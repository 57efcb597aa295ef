package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** Dev/audit tool: BPE merge training at a SCALE vocabulary — the
  * claim behind d55 is that each round is vocabulary-sized, never
  * corpus-sized; this measures the round cost at `n` distinct words
  * (default 1M, ~9 symbols each → ~8M weighted pair rows per round).
  *
  * The vocabulary is synthetic but carries a planted truth: every
  * word is 8 md5-hex chars plus the suffix "zz". 'z' appears nowhere
  * else, so round 1 MUST merge (z, z) with pair count exactly n, and
  * round 2's right side MUST be the fresh "zz" symbol (the (h8, zz)
  * boundary pairs, ~n/16 each, dominate the ~7n/256 interior hex-hex
  * pairs) — structural requires, not printouts.
  *
  * Usage: sbt "runMain graft.BpeRehearsal [nWords] [rounds]"
  * Results recorded in PLANS.md ("BPE scale rehearsal").
  */
object BpeRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    // the planted-truth checks below index merges(1): a 1-round run
    // cannot be audited, so reject it with a clear message instead of
    // an IndexOutOfBoundsException (round-10 advice)
    require(rounds >= 2,
      s"rehearsal needs rounds >= 2 (got $rounds): the round-2 " +
        "planted-truth check indexes the second merge")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    // one synthetic word per row: 8 hex chars (md5 of the row id) +
    // the planted "zz" suffix; ~all-distinct, counts 1
    val docs = spark.range(n).select(
      concat(substring(md5(col("id").cast("string")), 1, 8),
        lit("zz")).as("text"))
    val merges = Bpe.trainMerges(docs, "text", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val total = (System.nanoTime() - t0) / 1e9
    merges.foreach(m => println(s"[rehearsal] merge $m"))
    println(f"[rehearsal] $rounds rounds over $n-word vocab: " +
      f"$total%.1f s (${total / rounds}%.1f s/round incl. vocab build)")
    require(merges.head == ((1L, "z", "z", "zz", n)),
      s"round 1 must merge the planted (z,z) exactly n times: " +
        s"${merges.head}")
    require(merges(1)._3 == "zz",
      s"round 2 must consume the fresh zz symbol: ${merges(1)}")
    require(merges.length == rounds, "no early exhaustion expected")
    spark.stop()
  }
}
