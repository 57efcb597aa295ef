package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Dev/audit tool: the 10× scale rehearsal for the round-9 gate
  * surface (ResemblanceIndex pinned/staged/append). Builds the
  * adversarial near-dup corpus of the earlier dedup rehearsals —
  * every sf0.1 document × `variants` near-identical variants, so
  * every LSH bucket really holds a clique — then measures the costs
  * a recurring admission pipeline pays:
  *
  *   - corpus index BUILD + pin (the once-per-corpus cost);
  *   - a batch gate against the PINNED index (the steady-state
  *     per-micro-batch cost — must track batch size, not corpus);
  *   - index SAVE to bucketed staging tables + a gate against the
  *     LOADED index (the cross-session form; at toy scale the staged
  *     read loses to OS-cached recompute — the ContainmentIndex
  *     honesty note — while at 100 TB it removes the per-session
  *     corpus scans);
  *   - APPEND of an admitted batch (must be batch-sized) + a second
  *     batch's gate against the grown staged index.
  *
  * Usage: sbt "runMain graft.GateRehearsal [sfDir] [variants]"
  * Results are recorded in PLANS.md ("Round-9 gate rehearsal").
  */
object GateRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[gate-rehearsal] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // every doc × variants near-identical copies (clique worst case):
    // variant i appends a distinguishing token
    val corpus = base
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(variants - 1))).as("_v"))
      .select((col("doc_id") * 100 + col("_v")).as("doc_id"),
        concat(col("text"), lit(" variant"), col("_v").cast("string"))
          .as("text"))
      .localCheckpoint()
    println(s"[gate-rehearsal] corpus rows = ${corpus.count()}")

    def batch(offset: Long) = base
      .filter(pmod(col("doc_id"), lit(41L)) === 0 &&
        size(split(col("text"), " ")) >= 12)
      .select((col("doc_id") + offset).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, " +
          "size(split(text, ' ')) - 1), ' ')").as("text"))
    val b1 = batch(3000000L).localCheckpoint()
    val b2 = batch(4000000L).localCheckpoint()
    println(s"[gate-rehearsal] batch rows = ${b1.count()}")

    val pinned = timed(s"index build + pin (${variants}x corpus)") {
      Dedup.ResemblanceIndex.build(corpus, "doc_id", "text").pinned
    }
    val n1 = timed("gate batch1 vs PINNED index") {
      Dedup.lshVerifiedPairsAgainstIndex(b1, pinned, "doc_id", "text",
        threshold = 0.5).count()
    }
    println(s"[gate-rehearsal]   verified pairs = $n1")
    timed("index save (bucketed staging tables)") {
      Dedup.ResemblanceIndex.save(pinned, "gate_rx", buckets = 32)
    }
    try {
      val n2 = timed("gate batch1 vs LOADED (staged) index") {
        Dedup.lshVerifiedPairsAgainstIndex(b1,
          Dedup.ResemblanceIndex.load(spark, "gate_rx"),
          "doc_id", "text", threshold = 0.5).count()
      }
      require(n1 == n2, s"staged gate disagrees: $n1 vs $n2")
      timed("append batch1 into the staged index") {
        Dedup.ResemblanceIndex.append(
          Dedup.ResemblanceIndex.build(b1, "doc_id", "text"),
          "gate_rx", buckets = 32)
      }
      val n3 = timed("gate batch2 vs GROWN staged index") {
        Dedup.lshVerifiedPairsAgainstIndex(b2,
          Dedup.ResemblanceIndex.load(spark, "gate_rx"),
          "doc_id", "text", threshold = 0.5).count()
      }
      println(s"[gate-rehearsal]   grown-gate pairs = $n3 " +
        s"(includes batch2 x batch1 exact twins)")
      require(n3 > n2, "grown gate must see the admitted batch")
    } finally Seq("_bands", "_toks", "_sizes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS gate_rx$t"))
    spark.stop()
  }
}
