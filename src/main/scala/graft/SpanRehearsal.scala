package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Dev/audit tool: ExactSubstr span excision at a SCALE corpus — the
  * claim behind d62/d63 is that span localization is one gram-keyed
  * aggregation+join plus a window over DUPLICATED starts only, and
  * that surgery never explodes the corpus to words; this measures
  * both at `n` synthetic documents (default 1M, ~45 words each →
  * ~33M positioned 13-grams) with a PLANTED truth:
  *
  *   - every doc's noise words are md5-derived (16 hex chars of
  *     md5(id || '-' || position)) — unique per (doc, position); 16
  *     hex, not 8, because a 32-bit word space made ONE boundary-word
  *     birthday collision likely at 100k planted docs (found live:
  *     two docs shared the word before P and correctly reported a
  *     21-word span — the operator was right, the plant was narrow);
  *   - 10% of docs (id % 10 == 0) carry the SAME 20-word span P at a
  *     deterministic offset (prefix length 5 + id % 7), so the ONLY
  *     duplicated grams are those fully inside P (8 chained starts),
  *     and the correct answer is known per doc: exactly one span,
  *     exactly 20 words wide, at span_start = 6 + id % 7, text = P.
  *
  * Structural requires, not printouts: span count, width, position,
  * text, and the excision's word-conservation all checked exactly.
  *
  * Usage: sbt "runMain graft.SpanRehearsal [nDocs]"
  * Results recorded in PLANS.md ("span-excision scale rehearsal").
  */
object SpanRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val planted = (1 to 20).map(i => s"p$i").mkString(" ")
    def noise(from: Column, len: Column) =
      transform(sequence(from, from + len - 1),
        i => substring(md5(concat(col("id").cast("string"), lit("-"),
          i.cast("string"))), 1, 16))
    val docs = spark.range(n).select(col("id"),
        (lit(5L) + pmod(col("id"), lit(7L))).as("pre"),
        pmod(col("id"), lit(10L)).as("mark"))
      .select(col("id"),
        when(col("mark") === 0L,
          concat_ws(" ",
            concat_ws(" ", noise(lit(0L), col("pre"))),
            lit(planted),
            // suffix pads every doc to exactly 45 words
            concat_ws(" ", noise(lit(1000L), lit(25L) - col("pre")))))
        .otherwise(
          concat_ws(" ", noise(lit(0L), lit(45L)))).as("text"))
      .localCheckpoint()

    val nPlanted = (n + 9L) / 10L // ids 0, 10, 20, ... below n

    val t0 = System.nanoTime()
    val spans = Dedup.dupSpans(docs, "id", "text", n = 13)
      .localCheckpoint()
    val nSpans = spans.count()
    val tSpans = (System.nanoTime() - t0) / 1e9
    require(nSpans == nPlanted,
      s"expected one span per planted doc ($nPlanted), got $nSpans")
    // every span: 20 words wide, at start pre+1 = 6 + id%7, text = P
    val bad = spans.filter(
      col("span_words") =!= 20L ||
        col("span_start") =!= lit(6L) + pmod(col("id"), lit(7L)) ||
        col("span_end") =!= lit(25L) + pmod(col("id"), lit(7L)) ||
        col("span_text") =!= lit(planted) ||
        pmod(col("id"), lit(10L)) =!= 0L).count()
    require(bad == 0L, s"$bad spans violate the planted geometry")

    val t1 = System.nanoTime()
    val ex = Dedup.spanExcise(docs, "id", "text", n = 13)
      .localCheckpoint()
    val agg = ex.agg(
      sum(col("n_removed")).as("rm"),
      sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("cut"),
      sum(when(col("n_words") =!= 45L, 1L).otherwise(0L)).as("oddlen"))
      .head()
    val tEx = (System.nanoTime() - t1) / 1e9
    require(agg.getLong(0) == 20L * nPlanted,
      s"removed ${agg.getLong(0)} words, expected ${20L * nPlanted}")
    require(agg.getLong(1) == nPlanted,
      s"${agg.getLong(1)} docs cut, expected $nPlanted")
    require(agg.getLong(2) == 0L, "every synthetic doc has 45 words")

    println(f"[rehearsal] $n docs: dupSpans $tSpans%.1f s, " +
      f"spanExcise $tEx%.1f s ($nSpans spans, " +
      f"${20L * nPlanted} words removed)")
    spark.stop()
  }
}
