package graft

import graft.pipeline.{Dedup, TextStats}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stage-level counters via Spark's Observation API: the way a 100 TB
  * cleaning run reports rows-kept / rows-dropped per stage WITHOUT
  * extra count() jobs — the metrics ride along with the one real
  * action, collected on the driver from accumulators. */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cleaning pipeline emits per-stage counters with one action") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and friends"),
      (2L, "the quick brown fox jumps over the lazy dog and friends"),
      (3L, "good words spread far beyond their first speaker today really"),
      (4L, "the the the the the the the the the the the the"))
      .toDF("doc_id", "text")

    val inObs = Observation("in")
    val qualityObs = Observation("quality")
    val dedupObs = Observation("dedup")

    val observed = docs
      .observe(inObs, count(lit(1)).as("rows"))
      .filter(TextStats.isQuality(col("text")))
      .observe(qualityObs, count(lit(1)).as("rows"))
    val deduped = Dedup.exactDedup(observed, "doc_id", "text")
      .observe(dedupObs, count(lit(1)).as("rows"))

    val out = deduped.collect() // the ONE action; counters ride along
    assert(out.map(_.getLong(0)).sorted === Array(1L, 3L))
    assert(inObs.get("rows") === 4L)
    // doc 4 fails the type-token-ratio quality gate
    assert(qualityObs.get("rows") === 3L)
    // docs 1/2 collapse to one survivor
    assert(dedupObs.get("rows") === 2L)
  }
}
