package graft

import graft.ops.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(String, Double, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("grp", "value", "id")
  }

  /** Seeded corpora covering the ntile edge cases: group sizes with
    * every n % k residue, heavy value ties, single-value groups, and
    * groups smaller than the tile count. */
  private def corpus(seed: Int): Seq[(String, Double, Long)] = {
    val rnd = new scala.util.Random(seed)
    val sizes = Seq("a" -> (40 + seed), "b" -> (41 + seed),
      "c" -> (42 + seed), "d" -> (43 + seed), "tiny" -> 3, "one" -> 1)
    var id = 0L
    sizes.flatMap { case (g, n) =>
      (1 to n).map { _ =>
        id += 1
        // few distinct values -> massive ties, the hard ordering case
        val v = if (g == "one") 7.0 else rnd.nextInt(6).toDouble
        (g, v, id)
      }
    }
  }

  test("bucketedRank matches row_number over the full partition") {
    for (seed <- 1 to 3) {
      val d = df(corpus(seed))
      val got = DistributedRank
        .bucketedRank(d, "grp", "value", Seq("id"), buckets = 4)
        .select("grp", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val w = Window.partitionBy("grp").orderBy(col("value"), col("id"))
      val want = d.select(col("grp"), col("id"),
          row_number().over(w).cast("long").as("rank"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("bucketedNtile is bit-identical to ntile() for k=4 and k=3") {
    for (seed <- 1 to 3; k <- Seq(3, 4)) {
      val d = df(corpus(seed))
      val got = DistributedRank
        .bucketedNtile(d, "grp", "value", Seq("id"), nTiles = k,
          buckets = 4)
        .select("grp", "id", "ntile").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val w = Window.partitionBy("grp").orderBy(col("value"), col("id"))
      val want = d.select(col("grp"), col("id"),
          ntile(k).over(w).cast("long").as("ntile"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want, s"seed $seed k $k")
    }
  }

  test("null group keys and null values rank exactly like the window") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows: Seq[(String, Option[Double], Long)] =
      (1L to 120L).map { id =>
        val g = if (id % 5 == 0) null else s"g${id % 3}"
        val v = if (id % 7 == 0) None else Some(rnd.nextInt(5).toDouble)
        (g, v, id)
      }
    val d = rows.toDF("grp", "value", "id")
    val raw = DistributedRank
      .bucketedNtile(d, "grp", "value", Seq("id"), nTiles = 4, buckets = 4)
      .select("grp", "id", "ntile").collect()
    assert(raw.length === 120) // neither dropped NOR duplicated rows
    val got = raw
      .map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(2))
      .toMap
    val w = Window.partitionBy("grp").orderBy(col("value"), col("id"))
    val want = d.select(col("grp"), col("id"),
        ntile(4).over(w).cast("long").as("ntile"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got.size === 120) // no row dropped by the joins
    assert(got === want)
  }

  test("degenerate buckets=1 still agrees (single-cell fallback)") {
    val d = df(corpus(1))
    val got = DistributedRank
      .bucketedNtile(d, "grp", "value", Seq("id"), nTiles = 4, buckets = 1)
      .select("grp", "id", "ntile").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = Window.partitionBy("grp").orderBy(col("value"), col("id"))
    val want = d.select(col("grp"), col("id"),
        ntile(4).over(w).cast("long").as("ntile"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }
}
