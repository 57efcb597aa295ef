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

  test("bucketedRankBalanced ranks identically to the equi-width form and the window") {
    for (seed <- 1 to 2) {
      val d = df(corpus(seed))
      def ranks(r: org.apache.spark.sql.DataFrame) =
        r.select("grp", "id", "rank").collect()
          .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2))
          .toMap
      val eq = ranks(DistributedRank
        .bucketedRank(d, "grp", "value", Seq("id"), buckets = 4))
      val bal = ranks(DistributedRank
        .bucketedRankBalanced(d, "grp", "value", Seq("id"),
          buckets = 4))
      assert(eq === bal)
      val w = Window.partitionBy("grp").orderBy(col("value"), col("id"))
      val want = d.select(col("grp"), col("id"),
          row_number().over(w).cast("long").as("rank"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(bal === want)
    }
    // null values and null groups survive the quantile path too
    val s = spark
    import s.implicits._
    val withNulls = Seq(("a", Some(2.0), 1L), ("a", None, 2L),
      (null, Some(1.0), 3L), (null, None, 4L), ("a", Some(1.0), 5L))
      .toDF("grp", "value", "id")
    val got = DistributedRank.bucketedRankBalanced(withNulls, "grp",
        "value", Seq("id"), buckets = 3)
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group a: null value first (id 2), then 1.0, then 2.0
    assert(got(2L) === 1L && got(5L) === 2L && got(1L) === 3L)
    assert(got(4L) === 1L && got(3L) === 2L)
  }

  test("percentile cells stay balanced under heavy value skew where equi-width collapses") {
    val s = spark
    import s.implicits._
    // exponential-ish tail: almost all mass near 0, max ~e^9 — the
    // equi-width bucketizer puts ~everything in cell 0
    val rnd = new scala.util.Random(5)
    val rows = (1L to 4000L).map(i =>
      ("g", math.exp(rnd.nextDouble() * 9), i))
    val d = rows.toDF("grp", "value", "id")
    val B = 8
    val cells = DistributedRank.balancedCells(d, "grp", "value", B)
      .groupBy("_bkt").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxCell = cells.values.max
    // near-equal: no cell more than 2x the ideal n/B
    assert(maxCell <= 2L * 4000 / B,
      s"balanced cells skewed: $cells")
    // the equi-width assignment on the same data: cell 0 absorbs the
    // overwhelming majority (the failure mode being fixed)
    val mx = rows.map(_._2).max
    val equiCell0 = rows.count(v => (v._2 / (mx / B)).toLong <= 0)
    assert(equiCell0 > 4000 * 3 / 4,
      s"fixture not skewed enough: $equiCell0")
  }
}
