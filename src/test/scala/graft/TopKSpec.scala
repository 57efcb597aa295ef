package graft

import graft.functions.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private implicit def ord: Ordering[(Double, Long, Long)] =
    Ordering.by[(Double, Long, Long), (Double, Long, Long)](
      { case (v, a, b) => (-v, a, b) })(
      Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Long,
        Ordering.Long))

  test("TopK.agg equals window row_number filter, including ties") {
    val s = spark
    import s.implicits._
    // deterministic data with heavy value ties so the tie-break keys
    // (a, b) decide; 7 partitions exercise partial+merge paths
    val df = (1L to 2000L)
      .map(i => ((i * 7919L) % 50 / 10.0, i % 37, i))
      .toDF("v", "a", "b").repartition(7)

    val viaAgg = df.groupBy("a")
      .agg(TopK.agg[(Double, Long, Long)](5,
        col("v"), col("a"), col("b")).as("top"))
      .select(col("a"), posexplode(col("top")).as(Seq("pos", "row")))
      .select(col("a"), (col("pos") + 1).cast("long").as("rk"),
        col("row._1").as("v"), col("row._3").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet

    val w = Window.partitionBy("a")
      .orderBy(col("v").desc, col("a").asc, col("b").asc)
    val viaWindow = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("a", "rk", "v", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet

    assert(viaAgg === viaWindow)
  }

  test("buffer stays bounded at k and merge keeps global order") {
    val tk = new graft.functions.TopK[(Double, Long, Long)](3, ord,
      null, null)
    val left = Seq((1.0, 1L, 1L), (2.0, 2L, 2L), (3.0, 3L, 3L))
      .sorted(ord)
    val right = Seq((0.5, 4L, 4L), (2.5, 5L, 5L)).sorted(ord)
    val merged = tk.merge(left, right)
    assert(merged.length === 3)
    assert(merged === Seq((3.0, 3L, 3L), (2.5, 5L, 5L), (2.0, 2L, 2L)))
  }

  test("property: reduce+merge over any partitioning equals sorted take(k)") {
    val rnd = new scala.util.Random(7)
    val tk = new graft.functions.TopK[(Double, Long, Long)](4, ord,
      null, null)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(30)
      val data = Seq.fill(n)((rnd.nextInt(5).toDouble,
        rnd.nextInt(10).toLong, rnd.nextLong()))
      val expected = data.sorted(ord).take(4)
      // arbitrary partitioning: reduce each chunk, merge the buffers
      val chunks = if (data.isEmpty) Seq(Seq.empty) else
        data.grouped(rnd.nextInt(data.length) + 1).toSeq
      val merged = chunks
        .map(_.foldLeft(tk.zero)(tk.reduce))
        .reduce(tk.merge)
      assert(merged === expected, s"data=$data chunks=$chunks")
    }
  }
}
