package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def emb(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine top-k golden on known vectors") {
    val df = emb(Seq(
      (0L, Seq(1f, 0f)),        // query: cosine 1
      (1L, Seq(2f, 0f)),        // same direction: 1
      (2L, Seq(0f, 3f)),        // orthogonal: 0
      (3L, Seq(-1f, 0f)),       // opposite: -1
      (4L, Seq(1f, 1f))))       // 45°: √2/2
    val got = Similarity.cosineTopK(df, "vec_id", "embedding",
      Seq(1.0, 0.0), 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 4L, 2L, 3L))
    assert(math.abs(got(2)._2 - math.sqrt(2) / 2) < 1e-9)
    assert(math.abs(got(4)._2 - (-1.0)) < 1e-9)
  }

  test("ann lsh: query's own vector ranks first inside its bucket; " +
    "bucket assignment is deterministic") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val rows = (0L to 60L).map(id =>
      id -> Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = emb(rows)
    val q = rows.head._2.map(_.toDouble)
    val got = Similarity.annTopK(df, "vec_id", "embedding", q, k = 10)
      .collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(0) === 0L)
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-9)
    // all results share one bucket id
    assert(got.map(_.getLong(2)).toSet.size === 1)
    // recall sanity: bucket restriction only ever drops rows
    val brute = Similarity.cosineTopK(df, "vec_id", "embedding", q, 61)
    assert(got.length <= brute.count())
  }

  test("hyperplanes are deterministic across invocations") {
    assert(Similarity.hyperplanes(4, 8) === Similarity.hyperplanes(4, 8))
  }

  test("native vector_dot is bit-identical to the declarative fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1 to 200).map(_ => Tuple2(
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotDeclarative(col("a"), col("b")).as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(bad === 0)
  }

  test("ivf: full-probe equals brute force; few-probe is a subset with query first") {
    val rnd = new scala.util.Random(13)
    val dim = 16
    val rows = (0L to 80L).map(id =>
      id -> Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = emb(rows)
    val q = rows.head._2.map(_.toDouble)
    val brute = Similarity.cosineTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.ivfTopK(df, "vec_id", "embedding", q, 10,
        nCentroids = 8, nProbes = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === brute) // all cells probed → exact
    val few = Similarity.ivfTopK(df, "vec_id", "embedding", q, 10,
        nCentroids = 8, nProbes = 2).collect()
    assert(few.nonEmpty)
    assert(few.head.getLong(0) === 0L) // query's own cell always probed
    val bruteIds = Similarity.cosineTopK(df, "vec_id", "embedding", q, 81)
      .collect().map(_.getLong(0)).toSet
    assert(few.map(_.getLong(0)).forall(bruteIds)) // subset of the data
  }

  test("on-disk IVF index: identical results, only probed partitions read") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(23)
    val df = (0L to 60L)
      .map(i => (i, Seq.fill(8)((rnd.nextDouble() - 0.5).toFloat)))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble)
    val cids = (1L to 4L)
    val path = java.nio.file.Files
      .createTempDirectory("ivf_idx_spec").toString
    Similarity.writeIvfIndex(df, "vec_id", "embedding", path, cids)
    // layout: one directory per cell
    val cellDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty && cellDirs.subsetOf(
      cids.map(c => s"cell=$c").toSet))

    val indexed = Similarity.ivfTopKIndexed(s2, path, "vec_id",
      "embedding", q, k = 10, centroidIds = cids, nProbes = 2)
    val inline = Similarity.ivfTopKData(df, "vec_id", "embedding", q,
      k = 10, centroidIds = cids, nProbes = 2)
    assert(indexed.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq ===
      inline.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)

    // pruning: the cell predicate is a PARTITION filter (file-skipping),
    // not a row filter — the executed scan reports fewer files read
    // than the index holds
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val planStr = indexed.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cell"),
      s"cell predicate must be a partition filter:\n$planStr")
    val scan = scans(indexed.queryExecution.executedPlan)
      .find(_.toString.contains("cell")).get
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path))
        .count(f => f.getName.endsWith(".parquet"))
    }
    assert(scan.metrics.contains("numFiles"))
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < totalFiles,
      s"probe must skip unprobed partitions: read $read of $totalFiles")
  }

  test("IVF index append: new vectors join their cells, probes see both") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(29)
    def vecs(ids: Range) = ids.map(i =>
      (i.toLong, Seq.fill(8)((rnd.nextDouble() - 0.5).toFloat)))
      .toDF("vec_id", "embedding")
    val base = vecs(0 to 40)
    val cids = (1L to 4L)
    val path = java.nio.file.Files
      .createTempDirectory("ivf_idx_append").toString
    Similarity.writeIvfIndex(base, "vec_id", "embedding", path, cids)
    // incremental maintenance: same codebook, append-only
    val cents = Similarity.vectorsByIds(base, "vec_id", "embedding", cids)
    val delta = vecs(41 to 60)
    Similarity.writeIvfIndexWith(delta, "vec_id", "embedding", path,
      cids, cents, "append")
    val all = base.union(delta)
    val q = all.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble)
    val indexed = Similarity.ivfTopKIndexed(s2, path, "vec_id",
        "embedding", q, k = 15, centroidIds = cids, nProbes = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = Similarity.ivfTopKData(all, "vec_id", "embedding", q,
        k = 15, centroidIds = cids, nProbes = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed === inline)
    assert(indexed.map(_._1).exists(_ > 40L)) // appended rows reachable
  }

  test("data-derived IVF/ANN: full probe equals brute force (rounded)") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L to 60L)
      .map(i => (i, Seq.fill(8)((rnd.nextDouble() - 0.5).toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble)

    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // probing every cell degrades IVF to exact brute force
    val ivfAll = Similarity.ivfTopKData(emb, "vec_id", "embedding", q,
        k = 10, centroidIds = (1L to 4L), nProbes = 4)
      .select("vec_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll === brute)

    // data-derived LSH: the query's own bucket contains the query
    val hp = Similarity.vectorsByIds(emb, "vec_id", "embedding",
      Seq(1L, 2L, 3L))
    val ann = Similarity.annTopKWith(emb, "vec_id", "embedding", q,
        k = 10, hp)
      .collect().map(_.getLong(0))
    assert(ann.head === 0L) // cosine(q, q) = 1 ranks first
  }
}
