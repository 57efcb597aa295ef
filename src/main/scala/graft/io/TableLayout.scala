package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB posture: partitioned and
  * bucketed persistence so repeated joins/aggregations on the same key
  * are co-located (no exchange at read time).
  *
  * - `writePartitioned`: date/enum-partitioned parquet → partition
  *   pruning on predicates over the partition column.
  * - `writeBucketed`: hash-bucketed managed table → a join or groupBy on
  *   the bucket key of two same-bucketed tables plans without any
  *   `Exchange` on the big sides (verified in TableLayoutSpec).
  */
object TableLayout {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None,
                    mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    // A database-qualified name would mis-quote below (`db.tbl` is one
    // backticked identifier) and compute the WRONG orphan path — refuse
    // it up front rather than delete an unrelated directory (round-9
    // advice).
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'; " +
        "qualified names would mis-resolve the warehouse orphan path")
    if (mode == "overwrite") {
      // saveAsTable(overwrite) replaces a CATALOG-known table, but an
      // orphaned warehouse directory from an earlier process fails
      // with LOCATION_ALREADY_EXISTS: the in-memory catalog's table
      // metadata dies with its JVM while the directory survives.
      // Recurring staging writers (a nightly index refresh) hit this
      // on every run after the first — drop both the entry and the
      // orphan location. The delete only fires when no surviving
      // catalog entry still points at the directory (an EXTERNAL
      // table of the same name would, and its data must not vanish).
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir")),
        table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // fast path first: no orphan directory (the overwhelmingly
      // common case) → zero catalog RPCs. Only when a directory DOES
      // sit at the computed path is the catalog swept for a surviving
      // reference — that sweep is O(#tables) metastore calls, priced
      // only on the rare recovery path, not on every write.
      if (fs.exists(loc)) {
        val qualified = fs.makeQualified(loc)
        val catalog = spark.sessionState.catalog
        val stillReferenced = catalog.listDatabases().exists { db =>
          catalog.listTables(db).exists { id =>
            try fs.makeQualified(new org.apache.hadoop.fs.Path(
              catalog.getTableMetadata(id).location)) == qualified
            catch {
              // Only the cases that PROVE this entry cannot own the
              // directory may answer false: the table vanished
              // concurrently, or it is a view with no location (both
              // surface as AnalysisException). Anything else — a
              // transient metastore/RPC failure on exactly the table
              // that owns the path — must fail SAFE: treat it as
              // still-referenced so live external-table data is never
              // deleted on a flaky lookup (round-10 advice).
              case _: org.apache.spark.sql.AnalysisException => false
              case scala.util.control.NonFatal(_) => true
            }
          }
        }
        if (!stillReferenced) fs.delete(loc, true)
      }
    }
    val w = df.write.mode(mode)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Equi-width bin of `c` into [0, 2^bits) given the column's
    * [mn, mx] range (a 1-row parameter fetch at the caller). Pure
    * arithmetic — floor/clamp, no shifts — so an ANSI oracle
    * recomputes it exactly. A degenerate range bins to 0. */
  def binColumn(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, "bits in [1, 20]")
    val n = (1L << bits) - 1
    val scaled =
      if (mx > mn) floor((c.cast("double") - mn) / (mx - mn) * n)
      else lit(0.0)
    greatest(lit(0L), least(lit(n), scaled.cast("long")))
  }

  /** Morton (Z-order) interleave of d pre-binned dimensions, each in
    * [0, 2^bits): bit b of dimension i lands at position b·d + i.
    * Expressed as Σ ((bin ÷ 2^b) mod 2) · 2^(b·d+i) — divisions and
    * moduli only, reproducible in any engine. Points close in EVERY
    * dimension get close z-values, so sorting by z clusters the
    * multi-dimensional neighborhood into the same files — the
    * data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) for scans
    * that filter on several columns at once, where single-column
    * sorting only helps the leading column. */
  def zValue(bins: Seq[Column], bits: Int): Column = {
    require(bins.nonEmpty && bits * bins.length <= 60,
      "z-value must fit a long")
    val d = bins.length
    (for {
      b <- 0 until bits
      (c, i) <- bins.zipWithIndex
    } yield {
      val bit = pmod(floor(c / lit(math.pow(2.0, b))).cast("long"),
        lit(2L))
      bit * lit(1L << (b * d + i))
    }).reduce(_ + _)
  }

  /** Z-order-clustered parquet write: range-partition on the z-value
    * (so each output file owns a contiguous z-range = a compact
    * multi-dim tile) and sort within partitions (so parquet row-group
    * min/max stats are tight inside each file). Readers filtering on
    * any combination of the z-dimensions then skip most files/row
    * groups on stats alone — proven file-level in ScaleOpsSpec. The
    * `_z` column is persisted alongside the data (it doubles as the
    * cluster id for debugging; drop it at read time if unwanted). */
  def writeZOrdered(df: DataFrame, path: String, zCol: Column,
                    files: Int): Unit =
    df.withColumn("_z", zCol)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction: rewrite a parquet directory into
    * size-targeted files. Long-running ingestion (micro-batch sinks,
    * the JSONL connector's per-task parts) accretes small files whose
    * per-file open/footer cost eventually dominates scans at 100 TB;
    * periodic compaction is the standard operational answer. The
    * rewrite goes through a temp directory + atomic-ish swap so a
    * failed compaction never leaves the table truncated. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytesPerFile: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Flat directories only: rewriting a partitioned layout through
    // spark.read.parquet would flatten it (the partition column becomes
    // data; pruning dies silently). Compact each partition directory
    // individually instead.
    val subDirs = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
    require(subDirs.isEmpty,
      s"$path contains partition subdirectories " +
        s"(${subDirs.map(_.getPath.getName).take(3).mkString(", ")}…); " +
        "compact each partition directory individually")
    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter(f =>
        f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles(p)
    val totalBytes = before.map(_.getLen).sum
    val parts = math.max(1, math.ceil(
      totalBytes.toDouble / targetBytesPerFile).toInt)
    val tmp = new Path(p.getParent, s".${p.getName}_compact_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(path).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new Path(p.getParent, s".${p.getName}_compact_old")
    fs.delete(bak, true)
    require(fs.rename(p, bak), s"could not move $p aside")
    require(fs.rename(tmp, p), s"could not install compacted $tmp")
    fs.delete(bak, true)
    (before.size, dataFiles(p).size)
  }
}
