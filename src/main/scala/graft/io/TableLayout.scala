package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

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
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

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
