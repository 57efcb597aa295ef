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
}
