package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (suites run in one
  * forked JVM; building a session per suite would dominate test time). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    System.setProperty("derby.system.home", wh.toString)
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
