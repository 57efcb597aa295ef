package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter from the driver's synthetic `events` table
  * (event_id, ts, user_id, event_type∈{click,view,purchase,signup,error},
  * value, props='{"k": NN}') onto the reference's rime event shape, so
  * every SURVEY §2 operator can be exercised — and oracle-checked in
  * DuckDB — against the shared fixtures.
  *
  * The mapping is deterministic and expressible identically in Spark and
  * ANSI SQL (see [[rimeCte]]):
  *   - `click` events play the role of `text_committed` commits;
  *   - `k` (0..99, from the props JSON) derives the nullable sentinel
  *     rank: k%10==9 → null (field filtered by preset), k%10==8 → -1
  *     (direct commit), else k%10 ∈ 0..7;
  *   - committed/predicted texts are synthesized from k so that the
  *     frequency/window/sort operators see a realistic low-cardinality
  *     Zipf-ish key space.
  */
object SyntheticEvents {

  private val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int")

  /** Spark-side view; must stay in lockstep with [[rimeCte]]. */
  def rimeShaped(events: DataFrame): DataFrame = events.select(
    col("event_id"),
    col("ts"),
    col("user_id"),
    col("value"),
    when(col("event_type") === "click", lit("text_committed"))
      .otherwise(col("event_type")).as("event_type"),
    k.as("k"),
    when(k % 10 === 9, lit(null).cast("int"))
      .when(k % 10 === 8, lit(-1))
      .otherwise(k % 10).as("selected_candidate_rank"),
    concat(lit("w"), (k % 50).cast("string")).as("committed_text"),
    col("user_id").cast("string").as("source_input_buffer"),
    concat(lit("w"), (k % 7).cast("string")).as("source_first_candidate"))

  /** Canonical events read: `ts` normalized to LONG NANOSECONDS since
    * epoch, whatever the fixture's parquet encoding — all downstream
    * `ts` arithmetic is exact integer ns, and the DuckDB oracles are
    * unaffected because DuckDB reads either encoding as a TIMESTAMP
    * and the oracle SQL already speaks epoch_us/INTERVAL.
    *
    * The fixtures have shipped two encodings across driver rounds:
    * int64 nanosecond timestamps (Spark reads them as long under the
    * legacy nanosAsLong flag) and plain microsecond timestamps (Spark
    * reads TIMESTAMP/TIMESTAMP_NTZ — converted here via unix_micros
    * under a UTC session pin, so the numeric value equals the stored
    * micros regardless of the caller session's timezone).
    *
    * The UTC pin is SCOPED, not a session mutation: Spark resolves a
    * cast's timezone at analysis time and Dataset construction runs
    * the analyzer eagerly, so the pin is baked into this one plan and
    * the caller's `spark.sql.session.timeZone` is restored before
    * returning — later timestamp/date queries in the same session are
    * untouched. */
  def readEventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        val tzKey = "spark.sql.session.timeZone"
        val prevTz = spark.conf.getOption(tzKey)
        spark.conf.set(tzKey, "UTC")
        try raw.withColumn("ts",
          unix_micros(col("ts").cast("timestamp")) * lit(1000L))
        finally prevTz match {
          case Some(tz) => spark.conf.set(tzKey, tz)
          case None     => spark.conf.unset(tzKey)
        }
    }
  }

  def load(spark: SparkSession, sfDir: String): DataFrame =
    rimeShaped(readEventsTable(spark, sfDir))

  /** Commit subset. Filters the RAW event_type before the rename: the
    * post-rename predicate would sit inside a CASE expression that
    * parquet cannot push (`PushedFilters: []` — a full scan at scale);
    * pre-rename it pushes as `EqualTo(event_type, 'click')`. Equivalent
    * because only 'click' maps to 'text_committed'. Guarded by
    * PlanDisciplineSpec. */
  def commits(spark: SparkSession, sfDir: String): DataFrame =
    rimeShaped(readEventsTable(spark, sfDir)
      .filter(col("event_type") === "click"))

  /** DuckDB CTE computing the exact same view — prepended to every
    * events-based oracle query. */
  val rimeCte: String =
    """WITH rime AS (
      |  SELECT event_id, ts, user_id, value,
      |    CASE WHEN event_type = 'click' THEN 'text_committed'
      |         ELSE event_type END AS event_type,
      |    k,
      |    CASE WHEN k % 10 = 9 THEN NULL
      |         WHEN k % 10 = 8 THEN -1
      |         ELSE k % 10 END AS selected_candidate_rank,
      |    'w' || CAST(k % 50 AS VARCHAR) AS committed_text,
      |    CAST(user_id AS VARCHAR) AS source_input_buffer,
      |    'w' || CAST(k % 7 AS VARCHAR) AS source_first_candidate
      |  FROM (SELECT *,
      |          CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
      |        FROM events) raw
      |)""".stripMargin
}
