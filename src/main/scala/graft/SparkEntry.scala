package graft

import graft.ops.{EventOps => E, SyntheticEvents => SE}
import graft.queries.{AnalyzeQuery, ExportMissesQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2 (plus the driver-mandated LLM-pipeline operators), each
  * with a DuckDB-equivalent `oracleSql` where SQL-expressible.
  *
  * Verification discipline shared by every entry:
  *   - row-returning queries end in a deterministic total order
  *     (unique tie-break key) + LIMIT → top-k (`TakeOrderedAndProject`),
  *     which is also the scale-correct shape (never an unbounded global
  *     sort);
  *   - double aggregates whose value depends on summation order are
  *     ROUND-ed to 6 digits on both sides; money sums go through exact
  *     DECIMAL so Spark and DuckDB agree bit-for-bit;
  *   - integer-ish outputs are cast to BIGINT on both sides (DuckDB's
  *     smaller int types would otherwise mismatch the schema).
  */
object SparkEntry {

  private val rk = col("selected_candidate_rank")

  // ---- sources ---------------------------------------------------------
  // `ts` arrives as long nanoseconds (see SyntheticEvents.readEventsTable)
  private def rawEvents(s: SparkSession, dir: String): DataFrame =
    SE.readEventsTable(s, dir)
  private def events(s: SparkSession, dir: String): DataFrame =
    SE.load(s, dir)
  private def commits(s: SparkSession, dir: String): DataFrame =
    SE.commits(s, dir)
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full analyze metrics block (SURVEY §3.1) over the events table. */
  def entry(spark: SparkSession): DataFrame =
    analyzeMetrics(spark, "/root/testdata/sf0.001")

  // ---- flagship: analyze (cli.py:268-309 / analyzer.go:91-177) ---------
  private def analyzeMetrics(s: SparkSession, dir: String): DataFrame =
    AnalyzeQuery.metricsFrame(commits(s, dir)).select(
      col("total_commits"), col("total_selections"), col("raw_input_commits"),
      col("first_choice_count"), col("top3_count"),
      round(col("average_rank"), 6).as("average_rank"),
      round(col("overall_accuracy_score"), 6).as("overall_accuracy_score"),
      round(col("first_choice_hit_rate"), 6).as("first_choice_hit_rate"),
      round(col("top3_hit_rate"), 6).as("top3_hit_rate"),
      round(col("direct_input_rate"), 6).as("direct_input_rate"))

  private val cte = SE.rimeCte
  private val commitsCte =
    s"""$cte, c AS (SELECT * FROM rime WHERE event_type = 'text_committed')"""

  private case class Q(fn: (SparkSession, String) => DataFrame,
                       sql: Option[String])

  private lazy val registry: Map[String, Q] = Map(

    // ---- S: sources / scans (SURVEY §2.1) -----------------------------
    "s1_scan_project" -> Q(
      (s, dir) => rawEvents(s, dir)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id").limit(500),
      Some("""SELECT event_id, user_id, event_type FROM events
             |ORDER BY event_id LIMIT 500""".stripMargin)),

    "s2_scan_fused_filter" -> Q(
      (s, dir) => commits(s, dir)
        .select("event_id", "user_id", "k")
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id, user_id, k FROM c
              |ORDER BY event_id LIMIT 500""".stripMargin)),

    // ---- P: filters / projections (SURVEY §2.2) -----------------------
    "p2_filter_selections" -> Q(
      (s, dir) => commits(s, dir).filter(E.isSelection)
        .select(col("event_id"), rk.as("rank"))
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id, selected_candidate_rank AS rank FROM c
              |WHERE selected_candidate_rank >= 0
              |ORDER BY event_id LIMIT 500""".stripMargin)),

    "p3_filter_direct" -> Q(
      (s, dir) => commits(s, dir).filter(E.isDirectCommit)
        .select(col("event_id"), rk.as("rank"))
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id, selected_candidate_rank AS rank FROM c
              |WHERE selected_candidate_rank = -1
              |ORDER BY event_id LIMIT 500""".stripMargin)),

    "p4_filter_misses" -> Q(
      (s, dir) => commits(s, dir).filter(E.isMiss)
        .select(col("event_id"), rk.as("rank"))
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id, selected_candidate_rank AS rank FROM c
              |WHERE selected_candidate_rank > 0
              |ORDER BY event_id LIMIT 500""".stripMargin)),

    "p5_project_rename" -> Q(
      (s, dir) => ExportMissesQuery
        .misses(commits(s, dir), extraCols = Seq("event_id"))
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id,
              |  source_input_buffer AS 用户输入,
              |  committed_text AS 实际选择,
              |  source_first_candidate AS 程序预测,
              |  selected_candidate_rank AS 选择排名
              |FROM c WHERE selected_candidate_rank > 0
              |ORDER BY event_id LIMIT 500""".stripMargin)),

    "p7_accuracy_score" -> Q(
      (s, dir) => commits(s, dir).filter(E.isSelection)
        .select(col("event_id"), rk.as("rank"),
          E.accuracyScore.as("accuracy_score"))
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id, selected_candidate_rank AS rank,
              |  CAST(1 AS DOUBLE) / (selected_candidate_rank + 1)
              |    AS accuracy_score
              |FROM c WHERE selected_candidate_rank >= 0
              |ORDER BY event_id LIMIT 500""".stripMargin)),

    // ---- A: aggregations (SURVEY §2.3) --------------------------------
    "a1_counts" -> Q(
      (s, dir) => commits(s, dir).agg(
        count(lit(1)).as("total_commits"),
        count(when(E.isSelection, 1)).as("total_selections")),
      Some(s"""$commitsCte
              |SELECT count(*) AS total_commits,
              |  count(CASE WHEN selected_candidate_rank >= 0 THEN 1 END)
              |    AS total_selections
              |FROM c""".stripMargin)),

    "a2_count_first_choice" -> Q(
      (s, dir) => commits(s, dir)
        .agg(count(when(E.isFirstChoice, 1)).as("first_choice_count")),
      Some(s"""$commitsCte
              |SELECT count(CASE WHEN selected_candidate_rank = 0 THEN 1 END)
              |  AS first_choice_count FROM c""".stripMargin)),

    "a3_count_top3" -> Q(
      (s, dir) => commits(s, dir)
        .agg(count(when(E.isTop3, 1)).as("top3_count")),
      Some(s"""$commitsCte
              |SELECT count(CASE WHEN selected_candidate_rank >= 0
              |  AND selected_candidate_rank < 3 THEN 1 END) AS top3_count
              |FROM c""".stripMargin)),

    "a4_count_direct" -> Q(
      (s, dir) => commits(s, dir)
        .agg(count(when(E.isDirectCommit, 1)).as("raw_input_commits")),
      Some(s"""$commitsCte
              |SELECT count(CASE WHEN selected_candidate_rank = -1 THEN 1 END)
              |  AS raw_input_commits FROM c""".stripMargin)),

    "a5_avg_rank" -> Q(
      (s, dir) => commits(s, dir)
        .agg(avg(when(E.isSelection, rk)).as("average_rank")),
      Some(s"""$commitsCte
              |SELECT avg(CASE WHEN selected_candidate_rank >= 0
              |  THEN selected_candidate_rank END) AS average_rank
              |FROM c""".stripMargin)),

    "a6_hit_rates" -> Q(
      (s, dir) => AnalyzeQuery.metricsFrame(commits(s, dir)).select(
        round(col("first_choice_hit_rate"), 6).as("first_choice_hit_rate"),
        round(col("top3_hit_rate"), 6).as("top3_hit_rate"),
        round(col("direct_input_rate"), 6).as("direct_input_rate")),
      Some(s"""$commitsCte
              |SELECT
              |  ROUND(count(CASE WHEN selected_candidate_rank = 0 THEN 1 END)
              |    / CAST(count(CASE WHEN selected_candidate_rank >= 0 THEN 1
              |      END) AS DOUBLE), 6) AS first_choice_hit_rate,
              |  ROUND(count(CASE WHEN selected_candidate_rank >= 0
              |      AND selected_candidate_rank < 3 THEN 1 END)
              |    / CAST(count(CASE WHEN selected_candidate_rank >= 0 THEN 1
              |      END) AS DOUBLE), 6) AS top3_hit_rate,
              |  ROUND(count(CASE WHEN selected_candidate_rank = -1 THEN 1 END)
              |    * CAST(100 AS DOUBLE) / count(*), 6) AS direct_input_rate
              |FROM c""".stripMargin)),

    "q_analyze_metrics" -> Q(
      (s, dir) => analyzeMetrics(s, dir),
      Some(s"""$commitsCte
              |SELECT count(*) AS total_commits,
              |  count(CASE WHEN selected_candidate_rank >= 0 THEN 1 END)
              |    AS total_selections,
              |  count(CASE WHEN selected_candidate_rank = -1 THEN 1 END)
              |    AS raw_input_commits,
              |  count(CASE WHEN selected_candidate_rank = 0 THEN 1 END)
              |    AS first_choice_count,
              |  count(CASE WHEN selected_candidate_rank >= 0
              |    AND selected_candidate_rank < 3 THEN 1 END) AS top3_count,
              |  ROUND(avg(CASE WHEN selected_candidate_rank >= 0
              |    THEN selected_candidate_rank END), 6) AS average_rank,
              |  ROUND(avg(CASE WHEN selected_candidate_rank >= 0
              |    THEN CAST(1 AS DOUBLE) / (selected_candidate_rank + 1) END),
              |    6) AS overall_accuracy_score,
              |  ROUND(count(CASE WHEN selected_candidate_rank = 0 THEN 1 END)
              |    / CAST(count(CASE WHEN selected_candidate_rank >= 0 THEN 1
              |      END) AS DOUBLE), 6) AS first_choice_hit_rate,
              |  ROUND(count(CASE WHEN selected_candidate_rank >= 0
              |      AND selected_candidate_rank < 3 THEN 1 END)
              |    / CAST(count(CASE WHEN selected_candidate_rank >= 0 THEN 1
              |      END) AS DOUBLE), 6) AS top3_hit_rate,
              |  ROUND(count(CASE WHEN selected_candidate_rank = -1 THEN 1 END)
              |    * CAST(100 AS DOUBLE) / count(*), 6) AS direct_input_rate
              |FROM c""".stripMargin)),

    "a7_window_miss_freq" -> Q(
      (s, dir) => {
        val m = commits(s, dir).filter(E.isMiss)
          .select(col("event_id"), col("committed_text"))
        m.withColumn("错误频率",
            count(lit(1)).over(Window.partitionBy(col("committed_text"))))
          .orderBy("event_id").limit(1000)
      },
      Some(s"""$commitsCte
              |SELECT event_id, committed_text,
              |  count(*) OVER (PARTITION BY committed_text) AS 错误频率
              |FROM c WHERE selected_candidate_rank > 0
              |ORDER BY event_id LIMIT 1000""".stripMargin)),

    "a8_miss_count" -> Q(
      (s, dir) => commits(s, dir)
        .agg(count(when(E.isMiss, 1)).as("miss_count")),
      Some(s"""$commitsCte
              |SELECT count(CASE WHEN selected_candidate_rank > 0 THEN 1 END)
              |  AS miss_count FROM c""".stripMargin)),

    // ---- O: sort / export-misses (SURVEY §2.4, §3.2) ------------------
    "o1_sort_misses" -> Q(
      (s, dir) => ExportMissesQuery
        .run(commits(s, dir), window = false, extraCols = Seq("event_id"))
        .limit(1000),
      Some(s"""$commitsCte,
              |m AS (SELECT event_id,
              |        source_input_buffer AS 用户输入,
              |        committed_text AS 实际选择,
              |        source_first_candidate AS 程序预测,
              |        selected_candidate_rank AS 选择排名
              |      FROM c WHERE selected_candidate_rank > 0),
              |f AS (SELECT 实际选择, count(*) AS 错误频率 FROM m GROUP BY 实际选择)
              |SELECT m.*, f.错误频率 FROM m JOIN f USING (实际选择)
              |ORDER BY f.错误频率 DESC, m.用户输入 ASC, m.实际选择 ASC,
              |  m.选择排名 ASC, m.event_id ASC
              |LIMIT 1000""".stripMargin)),

    // ---- T: time / derivation operators (SURVEY §2.6, batch forms) ----
    "t1_sessionize" -> Q(
      (s, dir) => {
        // ts is long ns; 30-minute gap = 1.8e12 ns, exact integer compare
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val prev = lag(col("ts"), 1).over(w)
        val newSession =
          when(prev.isNull ||
            col("ts") > prev + lit(1800L * 1000000000L), 1).otherwise(0)
        rawEvents(s, dir).select("event_id", "user_id", "ts")
          .withColumn("session_seq", sum(newSession)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
          .select("event_id", "user_id", "session_seq")
          .orderBy("event_id").limit(1000)
      },
      Some("""WITH b AS (
             |  SELECT event_id, user_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS prev_ts
             |  FROM events)
             |SELECT event_id, user_id,
             |  CAST(SUM(CASE WHEN prev_ts IS NULL
             |      OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS session_seq
             |FROM b ORDER BY event_id LIMIT 1000""".stripMargin)),

    "t2_last_state" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        rawEvents(s, dir).select("event_id", "user_id", "event_type", "ts")
          .withColumn("prev_event_type", lag(col("event_type"), 1).over(w))
          .select("event_id", "user_id", "prev_event_type")
          .orderBy("event_id").limit(1000)
      },
      Some("""SELECT event_id, user_id,
             |  lag(event_type) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS prev_event_type
             |FROM events ORDER BY event_id LIMIT 1000""".stripMargin)),

    "t5_selection_method" -> Q(
      (s, dir) => commits(s, dir)
        .select(col("event_id"),
          E.selectionMethod(rk, col("k") < 50).as("selection_method"))
        .orderBy("event_id").limit(500),
      Some(s"""$commitsCte
              |SELECT event_id,
              |  CASE WHEN selected_candidate_rank = 0 THEN 'first_choice_space'
              |       WHEN selected_candidate_rank > 0 AND k < 50
              |         THEN 'nth_choice_number_'
              |           || CAST(selected_candidate_rank + 1 AS VARCHAR)
              |       WHEN selected_candidate_rank > 0 THEN 'nth_choice_space'
              |       WHEN selected_candidate_rank = -1
              |         THEN 'direct_commit_no_menu'
              |       ELSE 'unknown' END AS selection_method
              |FROM c ORDER BY event_id LIMIT 500""".stripMargin)),

    "t6_subtype_classify" -> Q(
      (s, dir) => rawEvents(s, dir)
        .select(when(col("event_type") === "view",
            when(col("value") < 10, "menu_navigation").otherwise("other_key"))
          .when(col("event_type") === "error", "input_rejected")
          .when(col("event_type") === "signup", "buffer_edit")
          .otherwise("other").as("event_subtype"))
        .groupBy("event_subtype").agg(count(lit(1)).as("n"))
        .orderBy("event_subtype"),
      Some("""SELECT CASE WHEN event_type = 'view' THEN
             |    (CASE WHEN value < 10 THEN 'menu_navigation'
             |          ELSE 'other_key' END)
             |  WHEN event_type = 'error' THEN 'input_rejected'
             |  WHEN event_type = 'signup' THEN 'buffer_edit'
             |  ELSE 'other' END AS event_subtype,
             |  count(*) AS n
             |FROM events GROUP BY 1 ORDER BY event_subtype""".stripMargin)),

    "t7_time_derive" -> Q(
      (s, dir) => {
        // long-ns → timestamp via exact integer div (never double division:
        // ns magnitudes exceed 2^53)
        val t = timestamp_micros(expr("ts div 1000"))
        rawEvents(s, dir).select(col("event_id"),
            year(t).cast("long").as("y"),
            month(t).cast("long").as("m"),
            dayofmonth(t).cast("long").as("dom"),
            hour(t).cast("long").as("h"),
            minute(t).cast("long").as("mi"))
          .orderBy("event_id").limit(1000)
      },
      Some("""SELECT event_id,
             |  CAST(year(ts) AS BIGINT) AS y,
             |  CAST(month(ts) AS BIGINT) AS m,
             |  CAST(day(ts) AS BIGINT) AS dom,
             |  CAST(hour(ts) AS BIGINT) AS h,
             |  CAST(minute(ts) AS BIGINT) AS mi
             |FROM events ORDER BY event_id LIMIT 1000""".stripMargin)),

    // ---- relational coverage over the star schema ---------------------
    "q1_lineitem_agg" -> Q(
      (s, dir) => lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus").agg(
          count(lit(1)).as("count_order"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("decimal(38,4)").as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  count(*) AS count_order,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
             |    AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
             |    AS DECIMAL(38,2)) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             |    AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
             |  ROUND(avg(l_discount), 6) AS avg_disc
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q2_broadcast_join_agg" -> Q(
      (s, dir) => lineitem(s, dir)
        .join(broadcast(table(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("total_qty"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
             |    AS total_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    "q3_join_topk" -> Q(
      (s, dir) => lineitem(s, dir)
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "c_mktsegment").agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("decimal(38,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc).limit(10),
      Some("""SELECT o_orderkey, c_mktsegment,
             |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             |    AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY o_orderkey, c_mktsegment
             |ORDER BY revenue DESC, o_orderkey ASC
             |LIMIT 10""".stripMargin)),

    "q4_dim_rollup" -> Q(
      (s, dir) => table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(
          count(lit(1)).as("n_suppliers"),
          sum(col("s_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("total_bal"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, count(*) AS n_suppliers,
             |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))
             |    AS total_bal
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
