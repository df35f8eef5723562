package graft

import graft.ops.{Dedup, Observations, Recap}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a SURVEY §2 operator instantiated on the
  * driver's synthetic tables; `oracleSql` carries the DuckDB-equivalent
  * SQL. Column names and types are aligned on both sides (the driver
  * sorts columns by name before hashing).
  *
  * Determinism policy (SURVEY §7.4): double summation is not
  * associative, and shuffle-fetch order varies run to run — so every
  * oracle-compared aggregate over a fractional double column is
  * computed in exact integer cents (`sum(round(x*100)::long)`) or
  * decimal, with the identical formula in the oracle SQL. Sums over
  * integer-valued doubles (counts, quantities) are exact as-is.
  */
object SparkEntry {

  /** Exact 2-dp-safe sum of a 2-decimal double column, as double.
    * Integer-cents arithmetic: deterministic at any partition/merge
    * order, unlike double summation. The final /100.0 is a single IEEE
    * op — bit-identical in any engine given the same integer. */
  private def centSum(c: Column): Column =
    sum(round(c * 100).cast("long")) / 100.0

  /** Exact 2-dp-safe average (rounded to cent precision), as double. */
  private def centAvg(c: Column): Column =
    round(sum(round(c * 100).cast("long")) / count(c)) / 100.0

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full nested daily-recap gold pipeline (SURVEY §3.3). */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val obs = Observations.guardValid(Observations.fromEvents(Tables.events(spark, sfDir)))
    Recap.pipeline(obs, Tables.customer(spark, sfDir))
  }

  private def obs(s: SparkSession, dir: String): DataFrame =
    Observations.guardValid(Observations.fromEvents(Tables.events(s, dir)))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A4/A5/A7 + F9: grouped scalar aggregates (classic shape) ----
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          centSum(col("l_extendedprice")).as("sum_base_price"),
          centAvg(col("l_extendedprice")).as("avg_price"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- Flagship stage B flattened: hourly recap over 10-min slots ----
    // Composes W1 keep-first (slot dedup), A3 hour bucketing, A4-A7
    // aggregates, A6 deterministic mode.
    "q_recap_hourly" -> ((s, dir) => {
      Recap.hourly(Recap.slotFirst(obs(s, dir)))
        .select(
          col("location_id"), col("obs_date"), col("obs_hour").cast("long").as("obs_hour"),
          col("avg_temp_c"), col("min_temp_c"), col("max_temp_c"),
          col("dominant_condition"), col("total_precip_mm"), col("n_obs")
        )
        .orderBy(col("location_id"), col("obs_date"), col("obs_hour"))
    }),

    // ---- Flagship stage C flattened: daily rollup + completeness flag (A9/A10) ----
    "q_recap_daily" -> ((s, dir) => {
      Recap.daily(Recap.hourly(Recap.slotFirst(obs(s, dir))))
        .select(
          col("location_id"), col("obs_date"),
          col("hours_present"), col("is_full_recap")
        )
        .orderBy(col("location_id"), col("obs_date"))
    }),

    // ---- A1: duplicate-group detection ----
    "q_dup_groups" -> ((s, dir) => {
      Dedup.duplicateGroups(
        obs(s, dir).select(col("obs_id"), col("location_id"), col("obs_date"), col("obs_hour"), col("obs_slot")),
        Seq("location_id", "obs_date", "obs_hour", "obs_slot"), "obs_id"
      )
        .select(col("location_id"), col("obs_date"), col("obs_hour").cast("long").as("obs_hour"),
          col("obs_slot").cast("long").as("obs_slot"), col("dup_count"))
        .orderBy(col("location_id"), col("obs_date"), col("obs_hour"), col("obs_slot"))
    }),

    // ---- J2: semi join ----
    "q_semi_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val highOrders = Tables.orders(s, dir).where(col("o_totalprice") > 400000).select(col("o_orderkey"))
      li.join(highOrders, li("l_orderkey") === highOrders("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- J3: anti join (customers with no high-value orders — the
    // reference's "not yet processed" incremental shape) ----
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).where(col("o_totalprice") > 300000).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
        |  round(sum(CAST(round(l_extendedprice*100) AS BIGINT))*1.0/count(l_extendedprice))/100.0 AS avg_price,
        |  min(l_discount) AS min_disc,
        |  max(l_discount) AS max_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1,2""".stripMargin,

    "q_recap_hourly" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour,
        |         (CAST(extract(minute FROM ts) AS INT) // 10) * 10 AS obs_slot,
        |         value AS temp_c, event_type AS condition,
        |         CASE WHEN event_type = 'purchase' THEN value END AS precip_mm
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), slot_first AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY location_id, obs_date, obs_hour, obs_slot ORDER BY obs_id) AS rn
        |    FROM obs) WHERE rn = 1
        |), cond_counts AS (
        |  SELECT location_id, obs_date, obs_hour, condition, count(*) AS c
        |  FROM slot_first GROUP BY 1,2,3,4
        |), dominant AS (
        |  SELECT location_id, obs_date, obs_hour, condition AS dominant_condition
        |  FROM (SELECT *, row_number() OVER (PARTITION BY location_id, obs_date, obs_hour ORDER BY c DESC, condition ASC) AS rn
        |        FROM cond_counts) WHERE rn = 1
        |)
        |SELECT f.location_id, f.obs_date, f.obs_hour,
        |  round(sum(CAST(round(f.temp_c*100) AS BIGINT))*1.0/count(f.temp_c))/100.0 AS avg_temp_c,
        |  min(f.temp_c) AS min_temp_c,
        |  max(f.temp_c) AS max_temp_c,
        |  any_value(d.dominant_condition) AS dominant_condition,
        |  coalesce(sum(CAST(round(f.precip_mm*100) AS BIGINT)), 0)/100.0 AS total_precip_mm,
        |  count(f.temp_c) AS n_obs
        |FROM slot_first f JOIN dominant d
        |  ON f.location_id = d.location_id AND f.obs_date = d.obs_date AND f.obs_hour = d.obs_hour
        |GROUP BY 1,2,3""".stripMargin,

    "q_recap_daily" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), hours AS (
        |  SELECT DISTINCT location_id, obs_date, obs_hour FROM obs
        |)
        |SELECT location_id, obs_date, count(*) AS hours_present,
        |       max(CASE WHEN obs_hour = 23 THEN true ELSE false END) AS is_full_recap
        |FROM hours GROUP BY 1,2""".stripMargin,

    "q_dup_groups" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour,
        |         CAST((CAST(extract(minute FROM ts) AS INT) // 10) * 10 AS BIGINT) AS obs_slot
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |)
        |SELECT location_id, obs_date, obs_hour, obs_slot, count(*) AS dup_count
        |FROM obs GROUP BY 1,2,3,4 HAVING count(*) > 1""".stripMargin,

    "q_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)""".stripMargin
  )
}
