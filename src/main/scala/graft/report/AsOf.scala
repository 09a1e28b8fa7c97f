package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Exact

/** As-of (point-in-time) join — the canonical operator Spark lacks
  * natively (SURVEY.md §2.4 notes the reference has none either; this
  * is a §7 capability extension for time-series enrichment: "what
  * config/rate was in force when this event happened").
  *
  * Built by composition (the preferred option (a) from the custom-
  * operator ladder, before any custom SparkStrategy): tag and UNION
  * the event and rate streams, then a per-key window ordered by
  * (time, is_event) carries the last non-null rate forward onto each
  * event row. One shuffle on the join key — same cost shape as a
  * sort-merge join, no custom physical operator needed.
  *
  * The "rate changes" dimension is derived deterministically from the
  * events table itself (every event_id % 97 == 0 row becomes a rate
  * change for its event_type), so the oracle can rebuild it exactly.
  */
object AsOf {

  def asofJoinRates(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // rate rows KEEP their source event_id: two rate changes sharing
    // (event_type, ts) would otherwise tie on every ORDER BY key and
    // make rate_in_force nondeterministic across runs and engines
    val rates = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_type"), col("ts"), col("event_id"),
        col("value").as("rate"), lit(0).as("is_event"))
    val base = ev.select(col("event_type"), col("ts"), col("event_id"),
      lit(null).cast("double").as("rate"), lit(1).as("is_event"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("is_event"), col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.unionAll(rates)
      .withColumn("rate_in_force", last(col("rate"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count(col("rate_in_force")).as("n_with_rate"),
           Exact.moneySum(coalesce(col("rate_in_force"), lit(0.0))).as("sum_rate"))
      .orderBy(col("event_type"))
  }

  val asofJoinRatesSql: String =
    s"""WITH rates AS (
         SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
           event_id, value AS rate, 0 AS is_event
         FROM events WHERE event_id % 97 = 0),
       base AS (
         SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(NULL AS DOUBLE) AS rate, 1 AS is_event
         FROM events),
       u AS (SELECT * FROM base UNION ALL SELECT * FROM rates),
       f AS (
         SELECT *, last_value(rate IGNORE NULLS) OVER (
             PARTITION BY event_type
             ORDER BY ts, is_event, event_id ASC NULLS FIRST
             ROWS UNBOUNDED PRECEDING) AS rate_in_force
         FROM u)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(rate_in_force) AS BIGINT) AS n_with_rate,
         ${Exact.moneySumSql("coalesce(rate_in_force, 0.0)")} AS sum_rate
       FROM f WHERE is_event = 1
       GROUP BY event_type ORDER BY event_type"""
}
