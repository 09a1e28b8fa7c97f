package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Exact grid-quantiles per event_type — the distributed-selection
  * problem (p50/p95/p99) done scale-safe and oracle-exact.
  *
  * Neither engine's native quantile matches the other (Spark
  * percentile_approx is a sketch; DuckDB quantile_cont interpolates
  * differently than Spark percentile), so quantiles are computed on a
  * DISCRETIZED grid: value floors to 1e-3 buckets, counts aggregate
  * per (type, bucket), and the quantile is the first bucket whose
  * running count reaches ceil(p·n) — exact on the grid, identical in
  * both engines, error bounded by the grid step.
  *
  * Scale shape: the ONLY per-row work is the bucket map + one
  * map-side-combining groupBy. The ordered cumulative window runs
  * over the (type, bucket) HISTOGRAM — cardinality = types ×
  * value-range/step, bounded by the grid, not by N — so the
  * low-cardinality-window trap (round 1) never sees the raw data.
  * This is the classic histogram-quantile rewrite of a global
  * per-group sort. */
object Quantiles {

  private val STEP = 1000L   // grid: floor(value * 1000) — 1e-3 buckets
  private val PS = Seq(("p50", 0.50), ("p95", 0.95), ("p99", 0.99))

  def valueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      // NULL values must not reach the histogram: Spark's window
      // ORDER BY sorts a NULL bucket FIRST where DuckDB sorts it
      // LAST, shifting every cumulative count — and a row with no
      // value has no business in a rank threshold either
      .filter(col("value").isNotNull)
      .select(col("event_type"), floor(col("value") * STEP).cast("long").as("b"))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("event_type"))))
    val aggs = max(col("n")).as("n") +: PS.map { case (name, p) =>
      (min(when(col("cum") >= ceil(lit(p) * col("n").cast("double")), col("b")))
        .cast("double") / STEP).as(name)
    }
    cum.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("event_type"))
  }

  val valueQuantilesSql: String = {
    val qs = PS.map { case (name, p) =>
      s"min(CASE WHEN cum >= ceil($p * CAST(n AS DOUBLE)) THEN b END) / CAST($STEP AS DOUBLE) AS $name"
    }.mkString(",\n         ")
    s"""WITH hist AS (
         SELECT event_type, CAST(floor(value * $STEP) AS BIGINT) AS b, count(*) AS c
         FROM events WHERE value IS NOT NULL
         GROUP BY event_type, CAST(floor(value * $STEP) AS BIGINT)),
       cum AS (
         SELECT event_type, b, c,
           sum(c) OVER (PARTITION BY event_type ORDER BY b
             ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
         FROM hist)
       SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         $qs
       FROM cum GROUP BY event_type ORDER BY event_type"""
  }
}
