package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Dataset audit/profiling — the pre-flight sweep every large-scale
  * ingest runs before committing compute: per-column null counts,
  * exact distinct cardinalities, and value ranges, in ONE pass over
  * the table (the reference has no audit surface at all; its parser
  * silently skips malformed rows — SURVEY.md §2.2 P-ops — so this is
  * the §7 "know your corpus before you train on it" extension).
  *
  * Shape: a single wide aggregate — Catalyst plans the multi-DISTINCT
  * via one Expand (×|cols| row fan-out) and a single shuffle keyed by
  * the distinct groups; min/max/null counts ride the same pass. The
  * per-column result rows are then unpivoted from the one aggregate
  * row with an `explode(array(struct...))` — no driver-side loop, no
  * second scan. At 100 TB the exact DISTINCT is the knob to relax:
  * swap `countDistinct` for `approx_count_distinct` (HLL++, no
  * Expand) — kept exact here because the oracle hash-compares, and
  * [[Sketches.distinctSketch]] already covers the approximate path.
  */
object Audit {

  private val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val strCols = Seq("l_returnflag", "l_linestatus")
  private val tsCols  = Seq("l_shipdate")

  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++
      (numCols ++ strCols ++ tsCols).flatMap { c =>
        Seq(count(col(c)).as(s"${c}__nn"),
            countDistinct(col(c)).as(s"${c}__nd"))
      } ++
      numCols.flatMap { c =>
        Seq(min(col(c)).cast("double").as(s"${c}__mn"),
            max(col(c)).cast("double").as(s"${c}__mx"))
      } ++
      // timestamps surface as whole epoch seconds (unix_timestamp
      // truncates; l_shipdate has no sub-second part, and DuckDB's
      // floor(epoch()) matches exactly)
      tsCols.flatMap { c =>
        Seq(unix_timestamp(min(col(c))).cast("double").as(s"${c}__mn"),
            unix_timestamp(max(col(c))).cast("double").as(s"${c}__mx"))
      } ++
      strCols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}__smn"), max(col(c)).as(s"${c}__smx"))
      }
    val one = li.agg(aggs.head, aggs.tail: _*)
    def rec(c: String, numeric: Boolean): Column = struct(
      lit(c).as("col_name"),
      (col("n_rows") - col(s"${c}__nn")).as("n_nulls"),
      col(s"${c}__nd").as("n_distinct"),
      (if (numeric) col(s"${c}__mn") else lit(null).cast("double")).as("min_num"),
      (if (numeric) col(s"${c}__mx") else lit(null).cast("double")).as("max_num"),
      (if (numeric) lit(null).cast("string") else col(s"${c}__smn")).as("min_str"),
      (if (numeric) lit(null).cast("string") else col(s"${c}__smx")).as("max_str"))
    val recs = (numCols ++ tsCols).map(rec(_, numeric = true)) ++
      strCols.map(rec(_, numeric = false))
    one.select(col("n_rows"), explode(array(recs: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"),
        col("p.min_num").as("min_num"), col("p.max_num").as("max_num"),
        col("p.min_str").as("min_str"), col("p.max_str").as("max_str"))
      .orderBy(col("col_name"))
  }

  val columnProfileSql: String = {
    def row(c: String, numeric: Boolean): String = {
      val isTs = tsCols.contains(c)
      val mn = if (isTs) s"CAST(floor(epoch(min($c))) AS DOUBLE)"
               else if (numeric) s"CAST(min($c) AS DOUBLE)"
               else "CAST(NULL AS DOUBLE)"
      val mx = if (isTs) s"CAST(floor(epoch(max($c))) AS DOUBLE)"
               else if (numeric) s"CAST(max($c) AS DOUBLE)"
               else "CAST(NULL AS DOUBLE)"
      val smn = if (numeric) "CAST(NULL AS VARCHAR)" else s"min($c)"
      val smx = if (numeric) "CAST(NULL AS VARCHAR)" else s"max($c)"
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           $mn AS min_num, $mx AS max_num, $smn AS min_str, $smx AS max_str
         FROM lineitem"""
    }
    val rows = (numCols ++ tsCols).map(row(_, numeric = true)) ++
      strCols.map(row(_, numeric = false))
    rows.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }
}
