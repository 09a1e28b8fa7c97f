package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Exact

/** TPC-H-shaped capability queries over the full test star schema —
  * the generic join/agg surface a user migrating off the reference's
  * MySQL would expect from an analytics engine (SURVEY.md §7.1 maps
  * lineitem⋈orders⋈customer to the reporting chain; these add the
  * supplier/nation/region dimension arm so every test table is
  * exercised).
  *
  * Plan shapes: selective dimension filters push to the scans, small
  * dims broadcast, the fact shuffles once per agg key. Q6 is the
  * pure-scan predicate-pushdown showcase: no join, no shuffle except
  * the final 1-row agg.
  */
object Tpch {

  /** Q3-shaped: top-10 unshipped orders by revenue. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c  = Tables.customer(spark, dir).filter(col("c_mktsegment") === "AUTOMOBILE")
    val o  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1995-03-15")))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1995-03-15")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'AUTOMOBILE'
         AND o_orderdate < TIMESTAMP '1995-03-15'
         AND l_shipdate > TIMESTAMP '1995-03-15'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q5-shaped: revenue by nation through the full 6-table join
    * (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) —
    * note the classic co-location predicate c_nationkey = s_nationkey. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
               c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSupplierSql: String =
    s"""SELECT n_name,
       ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** Q6-shaped: the pushed-down scan-only forecast aggregate. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1994-01-01")) &&
              col("l_shipdate") < to_timestamp(lit("1995-01-01")) &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(Exact.moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n_items"))

  val q6ForecastSql: String =
    s"""SELECT ${Exact.moneySumSql("l_extendedprice * l_discount")} AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1994-01-01'
         AND l_shipdate < TIMESTAMP '1995-01-01'
         AND l_discount >= 0.05 AND l_discount <= 0.07
         AND l_quantity < 24"""
}
