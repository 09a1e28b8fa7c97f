package graft.report

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Q4-shaped: orders having at least one late-shipped item — the
    * left_semi join (EXISTS) operator. The semi join keeps the probe
    * side narrow: only order keys flow from lineitem, no row
    * multiplication. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1996-06-30")))
      .select(col("l_orderkey"))
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > TIMESTAMP '1996-06-30')
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** CUBE over flag/status — all four grouping sets from ONE
    * finest-grain pass (completes the rollup in
    * Windows.rollupRevenue). The planner's CUBE Expands every fact
    * row 4× through the shuffle; aggregating once at (flag, status)
    * grain and re-aggregating the ≈|flag|·|status|-row result for the
    * coarser sets ships partial rows instead (guide §2.3) — exact
    * decimal partials keep every cell bit-identical, rounding stays
    * at the end. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("__s"),
        count(lit(1)).as("__n"))
    def fin(s: Column, n: Column): Seq[Column] =
      Seq(round(s, 2).cast("double").as("sum_price"), n.cast("long").as("n"))
    val nullS = lit(null).cast("string")
    val full = g.select(Seq(col("l_returnflag"), col("l_linestatus")) ++
      fin(col("__s"), col("__n")): _*)
    val byFlag = g.groupBy(col("l_returnflag"))
      .agg(sum(col("__s")).as("__s2"), sum(col("__n")).as("__n2"))
      .select(Seq(col("l_returnflag"), nullS.as("l_linestatus")) ++
        fin(col("__s2"), col("__n2")): _*)
    val byStatus = g.groupBy(col("l_linestatus"))
      .agg(sum(col("__s")).as("__s2"), sum(col("__n")).as("__n2"))
      .select(Seq(nullS.as("l_returnflag"), col("l_linestatus")) ++
        fin(col("__s2"), col("__n2")): _*)
    val total = g.agg(sum(col("__s")).as("__s2"), sum(col("__n")).as("__n2"))
      .select(Seq(nullS.as("l_returnflag"), nullS.as("l_linestatus")) ++
        fin(col("__s2"), col("__n2")): _*)
    full.unionByName(byFlag).unionByName(byStatus).unionByName(total)
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val cubeRevenueSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${Exact.moneySumSql("l_extendedprice")} AS sum_price,
       CAST(count(*) AS BIGINT) AS n
       FROM lineitem
       GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** Pivot: user cohorts × event types as a wide count matrix — the
    * oracle uses portable conditional sums so column names align. */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cohort", col("user_id") % 10)
      .groupBy(col("cohort"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy(col("cohort"))

  val pivotEventsSql: String =
    """SELECT user_id % 10 AS cohort,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
       FROM events GROUP BY 1 ORDER BY cohort"""

  /** Q6-shaped: the pushed-down scan-only forecast aggregate. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(Exact.moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n_items"))

  val q6ForecastSql: String =
    s"""SELECT ${Exact.moneySumSql("l_extendedprice * l_discount")} AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.05 AND l_discount <= 0.07
         AND l_quantity < 24"""

  /** TPC-H Q14 (promotion effect), adapted to the test dims: share of
    * one month's revenue from ECO-type parts. The part side carries
    * only (key, type) and is written WITHOUT a broadcast hint: at test
    * scale AQE broadcasts it; at TPC-H scale `part` grows with SF, so
    * forcing a broadcast would be the 100 TB mistake — the shuffled
    * hash join Spark picks there is the right plan. One conditional +
    * one total exact money sum in the same aggregate (single pass),
    * percentage via a single double division + portable rounding. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01")) &&
              col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        Exact.moneySum(when(col("p_type").startsWith("ECO"),
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))).as("promo_revenue"),
        Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      .withColumn("promo_pct",
        Exact.pround2(col("promo_revenue") * 100 /
          nullif(col("total_revenue"), lit(0.0))))
      .orderBy(col("promo_pct"))

  val q14PromoRevenueSql: String =
    s"""SELECT promo_revenue, total_revenue,
         ${Exact.pround2Sql("promo_revenue * 100 / nullif(total_revenue, 0)")} AS promo_pct
       FROM (
         SELECT
           ${Exact.moneySumSql(
             "CASE WHEN p_type LIKE 'ECO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             AS promo_revenue,
           ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-04-01')
       ORDER BY promo_pct"""

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns in one quarter. The classic shape: the quarter
    * filter prunes orders at the scan, the R-flag filter prunes
    * lineitem at the scan, the fact shuffles once on orderkey, the
    * customer⋈nation dimension arm broadcasts (customer grows with SF
    * but the post-join per-customer rollup is what bounds the top-k;
    * the dim join itself stays on custkey). TakeOrderedAndProject
    * caps the output — no global sort. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1996-04-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val cn = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        Exact.pround2(col("c_acctbal")).as("c_acctbal"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    s"""SELECT c_custkey, c_name, n_name,
         ${Exact.pround2Sql("c_acctbal")} AS c_acctbal,
         ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-04-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, n_name, ${Exact.pround2Sql("c_acctbal")}
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * clears 250 units, with their customer. The IN-subquery of the
    * spec is decorrelated Spark-first: ONE lineitem aggregate keyed on
    * orderkey, filtered, then equi-joined to orders⋈customer — a
    * semi-join by construction (the aggregate side is already
    * distinct on the key). Quantities are integral in this schema, so
    * the sum is an exact BIGINT — no double drift. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 250L)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), Exact.pround2(col("o_totalprice")).as("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  val q18LargeOrdersSql: String =
    s"""WITH big AS (
         SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
         FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
       SELECT c_custkey, c_name, o_orderkey, o_orderdate,
         ${Exact.pround2Sql("o_totalprice")} AS o_totalprice, total_qty
       FROM big
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY o_totalprice DESC, o_orderkey"""

  /** TPC-H Q19 (discounted revenue), adapted to the test part dims:
    * revenue from three disjunctive brand/size/quantity bands. The
    * OR-of-ANDs predicate straddles the join (part attrs AND lineitem
    * attrs), so it cannot push to either scan whole — but each
    * disjunct's single-side conjuncts CAN and do (Catalyst extracts
    * `l_quantity <= 36` and the brand IN-list to the scans). The part
    * side is hint-free like q14: AQE broadcasts at test scale, shuffle
    * join at TPC-H scale. */
  def q19DiscountRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val band = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand &&
      col("p_size").between(szLo, szHi) &&
      col("l_quantity") >= qLo && col("l_quantity") <= qHi
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#1", 1, 15, 1, 11) ||
              band("Brand#7", 10, 30, 10, 20) ||
              band("Brand#15", 20, 50, 20, 36))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
  }

  val q19DiscountRevenueSql: String =
    s"""SELECT ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
              AND l_quantity >= 1 AND l_quantity <= 11)
          OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
              AND l_quantity >= 10 AND l_quantity <= 20)
          OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
              AND l_quantity >= 20 AND l_quantity <= 36)"""

  /** TPC-H Q13 (customer distribution): the two-level aggregate —
    * orders per customer (outer join keeps the zero-order customers;
    * `Windows.customerOrderCounts` is the first level alone), then
    * the histogram of those counts. The second groupBy runs on the
    * ~|distinct counts| frame, so the only real shuffle is the first
    * custkey-keyed one. */
  /** TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    * lost if small orders (quantity below 20% of the part's average)
    * were no longer filled, for one brand. The textbook CORRELATED
    * SCALAR SUBQUERY (`0.2 * avg(l_quantity) where l2.partkey =
    * p_partkey`) decorrelated into one per-part aggregate joined back
    * to the same pruned fact — the J4/report_metrics decorrelation
    * applied to TPC-H's canonical example of it.
    *
    * Exactness: quantities are integral, so the threshold compare
    * runs as BIGINTs — `qty < 0.2·S/C  ⟺  5·qty·C < S` — no double
    * division anywhere near the filter; revenue is an exact decimal
    * sum divided by 7 with portable rounding.
    *
    * Scale shape: the brand filter prunes `part` AT THE SCAN to a
    * bounded dim that broadcasts; the pruned fact then shuffles ONCE
    * on partkey for a whole-partition (unordered, so deterministic)
    * window that carries (S, C) to every row — one fact scan, one
    * exchange, against the self-join decorrelation's two scans and
    * two exchanges. The final agg is a single global row. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#4").select(col("p_partkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"), col("l_extendedprice"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    l.withColumn("s_qty", sum(col("qty")).over(w))
      .withColumn("n_li", count(lit(1)).over(w))
      .filter(col("qty") * 5 * col("n_li") < col("s_qty"))
      .agg(count(lit(1)).as("n_small"),
        Exact.moneySum(col("l_extendedprice")).as("small_revenue"))
      .withColumn("avg_yearly", Exact.pround2(col("small_revenue") / 7))
      .orderBy(col("n_small"))
  }

  val q17SmallQtySql: String =
    s"""WITH l AS (
         SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#4'),
       ww AS (
         SELECT qty, l_extendedprice,
           CAST(sum(qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS s_qty,
           count(*) OVER (PARTITION BY l_partkey) AS n_li
         FROM l)
       SELECT CAST(count(*) AS BIGINT) AS n_small,
         ${Exact.moneySumSql("l_extendedprice")} AS small_revenue,
         ${Exact.pround2Sql(
           s"${Exact.moneySumSql("l_extendedprice")} / 7")} AS avg_yearly
       FROM ww WHERE qty * 5 * n_li < s_qty
       ORDER BY n_small"""

  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).cast("long").as("custdist"))
      .select(col("c_count").cast("long").as("c_count"), col("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustdistSql: String =
    """SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
       FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey)
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, then
    * the supplier(s) achieving the maximum. The spec's view +
    * correlated max is decorrelated Spark-first: ONE suppkey
    * aggregate, its 1-row max broadcast back as a cross join, an
    * equality filter (ties all surface, per the spec), then the
    * supplier dim join. Revenue compares at exact DECIMAL cents —
    * a double `=` on aggregated revenue would be a flaky gate. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev"))
      .transform(graft.util.Fence.lineage)
    val mx = rev.agg(max(col("rev")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev") === col("mx"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev"), 2).cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
         SELECT l_suppkey,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey),
       mx AS (SELECT max(rev) AS mx FROM rev)
       SELECT s_suppkey, s_name,
         CAST(round(rev, 2) AS DOUBLE) AS total_revenue
       FROM rev CROSS JOIN mx
       JOIN supplier ON l_suppkey = s_suppkey
       WHERE rev = mx
       ORDER BY s_suppkey"""

  /** TPC-H Q7 (volume shipping): bilateral trade between two nations
    * by ship year — supplier nation on one side, customer nation on
    * the other, BOTH directions kept. The nation dimension joins
    * broadcast twice under different role names (supp/cust); the
    * fact shuffles once on orderkey for the orders join, and the
    * 3-key groupBy is low-cardinality (2 directions × 2 years).
    * Year extraction is an integer date part — deterministic in both
    * engines (no libm). */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01")))
    li.join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7VolumeShippingSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
         ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year"""

  /** TPC-H Q8 (national market share): of all PROMO-part revenue sold
    * into EUROPE-region customers, the fraction supplied by NATION_1,
    * per order year. The share division runs on two exact-decimal
    * sums surfaced as identical doubles in both engines, then
    * portable 4-dp rounding — the no-naive-`round(sum(double))`
    * convention (see graft.util.Exact).
    *
    * Scale shape: part/customer-side filters prune at the scans, the
    * two nation copies and region broadcast, the fact shuffles once
    * per equi-join key chain, and the final groupBy has one row per
    * year. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val nCust = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_nk"))
    val nSupp = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                  col("o_orderdate") < to_timestamp(lit("1998-01-01")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cn_nk"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        Exact.moneySum(when(col("supp_nation") === "NATION_1",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))).as("nation_volume"),
        Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_volume"))
      .withColumn("mkt_share",
        Exact.pround4(col("nation_volume") / nullif(col("total_volume"), lit(0.0))))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    s"""SELECT o_year, nation_volume, total_volume,
         ${Exact.pround4Sql("nation_volume / nullif(total_volume, 0)")} AS mkt_share
       FROM (
         SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
           ${Exact.moneySumSql(
             "CASE WHEN n2.n_name = 'NATION_1' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             AS nation_volume,
           ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS total_volume
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY o_year)
       ORDER BY o_year"""

  /** TPC-H Q22 (global sales opportunity), adapted to this schema's
    * columns: customers in three target nations with above-average
    * positive balances and NO orders in the trailing year — the
    * "idle wealthy customer" report. c_phone's country code (absent
    * here) becomes c_nationkey, and the bare NOT EXISTS becomes a
    * dated one (this dense synthetic corpus gives every customer at
    * least one lifetime order, so the literal predicate is vacuous).
    * The average-positive-balance threshold is derived
    * IN-QUERY (1-row agg, broadcast cross join — the no-driver-probe
    * convention) from an exact decimal sum so both engines compare
    * against the bit-identical double; the no-orders predicate is a
    * left_anti join (never a correlated NOT EXISTS re-scan per row). */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq(1L, 2L, 3L)
    val cust = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(nations: _*))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("avg_bal"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-08-01")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        Exact.moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntry"))
  }

  val q22IdleCustomersSql: String =
    s"""WITH cust AS (
         SELECT c_custkey, c_nationkey, c_acctbal FROM customer
         WHERE c_nationkey IN (1, 2, 3)),
       thr AS (
         SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_bal
         FROM cust WHERE c_acctbal > 0),
       idle AS (
         SELECT c.* FROM cust c CROSS JOIN thr
         WHERE c.c_acctbal > thr.avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2000-08-01'))
       SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
         ${Exact.moneySumSql("c_acctbal")} AS totacctbal
       FROM idle GROUP BY cntry ORDER BY cntry"""

  /** TPC-H Q9 (product-type profit), adapted to the partsupp-less test
    * schema: supply cost stands in as `p_retailprice * l_quantity`
    * (the schema's only per-part cost basis). Profit per (supplier
    * nation, order year) over parts whose name carries one token.
    *
    * Scale shape: the name LIKE prunes `part` at the scan to a
    * broadcastable dim; `supplier`⋈`nation` is a second broadcast arm;
    * the only big shuffle is lineitem⋈orders on orderkey, then a
    * low-cardinality (nation × year) groupBy that partial-aggregates
    * map-side. Exactness: the two money terms are summed as SEPARATE
    * exact DECIMAL(18,4) sums and subtracted in decimal — a single
    * double subtraction per row would re-order error across engines. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(round(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")) -
        sum((col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")),
        2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) -
           sum(CAST(p_retailprice * l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
           AS sum_profit
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN orders ON l_orderkey = o_orderkey
       WHERE p_name LIKE '%red%'
       GROUP BY n_name, year(o_orderdate) ORDER BY 1, 2 DESC"""

  /** TPC-H Q11 (important stock), adapted: per-part supplied VALUE
    * (revenue through one nation's suppliers) vs a fraction of that
    * nation's total — the "parts worth tracking" report. The spec's
    * correlated `HAVING > (SELECT sum(...) * fraction)` decorrelates
    * into ONE partkey aggregate (fenced so it computes once), its
    * 1-row total cross-join-broadcast back, and an EXACT-DECIMAL
    * integer-multiplier compare (`value * 1000 > total`) — no double
    * division, no driver probe (the q22/dedup_semantic convention).
    *
    * Scale shape: the nation filter prunes supplier to a broadcast
    * dim; lineitem shuffles once on partkey; the total is a 1-row
    * all-to-one agg over the already-aggregated ~|parts| frame. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val pv = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("v"))
      .transform(graft.util.Fence.lineage)
    val total = pv.agg(sum(col("v")).as("total"))
    pv.crossJoin(broadcast(total))
      .filter(col("v") * 1000 > col("total"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("v"), 2).cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11ImportantPartsSql: String =
    """WITH pv AS (
         SELECT l_partkey,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS v
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_3'
         GROUP BY l_partkey),
       t AS (SELECT sum(v) AS total FROM pv)
       SELECT l_partkey AS p_partkey, CAST(round(v, 2) AS DOUBLE) AS value
       FROM pv CROSS JOIN t
       WHERE v * 1000 > total
       ORDER BY value DESC, p_partkey"""

  /** TPC-H Q12 (shipping-mode priority), adapted to the shipmode-less
    * schema: order-to-ship LATENCY BANDS stand in for ship modes —
    * per band, how many critical (1-URGENT / 2-HIGH) vs other-priority
    * lineitems shipped. The operational question (are urgent orders
    * shipping late?) survives the adaptation intact.
    *
    * Scale shape: the two-year shipdate window pushes to the lineitem
    * scan; the orderkey join is the one real shuffle; the band
    * groupBy is 3 rows with map-side combine. `datediff` is integer
    * day arithmetic — deterministic in both engines (dates here are
    * midnight-aligned timestamps). */
  def q12ShippingDelay(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") <  to_timestamp(lit("1998-01-01")))
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_band",
        when(delay <= 30, "a_0_30")
          .when(delay <= 60, "b_31_60")
          .otherwise("c_late"))
      .groupBy(col("delay_band"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).cast("long").as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
          .otherwise(1)).cast("long").as("low_line_count"))
      .orderBy(col("delay_band"))
  }

  val q12ShippingDelaySql: String =
    """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'a_0_30'
              WHEN datediff('day', o_orderdate, l_shipdate) <= 60 THEN 'b_31_60'
              ELSE 'c_late' END AS delay_band,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
       GROUP BY delay_band ORDER BY delay_band"""

  /** TPC-H Q16 (parts/supplier relationship), adapted: how many
    * DISTINCT suppliers have actually shipped each (brand, type,
    * size) — supply redundancy per part class, with one brand and one
    * type family excluded and "complained-about" suppliers (negative
    * account balance, standing in for the spec's comment scan)
    * removed by a BROADCAST ANTI-JOIN before the count.
    *
    * Scale shape: part prunes at the scan and broadcasts; the
    * distinct-supplier count is Spark's two-stage distinct aggregate
    * — a (brand, type, size, suppkey) partial dedup map-side, then
    * the group shuffle; nothing row-scale crosses the wire twice. */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && !col("p_type").like("PROMO%"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complained = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complained), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16SupplierCountsSql: String =
    """SELECT p_brand, p_type, p_size,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q20 (potential part promotion), adapted: suppliers who
    * moved real volume (> 300 units) of one part-name family in one
    * year — the "who can take the promo" shortlist. The spec's nested
    * IN-subqueries flatten into one aggregate: part prunes at the
    * scan (name prefix) and broadcasts, the year filter pushes to the
    * lineitem scan, ONE suppkey-keyed sum, a post-agg HAVING, then
    * broadcast joins to supplier and nation for the report columns.
    * Quantities are integral → the sum and threshold are BIGINTs. */
  def q20PotentialPromotion(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") <  to_timestamp(lit("1997-01-01")))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_moved"))
      .filter(col("qty_moved") > 300)
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name").as("nation"),
        col("qty_moved").cast("long").as("qty_moved"))
      .orderBy(col("s_name"))
  }

  val q20PotentialPromotionSql: String =
    """SELECT s_name, n_name AS nation, CAST(qty_moved AS BIGINT) AS qty_moved
       FROM (
         SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty_moved
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_name LIKE 'small%'
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
         GROUP BY l_suppkey)
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE qty_moved > 300
       ORDER BY s_name"""

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    * receiptdate-less schema: in each finished multi-supplier order,
    * the supplier who UNIQUELY shipped last (max shipdate) is the one
    * the order waited on. The spec's EXISTS / NOT-EXISTS pair over l2
    * and l3 becomes one orderkey-partitioned window pass: per
    * (order, supplier) last-ship aggregate first (so the window frame
    * is suppliers-per-order, not lineitems), then `nsupp >= 2` ≡
    * EXISTS(another supplier) and `n_at_max = 1` ≡ NOT EXISTS(another
    * supplier equally late).
    *
    * Scale shape: two orderkey-keyed exchanges (pre-agg + window) and
    * a final |suppliers|-bounded count; TakeOrderedAndProject caps
    * the output at 20. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("s_max"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    val blamed = perSupp
      .withColumn("maxd", max(col("s_max")).over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .filter(col("nsupp") >= 2 && col("s_max") === col("maxd"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_at_max"), min(col("l_suppkey")).as("suppkey"))
      .filter(col("n_at_max") === 1)
    blamed.groupBy(col("suppkey"))
      .agg(count(lit(1)).cast("long").as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSuppliersSql: String =
    """WITH per_supp AS (
         SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY l_orderkey, l_suppkey),
       flagged AS (
         SELECT l_orderkey, l_suppkey, s_max,
           max(s_max) OVER (PARTITION BY l_orderkey) AS maxd,
           count(*) OVER (PARTITION BY l_orderkey) AS nsupp
         FROM per_supp),
       blamed AS (
         SELECT l_orderkey, count(*) AS n_at_max, min(l_suppkey) AS suppkey
         FROM flagged WHERE nsupp >= 2 AND s_max = maxd
         GROUP BY l_orderkey HAVING count(*) = 1)
       SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM blamed JOIN supplier ON suppkey = s_suppkey
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 20"""

  /** Market-basket pair mining: the 20 part pairs most often bought
    * together in one order, with each part's own order-support — the
    * co-occurrence input to association rules (lift/confidence are
    * one division away; counts stay integer here so the head order is
    * exact).
    *
    * Scale shape: the per-order item set dedups FIRST ((order, part)
    * distinct — repeated lineitems of one part never inflate a pair),
    * then the pair generator is a self-equi-join on orderkey with
    * `p1 < p2` — fanout bounded by basket size (max 13 here, C(13,2)
    * per order), never |parts|². Both sides shuffle on the SAME
    * orderkey partitioning (one exchange, reused), the pair count is
    * map-side combined, TakeOrderedAndProject caps at 20, and the
    * per-part supports broadcast-join onto those 20 rows only. */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    // fenced: four consumers (both join sides + two support lookups)
    // would otherwise each re-scan and re-dedup the fact table
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .transform(graft.util.Fence.lineage)
    val a = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = items.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2"))
    val pairs = a.join(b,
        col("l_orderkey") === col("ok2") && col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).cast("long").as("n_together"))
      .orderBy(col("n_together").desc, col("p1"), col("p2"))
      .limit(20)
    val support = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).cast("long").as("s"))
    pairs
      .join(broadcast(support.select(col("l_partkey").as("p1"), col("s").as("n_p1"))), Seq("p1"))
      .join(broadcast(support.select(col("l_partkey").as("p2"), col("s").as("n_p2"))), Seq("p2"))
      .select(col("p1"), col("p2"), col("n_together"), col("n_p1"), col("n_p2"))
      .orderBy(col("n_together").desc, col("p1"), col("p2"))
  }

  val basketPairsSql: String =
    """WITH items AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       pairs AS (
         SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           CAST(count(*) AS BIGINT) AS n_together
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY n_together DESC, p1, p2 LIMIT 20),
       support AS (
         SELECT l_partkey, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY 1)
       SELECT p1, p2, n_together, s1.s AS n_p1, s2.s AS n_p2
       FROM pairs
       JOIN support s1 ON p1 = s1.l_partkey
       JOIN support s2 ON p2 = s2.l_partkey
       ORDER BY n_together DESC, p1, p2"""

  /** GROUPING SETS with heterogeneous sets — the grouping surface
    * [[cubeRevenue]]/[[rollupRevenue]] can't express (cube = all 2ᵏ
    * sets, rollup = prefixes; a hand-picked set list is neither):
    * per-returnflag, per-linestatus, and grand-total revenue in ONE
    * fact pass, disambiguated by GROUPING_ID (a NULL flag value vs a
    * rolled-up flag would otherwise collide). */
  def groupingSetsRevenue(spark: SparkSession, dir: String): DataFrame = {
    // finest-grain pre-aggregate, each hand-picked set re-aggregated
    // from the ≈|flag|·|status|-row result with its GROUPING_ID as a
    // literal — the planner's GROUPING SETS Expands every fact row 3×
    // through the shuffle (same shape as cubeRevenue above)
    val g = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("__s"),
        count(lit(1)).as("__n"))
    val nullS = lit(null).cast("string")
    def fin(s: Column, n: Column): Seq[Column] =
      Seq(round(s, 2).cast("double").as("sum_price"), n.cast("long").as("n"))
    val byFlag = g.groupBy(col("l_returnflag"))
      .agg(sum(col("__s")).as("__s2"), sum(col("__n")).as("__n2"))
      .select(Seq(col("l_returnflag"), nullS.as("l_linestatus"),
        lit(1L).as("gid")) ++ fin(col("__s2"), col("__n2")): _*)
    val byStatus = g.groupBy(col("l_linestatus"))
      .agg(sum(col("__s")).as("__s2"), sum(col("__n")).as("__n2"))
      .select(Seq(nullS.as("l_returnflag"), col("l_linestatus"),
        lit(2L).as("gid")) ++ fin(col("__s2"), col("__n2")): _*)
    val total = g.agg(sum(col("__s")).as("__s2"), sum(col("__n")).as("__n2"))
      .select(Seq(nullS.as("l_returnflag"), nullS.as("l_linestatus"),
        lit(3L).as("gid")) ++ fin(col("__s2"), col("__n2")): _*)
    byFlag.unionByName(byStatus).unionByName(total)
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val groupingSetsRevenueSql: String =
    s"""SELECT l_returnflag, l_linestatus,
         CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
           AS gid,
         ${Exact.moneySumSql("l_extendedprice")} AS sum_price,
         CAST(count(*) AS BIGINT) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       ORDER BY gid, l_returnflag ASC NULLS FIRST,
         l_linestatus ASC NULLS FIRST"""

  /** Revenue-concentration (Lorenz) audit: how much of total order
    * revenue the top 1% / 5% / 10% / 25% / 50% of customers carry —
    * the skew number behind "do we need key salting / a VIP lane".
    * Customers rank by exact-cents revenue under a TOTAL
    * (cents, custkey) order; each band's threshold rank is an integer
    * cross-multiplication (`rank·100 ≤ pct·n`), and shares are exact
    * ppm of the grand total (derived in-query, 1-row broadcast).
    *
    * Scale shape: one custkey aggregate collapses orders; the rank
    * is the exact distributed one
    * ([[graft.report.DistributedRank.withRank]] on negated cents —
    * chunked prefix sums, no unpartitioned window ever sorts the
    * |customers| frame); the band rollup is 5 rows via one
    * conditional-sum pass — no per-band re-scan. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("cents"))
      .transform(graft.util.Fence.lineage)
    val tot = perCust.agg(sum(col("cents")).as("total_cents"),
      count(lit(1)).as("n_cust"))
    // cents DESC, custkey ASC == (-cents, custkey) ASC
    val ranked = graft.report.DistributedRank.withRank(
      perCust.crossJoin(broadcast(tot))
        .withColumn("neg_cents", -col("cents")),
      Nil, "neg_cents", "o_custkey", "rk")
    val bands = Seq(1, 5, 10, 25, 50)
    val exprs = bands.map { p =>
      struct(
        sum(when(col("rk") * 100 <= col("n_cust") * p, col("cents"))
          .otherwise(0L)).cast("long").as("cents"),
        sum(when(col("rk") * 100 <= col("n_cust") * p, 1L)
          .otherwise(0L)).cast("long").as("n"))
        .as(s"b$p")
    }
    val agg = ranked.groupBy(col("total_cents"))
      .agg(exprs.head, exprs.tail: _*)
    agg.select(explode(array(bands.map(p =>
        struct(lit(p).cast("long").as("top_pct"),
          col(s"b$p")("n").as("n_customers"),
          col(s"b$p")("cents").as("band_cents"),
          floor(col(s"b$p")("cents").cast("double") * 1000000 /
            col("total_cents")).cast("long").as("share_ppm"))): _*))
        .as("b"))
      .select(col("b.top_pct"), col("b.n_customers"),
        col("b.band_cents"), col("b.share_ppm"))
      .orderBy(col("top_pct"))
  }

  val revenueConcentrationSql: String =
    s"""WITH pc AS (
         SELECT o_custkey,
           CAST(sum(${Exact.centsSql("o_totalprice")}) AS BIGINT) AS cents
         FROM orders GROUP BY o_custkey),
       tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents,
                      count(*) AS n_cust FROM pc),
       ranked AS (
         SELECT cents, total_cents, n_cust,
           row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk
         FROM pc CROSS JOIN tot),
       bands AS (
         SELECT unnest([1, 5, 10, 25, 50]) AS top_pct)
       SELECT CAST(b.top_pct AS BIGINT) AS top_pct,
         CAST(sum(CASE WHEN r.rk * 100 <= r.n_cust * b.top_pct
           THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
         CAST(sum(CASE WHEN r.rk * 100 <= r.n_cust * b.top_pct
           THEN r.cents ELSE 0 END) AS BIGINT) AS band_cents,
         CAST(floor(CAST(sum(CASE WHEN r.rk * 100 <= r.n_cust * b.top_pct
           THEN r.cents ELSE 0 END) AS DOUBLE) * 1000000
             / any_value(r.total_cents)) AS BIGINT) AS share_ppm
       FROM ranked r CROSS JOIN bands b
       GROUP BY b.top_pct ORDER BY top_pct"""

  /** Month-over-month growth: monthly order revenue with the previous
    * month's value (lag), the absolute delta in exact cents, and the
    * relative change in exact ppm (integer cross-products over a
    * floor-divided double — no accumulated float). The window runs on
    * the ≤ #months frame (the calendar-bounded convention), ordered
    * totally by month key. */
  def momGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"))
      .agg(sum(Exact.cents(col("o_totalprice"))).cast("long").as("cents"),
        count(lit(1)).cast("long").as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ym"))
    monthly
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      // the first month has no predecessor and is dropped — a NULL in
      // a BIGINT result column would float64-ify the pandas dtype on
      // one side of the oracle compare (the r03 pack_sequences trap)
      .filter(col("prev_cents").isNotNull)
      .select(col("ym"), col("n_orders"), col("cents"),
        col("prev_cents").cast("long").as("prev_cents"),
        (col("cents") - col("prev_cents")).cast("long").as("delta_cents"),
        floor((col("cents") - col("prev_cents")).cast("double") *
          1000000 / col("prev_cents")).cast("long").as("growth_ppm"))
      .orderBy(col("ym"))
  }

  val momGrowthSql: String =
    s"""WITH m AS (
         SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) * 100
             + month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ym,
           CAST(sum(${Exact.centsSql("o_totalprice")}) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY 1),
       lagged AS (
         SELECT ym, n_orders, cents, lag(cents) OVER (ORDER BY ym) AS pc
         FROM m)
       SELECT ym, n_orders, cents,
         CAST(pc AS BIGINT) AS prev_cents,
         CAST(cents - pc AS BIGINT) AS delta_cents,
         CAST(floor(CAST(cents - pc AS DOUBLE) * 1000000 / pc) AS BIGINT)
           AS growth_ppm
       FROM lagged WHERE pc IS NOT NULL ORDER BY ym"""

  /** Supplier scorecard: the per-supplier operational rollup — line
    * items shipped, exact-decimal revenue, distinct orders touched,
    * mean order-to-ship delay (integer day sums, portable 4-dp mean),
    * and the slow-shipment share (> 60 days) in exact ppm. One fact
    * scan, one orderkey join for the order date, one suppkey
    * aggregate, a broadcast name join — the multi-metric single-pass
    * report shape (J4 decorrelation at supplier grain).
    *
    * The distinct-order count rides the same two-stage distinct
    * aggregate as q16 — nothing scans twice. */
  def supplierScorecard(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"))
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_d", delay.cast("long"))
      // manual two-level distinct: the (suppkey, orderkey) grain
      // REUSES the join's hash(orderkey) partitioning (grouping keys
      // are a superset), so the first aggregate runs exchange-free and
      // the Expand row-doubling a countDistinct-with-siblings plan
      // ships through the shuffle is gone (guide §2.3) — n_orders is
      // the group count, every other metric a sum of exact partials
      // (decimal money sums are order-independent by construction)
      .groupBy(col("l_suppkey"), col("l_orderkey"))
      .agg(count(lit(1)).as("__c"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("__rev"),
        sum(col("delay_d")).as("__sd"),
        sum(when(col("delay_d") > 60, 1L).otherwise(0L)).as("__sl"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("__c")).cast("long").as("n_lineitems"),
        count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("__rev")), 2).cast("double").as("revenue"),
        sum(col("__sd")).cast("long").as("sum_delay_d"),
        sum(col("__sl")).cast("long").as("n_slow"))
      .withColumn("mean_delay_d",
        Exact.pround4(col("sum_delay_d").cast("double") / col("n_lineitems")))
      .withColumn("slow_ppm",
        floor(col("n_slow").cast("double") * 1000000 / col("n_lineitems"))
          .cast("long"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_lineitems"), col("n_orders"),
        col("revenue"), col("mean_delay_d"), col("slow_ppm"))
      .orderBy(col("s_name"))
  }

  val supplierScorecardSql: String =
    s"""WITH li AS (
         SELECT l_suppkey, l_orderkey,
           datediff('day', o_orderdate, l_shipdate) AS delay_d,
           l_extendedprice, l_discount
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       g AS (
         SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
           CAST(sum(delay_d) AS BIGINT) AS sum_delay_d,
           CAST(sum(CASE WHEN delay_d > 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_slow
         FROM li GROUP BY l_suppkey)
       SELECT s_name, n_lineitems, n_orders, revenue,
         ${Exact.pround4Sql("CAST(sum_delay_d AS DOUBLE) / n_lineitems")}
           AS mean_delay_d,
         CAST(floor(CAST(n_slow AS DOUBLE) * 1000000 / n_lineitems) AS BIGINT)
           AS slow_ppm
       FROM g JOIN supplier ON l_suppkey = s_suppkey
       ORDER BY s_name"""

  /** TPC-H Q2 (minimum-cost supplier), adapted to the partsupp-less
    * test schema (`real_parse.pl` has no supplier catalog either; the
    * capability under test is the correlated-scalar-MIN + tie-break
    * shape): per-(part, supplier) supply cost is the minimum observed
    * line price through EUROPE-region suppliers, and each STANDARD-
    * typed part reports the supplier achieving the regional minimum.
    *
    * The spec's correlated `ps_supplycost = (SELECT min(...))`
    * decorrelates into the cross-engine struct-min argmax convention
    * (`min(struct(cost, suppkey))` == DuckDB `min(struct_pack(...))`)
    * — one partial-aggregating shuffle on partkey instead of a rank
    * window that would ship every (part, supplier) row; the suppkey
    * member breaks cost ties identically on both engines.
    *
    * Scale shape: region→nation→supplier prunes to a broadcast dim;
    * lineitem shuffles once on (partkey, suppkey), the argmax reuses
    * that partitioning (partkey is a prefix), and the part filter is
    * a broadcast join applied before the presentation sort. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eur = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val best = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      .join(broadcast(eur.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("price")).as("supplycost"))
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("supplycost"), col("l_suppkey"))).as("m"))
      .select(col("l_partkey"),
        col("m.supplycost").as("sc"), col("m.l_suppkey").as("best_suppkey"))
    best
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "STANDARD")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(eur), col("best_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        col("sc").cast("double").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  val q2MinCostSupplierSql: String =
    """WITH eur AS (
         SELECT s_suppkey, s_name, s_acctbal, n_name
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'),
       cost AS (
         SELECT l_partkey, l_suppkey,
           min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
         FROM lineitem JOIN eur ON l_suppkey = s_suppkey
         GROUP BY l_partkey, l_suppkey),
       best AS (
         SELECT l_partkey,
           (min(struct_pack(supplycost := supplycost, l_suppkey := l_suppkey))).supplycost AS sc,
           (min(struct_pack(supplycost := supplycost, l_suppkey := l_suppkey))).l_suppkey AS best_suppkey
         FROM cost GROUP BY l_partkey)
       SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
         CAST(sc AS DOUBLE) AS supplycost
       FROM best
       JOIN part ON l_partkey = p_partkey
       JOIN eur ON best_suppkey = s_suppkey
       WHERE p_type = 'STANDARD'
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey"""

  /** Top-3 brands per supplier nation by revenue — the per-group
    * top-k-with-ties report (dense_rank, so revenue ties share a
    * rank and both tied brands surface). Ranking runs over the
    * ALREADY-AGGREGATED (nation, brand) frame — |nations|×|brands|
    * rows — never over raw lineitems, and Spark's WindowGroupLimit
    * pushes the rank<=3 cut into the window sort. The rank orders by
    * the exact-decimal-then-rounded revenue plus the brand as a total
    * tie-break, so both engines rank identically.
    *
    * Scale shape: two broadcast dim joins, ONE fact shuffle on the
    * (nation, brand) agg key, then a window over a dim-sized frame. */
  def topkBrandsPerNation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    rev.withColumn("rk", dense_rank().over(
        Window.partitionBy(col("n_name"))
          .orderBy(col("revenue").desc, col("p_brand"))))
      .filter(col("rk") <= 3)
      .select(col("n_name"), col("rk").cast("int").as("rk"),
        col("p_brand"), col("revenue"))
      .orderBy(col("n_name"), col("rk"), col("p_brand"))
  }

  val topkBrandsPerNationSql: String =
    s"""WITH rev AS (
         SELECT n_name, p_brand,
           ${Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name, p_brand),
       r AS (
         SELECT n_name, p_brand, revenue,
           dense_rank() OVER (PARTITION BY n_name
             ORDER BY revenue DESC, p_brand) AS rk
         FROM rev)
       SELECT n_name, CAST(rk AS INTEGER) AS rk, p_brand, revenue
       FROM r WHERE rk <= 3 ORDER BY n_name, rk, p_brand"""

  /** Percent-of-parent hierarchy rollup — the drill-down tree every
    * BI layer renders (region → nation → supplier revenue, each row
    * carrying its share of its PARENT): supplier-of-nation,
    * nation-of-region, and region-of-total shares in exact integer
    * ppm over exact-cents sums. The nation/region parent totals are
    * window sums over the ALREADY-AGGREGATED supplier frame
    * (≤|suppliers| rows) — the fact shuffles once on the (region,
    * nation, supplier) key and nothing row-scale ever enters a
    * window; the grand total rides in as a 1-row aggregate broadcast
    * cross-join rather than an empty-partition window (which would
    * funnel the whole supplier frame through one task).
    *
    * Scale shape: two broadcast dim joins, ONE fact groupBy, two
    * partition-sum windows on a dim-sized frame + one broadcast
    * scalar. */
  def hierarchyShares(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("r_name"))
    val sup = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), Exact.cents(col("l_extendedprice")).as("cents"))
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("n_name"), col("s_name"))
      .agg(sum(col("cents")).cast("long").as("cents"))
      .transform(graft.util.Fence.lineage) // grand total + shares both read it
    val wN = Window.partitionBy(col("r_name"), col("n_name"))
    val wR = Window.partitionBy(col("r_name"))
    val total = sup.agg(sum(col("cents")).cast("long").as("tot_cents"))
    sup
      .withColumn("nat_cents", sum(col("cents")).over(wN).cast("long"))
      .withColumn("reg_cents", sum(col("cents")).over(wR).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("r_name"), col("n_name"), col("s_name"), col("cents"),
        expr("cents * 1000000 div nat_cents").as("share_of_nation_ppm"),
        expr("nat_cents * 1000000 div reg_cents").as("nation_of_region_ppm"),
        expr("reg_cents * 1000000 div tot_cents").as("region_of_total_ppm"))
      .orderBy(col("r_name"), col("n_name"), col("s_name"))
  }

  val hierarchySharesSql: String =
    """WITH sup AS (
         SELECT r_name, n_name, s_name,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name, s_name),
       w AS (
         SELECT r_name, n_name, s_name, cents,
           CAST(sum(cents) OVER (PARTITION BY r_name, n_name) AS BIGINT)
             AS nat_cents,
           CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS reg_cents,
           CAST(sum(cents) OVER () AS BIGINT) AS tot_cents
         FROM sup)
       SELECT r_name, n_name, s_name, cents,
         CAST(cents * 1000000 // nat_cents AS BIGINT) AS share_of_nation_ppm,
         CAST(nat_cents * 1000000 // reg_cents AS BIGINT)
           AS nation_of_region_ppm,
         CAST(reg_cents * 1000000 // tot_cents AS BIGINT)
           AS region_of_total_ppm
       FROM w ORDER BY r_name, n_name, s_name"""

  /** Skyline (Pareto-frontier) query per part type — the multi-
    * criteria shortlist a buyer report wants: within each p_type,
    * keep exactly the parts no other part DOMINATES (cheaper-or-equal
    * price AND bigger-or-equal size with at least one strict). The
    * classic SKYLINE operator (Börzsönyi et al., ICDE'01) expressed
    * as two window passes instead of the naive O(n²) self-join:
    * ordered by price, a part is dominated iff the best size among
    * STRICTLY cheaper parts already reaches its size (RANGE frame on
    * the cents key), or a same-price part strictly exceeds it
    * (per-(type, cents) max).
    *
    * Scale shape: one p_type-keyed shuffle serves both windows (the
    * same-price max is a window over the identical sort, not a
    * self-join); nothing pairwise anywhere, so a 10^9-part catalog
    * costs one sort per type partition. Price is exact cents —
    * dominance never hinges on a double compare. */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_type"),
        Exact.cents(col("p_retailprice")).as("price_cents"),
        col("p_size").cast("long").as("size"))
    val cheaper = Window.partitionBy(col("p_type")).orderBy(col("price_cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val samePrice = Window.partitionBy(col("p_type"), col("price_cents"))
    p.withColumn("best_cheaper", max(col("size")).over(cheaper))
      .withColumn("best_same", max(col("size")).over(samePrice))
      .filter((col("best_cheaper").isNull || col("best_cheaper") < col("size"))
        && col("best_same") === col("size"))
      .select(col("p_type"), col("p_partkey"), col("price_cents"), col("size"))
      .orderBy(col("p_type"), col("price_cents"), col("p_partkey"))
  }

  val skylinePartsSql: String =
    s"""WITH p AS (
         SELECT p_partkey, p_type,
           ${Exact.centsSql("p_retailprice")} AS price_cents,
           CAST(p_size AS BIGINT) AS size
         FROM part),
       w AS (
         SELECT *,
           max(size) OVER (PARTITION BY p_type ORDER BY price_cents
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_cheaper,
           max(size) OVER (PARTITION BY p_type, price_cents) AS best_same
         FROM p)
       SELECT p_type, p_partkey, price_cents, size
       FROM w
       WHERE (best_cheaper IS NULL OR best_cheaper < size)
         AND best_same = size
       ORDER BY p_type, price_cents, p_partkey"""

  /** Supplier revenue concentration per nation — the Herfindahl-
    * Hirschman index (HHI), the canonical market-concentration
    * statistic (DOJ thresholds: <1,500 "unconcentrated", >2,500
    * "highly concentrated", on the 10,000 scale — emitted here in
    * ppm of 1): HHI = Σᵢ shareᵢ² over each nation's suppliers. The
    * supply-chain-risk readout: a nation whose parts flow through
    * two suppliers is fragile however many are nominally registered.
    *
    * Exactness at any size: revenues collapse to whole dollars, and
    * both the squares and the total are REDUCED by a data-derived
    * common scale s = max(1, total div 10⁶) before squaring
    * (seasonal_strength's convention) — Σ(rᵢ div s)² ≤ 10¹² · |suppliers|
    * and (T div s)² ≤ 10¹², both BIGINT-safe at any corpus, and the
    * reduction is bit-identical cross-engine. Scale shape: one
    * lineitem→supplier-keyed revenue aggregate, a nation-keyed
    * rollup of ≤|suppliers| rows, nation dim broadcast. */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(expr(
        "sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        + " AS BIGINT)) div 100").as("r"))
    val bySupp = rev
      .join(Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        Seq("l_suppkey"))
      .transform(graft.util.Fence.lineage)
    val natTotal = bySupp.groupBy(col("s_nationkey"))
      .agg(sum(col("r")).as("total"), count(lit(1)).as("n_suppliers"))
      .withColumn("s", greatest(lit(1L), expr("total div 1000000")))
    bySupp.join(natTotal, Seq("s_nationkey"))
      .groupBy(col("s_nationkey"), col("n_suppliers"), col("total"), col("s"))
      .agg(sum(expr("(r div s) * (r div s)")).as("sq"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
        Seq("s_nationkey"))
      .select(col("n_name"),
        col("n_suppliers").cast("long").as("n_suppliers"),
        col("total").cast("long").as("total_dollars"),
        expr("sq * 1000000 div nullif((total div s) * (total div s), 0)")
          .as("hhi_ppm"))
      .orderBy(col("n_name"))
  }

  val supplierHhiSql: String =
    """WITH rev AS (
         SELECT l_suppkey,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
             AS BIGINT)) // 100 AS BIGINT) AS r
         FROM lineitem GROUP BY l_suppkey),
       bs AS (
         SELECT s.s_nationkey, rev.r
         FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey),
       nt AS (
         SELECT s_nationkey, CAST(sum(r) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           greatest(1, CAST(sum(r) AS BIGINT) // 1000000) AS s
         FROM bs GROUP BY s_nationkey),
       q AS (
         SELECT bs.s_nationkey, nt.n_suppliers, nt.total, nt.s,
           CAST(sum((bs.r // nt.s) * (bs.r // nt.s)) AS BIGINT) AS sq
         FROM bs JOIN nt ON nt.s_nationkey = bs.s_nationkey
         GROUP BY bs.s_nationkey, nt.n_suppliers, nt.total, nt.s)
       SELECT n.n_name,
         CAST(q.n_suppliers AS BIGINT) AS n_suppliers,
         CAST(q.total AS BIGINT) AS total_dollars,
         CAST(q.sq * 1000000 // nullif((q.total // q.s) * (q.total // q.s), 0)
           AS BIGINT) AS hhi_ppm
       FROM q JOIN nation n ON n.n_nationkey = q.s_nationkey
       ORDER BY n.n_name"""

  /** Discount-band elasticity table — the promo-effectiveness
    * readout: per discount level, how order-line quantity and
    * revenue respond (does 7% off actually move more units than
    * 5%?). Per band: line count, exact mean quantity in milli-units,
    * exact-decimal revenue, revenue per line in cents — the marginal
    * columns a pricing decision reads across rows. Quantity response
    * is the elasticity signal; revenue per line shows where deeper
    * discounts stop paying for themselves.
    *
    * Scale shape: ONE pass over lineitem into a ≤|discount levels|
    * groupBy (map-side combined); discount bands are exact cents of
    * the discount fraction, so no float ever keys a group. */
  def discountElasticity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(Exact.cents(col("l_discount")).as("discount_pct"))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"),
        expr("sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
          + " AS BIGINT))").as("revenue_cents"))
      .select(col("discount_pct"), col("n_lines"),
        expr("sum_qty * 1000 div n_lines").as("mean_qty_milli"),
        col("revenue_cents").cast("long").as("revenue_cents"),
        expr("revenue_cents div n_lines").as("rev_per_line_cents"))
      .orderBy(col("discount_pct"))

  val discountElasticitySql: String =
    """WITH g AS (
         SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
             AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem GROUP BY 1)
       SELECT discount_pct, n_lines,
         CAST(sum_qty * 1000 // n_lines AS BIGINT) AS mean_qty_milli,
         revenue_cents,
         CAST(revenue_cents // n_lines AS BIGINT) AS rev_per_line_cents
       FROM g ORDER BY discount_pct"""
}
