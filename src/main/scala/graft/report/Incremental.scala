package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.{Exact, Hashing}

/** Incremental-load companions to the watermark filter (SURVEY.md
  * §2.3 F1, §2.4): the set-difference formulations the reference
  * approximates with its `> max(datetime)` bound, plus the
  * skew-resistant aggregation pattern for 100 TB group-bys.
  */
object Incremental {

  /** F1 as a true anti-join: new rows = events whose natural key is
    * not already in the loaded slice. Exact where the watermark bound
    * is lossy at the boundary second (SURVEY.md §7.5.2). At scale
    * this is a broadcast anti-join when the loaded-key side is small,
    * or a shuffled left_anti on the natural key otherwise — Catalyst
    * picks; no driver-side state either way. */
  def incrementalAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val loaded = ev.filter(col("event_id") % 3 =!= 0).select(col("event_id"))
    ev.join(loaded, Seq("event_id"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_new"), Exact.moneySum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val incrementalAntijoinSql: String =
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_new,
       ${Exact.moneySumSql("value")} AS sum_value
       FROM events e
       WHERE NOT EXISTS (SELECT 1 FROM events l
                         WHERE l.event_id % 3 <> 0 AND l.event_id = e.event_id)
       GROUP BY event_type ORDER BY event_type"""

  /** Natural-key dedup — the batch form of the streaming
    * dropDuplicatesWithinWatermark: rows agreeing on
    * (user_id, ts, event_type) collapse to one (min event_id wins,
    * deterministically). */
  def dedupBoundary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("ts"), col("event_type"))
      .agg(min(col("event_id")).as("event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct"))
      .orderBy(col("event_type"))

  val dedupBoundarySql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct
       FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_type, min(event_id) AS event_id
             FROM events GROUP BY user_id, tsu, event_type)
       GROUP BY event_type ORDER BY event_type"""

  /** Skew-resistant two-phase aggregation (salting): partial agg on
    * (key, salt) spreads a hot key over N reducers, final agg merges
    * partials. Result is identical to the direct groupBy — which is
    * exactly what the oracle checks. At 100 TB this is the pattern
    * for power-law keys where AQE skew handling isn't enough. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val salted = Tables.events(spark, dir)
      .withColumn("salt", col("event_id") % 16)
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast("decimal(18,4)")).as("psum"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
           round(sum(col("psum")), 2).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val saltedAggSql: String =
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       ${Exact.moneySumSql("value")} AS sum_value
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** Salted JOIN — [[saltedAgg]]'s sibling for the join side of the
    * skew problem. `event_type` has a handful of values, so a plain
    * shuffle join on it lands each type's ENTIRE fact volume in one
    * task (the classic power-law straggler). Fix: replicate the small
    * dim R ways (explode over the salt range) and shard the fact side
    * deterministically (`event_id % R`); the join key becomes
    * (event_type, salt) — R tasks per hot key. The shuffle_hash hint
    * keeps the demonstration honest at test scale (the 40-row dim
    * would otherwise auto-broadcast, which IS the right plan when the
    * dim fits — salting is for when it doesn't, or when AQE's skew
    * split can't help a hash-partitioned downstream). Enrichment is
    * exact-integer: value cents × per-type rate_ppm, so the oracle
    * (the UNSALTED plain join) matches bit-for-bit. */
  private val R = 8

  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        Exact.cents(col("value")).as("cents"),
        (col("event_id") % R).as("salt"))
    val dim = Tables.events(spark, dir)
      .select(col("event_type")).distinct()
      .withColumn("rate_ppm", Hashing.phash(col("event_type"), "rate_") % 1000000L)
      // explode_outer + isNotNull per the generator rule (CLAUDE.md)
      .withColumn("salt", explode_outer(sequence(lit(0L), lit(R - 1L))))
      .filter(col("salt").isNotNull)
    ev.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("cents") * col("rate_ppm")).as("scaled_sum"))
      .orderBy(col("event_type"))
  }

  val skewJoinSql: String =
    s"""WITH ev AS (
         SELECT event_type,
           ${Exact.centsSql("value")} AS cents
         FROM events),
       dim AS (
         SELECT DISTINCT event_type,
           ${Hashing.phashSql("event_type", "rate_")} % 1000000 AS rate_ppm
         FROM events)
       SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(ev.cents * dim.rate_ppm) AS BIGINT) AS scaled_sum
       FROM ev JOIN dim ON ev.event_type = dim.event_type
       GROUP BY ev.event_type ORDER BY ev.event_type"""

  /** MERGE INTO (upsert + delete) as a single full-outer join — the
    * CDC apply step every lakehouse table maintenance job runs, here
    * as its classification/verification report. Base = the loaded
    * orders slice (keys % 10 != 0); the CDC batch carries re-priced
    * rows for keys % 5 == 0, with keys % 25 == 0 flagged as deletes.
    * Each key classifies exactly one way (insert / update / delete /
    * delete-of-absent noop / unchanged), and the post-merge money
    * total per priority is the exact decimal sum of the SURVIVING
    * row versions — so a wrong classification anywhere changes a
    * hashed money column, not just a count.
    *
    * Scale shape: ONE shuffled full-outer equi-join on the natural
    * key (what Delta/Iceberg MERGE compiles to when the delta side
    * is too big to broadcast), then a map-side-combining groupBy on
    * |priorities| keys. No windows, no second pass over the fact. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val base = o.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("bp"),
        col("o_totalprice").as("bprice"))
    val delta = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("dp"),
        (col("o_totalprice") + lit(100.0)).as("dprice"),
        (col("o_orderkey") % 25 === 0).as("is_del"))
    base.join(delta, Seq("k"), "full_outer")
      .withColumn("action",
        when(col("dp").isNull, lit("unchanged"))
          .when(col("bp").isNull && !col("is_del"), lit("insert"))
          .when(col("bp").isNull, lit("noop"))
          .when(col("is_del"), lit("delete"))
          .otherwise(lit("update")))
      .withColumn("out_price",
        when(col("action") === "unchanged", col("bprice"))
          .when(col("action").isin("insert", "update"), col("dprice")))
      .groupBy(coalesce(col("bp"), col("dp")).as("o_orderpriority"))
      .agg(
        sum(when(col("action") === "insert", 1L).otherwise(0L)).cast("long").as("n_insert"),
        sum(when(col("action") === "update", 1L).otherwise(0L)).cast("long").as("n_update"),
        sum(when(col("action") === "delete", 1L).otherwise(0L)).cast("long").as("n_delete"),
        sum(when(col("action") === "noop", 1L).otherwise(0L)).cast("long").as("n_noop"),
        sum(when(col("action") === "unchanged", 1L).otherwise(0L)).cast("long").as("n_unchanged"),
        Exact.moneySum(col("out_price")).as("merged_total"))
      .orderBy(col("o_orderpriority"))
  }

  val mergeUpsertSql: String =
    s"""WITH base AS (
         SELECT o_orderkey AS k, o_orderpriority AS bp, o_totalprice AS bprice
         FROM orders WHERE o_orderkey % 10 <> 0),
       delta AS (
         SELECT o_orderkey AS k, o_orderpriority AS dp,
           o_totalprice + 100.0 AS dprice,
           (o_orderkey % 25 = 0) AS is_del
         FROM orders WHERE o_orderkey % 5 = 0),
       m AS (
         SELECT coalesce(b.bp, d.dp) AS prio,
           CASE WHEN d.k IS NULL THEN 'unchanged'
                WHEN b.k IS NULL AND NOT d.is_del THEN 'insert'
                WHEN b.k IS NULL THEN 'noop'
                WHEN d.is_del THEN 'delete'
                ELSE 'update' END AS action,
           b.bprice, d.dprice
         FROM base b FULL OUTER JOIN delta d ON b.k = d.k),
       c AS (
         SELECT prio, action,
           CASE WHEN action = 'unchanged' THEN bprice
                WHEN action IN ('insert', 'update') THEN dprice END AS out_price
         FROM m)
       SELECT prio AS o_orderpriority,
         CAST(sum(CASE WHEN action = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
         CAST(sum(CASE WHEN action = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
         CAST(sum(CASE WHEN action = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
         CAST(sum(CASE WHEN action = 'noop' THEN 1 ELSE 0 END) AS BIGINT) AS n_noop,
         CAST(sum(CASE WHEN action = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         ${Exact.moneySumSql("out_price")} AS merged_total
       FROM c GROUP BY prio ORDER BY prio"""
}
