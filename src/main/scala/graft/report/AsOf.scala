package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Exact

/** As-of (point-in-time) join — the canonical operator Spark lacks
  * natively (SURVEY.md §2.4 notes the reference has none either; this
  * is a §7 capability extension for time-series enrichment: "what
  * config/rate was in force when this event happened").
  *
  * Built as a broadcast dimension lookup: the rate-change side is
  * tiny by construction (every 97th event), so it collapses to one
  * sorted (ts, event_id, rate) array per key, broadcast to every
  * executor; each event resolves its rate-in-force by scanning that
  * array — a narrow, shuffle-free map over the fact side.
  *
  * Round 1 built this as tag+UNION+window partitioned by event_type;
  * event_type has ~5 values, so at 100 TB one task would sort 20% of
  * the data — the classic low-cardinality-window scale-killer. The
  * broadcast form keeps the fact side embarrassingly parallel. If
  * the rate side ever outgrows broadcast size, the fallback is a
  * coarse time-bucket added to both join keys (bounded bucket scan),
  * or a custom binary-search Expression over the sorted array — the
  * in-array `filter` here is O(R) per event, fine while R/key is
  * thousands, not millions.
  *
  * Tie semantics (bit-compatible with the round-1 window): rates
  * sort by (ts, event_id); an event at ts T sees every rate with
  * rate.ts <= T (a rate "arrives" before an event in the same
  * second), and the latest (ts, event_id) wins.
  *
  * The "rate changes" dimension is derived deterministically from the
  * events table itself (every event_id % 97 == 0 row becomes a rate
  * change for its event_type), so the oracle can rebuild it exactly.
  */
object AsOf {

  def asofJoinRates(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // rate rows KEEP their source event_id: two rate changes sharing
    // (event_type, ts) would otherwise tie on the sort key and make
    // rate_in_force nondeterministic across runs and engines
    val rateArr = ev.filter(col("event_id") % 97 === 0)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("value").as("rate")))).as("ra"))
    // left join: an event_type with no rate changes must still count
    ev.join(broadcast(rateArr), Seq("event_type"), "left")
      .withColumn("rate_in_force",
        try_element_at(
          filter(col("ra"), r => r("ts") <= col("ts")), lit(-1))("rate"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count(col("rate_in_force")).as("n_with_rate"),
           Exact.moneySum(coalesce(col("rate_in_force"), lit(0.0))).as("sum_rate"))
      .orderBy(col("event_type"))
  }

  val asofJoinRatesSql: String =
    s"""WITH rates AS (
         SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value AS rate
         FROM events WHERE event_id % 97 = 0),
       ra AS (
         SELECT event_type,
           list(struct_pack(ts := ts, event_id := event_id, rate := rate)
                ORDER BY ts, event_id) AS ra
         FROM rates GROUP BY event_type),
       f AS (
         SELECT e.event_type,
           (list_filter(ra.ra, r -> r.ts <= CAST(e.ts AS TIMESTAMP)))[-1].rate
             AS rate_in_force
         FROM events e LEFT JOIN ra ON e.event_type = ra.event_type)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(rate_in_force) AS BIGINT) AS n_with_rate,
         ${Exact.moneySumSql("coalesce(rate_in_force, 0.0)")} AS sum_rate
       FROM f
       GROUP BY event_type ORDER BY event_type"""
}
