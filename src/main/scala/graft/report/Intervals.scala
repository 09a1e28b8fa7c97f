package graft.report

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Exact

/** Interval (overlap) joins and time-range rolling aggregates — the
  * two time-range operators Spark has no native physical strategy
  * for (alongside [[AsOf]]'s point-in-time join; SURVEY.md §2.4 notes
  * the reference has none of the three — these are §7 capability
  * extensions for time-series enrichment).
  *
  * A naive interval join (`a.start <= b.ts AND b.ts <= a.end`) is a
  * theta-join: Catalyst can only plan it as BroadcastNestedLoopJoin
  * — O(|A|·|B|) and an O(N) broadcast when neither side is tiny. The
  * scale shape used here is the standard COARSE-BUCKET decomposition
  * (same W-bucket scheme as [[AsOf]]):
  *
  *  1. each interval explodes into the W-width time buckets it
  *     covers — for bounded-length intervals (here: fixed 2 h) that
  *     is ≤ len/W + 1 rows each, a constant fan-out;
  *  2. each point row lands in exactly ONE bucket, so the bucket
  *     equi-join emits every true (point, interval) pair exactly
  *     once — no post-join dedup — plus only the false candidates
  *     that share a bucket but miss the range predicate;
  *  3. both sides SHUFFLE on the high-cardinality (type, bucket)
  *     key. The interval side here is ~0.5% of events — O(N), so it
  *     must never broadcast (the round-2 as-of lesson); per-cell
  *     work is bounded by interval density × W, with W the knob.
  */
object Intervals {

  /** Bucket width (seconds). Intervals are LEN-long, so each explodes
    * into at most LEN/W + 1 = 3 buckets. */
  private val W = 3600L
  private val LEN = 7200L

  /** In-plan series-length contract for the fold-based ops
    * ([[cusumDrift]], [[ewmaSmooth]], [[kaplanMeier]]): their
    * per-group `collect_list` arrays are CALENDAR-bounded (daily
    * buckets / duration days), which is an implicit property of the
    * grouping key — a key-cardinality bug (say, grouping by user_id
    * instead of event_type) would silently OOM one task at 100 TB.
    * Per the repo's raise_error convention (dedupIncremental's id
    * floor), the bound is asserted IN the plan, evaluated once per
    * aggregated group: ≤ [[SERIES_CAP]] elements (≈274 years of
    * days — generous) passes through unchanged; a violating group
    * fails the job loudly instead of spilling. */
  private[graft] val SERIES_CAP = 100000
  private[graft] def boundedSeries(ds: Column, op: String): Column =
    when(size(ds) <= SERIES_CAP, ds).otherwise(
      raise_error(concat(
        lit(s"$op: per-group series exceeds $SERIES_CAP elements ("),
        size(ds).cast("string"),
        lit(") — calendar-bound contract violated"))))

  /** Maintenance-window enrichment: every `event_id % 199 == 0` event
    * opens a 2 h window for its event_type (deterministic, so the
    * oracle rebuilds it exactly); each window reports how many
    * same-type events fall inside it [w_start, w_start+2h] and their
    * value total. The window's own opening event is inside by
    * construction, so the join is inner. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("value"),
        floor(unix_timestamp(col("ts")) / W).cast("long").as("bucket"))
    // unix_timestamp truncates sub-second parts; floor(floor(x)/W) ==
    // floor(x/W) for integer W, so buckets match DuckDB's
    // floor(epoch(ts)/W) exactly (same argument as AsOf)
    val wins = Tables.events(spark, dir)
      .filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("window_id"),
        col("event_type").as("w_type"), col("ts").as("w_start"),
        (col("ts") + expr(s"INTERVAL $LEN SECONDS")).as("w_end"),
        floor(unix_timestamp(col("ts")) / W).cast("long").as("bs"),
        floor((unix_timestamp(col("ts")) + LEN) / W).cast("long").as("be"))
    // explode_outer + isNotNull: the CLAUDE.md generator rule — plain
    // explode lets InferFiltersFromGenerate push a synthesized
    // size(sequence(..))>0 filter below the projection with the
    // expression inlined onto the scan
    val winsExp = wins
      .select(col("window_id"), col("w_type"), col("w_start"), col("w_end"),
        explode_outer(sequence(col("bs"), col("be"))).as("bucket"))
      .filter(col("bucket").isNotNull)
    // no broadcast hint: the interval side is O(N) by construction —
    // this must stay a shuffle equi-join at scale
    ev.join(winsExp,
        ev("event_type") === winsExp("w_type") &&
        ev("bucket") === winsExp("bucket") &&
        ev("ts") >= winsExp("w_start") && ev("ts") <= winsExp("w_end"))
      .groupBy(col("window_id"), col("w_type"))
      .agg(count(lit(1)).as("n_events"),
           Exact.moneySum(col("value")).as("sum_value"))
      .orderBy(col("window_id"))
  }

  val intervalJoinSql: String =
    s"""WITH src AS (
         SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
         FROM events),
       wins AS (
         SELECT event_id AS window_id, event_type AS w_type,
           ts AS w_start, ts + INTERVAL $LEN SECOND AS w_end
         FROM src WHERE event_id % 199 = 0)
       SELECT w.window_id, w.w_type,
         CAST(count(*) AS BIGINT) AS n_events,
         ${Exact.moneySumSql("e.value")} AS sum_value
       FROM src e JOIN wins w
         ON e.event_type = w.w_type
        AND e.ts >= w.w_start AND e.ts <= w.w_end
       GROUP BY w.window_id, w.w_type
       ORDER BY w.window_id"""

  /** Trailing 7-day per-user activity (RANGE frame): for every event,
    * the count and value total of that user's events in the preceding
    * week (inclusive). The window partitions on user_id — high
    * cardinality, so state per partition-key is one user's horizon,
    * never the table — and the frame is a RANGE over epoch seconds,
    * so peer rows (same second) aggregate identically in any engine.
    * Value sums ride as exact integer cents (portable-rounded per
    * row) — no accumulated-double drift. */
  def rollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        Exact.cents(col("value")).as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
      .rangeBetween(-(7L * 86400 - 1), Window.currentRow)
    ev.withColumn("trailing_cnt", count(lit(1)).over(w))
      .withColumn("trailing_cents", sum(col("cents")).over(w))
      .select(col("event_id"), col("user_id"), col("es"),
        col("trailing_cnt"), col("trailing_cents"))
      .orderBy(col("event_id"))
  }

  val rollingWindowSql: String =
    s"""WITH src AS (
         SELECT event_id, user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
           ${Exact.centsSql("value")} AS cents
         FROM events)
       SELECT event_id, user_id, es,
         CAST(count(*) OVER w AS BIGINT) AS trailing_cnt,
         CAST(sum(cents) OVER w AS BIGINT) AS trailing_cents
       FROM src
       WINDOW w AS (PARTITION BY user_id ORDER BY es
                    RANGE BETWEEN ${7L * 86400 - 1} PRECEDING AND CURRENT ROW)
       ORDER BY event_id"""

  // ---- Time-series resampling (gap-fill + carry-forward) -----------

  /** Hourly resample of the event stream, per type: every hour in the
    * type's observed span gets a row — hours with no events are
    * FILLED (n_events = 0) and carry the last observed reading
    * forward (LOCF, the standard sensor/metric resampling rule; hours
    * before a type's first reading stay NULL and are flagged). The
    * densify + carry machinery [[graft.report.AsOf]] uses internally,
    * surfaced as the user-facing operator.
    *
    * Scale shape: raw events aggregate ONCE on (type, hour) — the
    * only data-sized shuffle, and a PARTIAL one (the count and the
    * last-reading struct-max combine map-side, so no whole-hour row
    * group ever rides the exchange — strictly better than a rank
    * window). The dense hour grid and the carry-forward window both
    * run on the #types × #hours frame — timeline-bounded, NOT
    * data-bounded. Readings carry as exact integer cents; the last
    * reading resolves by the (ts, event_id) total order. */
  def resampleHourly(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hb"),
        col("ts"), col("event_id"), Exact.cents(col("value")).as("cents"))
    val hourly = src
      .groupBy(col("event_type"), col("hb"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("cents"))).as("b"))
      .select(col("event_type"), col("hb"), col("n_events"),
        col("b")("cents").as("last_cents"))
    val dense = src.groupBy(col("event_type"))
      .agg(min(col("hb")).as("minh"), max(col("hb")).as("maxh"))
      .select(col("event_type"),
        explode(sequence(col("minh"), col("maxh"))).as("hb"))
    val wCarry = Window.partitionBy(col("event_type")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(hourly, Seq("event_type", "hb"), "left")
      .withColumn("carried_cents",
        last(col("last_cents"), ignoreNulls = true).over(wCarry))
      .select(col("event_type"), (col("hb") * 3600).as("hour_epoch"),
        coalesce(col("n_events"), lit(0L)).cast("long").as("n_events"),
        col("carried_cents").cast("long").as("carried_cents"),
        when(col("n_events").isNull, 1L).otherwise(0L).as("is_gap"))
      .orderBy(col("event_type"), col("hour_epoch"))
  }

  val resampleHourlySql: String =
    s"""WITH src AS (
         SELECT event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hb,
           CAST(ts AS TIMESTAMP) AS ts, event_id,
           ${Exact.centsSql("value")} AS cents
         FROM events),
       hourly AS (
         SELECT event_type, hb, count(*) AS n_events,
           (max(struct_pack(ts := ts, event_id := event_id, cents := cents))).cents
             AS last_cents
         FROM src GROUP BY event_type, hb),
       span AS (
         SELECT event_type, min(hb) AS minh, max(hb) AS maxh
         FROM src GROUP BY event_type),
       dense AS (
         SELECT s.event_type, unnest(generate_series(s.minh, s.maxh)) AS hb
         FROM span s),
       f AS (
         SELECT d.event_type, d.hb, h.n_events, h.last_cents,
           last_value(h.last_cents IGNORE NULLS) OVER (
             PARTITION BY d.event_type ORDER BY d.hb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_cents
         FROM dense d LEFT JOIN hourly h
           ON d.event_type = h.event_type AND d.hb = h.hb)
       SELECT event_type, CAST(hb * 3600 AS BIGINT) AS hour_epoch,
         CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
         CAST(carried_cents AS BIGINT) AS carried_cents,
         CAST(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
       FROM f ORDER BY event_type, hour_epoch"""

  /** Trailing-24h rate anomaly detection: per (event_type, hour), is
    * this hour's event count more than 2× the trailing-24h hourly
    * mean — the alerting query a monitoring pipeline runs on every
    * metric stream. The trailing frame is a RANGE over epoch seconds
    * ending at the PREVIOUS hour (the current hour never smooths its
    * own spike), and the flag only fires on a FULL 24-hour baseline
    * (`trail_hours = 24`) so cold starts and gappy streams never
    * false-positive. The compare is pure integer cross-multiplication
    * (`n * 24 > 2 * trail_sum`) — no double division, no libm.
    *
    * Scale shape: one (type, hour) pre-aggregate with map-side
    * combine collapses the stream to #types × #hours rows BEFORE the
    * only window, which partitions on event_type and holds a ≤24-row
    * frame; nothing row-scale is ever sorted. */
  def rateAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("eh"))
      .groupBy(col("event_type"), col("eh"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("eh"))
      .rangeBetween(-86400, -3600)
    hourly
      .withColumn("trail_sum", sum(col("n")).over(w))
      .withColumn("trail_hours", count(lit(1)).over(w))
      .select(col("event_type"), col("eh").as("hour_epoch"),
        col("n").cast("long").as("n_events"),
        coalesce(col("trail_sum"), lit(0L)).cast("long").as("trail_sum"),
        col("trail_hours").cast("long").as("trail_hours"),
        (col("trail_hours") === 24 &&
          col("n") * 24 > col("trail_sum") * 2).cast("long").as("is_anomaly"))
      .orderBy(col("event_type"), col("hour_epoch"))
  }

  val rateAnomalySql: String =
    """WITH hourly AS (
         SELECT event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT) AS eh,
           count(*) AS n
         FROM events GROUP BY 1, 2),
       f AS (
         SELECT event_type, eh, n,
           sum(n) OVER (PARTITION BY event_type ORDER BY eh
             RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS trail_sum,
           count(*) OVER (PARTITION BY event_type ORDER BY eh
             RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS trail_hours
         FROM hourly)
       SELECT event_type, eh AS hour_epoch, CAST(n AS BIGINT) AS n_events,
         CAST(coalesce(trail_sum, 0) AS BIGINT) AS trail_sum,
         CAST(trail_hours AS BIGINT) AS trail_hours,
         CAST(CASE WHEN trail_hours = 24 AND n * 24 > trail_sum * 2
           THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
       FROM f ORDER BY event_type, hour_epoch"""

  /** Interval UNION (coverage merge): per user, the total time covered
    * by their (overlapping) activity windows and how many disjoint
    * busy islands those windows merge into — the gaps-and-islands
    * MERGE, where [[intervalJoin]] was the gaps-and-islands LOOKUP.
    * Every `event_id % 7 == 0` event opens a window of 30/60/90/120
    * minutes (`(1 + event_id % 4) * 1800 s` — deterministic, so the
    * oracle rebuilds it exactly); windows of one user chain into an
    * island while each starts no later than the running max end of
    * its predecessors.
    *
    * Scale shape: ONE user-keyed window pass (running max-end lagged
    * one row behind, over a TOTAL (start, event_id) order) marks
    * island openings; a running sum over the same order numbers them;
    * then two shrinking groupBys (user × island → user). All time
    * arithmetic is integer epoch seconds. Nothing is quadratic in
    * overlap depth — a 10⁶-interval user costs one sort, not 10¹²
    * comparisons. */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .filter(col("event_id") % 7 === 0)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) +
          (lit(1) + col("event_id") % 4) * 1800).as("e"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val prevMax = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val islands = iv
      .withColumn("pmax", max(col("e")).over(prevMax))
      .withColumn("is_new",
        when(col("pmax").isNull || col("s") > col("pmax"), 1).otherwise(0))
      .withColumn("island", sum(col("is_new")).over(ord))
      .groupBy(col("user_id"), col("island"))
      .agg((max(col("e")) - min(col("s"))).as("covered"),
        count(lit(1)).as("n_iv"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("covered")).cast("long").as("covered_s"),
        count(lit(1)).cast("long").as("n_islands"),
        sum(col("n_iv")).cast("long").as("n_intervals"))
      .orderBy(col("user_id"))
  }

  val intervalUnionSql: String =
    """WITH iv AS (
         SELECT user_id, event_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             + (1 + event_id % 4) * 1800 AS e
         FROM events WHERE event_id % 7 = 0),
       marked AS (
         SELECT user_id, event_id, s, e,
           max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         FROM iv),
       flagged AS (
         SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS is_new
         FROM marked),
       numbered AS (
         SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id)
           AS island
         FROM flagged),
       islands AS (
         SELECT user_id, island, max(e) - min(s) AS covered, count(*) AS n_iv
         FROM numbered GROUP BY user_id, island)
       SELECT user_id, CAST(sum(covered) AS BIGINT) AS covered_s,
         CAST(count(*) AS BIGINT) AS n_islands,
         CAST(sum(n_iv) AS BIGINT) AS n_intervals
       FROM islands GROUP BY user_id ORDER BY user_id"""

  /** One-sided CUSUM drift detector over daily event rates — the
    * statistical-process-control complement to [[rateAnomaly]]'s
    * trailing-window spike rule: a SLOW upward drift never trips a
    * per-point threshold, but the clamped cumulative excess
    * `Cₜ = max(0, Cₜ₋₁ + xₜ − μ − k)` accumulates it (Page 1954).
    * Target μ is the type's own integer mean daily count, slack
    * k = μ/20, alarm at C > μ — all BIGINT floor-division, so the
    * alarm sequence is bit-decidable cross-engine. The recurrence is
    * inherently sequential, so it folds over the type's SORTED daily
    * series with `aggregate()` — a bounded array (#days per type),
    * never a row window — and the oracle replays the same recurrence
    * as a recursive CTE stepping idx+1.
    *
    * Scale shape: one (type, day) count groupBy (map-side combined),
    * then |types| rows each folding a ≤|days| array on the executor.
    * The DAY series is bounded by the calendar, not the corpus —
    * this is the canonical "big data, small state" monitor; the
    * bound is ASSERTED in-plan by [[boundedSeries]]. */
  def cusumDrift(spark: SparkSession, dir: String): DataFrame =
    cusumDriftOf(Tables.events(spark, dir))

  private[graft] def cusumDriftOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
    val acc0 = struct(lit(0L).as("c"), lit(0L).as("alarms"),
      lit(0L).as("maxc"), lit(0L).as("first"), lit(0L).as("idx"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).cast("long").as("total"),
        boundedSeries(
          array_sort(collect_list(struct(col("day"), col("x")))),
          "cusumDrift").as("ds"))
      .withColumn("mean_daily", expr("total div n_days"))
      .withColumn("slack", expr("mean_daily div 20"))
      .withColumn("st", aggregate(
        transform(col("ds"), d => d.getField("x")), acc0,
        (acc, x) => {
          val idx = acc.getField("idx") + 1
          val c2 = greatest(lit(0L),
            acc.getField("c") + x - col("mean_daily") - col("slack"))
          val isA = c2 > col("mean_daily")
          struct(c2.as("c"),
            (acc.getField("alarms") + when(isA, 1L).otherwise(0L)).as("alarms"),
            greatest(acc.getField("maxc"), c2).as("maxc"),
            when(acc.getField("first") === 0L && isA, idx)
              .otherwise(acc.getField("first")).as("first"),
            idx.as("idx"))
        }))
      .select(col("event_type"), col("n_days"), col("mean_daily"),
        col("st.alarms").as("n_alarms"),
        col("st.maxc").as("max_cusum"),
        col("st.first").as("first_alarm_idx"))
      .orderBy(col("event_type"))
  }

  val cusumDriftSql: String =
    """WITH RECURSIVE d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(count(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       i AS (
         SELECT event_type, x,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS idx
         FROM d),
       m AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) // count(*) AS BIGINT) AS mean_daily,
           CAST((sum(x) // count(*)) // 20 AS BIGINT) AS slack
         FROM d GROUP BY event_type),
       r AS (
         SELECT i.event_type, i.idx,
           greatest(CAST(0 AS BIGINT), i.x - m.mean_daily - m.slack) AS c
         FROM i JOIN m USING (event_type) WHERE i.idx = 1
         UNION ALL
         SELECT i.event_type, i.idx,
           greatest(CAST(0 AS BIGINT), r.c + i.x - m.mean_daily - m.slack)
         FROM r
         JOIN i ON i.event_type = r.event_type AND i.idx = r.idx + 1
         JOIN m ON m.event_type = i.event_type)
       SELECT r.event_type,
         max(m.n_days) AS n_days,
         max(m.mean_daily) AS mean_daily,
         CAST(sum(CASE WHEN r.c > m.mean_daily THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarms,
         CAST(max(r.c) AS BIGINT) AS max_cusum,
         CAST(coalesce(min(CASE WHEN r.c > m.mean_daily THEN r.idx END), 0)
           AS BIGINT) AS first_alarm_idx
       FROM r JOIN m USING (event_type)
       GROUP BY r.event_type ORDER BY r.event_type"""

  /** Per-group trend slopes — grouped ordinary least squares over the
    * daily revenue series (the "is this segment growing?" number),
    * kept EXACT by emitting the closed-form slope as its integer
    * numerator/denominator pair (the [[zipf_fit]] convention —
    * `n·Σxy − Σx·Σy` over `n·Σx² − (Σx)²`, cents × day-index) plus a
    * floor-divided micro-cents-per-day quotient. Day indexes are
    * rebased to the type's own first day so the x-moments stay small.
    *
    * Scale shape: one (type, day) money groupBy, then one groupBy per
    * type accumulating the four integer moments map-side — the
    * regression never sees raw rows, only the bounded daily frame. */
  def trendSlopes(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(sum(Exact.cents(col("value"))).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type"))
    daily
      .withColumn("x", col("day") - min(col("day")).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("cents")).cast("long").as("sy"),
        sum(col("x") * col("cents")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"))
      .select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        expr("(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)")
          .as("slope_microcents_per_day"))
      .orderBy(col("event_type"))
  }

  val trendSlopesSql: String =
    """WITH d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
         FROM events GROUP BY 1, 2),
       x AS (
         SELECT event_type, cents,
           day - min(day) OVER (PARTITION BY event_type) AS x
         FROM d),
       g AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
           CAST(sum(x * cents) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
         FROM x GROUP BY event_type)
       SELECT event_type, n,
         CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
         CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
         CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT)
           AS slope_microcents_per_day
       FROM g ORDER BY event_type"""

  /** Daily time-weighted average (TWAP) — the duration-weighted mean
    * a plain `avg(value)` misquotes whenever readings arrive
    * unevenly: each reading's value holds until the NEXT same-day
    * reading (financial-convention daily bars — no overnight carry,
    * the session resets at the day boundary, so a day's last reading
    * carries no weight). Exact: cents × floor-seconds integer
    * products, the quotient as truncated milli-cents.
    *
    * Scale shape: the lead window partitions on the HIGH-CARDINALITY
    * (type, day) key — bounded partitions, never a per-type
    * full-timeline sort — and the numerator is bounded by
    * max_cents × seconds-per-day regardless of row count (durations
    * telescope), so the BIGINT math can't overflow at any SF. */
  def twapDaily(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        Exact.cents(col("value")).as("cents"))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("us"), col("event_id"))
    src
      .withColumn("dur_s",
        coalesce((lead(col("us"), 1).over(w) - col("us")), lit(0L)))
      .withColumn("dur_s", expr("dur_s div 1000000"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).cast("long").as("n_readings"),
        sum(col("dur_s")).cast("long").as("weighted_s"),
        sum(col("cents") * col("dur_s")).cast("long").as("twap_num"))
      .withColumn("twap_millicents",
        expr("(twap_num * 1000) div nullif(weighted_s, 0)"))
      .orderBy(col("event_type"), col("day"))
  }

  val twapDailySql: String =
    s"""WITH src AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
           ${Exact.centsSql("value")} AS cents
         FROM events),
       d AS (
         SELECT event_type, day, cents,
           coalesce(lead(us) OVER (PARTITION BY event_type, day
             ORDER BY us, event_id) - us, 0) // 1000000 AS dur_s
         FROM src)
       SELECT event_type, day,
         CAST(count(*) AS BIGINT) AS n_readings,
         CAST(sum(dur_s) AS BIGINT) AS weighted_s,
         CAST(sum(cents * dur_s) AS BIGINT) AS twap_num,
         CAST(sum(cents * dur_s) * 1000 // nullif(sum(dur_s), 0) AS BIGINT)
           AS twap_millicents
       FROM d GROUP BY event_type, day ORDER BY event_type, day"""

  /** Daily OHLC bars — open/high/low/close candles per (type, day),
    * the compaction every time-series store ships. Open and close are
    * cross-engine argmin/argmax via lexicographic struct min/max on
    * (us, event_id, cents) — total order, partial-aggregating
    * map-side (the resample_hourly convention) — so the whole bar is
    * ONE groupBy with no window and no second pass. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        Exact.cents(col("value")).as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min(struct(col("us"), col("event_id"), col("cents"))).as("o"),
        max(col("cents")).cast("long").as("high_cents"),
        min(col("cents")).cast("long").as("low_cents"),
        max(struct(col("us"), col("event_id"), col("cents"))).as("c"),
        count(lit(1)).cast("long").as("n_ticks"),
        sum(col("cents")).cast("long").as("volume_cents"))
      .select(col("event_type"), col("day"),
        col("o")("cents").cast("long").as("open_cents"),
        col("high_cents"), col("low_cents"),
        col("c")("cents").cast("long").as("close_cents"),
        col("n_ticks"), col("volume_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  val ohlcBarsSql: String =
    s"""WITH src AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
           ${Exact.centsSql("value")} AS cents
         FROM events)
       SELECT event_type, day,
         CAST((min(struct_pack(us := us, event_id := event_id,
           cents := cents))).cents AS BIGINT) AS open_cents,
         CAST(max(cents) AS BIGINT) AS high_cents,
         CAST(min(cents) AS BIGINT) AS low_cents,
         CAST((max(struct_pack(us := us, event_id := event_id,
           cents := cents))).cents AS BIGINT) AS close_cents,
         CAST(count(*) AS BIGINT) AS n_ticks,
         CAST(sum(cents) AS BIGINT) AS volume_cents
       FROM src GROUP BY event_type, day ORDER BY event_type, day"""

  /** Exact EWMA smoothing of the daily revenue series — α = 1/2 kept
    * in pure integers (`e_i = trunc((e_{i-1} + x_i) / 2)`, matching
    * DuckDB's `//` truncation toward zero even when a daily sum is
    * negative — shiftright alone would FLOOR and diverge by one on
    * negative odd sums; no libm pow, the CLAUDE.md rule), seeded
    * at the series head. Emits the full smoothed series, not just the
    * endpoint — the dashboard overlay line. The per-type day series
    * is calendar-bounded — asserted in-plan by [[boundedSeries]].
    *
    * Scale shape: the cusum_drift "big data, small state" pattern —
    * raw rows collapse to one (type, day) groupBy, the inherently
    * sequential recurrence then folds over each type's BOUNDED sorted
    * day array (≤ #days elements) via `aggregate`, and the series
    * re-explodes from the accumulator. The oracle replays the same
    * recurrence as a recursive CTE. */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame =
    ewmaSmoothOf(Tables.events(spark, dir))

  private[graft] def ewmaSmoothOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(sum(Exact.cents(col("value"))).cast("long").as("x"))
    val acc0 = struct(
      array().cast("array<struct<day:bigint,x:bigint,e:bigint>>").as("arr"),
      lit(0L).as("prev"), lit(0L).as("idx"))
    daily.groupBy(col("event_type"))
      .agg(boundedSeries(
        array_sort(collect_list(struct(col("day"), col("x")))),
        "ewmaSmooth").as("ds"))
      .withColumn("st", aggregate(col("ds"), acc0, (acc, d) => {
        // trunc-toward-zero halving: floor (shiftright) plus one when
        // the sum is negative and odd — bit-identical to DuckDB `// 2`
        val s = acc.getField("prev") + d.getField("x")
        val e = when(acc.getField("idx") === 0L, d.getField("x"))
          .otherwise(shiftright(s, 1) +
            when(s < 0, s.bitwiseAND(lit(1L))).otherwise(lit(0L)))
        struct(
          concat(acc.getField("arr"),
            array(struct(d.getField("day").as("day"),
              d.getField("x").as("x"), e.as("e")))).as("arr"),
          e.as("prev"), (acc.getField("idx") + 1).as("idx"))
      }))
      .select(col("event_type"), explode(col("st.arr")).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.x").as("x_cents"), col("r.e").as("ewma_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  val ewmaSmoothSql: String =
    """WITH RECURSIVE d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       i AS (
         SELECT event_type, day, x,
           row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         FROM d),
       r AS (
         SELECT event_type, day, x, rn, x AS e FROM i WHERE rn = 1
         UNION ALL
         SELECT i.event_type, i.day, i.x, i.rn, (r.e + i.x) // 2 AS e
         FROM r JOIN i ON i.event_type = r.event_type AND i.rn = r.rn + 1)
       SELECT event_type, day, CAST(x AS BIGINT) AS x_cents,
         CAST(e AS BIGINT) AS ewma_cents
       FROM r ORDER BY event_type, day"""

  /** Hourly LINEAR-interpolation resample — the gap-fill
    * [[resampleHourly]]'s LOCF deliberately does not do: each grid
    * hour estimates its value on the straight line between the
    * latest reading strictly before the grid instant and the first
    * reading at/after it (sensor convention; edges where either
    * bracket is missing stay null). All integer: cents slope times
    * µs offset, floor-divided — `(v1−v0)·(g−t0) div (t1−t0)` — and
    * the product is bounded by max_cents × corpus-span-µs, BIGINT-
    * safe at any SF.
    *
    * Scale shape: raw rows collapse to per-(type, hour-bucket)
    * first/last reading structs in ONE partial-aggregating groupBy;
    * the bracket carries (last-before via a trailing window, first-
    * after via a leading window) and the interpolation itself run on
    * the timeline-bounded #types × #hours grid. */
  def resampleLinear(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .select(col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        Exact.cents(col("value")).as("cents"))
      .withColumn("hb", expr("us div 3600000000"))
    val hourly = src.groupBy(col("event_type"), col("hb"))
      .agg(min(struct(col("us"), col("event_id"), col("cents"))).as("f"),
        max(struct(col("us"), col("event_id"), col("cents"))).as("l"))
    val dense = hourly.groupBy(col("event_type"))
      .agg(min(col("hb")).as("minh"), max(col("hb")).as("maxh"))
      .select(col("event_type"),
        explode(sequence(col("minh"), col("maxh"))).as("hb"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    dense.join(hourly, Seq("event_type", "hb"), "left")
      .withColumn("g_us", col("hb") * lit(3600000000L))
      .withColumn("p", last(col("l"), ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(col("f"), ignoreNulls = true).over(wNext))
      .select(col("event_type"), (col("hb") * 3600).as("hour_epoch"),
        col("p")("cents").cast("long").as("prev_cents"),
        col("nx")("cents").cast("long").as("next_cents"),
        expr("""CAST(p.cents + ((nx.cents - p.cents) * (g_us - p.us))
          div nullif(nx.us - p.us, 0) AS BIGINT)""").as("interp_cents"))
      .orderBy(col("event_type"), col("hour_epoch"))
  }

  val resampleLinearSql: String =
    s"""WITH src AS (
         SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
           ${Exact.centsSql("value")} AS cents
         FROM events),
       s2 AS (SELECT *, us // 3600000000 AS hb FROM src),
       hourly AS (
         SELECT event_type, hb,
           min(struct_pack(us := us, event_id := event_id, cents := cents))
             AS f,
           max(struct_pack(us := us, event_id := event_id, cents := cents))
             AS l
         FROM s2 GROUP BY 1, 2),
       span AS (
         SELECT event_type, min(hb) AS minh, max(hb) AS maxh
         FROM hourly GROUP BY event_type),
       dense AS (
         SELECT s.event_type, unnest(generate_series(s.minh, s.maxh)) AS hb
         FROM span s),
       c AS (
         SELECT d.event_type, d.hb, d.hb * 3600000000 AS g_us,
           last_value(h.l IGNORE NULLS) OVER (
             PARTITION BY d.event_type ORDER BY d.hb
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
           first_value(h.f IGNORE NULLS) OVER (
             PARTITION BY d.event_type ORDER BY d.hb
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
         FROM dense d LEFT JOIN hourly h
           ON d.event_type = h.event_type AND d.hb = h.hb)
       SELECT event_type, CAST(hb * 3600 AS BIGINT) AS hour_epoch,
         CAST(p.cents AS BIGINT) AS prev_cents,
         CAST(nx.cents AS BIGINT) AS next_cents,
         CAST(p.cents + ((nx.cents - p.cents) * (g_us - p.us))
           // nullif(nx.us - p.us, 0) AS BIGINT) AS interp_cents
       FROM c ORDER BY event_type, hour_epoch"""

  /** Alert episodes — consecutive anomalous hours merged into one
    * incident row (what a pager actually wants: "3-hour spike peaking
    * at N", not 3 rows). The flag is bit-identical to
    * [[rateAnomaly]]'s full-baseline trailing-24h rule; the merge is
    * the gaps-and-islands trick on the integer hour index
    * (`hour − row_number()` is constant exactly on consecutive runs).
    *
    * Scale shape: one (type, hour) pre-aggregate, the ≤24-row-frame
    * anomaly window, then row_number + groupBy on the FLAGGED subset
    * of the bounded hourly frame — raw rows are touched once. */
  def alertEpisodes(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hidx"))
      .groupBy(col("event_type"), col("hidx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hidx"))
      .rangeBetween(-24, -1)
    val ord = Window.partitionBy(col("event_type")).orderBy(col("hidx"))
    hourly
      .withColumn("trail_sum", sum(col("n")).over(w))
      .withColumn("trail_hours", count(lit(1)).over(w))
      .filter(col("trail_hours") === 24 &&
        col("n") * 24 > col("trail_sum") * 2)
      .withColumn("grp", col("hidx") - row_number().over(ord))
      .groupBy(col("event_type"), col("grp"))
      .agg((min(col("hidx")) * 3600).cast("long").as("start_epoch"),
        (max(col("hidx")) * 3600).cast("long").as("end_epoch"),
        count(lit(1)).cast("long").as("n_hours"),
        max(col("n")).cast("long").as("peak_events"),
        sum(col("n")).cast("long").as("total_events"))
      .drop("grp")
      .orderBy(col("event_type"), col("start_epoch"))
  }

  val alertEpisodesSql: String =
    """WITH hourly AS (
         SELECT event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hidx,
           count(*) AS n
         FROM events GROUP BY 1, 2),
       f AS (
         SELECT event_type, hidx, n,
           sum(n) OVER (PARTITION BY event_type ORDER BY hidx
             RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
           count(*) OVER (PARTITION BY event_type ORDER BY hidx
             RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_hours
         FROM hourly),
       g AS (
         SELECT event_type, hidx, n,
           hidx - row_number() OVER (PARTITION BY event_type
             ORDER BY hidx) AS grp
         FROM f WHERE trail_hours = 24 AND n * 24 > trail_sum * 2)
       SELECT event_type,
         CAST(min(hidx) * 3600 AS BIGINT) AS start_epoch,
         CAST(max(hidx) * 3600 AS BIGINT) AS end_epoch,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(max(n) AS BIGINT) AS peak_events,
         CAST(sum(n) AS BIGINT) AS total_events
       FROM g GROUP BY event_type, grp ORDER BY event_type, start_epoch"""

  /** Pairwise Pearson correlation between event types' daily revenue
    * series — "do these segments move together?", the input to any
    * portfolio/cannibalization read. Moments stay exact BIGINTs
    * (cents); only the final normalization touches doubles, via the
    * ONE libm function CLAUDE.md admits (`sqrt` is bit-stable
    * cross-engine) with identically-shaped expressions both sides —
    * `sqrt(dx)·sqrt(dy)`, never `sqrt(dx·dy)`, because dx·dy
    * overflows BIGINT while each factor fits. Zero-variance series
    * null out through nullif.
    *
    * Scale shape: raw rows collapse to the (type, day) frame once
    * (lineage-fenced — both join arms read it); the pair join is on
    * the ≤#days key with ≤#types rows per day, so the pair frame is
    * #days × #types² — bounded — and the moment groupBy partial-
    * aggregates map-side. */
  def dailyCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(sum(Exact.cents(col("value"))).cast("long").as("c"))
      .transform(graft.util.Fence.lineage)
    val a = daily.select(col("event_type").as("type_a"), col("day"),
      col("c").as("x"))
    val b = daily.select(col("event_type").as("type_b"), col("day"),
      col("c").as("y"))
    a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("y") * col("y")).cast("long").as("syy"))
      .select(col("type_a"), col("type_b"), col("n_days"),
        expr("n_days * sxy - sx * sy").as("corr_num"),
        expr("""CAST(floor(1000.0 * CAST(n_days * sxy - sx * sy AS DOUBLE)
          / nullif(sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)), 0.0))
          AS BIGINT)""").as("corr_milli"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val dailyCorrSql: String =
    """WITH d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
         FROM events GROUP BY 1, 2),
       p AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.c AS x, b.c AS y
         FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type),
       g AS (
         SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
         FROM p GROUP BY type_a, type_b)
       SELECT type_a, type_b, n_days,
         CAST(n_days * sxy - sx * sy AS BIGINT) AS corr_num,
         CAST(floor(1000.0 * CAST(n_days * sxy - sx * sy AS DOUBLE)
           / nullif(sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)), 0.0))
           AS BIGINT) AS corr_milli
       FROM g ORDER BY type_a, type_b"""

  /** Burstiness audit per event type — the variance-to-mean (Fano
    * factor) of the DAILY arrival counts, the dispersion statistic
    * that separates Poisson-like steady streams (Fano ≈ 1) from
    * bursty/clumped ones (Fano >> 1) and from quota-smoothed ones
    * (Fano < 1): the first check before alert thresholds or capacity
    * plans assume independence. Days the stream was silent COUNT AS
    * ZEROS — the grid is the full observed calendar crossed with the
    * type set, because skipping silent days biases the variance down
    * exactly when the stream is burstiest.
    *
    * Exactness: Fano = (D·Σx² − (Σx)²) / (D·Σx) in pure BIGINT ppm —
    * no float moment anywhere. Scale shape: raw rows collapse once to
    * the (type, day) count frame (map-side combined); the grid is
    * #days × #types — calendar-bounded — so the zero-fill left join
    * broadcasts. */
  def overdispersion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.util.Fence.lineage)
    val days = counts.select(col("day")).distinct()
    val types = counts.select(col("event_type")).distinct()
    val grid = days.crossJoin(broadcast(types))
    grid.join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), coalesce(col("n"), lit(0L)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).cast("long").as("total"),
        sum(col("x") * col("x")).cast("long").as("sxx"))
      .select(col("event_type"), col("n_days"), col("total"),
        expr("total * 1000 div n_days").as("mean_milli"),
        expr("n_days * sxx - total * total").as("var_num"),
        expr("(n_days * sxx - total * total) * 1000000 div nullif(n_days * total, 0)")
          .as("fano_ppm"))
      .orderBy(col("event_type"))
  }

  val overdispersionSql: String =
    """WITH c AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       grid AS (
         SELECT t.event_type, d.day
         FROM (SELECT DISTINCT day FROM c) d
         CROSS JOIN (SELECT DISTINCT event_type FROM c) t),
       x AS (
         SELECT g.event_type, coalesce(c.n, 0) AS x
         FROM grid g LEFT JOIN c
           ON c.event_type = g.event_type AND c.day = g.day),
       m AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS total,
           CAST(sum(x * x) AS BIGINT) AS sxx
         FROM x GROUP BY event_type)
       SELECT event_type, n_days, total,
         CAST(total * 1000 // n_days AS BIGINT) AS mean_milli,
         CAST(n_days * sxx - total * total AS BIGINT) AS var_num,
         CAST((n_days * sxx - total * total) * 1000000
           // nullif(n_days * total, 0) AS BIGINT) AS fano_ppm
       FROM m ORDER BY event_type"""

  /** Single-changepoint detection on each type's daily count series —
    * binary segmentation's first step (the CUSUM family's offline
    * sibling): the split day k maximizing the between-segment
    * variance reduction gain(k) = S₁²/n₁ + S₂²/n₂ − S²/n, i.e. "did
    * this stream's level shift, and when?" — the question a drift
    * alarm ([[cusumDrift]]) hands to a postmortem. The gain is
    * computed as ONE exact non-negative rational
    * (S₁²n₂ + S₂²n₁)·n − S²·n₁n₂ over n₁n₂n (≥ 0 by Cauchy-Schwarz),
    * floored to milli only once; the argmax is a struct-max with an
    * earliest-day tie-break, identical lexicographic semantics in
    * both engines.
    *
    * Scale shape: raw rows collapse once to the (type, day) frame;
    * the prefix sums and the candidate scan are windows over the
    * calendar-bounded per-type series; the argmax partial-aggregates.
    * Zero-activity days are genuine zeros of the grid (same
    * [[overdispersion]] rule — a gap IS evidence of a level shift). */
  def changepointDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.util.Fence.lineage)
    val days = counts.select(col("day")).distinct()
    val types = counts.select(col("event_type")).distinct()
    val daily = days.crossJoin(broadcast(types))
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("x"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    daily
      .withColumn("n1", row_number().over(wOrd).cast("long"))
      .withColumn("s1", sum(col("x")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s", sum(col("x")).over(wAll))
      .filter(col("n1") < col("n"))
      .select(col("event_type"), col("day"), col("n1"), col("s1"),
        col("n"), col("s"),
        expr("""((s1 * s1 * (n - n1) + (s - s1) * (s - s1) * n1) * n
          - s * s * n1 * (n - n1)) * 1000
          div (n1 * (n - n1) * n)""").as("gain_milli"))
      .groupBy(col("event_type"))
      .agg(max(struct(col("gain_milli"), (-col("day")).as("neg_day"),
        col("n1"), col("s1"), col("n"), col("s"))).as("m"))
      .select(col("event_type"),
        (-col("m")("neg_day")).cast("long").as("split_day"),
        col("m")("n").cast("long").as("n_days"),
        col("m")("n1").cast("long").as("n_left"),
        col("m")("gain_milli").cast("long").as("gain_milli"),
        expr("m.s1 * 1000 div m.n1").as("mean_left_milli"),
        expr("(m.s - m.s1) * 1000 div (m.n - m.n1)").as("mean_right_milli"))
      .orderBy(col("event_type"))
  }

  val changepointDailySql: String =
    """WITH c AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       grid AS (
         SELECT t.event_type, d.day, coalesce(c.n, 0) AS x
         FROM (SELECT DISTINCT day FROM c) d
         CROSS JOIN (SELECT DISTINCT event_type FROM c) t
         LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
       pre AS (
         SELECT event_type, day,
           CAST(row_number() OVER w AS BIGINT) AS n1,
           sum(x) OVER w AS s1,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           sum(x) OVER (PARTITION BY event_type) AS s
         FROM grid
         WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       cand AS (
         SELECT event_type, day, n1, s1, n, s,
           CAST(((s1 * s1 * (n - n1) + (s - s1) * (s - s1) * n1) * n
             - s * s * n1 * (n - n1)) * 1000
             // (n1 * (n - n1) * n) AS BIGINT) AS gain_milli
         FROM pre WHERE n1 < n),
       am AS (
         SELECT event_type,
           max(struct_pack(gain_milli := gain_milli, neg_day := -day,
             n1 := n1, s1 := s1, n := n, s := s)) AS m
         FROM cand GROUP BY event_type)
       SELECT event_type,
         CAST(-(m.neg_day) AS BIGINT) AS split_day,
         CAST(m.n AS BIGINT) AS n_days,
         CAST(m.n1 AS BIGINT) AS n_left,
         CAST(m.gain_milli AS BIGINT) AS gain_milli,
         CAST(m.s1 * 1000 // m.n1 AS BIGINT) AS mean_left_milli,
         CAST((m.s - m.s1) * 1000 // (m.n - m.n1) AS BIGINT)
           AS mean_right_milli
       FROM am ORDER BY event_type"""

  /** Kaplan-Meier survival curves per experiment arm — retention
    * with CENSORING done right: a user's lifetime is first→last
    * active day, and users still active in the corpus' final week
    * are censored (they exit the risk set without counting as
    * churn) — the estimator every "did the feature improve
    * retention" readout needs, because naive churn rates undercount
    * exactly the long-lived users an experiment hopes to create
    * (Kaplan & Meier, JASA 1958). Survival folds as the integer
    * recurrence s ← s·(n−d) div n in ppm — deterministic floor at
    * each step, the [[ewmaSmooth]]/[[cusumDrift]] convention — so
    * the oracle replays it exactly as a recursive CTE.
    *
    * Scale shape: events collapse once per user (map-side
    * combined), the duration histogram is (arms × ≤#days) rows, and
    * the fold runs per arm over that bounded sorted array — the
    * calendar bound asserted in-plan by [[boundedSeries]]; the
    * corpus horizon is a 1-row broadcast, never a driver probe. */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame =
    kaplanMeierOf(Tables.events(spark, dir))

  private[graft] def kaplanMeierOf(events: DataFrame): DataFrame = {
    import graft.util.Hashing
    val users = events
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .withColumn("arm",
        Hashing.phash(col("user_id").cast("string"), "ab_") % 2L)
      .transform(graft.util.Fence.lineage) // horizon agg + hist both read it
    val horizon = users.agg(max(col("last_day")).as("m"))
    val hist = users.crossJoin(broadcast(horizon))
      .select(col("arm"), (col("last_day") - col("first_day")).as("t"),
        when(col("last_day") <= col("m") - 8L, 1L).otherwise(0L).as("ev"))
      .groupBy(col("arm"), col("t"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
    val acc0 = struct(
      array().cast(
        "array<struct<t:bigint,n_risk:bigint,d:bigint,c:bigint,s:bigint>>")
        .as("arr"),
      lit(1000000L).as("s"), lit(0L).as("rem"))
    hist.groupBy(col("arm"))
      .agg(boundedSeries(
          array_sort(collect_list(struct(col("t"), col("d"), col("c")))),
          "kaplanMeier").as("ds"),
        sum(col("d") + col("c")).as("total"))
      .withColumn("st", aggregate(col("ds"),
        struct(acc0.getField("arr").as("arr"), acc0.getField("s").as("s"),
          col("total").as("rem")),
        (acc, r) => {
          val nRisk = acc.getField("rem")
          // exact integral divide: x - (x mod n) is divisible by n, and
          // double division of exactly-divisible longs is exact below
          // 2^53 (s <= 1e6, so safe to ~9e9 users at risk; past that
          // the rung is DECIMAL intermediates)
          val x = acc.getField("s") * (nRisk - r.getField("d"))
          val sFloor = ((x - pmod(x, nRisk)) / nRisk).cast("long")
          struct(
            concat(acc.getField("arr"), array(struct(
              r.getField("t").as("t"), nRisk.as("n_risk"),
              r.getField("d").as("d"), r.getField("c").as("c"),
              sFloor.as("s")))).as("arr"),
            sFloor.as("s"),
            (acc.getField("rem") - r.getField("d") - r.getField("c"))
              .as("rem"))
        }))
      .select(col("arm"), explode(col("st.arr")).as("r"))
      .select(col("arm"), col("r.t").as("t_days"),
        col("r.n_risk").as("n_risk"), col("r.d").as("d_churned"),
        col("r.c").as("c_censored"), col("r.s").as("surv_ppm"))
      .orderBy(col("arm"), col("t_days"))
  }

  val kaplanMeierSql: String = {
    import graft.util.Hashing
    s"""WITH RECURSIVE u AS (
         SELECT user_id,
           min(CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400)
             AS BIGINT)) AS first_day,
           max(CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400)
             AS BIGINT)) AS last_day
         FROM events GROUP BY user_id),
       hz AS (SELECT max(last_day) AS m FROM u),
       lab AS (
         SELECT ${Hashing.phashSql("CAST(user_id AS VARCHAR)", "ab_")} % 2
             AS arm,
           last_day - first_day AS t,
           CASE WHEN last_day <= hz.m - 8 THEN 1 ELSE 0 END AS ev
         FROM u CROSS JOIN hz),
       h AS (
         SELECT arm, t, CAST(sum(ev) AS BIGINT) AS d,
           CAST(sum(1 - ev) AS BIGINT) AS c
         FROM lab GROUP BY arm, t),
       i AS (
         SELECT arm, t, d, c,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(sum(d + c) OVER (PARTITION BY arm) AS BIGINT)
             - CAST(coalesce(sum(d + c) OVER (PARTITION BY arm ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
         FROM h WINDOW w AS (PARTITION BY arm ORDER BY t)),
       r AS (
         SELECT arm, t, d, c, rn, n_risk,
           1000000 * (n_risk - d) // n_risk AS s
         FROM i WHERE rn = 1
         UNION ALL
         SELECT i.arm, i.t, i.d, i.c, i.rn, i.n_risk,
           r.s * (i.n_risk - i.d) // i.n_risk AS s
         FROM r JOIN i ON i.arm = r.arm AND i.rn = r.rn + 1)
       SELECT arm, t AS t_days, n_risk, d AS d_churned, c AS c_censored,
         CAST(s AS BIGINT) AS surv_ppm
       FROM r ORDER BY arm, t_days"""
  }

  private val TS_OFF = 1000000000000000L // positive-shift for slope div

  /** Theil-Sen robust trend per event type — the median of ALL
    * pairwise daily-revenue slopes (Theil '50 / Sen JASA'68): the
    * trend estimate one outlier day cannot move, where [[trendSlopes]]'
    * OLS bends toward it (breakdown point 29% vs 0%). Slopes are
    * exact integer micro-cents/day via the positive-shift floor
    * division `(Δx·10⁶ + OFF·Δd) div Δd − OFF`: both engines
    * truncate integer division toward zero (verified), so a negative
    * slope would round toward zero instead of flooring — the shift
    * keeps every quotient a true floor, so the median is the exact
    * lower median of floored slopes (OFF = 10¹⁵ holds to ~10⁹
    * cents/day deltas; past that the shift widens to DECIMAL). The
    * median is the lower median with a (slope, day-pair) total
    * order.
    *
    * Scale shape: raw rows collapse once to the (type, day) frame
    * (calendar-bounded); the pair generator is a self-join on that
    * BOUNDED frame — ≤ #days²/2 pairs per type, never row-sized —
    * and the median window sorts only the pair frame. */
  def theilSenTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(sum(Exact.cents(col("value"))).cast("long").as("x"))
      .transform(graft.util.Fence.lineage)
    val a = daily.select(col("event_type"), col("day").as("d1"), col("x").as("x1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("x").as("x2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
      .select(col("event_type"), col("d1"), col("d2"),
        expr(s"((x2 - x1) * 1000000 + $TS_OFF * (d2 - d1)) div (d2 - d1)"
          + s" - $TS_OFF").as("slope_micro"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_micro"), col("d1"), col("d2"))
    val wAll = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(wAll).cast("long"))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        col("slope_micro").as("theil_slope_micro"))
      .orderBy(col("event_type"))
  }

  val theilSenTrendSql: String =
    s"""WITH d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       p AS (
         SELECT a.event_type, a.day AS d1, b.day AS d2,
           ((b.x - a.x) * 1000000 + $TS_OFF * (b.day - a.day))
             // (b.day - a.day) - $TS_OFF AS slope_micro
         FROM d a JOIN d b
           ON a.event_type = b.event_type AND a.day < b.day),
       r AS (
         SELECT event_type, slope_micro,
           CAST(row_number() OVER (PARTITION BY event_type
             ORDER BY slope_micro, d1, d2) AS BIGINT) AS rn,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
         FROM p)
       SELECT event_type, n_pairs,
         CAST(slope_micro AS BIGINT) AS theil_slope_micro
       FROM r WHERE rn = (n_pairs + 1) // 2
       ORDER BY event_type"""

  /** Weekday-adjusted (deseasonalized) trend — [[trendSlopes]]' OLS
    * rerun on residuals after removing each type's weekday mean: a
    * revenue series with a strong weekly cycle shows a spurious OLS
    * slope whenever the observation window starts and ends on
    * different weekday phases; subtracting the per-(type, weekday)
    * mean first is the standard seasonal adjustment. Residuals are
    * exact integer milli-cents (the weekday mean floors once), and
    * the slope ships as the exact numerator/denominator pair PLUS a
    * truncating micro quotient — integer division truncates toward
    * zero IDENTICALLY on both engines (verified; CLAUDE.md), so the
    * negative-capable numerator divides directly; the exact
    * num/den pair rides alongside for any consumer that needs the
    * unrounded rational.
    *
    * Scale shape: raw rows collapse once to the (type, day) frame;
    * weekday means are a ≤ types×7 groupBy broadcast back; the
    * moment sums for the slope aggregate the calendar-bounded daily
    * frame. */
  def deseasonalizedTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(sum(Exact.cents(col("value"))).cast("long").as("x"))
      .transform(graft.util.Fence.lineage)
    val wd = daily
      .withColumn("weekday", pmod(col("day"), lit(7L)))
      .groupBy(col("event_type"), col("weekday"))
      .agg(expr("sum(x) * 1000 div count(1)").as("wd_mean_milli"))
    val wMin = Window.partitionBy(col("event_type"))
    daily
      .withColumn("weekday", pmod(col("day"), lit(7L)))
      .join(broadcast(wd), Seq("event_type", "weekday"))
      .withColumn("day0", col("day") - min(col("day")).over(wMin))
      .select(col("event_type"), col("day0"),
        (col("x") * 1000L - col("wd_mean_milli")).as("r"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("day0")).as("sd"), sum(col("r")).as("sr"),
        sum(col("day0") * col("r")).as("sdr"),
        sum(col("day0") * col("day0")).as("sdd"))
      .select(col("event_type"), col("n_days"),
        expr("n_days * sdr - sd * sr").as("slope_num"),
        expr("n_days * sdd - sd * sd").as("slope_den"),
        expr("(n_days * sdr - sd * sr) * 1000"
          + " div nullif(n_days * sdd - sd * sd, 0)")
          .as("slope_microcents_per_day"))
      .orderBy(col("event_type"))
  }

  val deseasonalizedTrendSql: String =
    s"""WITH d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       wd AS (
         SELECT event_type, day % 7 AS weekday,
           CAST(sum(x) * 1000 // count(*) AS BIGINT) AS wd_mean_milli
         FROM d GROUP BY 1, 2),
       res AS (
         SELECT d.event_type,
           d.day - min(d.day) OVER (PARTITION BY d.event_type) AS day0,
           d.x * 1000 - wd.wd_mean_milli AS r
         FROM d JOIN wd
           ON wd.event_type = d.event_type AND wd.weekday = d.day % 7),
       g AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(day0) AS BIGINT) AS sd, CAST(sum(r) AS BIGINT) AS sr,
           CAST(sum(day0 * r) AS BIGINT) AS sdr,
           CAST(sum(day0 * day0) AS BIGINT) AS sdd
         FROM res GROUP BY event_type)
       SELECT event_type, n_days,
         CAST(n_days * sdr - sd * sr AS BIGINT) AS slope_num,
         CAST(n_days * sdd - sd * sd AS BIGINT) AS slope_den,
         CAST((n_days * sdr - sd * sr) * 1000
           // nullif(n_days * sdd - sd * sd, 0) AS BIGINT)
           AS slope_microcents_per_day
       FROM g ORDER BY event_type"""

  /** Seasonality strength per type — STL's F_s statistic in exact
    * integers: 1 − Var(residual)/Var(series) over the daily cents
    * series, where residual = day's cents minus its weekday mean
    * (the same adjustment [[deseasonalizedTrend]] regresses on).
    * ~0 ppm means the weekly cycle explains nothing; near 10⁶ means
    * the series IS its weekday profile — the triage number deciding
    * whether forecasts/anomaly baselines must be weekday-conditioned.
    * Both variances share the same n, so the ratio needs only the
    * two integer variance NUMERATORS — which are first REDUCED by a
    * common data-derived scale s = max(1, varO div 10⁹) so the ×10⁶
    * ppm multiply can never overflow however large the series
    * (reduction is identical on both engines, so the oracle agrees
    * bit-for-bit); clamped at 0 (floor cross-talk can nick a
    * pure-noise series a hair negative).
    *
    * Scale shape: identical to deseasonalized_trend — one (type,
    * day) collapse, a ≤types×7 broadcast of weekday means, one
    * moment aggregate over the calendar-bounded frame. Moments run
    * in whole DOLLARS (cents div 100): n·Σx² stays in BIGINT to
    * ~10⁸ dollars/day across a year; past that the moments widen to
    * DECIMAL. */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(expr("sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) div 100")
        .as("x"))
      .transform(graft.util.Fence.lineage)
    val wd = daily
      .withColumn("weekday", pmod(col("day"), lit(7L)))
      .groupBy(col("event_type"), col("weekday"))
      .agg(expr("sum(x) div count(1)").as("wd_mean"))
    daily
      .withColumn("weekday", pmod(col("day"), lit(7L)))
      .join(broadcast(wd), Seq("event_type", "weekday"))
      .select(col("event_type"), col("x"),
        (col("x") - col("wd_mean")).as("r"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("r")).as("sr"), sum(col("r") * col("r")).as("srr"))
      .select(col("event_type"), col("n_days"),
        expr("n_days * sxx - sx * sx").as("var_o_num"),
        expr("n_days * srr - sr * sr").as("var_r_num"))
      .withColumn("s",
        greatest(lit(1L), expr("var_o_num div 1000000000")))
      .select(col("event_type"), col("n_days"), col("var_o_num"),
        col("var_r_num"),
        greatest(lit(0L),
          expr("""(var_o_num div s - var_r_num div s) * 1000000
            div nullif(var_o_num div s, 0)"""))
          .as("strength_ppm"))
      .orderBy(col("event_type"))
  }

  val seasonalStrengthSql: String =
    """WITH d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100
             AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       wd AS (
         SELECT event_type, day % 7 AS weekday,
           CAST(sum(x) // count(*) AS BIGINT) AS wd_mean
         FROM d GROUP BY 1, 2),
       res AS (
         SELECT d.event_type, d.x, d.x - wd.wd_mean AS r
         FROM d JOIN wd
           ON wd.event_type = d.event_type AND wd.weekday = d.day % 7),
       g AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(r) AS BIGINT) AS sr, CAST(sum(r * r) AS BIGINT) AS srr
         FROM res GROUP BY event_type),
       v AS (
         SELECT event_type, n_days,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS var_o_num,
           CAST(n_days * srr - sr * sr AS BIGINT) AS var_r_num
         FROM g),
       sc AS (
         SELECT *, greatest(1, var_o_num // 1000000000) AS s FROM v)
       SELECT event_type, n_days, var_o_num, var_r_num,
         CAST(greatest(0, (var_o_num // s - var_r_num // s) * 1000000
           // nullif(var_o_num // s, 0)) AS BIGINT) AS strength_ppm
       FROM sc ORDER BY event_type"""

  /** Daily autocorrelation at lags 1 and 7 — the periodicity
    * detector that justifies (or refutes) weekday conditioning
    * before [[seasonalStrength]] assumes a 7-day cycle: r_k =
    * lag-k Pearson over the (x_t, x_{t+k}) pairs of each type's
    * daily dollar series. High r_7 with low r_1 is a weekly cycle;
    * high r_1 is momentum/level-shift; both near zero says the
    * daily series is noise and any seasonal model is overfit.
    * Moments are exact BIGINTs over whole dollars; the quotient
    * uses the [[dailyCorr]] convention — `sqrt(dx)·sqrt(dy)` double
    * normalization, truncated to milli, zero-variance pairs nulled.
    *
    * Scale shape: one (type, day) collapse (lineage-fenced — both
    * lag arms read it), then an equi-join of the bounded daily frame
    * to itself on (type, day+k) per lag — ≤ #days rows per type per
    * lag, never row-sized. */
  def autocorrDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .agg(expr("sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) div 100")
        .as("x"))
      .transform(graft.util.Fence.lineage)
    val lags = Seq(1L, 7L).map { k =>
      val a = daily.select(col("event_type"), col("day"), col("x"))
      val b = daily.select(col("event_type"),
        (col("day") - k).as("day"), col("x").as("y"))
      a.join(b, Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), lit(k).as("lag"), col("n_pairs"),
          expr("n_pairs * sxy - sx * sy").as("acf_num"),
          expr("""CAST(floor(1000.0 * CAST(n_pairs * sxy - sx * sy AS DOUBLE)
            / nullif(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                   * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0.0))
            AS BIGINT)""").as("acf_milli"))
    }
    lags.reduce(_ unionByName _)
      .orderBy(col("event_type"), col("lag"))
  }

  val autocorrDailySql: String = {
    def leg(k: Long): String =
      s"""SELECT a.event_type, CAST($k AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) * sum(a.x * b.x) - sum(a.x) * sum(b.x) AS BIGINT)
             AS acf_num,
           CAST(floor(1000.0 * CAST(count(*) * sum(a.x * b.x)
               - sum(a.x) * sum(b.x) AS DOUBLE)
             / nullif(sqrt(CAST(count(*) * sum(a.x * a.x)
                 - sum(a.x) * sum(a.x) AS DOUBLE))
               * sqrt(CAST(count(*) * sum(b.x * b.x)
                 - sum(b.x) * sum(b.x) AS DOUBLE)), 0.0)) AS BIGINT)
             AS acf_milli
         FROM d a JOIN d b
           ON b.event_type = a.event_type AND b.day = a.day + $k
         GROUP BY a.event_type"""
    s"""WITH d AS (
         SELECT event_type,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100
             AS BIGINT) AS x
         FROM events GROUP BY 1, 2)
       ${leg(1)}
       UNION ALL
       ${leg(7)}
       ORDER BY event_type, lag"""
  }
}
