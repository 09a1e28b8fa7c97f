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

  // ---- Robust outliers: median absolute deviation -------------------

  /** Robust per-type outlier detection: median + MAD (median absolute
    * deviation) with the classic |x − med| > 3·MAD flag — the outlier
    * gate that, unlike a mean/stddev z-score, is not itself dragged by
    * the outliers it hunts. Both medians are the discrete
    * lower-median (`cum·2 ≥ n` integer cross-multiplication) over
    * exact integer cents, so the whole operator is integer arithmetic.
    *
    * Scale shape: the raw stream is scanned ONCE into the per-type
    * cents histogram; the deviation histogram is derived FROM the
    * value histogram (re-keying buckets by |b − med| and summing
    * counts — no second pass over rows), and every window runs over
    * histograms. Medians/MADs broadcast back as tiny per-type frames. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        graft.util.Exact.cents(col("value")).as("b"))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))
      // referenced by the median pass, the deviation re-key, and the
      // outlier rollup
      .transform(graft.util.Fence.lineage)
    val wv = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = h
      .withColumn("cum", sum(col("c")).over(wv))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 2 >= col("n"), col("b"))).as("med"))
    val dev = h.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), abs(col("b") - col("med")).as("d"))
      .agg(sum(col("c")).as("dc"))
    val wd = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev
      .withColumn("cum", sum(col("dc")).over(wd))
      .withColumn("n", sum(col("dc")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("d"))).as("mad"))
    h.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_events"),
        max(col("med")).cast("long").as("median_cents"),
        max(col("mad")).cast("long").as("mad_cents"),
        sum(when(abs(col("b") - col("med")) > col("mad") * 3, col("c"))
          .otherwise(0L)).cast("long").as("n_outliers"))
      .orderBy(col("event_type"))
  }

  val madOutliersSql: String =
    s"""WITH h AS (
         SELECT event_type, ${graft.util.Exact.centsSql("value")} AS b,
           count(*) AS c
         FROM events WHERE value IS NOT NULL
         GROUP BY event_type, ${graft.util.Exact.centsSql("value")}),
       cumv AS (
         SELECT event_type, b, c,
           sum(c) OVER (PARTITION BY event_type ORDER BY b
             ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
         FROM h),
       med AS (
         SELECT event_type, max(n) AS n,
           min(CASE WHEN cum * 2 >= n THEN b END) AS med
         FROM cumv GROUP BY event_type),
       dev AS (
         SELECT h.event_type, abs(h.b - m.med) AS d, sum(h.c) AS dc
         FROM h JOIN med m USING (event_type)
         GROUP BY h.event_type, abs(h.b - m.med)),
       cumd AS (
         SELECT event_type, d, dc,
           sum(dc) OVER (PARTITION BY event_type ORDER BY d
             ROWS UNBOUNDED PRECEDING) AS cum,
           sum(dc) OVER (PARTITION BY event_type) AS n
         FROM dev),
       mad AS (
         SELECT event_type,
           min(CASE WHEN cum * 2 >= n THEN d END) AS mad
         FROM cumd GROUP BY event_type)
       SELECT h.event_type, CAST(max(m.n) AS BIGINT) AS n_events,
         CAST(max(m.med) AS BIGINT) AS median_cents,
         CAST(max(a.mad) AS BIGINT) AS mad_cents,
         CAST(sum(CASE WHEN abs(h.b - m.med) > a.mad * 3 THEN h.c ELSE 0 END)
           AS BIGINT) AS n_outliers
       FROM h JOIN med m USING (event_type) JOIN mad a USING (event_type)
       GROUP BY h.event_type ORDER BY h.event_type"""

  /** Exact inter-arrival latency percentiles (p50/p90/p99) per event
    * type — the SLO table for arrival cadence, computed with the
    * repo's histogram-selection pattern (value_quantiles /
    * quality_gate): gaps come from ONE lag window over the total
    * (ts, event_id) user-timeline order, collapse to a (type, gap_s)
    * histogram, and each percentile is the smallest gap whose
    * cumulative count clears the integer cross-multiplied rank cut —
    * exact selection, no interpolation, bit-identical cross-engine.
    *
    * Scale shape: the cumulative window sorts DISTINCT gap seconds
    * per type (bounded by the histogram), never raw gap rows; the
    * output is |event_types| rows. */
  def latencyPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val wlag = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wlag))
      .filter(col("gap_us").isNotNull)
      .select(col("event_type"), expr("gap_us div 1000000").as("gap_s"))
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("gap_s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy(col("event_type"))
    gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(wall))
      .groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_gaps"),
        min(when(col("cum") * 2 >= col("n"), col("gap_s"))).cast("long").as("p50_s"),
        min(when(col("cum") * 10 >= col("n") * 9, col("gap_s"))).cast("long").as("p90_s"),
        min(when(col("cum") * 100 >= col("n") * 99, col("gap_s"))).cast("long").as("p99_s"),
        max(col("gap_s")).cast("long").as("max_s"))
      .orderBy(col("event_type"))
  }

  val latencyPercentilesSql: String =
    """WITH l AS (
         SELECT event_type,
           (epoch_us(CAST(ts AS TIMESTAMP)) -
             lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id)) // 1000000 AS gap_s
         FROM events),
       h AS (
         SELECT event_type, gap_s, count(*) AS c
         FROM l WHERE gap_s IS NOT NULL GROUP BY event_type, gap_s),
       r AS (
         SELECT event_type, gap_s, c,
           sum(c) OVER (PARTITION BY event_type ORDER BY gap_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
         FROM h)
       SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
         CAST(min(CASE WHEN cum * 2 >= n THEN gap_s END) AS BIGINT) AS p50_s,
         CAST(min(CASE WHEN cum * 10 >= n * 9 THEN gap_s END) AS BIGINT) AS p90_s,
         CAST(min(CASE WHEN cum * 100 >= n * 99 THEN gap_s END) AS BIGINT) AS p99_s,
         CAST(max(gap_s) AS BIGINT) AS max_s
       FROM r GROUP BY event_type ORDER BY event_type"""

  /** Winsorized robust statistics — the outlier-clipped mean a
    * metrics pipeline reports next to the raw mean (one fat-finger
    * order must not move the dashboard): per event type, values clip
    * to the exact [p02, p98] percentile band (histogram-selection
    * cuts, the repo's [[valueQuantiles]] pattern, on exact cents) and
    * both means are emitted in integer micro-cents. The clipped-mass
    * counts certify how much each tail lost.
    *
    * Scale shape: one (type, cents) histogram groupBy; cumulative
    * windows over DISTINCT cent values; cuts broadcast back onto the
    * HISTOGRAM (not the raw rows) for the clipped re-aggregate —
    * raw events are scanned once. */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy(col("event_type"))
    val h = Tables.events(spark, dir)
      .select(col("event_type"), graft.util.Exact.cents(col("value")).as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(wall))
      .transform(graft.util.Fence.lineage)
    val cuts = h.groupBy(col("event_type"))
      .agg(min(when(col("cum") * 50 >= col("n"), col("cents"))).as("lo"),
        min(when(col("cum") * 50 >= col("n") * 49, col("cents"))).as("hi"))
    h.join(broadcast(cuts), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_events"),
        max(col("lo")).cast("long").as("p02_cents"),
        max(col("hi")).cast("long").as("p98_cents"),
        sum(col("cents") * col("c")).as("raw_sum"),
        sum(greatest(least(col("cents"), col("hi")), col("lo")) * col("c"))
          .as("win_sum"),
        sum(when(col("cents") < col("lo"), col("c")).otherwise(0L)).cast("long")
          .as("n_clipped_low"),
        sum(when(col("cents") > col("hi"), col("c")).otherwise(0L)).cast("long")
          .as("n_clipped_high"))
      .select(col("event_type"), col("n_events"), col("p02_cents"),
        col("p98_cents"),
        expr("raw_sum * 1000000 div n_events").as("raw_mean_microcents"),
        expr("win_sum * 1000000 div n_events").as("win_mean_microcents"),
        col("n_clipped_low"), col("n_clipped_high"))
      .orderBy(col("event_type"))
  }

  val winsorizedStatsSql: String =
    """WITH d AS (
         SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         FROM events),
       h AS (
         SELECT event_type, cents, count(*) AS c
         FROM d GROUP BY event_type, cents),
       r AS (
         SELECT event_type, cents, c,
           sum(c) OVER (PARTITION BY event_type ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
         FROM h),
       cuts AS (
         SELECT event_type,
           min(CASE WHEN cum * 50 >= n THEN cents END) AS lo,
           min(CASE WHEN cum * 50 >= n * 49 THEN cents END) AS hi
         FROM r GROUP BY event_type),
       g AS (
         SELECT r.event_type,
           CAST(max(r.n) AS BIGINT) AS n_events,
           CAST(max(ct.lo) AS BIGINT) AS p02_cents,
           CAST(max(ct.hi) AS BIGINT) AS p98_cents,
           CAST(sum(r.cents * r.c) AS BIGINT) AS raw_sum,
           CAST(sum(greatest(least(r.cents, ct.hi), ct.lo) * r.c) AS BIGINT)
             AS win_sum,
           CAST(sum(CASE WHEN r.cents < ct.lo THEN r.c ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(sum(CASE WHEN r.cents > ct.hi THEN r.c ELSE 0 END) AS BIGINT)
             AS n_clipped_high
         FROM r JOIN cuts ct USING (event_type)
         GROUP BY r.event_type)
       SELECT event_type, n_events, p02_cents, p98_cents,
         CAST(raw_sum * 1000000 // n_events AS BIGINT) AS raw_mean_microcents,
         CAST(win_sum * 1000000 // n_events AS BIGINT) AS win_mean_microcents,
         n_clipped_low, n_clipped_high
       FROM g ORDER BY event_type"""

  /** WEIGHTED percentiles — where the unweighted median answers
    * "what does the typical DOCUMENT look like", the token-weighted
    * median answers "what does the typical TOKEN's document look
    * like" (what a training run actually samples: long docs carry
    * more of the batch). Per source: the doc length at which half,
    * and 90%, of the source's TOKEN mass sits — the histogram-
    * selection pattern with weight len·count instead of count, so
    * the cumulative window still runs over DISTINCT lengths and the
    * cuts stay exact integer cross-multiplications.
    *
    * Scale shape: identical to [[latencyPercentiles]] — one
    * histogram groupBy, windows over the bounded distinct-length
    * frame, |sources| output rows. */
  def weightedMedianLen(spark: SparkSession, dir: String): DataFrame = {
    val wcum = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy(col("source"))
    Tables.documents(spark, dir)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("len"))
      .groupBy(col("source"), col("len"))
      .agg(count(lit(1)).as("c"))
      .withColumn("tw", col("len") * col("c"))
      .withColumn("cumw", sum(col("tw")).over(wcum))
      .withColumn("totw", sum(col("tw")).over(wall))
      .withColumn("totd", sum(col("c")).over(wall))
      .groupBy(col("source"))
      .agg(max(col("totd")).cast("long").as("n_docs"),
        max(col("totw")).cast("long").as("total_tokens"),
        min(when(col("cumw") * 2 >= col("totw"), col("len"))).cast("long")
          .as("wmedian_len"),
        min(when(col("cumw") * 10 >= col("totw") * 9, col("len"))).cast("long")
          .as("wp90_len"))
      .orderBy(col("source"))
  }

  val weightedMedianLenSql: String =
    s"""WITH d AS (
         SELECT source,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS len
         FROM documents),
       h AS (
         SELECT source, len, count(*) AS c FROM d GROUP BY source, len),
       r AS (
         SELECT source, len, c, len * c AS tw,
           sum(len * c) OVER (PARTITION BY source ORDER BY len
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
           sum(len * c) OVER (PARTITION BY source) AS totw,
           sum(c) OVER (PARTITION BY source) AS totd
         FROM h)
       SELECT source, CAST(max(totd) AS BIGINT) AS n_docs,
         CAST(max(totw) AS BIGINT) AS total_tokens,
         CAST(min(CASE WHEN cumw * 2 >= totw THEN len END) AS BIGINT)
           AS wmedian_len,
         CAST(min(CASE WHEN cumw * 10 >= totw * 9 THEN len END) AS BIGINT)
           AS wp90_len
       FROM r GROUP BY source ORDER BY source"""

  /** Calibration bins — the reliability-diagram table behind every
    * "is this score calibrated?" check: events bucket into 10
    * equal-population bands of their value (the "score"), and each
    * band reports its observed purchase rate in exact ppm. A
    * well-calibrated score shows rates monotone in the band index;
    * this is the eval every ranking/propensity model ships with.
    * Band edges are EXACT equal-population cuts via the
    * histogram-selection pattern: the cumulative window walks the
    * DISTINCT cents values (tied scores are inseparable and stay in
    * one band — the correct discrete behavior), never raw rows.
    *
    * Scale shape: one (cents) histogram groupBy with map-side
    * combine, a cumulative window over the bounded distinct-value
    * frame, a 1-row total broadcast, and a ≤10-row final rollup. */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Exact
    val hist = Tables.events(spark, dir)
      .select(Exact.cents(col("value")).as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("hit"))
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("hits"))
    val total = hist.agg(sum(col("n")).cast("long").as("n_total"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_before", coalesce(sum(col("n")).over(wCum), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("score_bin", expr("(cum_before * 10) div n_total"))
      .groupBy(col("score_bin"))
      .agg(sum(col("n")).cast("long").as("n_events"),
        sum(col("hits")).cast("long").as("n_purchases"),
        min(col("cents")).cast("long").as("lo_cents"),
        max(col("cents")).cast("long").as("hi_cents"),
        sum(col("cents") * col("n")).cast("long").as("sum_cents"))
      .select(col("score_bin"), col("n_events"), col("n_purchases"),
        expr("n_purchases * 1000000 div n_events").as("purchase_ppm"),
        col("lo_cents"), col("hi_cents"),
        expr("sum_cents * 1000 div n_events").as("mean_millicents"))
      .orderBy(col("score_bin"))
  }

  val calibrationBinsSql: String =
    """WITH h AS (
         SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           count(*) AS n,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hits
         FROM events GROUP BY cents),
       t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM h),
       c AS (
         SELECT cents, n, hits,
           coalesce(sum(n) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_before
         FROM h)
       SELECT CAST((cum_before * 10) // n_total AS BIGINT) AS score_bin,
         CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(hits) AS BIGINT) AS n_purchases,
         CAST(sum(hits) * 1000000 // sum(n) AS BIGINT) AS purchase_ppm,
         CAST(min(cents) AS BIGINT) AS lo_cents,
         CAST(max(cents) AS BIGINT) AS hi_cents,
         CAST(sum(cents * n) * 1000 // sum(n) AS BIGINT) AS mean_millicents
       FROM c CROSS JOIN t
       GROUP BY score_bin ORDER BY score_bin"""

  private val BOOT_B = 32
  // Poisson(1) pmf cumulative thresholds on the 1e6 grid:
  // P(X<=k) for k=0..6; a uniform draw h in [0,1e6) maps to the
  // weight w = #{thresholds <= h}
  private val POIS = Seq(367879L, 735758L, 919698L, 981011L,
    996340L, 999406L, 999917L)

  /** One-pass Poisson bootstrap CI for mean purchase value — the
    * big-data bootstrap (Chamandy et al., Google 2012): instead of B
    * resampling passes, each row draws B independent Poisson(1)
    * pseudo-counts from content hashes (deterministic, engine-
    * portable) and contributes w·x to resample b — all B=32 resample
    * means materialize from ONE scan, and the 2nd/31st order
    * statistics of the 32 means bracket a ~94% CI. THE way to put
    * error bars on any mean at 100 TB: no per-resample shuffle of
    * raw rows, just a 32-key groupBy that map-side combines to ≤B
    * rows per partition.
    *
    * Exactness: draws compare integer hashes against the fixed
    * Poisson cumulative grid; resample sums stay in BIGINT cents and
    * divide once to milli-cents. The explode input is a FOLDABLE
    * sequence literal, so the InferFiltersFromGenerate trap
    * (CLAUDE.md) does not apply. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.{Exact, Hashing}
    val x = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), Exact.cents(col("value")).as("cents"))
      .transform(graft.util.Fence.lineage) // point agg + 32-draw explode both read it
    val point = x.agg(count(lit(1)).cast("long").as("n_rows"),
      expr("sum(cents) * 1000 div count(1)").as("point_milli"))
    val weighted = x
      .select(col("event_id"), col("cents"),
        explode(expr(s"sequence(1, $BOOT_B)")).as("b"))
      .withColumn("h",
        Hashing.phash(concat(col("b").cast("string"), lit("_"),
          col("event_id").cast("string")), "boot_") % 1000000L)
      .withColumn("w",
        POIS.map(t => when(col("h") >= t, 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("b"))
      .agg(sum(col("w") * col("cents")).as("swx"), sum(col("w")).as("sw"))
      .select(col("b"), expr("swx * 1000 div nullif(sw, 0)").as("mean_milli"))
    // a zero-total-weight resample yields NULL mean_milli; pin NULLS
    // FIRST explicitly on BOTH engines (Spark's ascending default,
    // DuckDB's is NULLS LAST) so a freak all-zero draw can't silently
    // shift which rows land at ranks 2 and 31
    val ord = Window.orderBy(col("mean_milli").asc_nulls_first, col("b"))
    val ranked = weighted.withColumn("r", row_number().over(ord))
    ranked.agg(
        max(when(col("r") === 2, col("mean_milli"))).as("ci_lo_milli"),
        max(when(col("r") === BOOT_B - 1, col("mean_milli"))).as("ci_hi_milli"))
      .crossJoin(broadcast(point))
      .select(col("n_rows"), col("point_milli"),
        lit(BOOT_B.toLong).as("n_resamples"),
        col("ci_lo_milli").cast("long").as("ci_lo_milli"),
        col("ci_hi_milli").cast("long").as("ci_hi_milli"))
  }

  val bootstrapCiSql: String = {
    import graft.util.Hashing
    val wExpr = POIS.map(t => s"CASE WHEN h >= $t THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH x AS (
         SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'),
       pt AS (
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) * 1000 // count(*) AS BIGINT) AS point_milli
         FROM x),
       drawn AS (
         SELECT t.b, x.cents,
           ${Hashing.phashSql(
             "CAST(t.b AS VARCHAR) || '_' || CAST(x.event_id AS VARCHAR)",
             "boot_")} % 1000000 AS h
         FROM x CROSS JOIN range(1, ${BOOT_B + 1}) t(b)),
       means AS (
         SELECT b, CAST(sum(($wExpr) * cents) * 1000
             // nullif(sum($wExpr), 0) AS BIGINT) AS mean_milli
         FROM drawn GROUP BY b),
       ranked AS (
         SELECT mean_milli,
           row_number() OVER (ORDER BY mean_milli ASC NULLS FIRST, b) AS r
         FROM means)
       SELECT pt.n_rows, pt.point_milli,
         CAST($BOOT_B AS BIGINT) AS n_resamples,
         CAST(max(CASE WHEN r = 2 THEN mean_milli END) AS BIGINT)
           AS ci_lo_milli,
         CAST(max(CASE WHEN r = ${BOOT_B - 1} THEN mean_milli END) AS BIGINT)
           AS ci_hi_milli
       FROM ranked CROSS JOIN pt
       GROUP BY pt.n_rows, pt.point_milli"""
  }

  /** Mann-Whitney U rank-sum test between the two hash-split
    * experiment arms' purchase values — the nonparametric "is arm A's
    * value distribution shifted?" companion to ab_test_lift's
    * conversion z²: robust to the heavy-tailed revenue distributions
    * that break a t-test. Emits the EXACT U statistics (doubled, so
    * tie midranks stay integral) and the common-language effect size
    * U_A/(n_A·n_B) in ppm — everything a readout needs except the
    * normal approximation, which would cost a libm sqrt.
    *
    * Scale shape: raw purchases collapse once to the (cents, arm)
    * histogram; midranks come from ONE cumulative window over the
    * DISTINCT value frame (the histogram-selection machinery — never
    * a rank over raw rows); the final fold is a 1-row aggregate.
    * Doubled midranks: 2·midrank = 2·cum_before + cnt + 1, exact for
    * ties. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.{Exact, Hashing}
    val x = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(Exact.cents(col("value")).as("cents"),
        (Hashing.phash(col("user_id").cast("string"), "ab_") % 2L).as("arm"))
    val hist = x.groupBy(col("cents"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na_v"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nb_v"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_before",
        coalesce(sum(col("na_v") + col("nb_v")).over(wCum), lit(0L)))
      .agg(
        sum(col("na_v")).cast("long").as("n_a"),
        sum(col("nb_v")).cast("long").as("n_b"),
        sum(col("na_v") * (col("cum_before") * 2 + col("na_v")
          + col("nb_v") + 1)).cast("long").as("r_a2"))
      .select(col("n_a"), col("n_b"),
        expr("r_a2 - n_a * (n_a + 1)").as("u_a2"),
        expr("2 * n_a * n_b - (r_a2 - n_a * (n_a + 1))").as("u_b2"),
        expr("(r_a2 - n_a * (n_a + 1)) * 1000000 div (2 * n_a * n_b)")
          .as("auc_ppm"))
  }

  val mannWhitneySql: String = {
    import graft.util.Hashing
    s"""WITH x AS (
         SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           ${Hashing.phashSql("CAST(user_id AS VARCHAR)", "ab_")} % 2 AS arm
         FROM events WHERE event_type = 'purchase'),
       h AS (
         SELECT cents,
           sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na_v,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb_v
         FROM x GROUP BY cents),
       c AS (
         SELECT *, coalesce(sum(na_v + nb_v) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
         FROM h),
       g AS (
         SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
           CAST(sum(nb_v) AS BIGINT) AS n_b,
           CAST(sum(na_v * (cum_before * 2 + na_v + nb_v + 1)) AS BIGINT)
             AS r_a2
         FROM c)
       SELECT n_a, n_b,
         CAST(r_a2 - n_a * (n_a + 1) AS BIGINT) AS u_a2,
         CAST(2 * n_a * n_b - (r_a2 - n_a * (n_a + 1)) AS BIGINT) AS u_b2,
         CAST((r_a2 - n_a * (n_a + 1)) * 1000000 // (2 * n_a * n_b)
           AS BIGINT) AS auc_ppm
       FROM g"""
  }

  /** Quantile treatment effects — the distributional experiment
    * readout the mean lift hides: at each decile of the purchase-
    * value distribution, how far arm A's quantile sits above arm
    * B's (Athey & Imbens' heterogeneous-effect view): a lift
    * concentrated in q80-q90 with a flat median is a whale effect,
    * not a broad improvement, and ships a different decision. Each
    * arm's deciles are EXACT discrete lower-quantiles via the
    * histogram-selection pattern (cumulative window over DISTINCT
    * cents, integer cross-multiplied rank cuts — never a sort of
    * raw purchases); the one result row carries both arms' q10-q90
    * and their differences in exact cents.
    *
    * Scale shape: one (arm, cents) histogram groupBy (map-side
    * combined), one cumulative window per arm over distinct values,
    * two 1-row conditional-min aggregates joined by cross product
    * of broadcast singletons. */
  def quantileTreatmentEffect(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.{Exact, Hashing}
    val hist = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(Exact.cents(col("value")).as("cents"),
        (Hashing.phash(col("user_id").cast("string"), "ab_") % 2L).as("arm"))
      .groupBy(col("arm"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("arm"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("tot", sum(col("cnt")).over(wAll))
    def deciles(armVal: Long, pfx: String) = {
      val cs = (1 to 9).map(d =>
        min(when(col("cum") * 10 >= col("tot") * d, col("cents")))
          .cast("long").as(s"${pfx}q${d}0"))
      cum.filter(col("arm") === armVal).agg(cs.head, cs.tail: _*)
    }
    val outs = (1 to 9).flatMap(d => Seq(
      col(s"a_q${d}0"), col(s"b_q${d}0"),
      (col(s"a_q${d}0") - col(s"b_q${d}0")).as(s"qte_${d}0")))
    deciles(0L, "a_").crossJoin(broadcast(deciles(1L, "b_")))
      .select(outs: _*)
  }

  val quantileTreatmentEffectSql: String = {
    import graft.util.Hashing
    val mins = (p: String) => (1 to 9).map(d =>
      s"CAST(min(CASE WHEN cum * 10 >= tot * $d THEN cents END) AS BIGINT) AS ${p}q${d}0"
    ).mkString(",\n           ")
    val outs = (1 to 9).map(d =>
      s"a.a_q${d}0, b.b_q${d}0, CAST(a.a_q${d}0 - b.b_q${d}0 AS BIGINT) AS qte_${d}0"
    ).mkString(",\n         ")
    s"""WITH x AS (
         SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           ${Hashing.phashSql("CAST(user_id AS VARCHAR)", "ab_")} % 2 AS arm
         FROM events WHERE event_type = 'purchase'),
       h AS (
         SELECT arm, cents, count(*) AS cnt FROM x GROUP BY arm, cents),
       c AS (
         SELECT *,
           sum(cnt) OVER (PARTITION BY arm ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER (PARTITION BY arm) AS tot
         FROM h),
       a AS (
         SELECT ${mins("a_")}
         FROM c WHERE arm = 0),
       b AS (
         SELECT ${mins("b_")}
         FROM c WHERE arm = 1)
       SELECT ${outs}
       FROM a CROSS JOIN b"""
  }
}
