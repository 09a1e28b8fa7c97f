package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking without any unbounded-partition
  * window — the scale-safe replacement for `row_number()/ntile()
  * OVER (ORDER BY metric, key)` on frames that can reach 10⁹ rows
  * (per-customer aggregates), where the plain window moves the whole
  * frame to ONE task.
  *
  * rank(row) = |{r' : v(r') < v}| + |{r' : v(r') = v, tie(r') < tie}| + 1
  *
  * Both terms come from chunked prefix sums (the two-level scan-sum
  * pattern): values bucket into 2^bits-wide chunks via `shiftright`
  * (floor division — monotone for negatives too), per-chunk totals
  * prefix-sum on the CHUNK frame (bounded by value-domain / 2^bits,
  * independent of row count), and within-chunk positions come from
  * windows whose partitions are bounded. No window in the plan sorts
  * an unbounded partition:
  *  - the chunk-offset windows run over per-chunk AGGREGATE frames
  *    (≤ domain/2^bits rows — a few thousand for cent-scale money);
  *  - the within-chunk value window partitions on the chunk id
  *    (≤ 2^bits distinct values per partition);
  *  - the tie-position window partitions on (value, tie-chunk) —
  *    bounded by the number of distinct tie keys inside one 2^bits
  *    key range, even when ONE value ties 10⁸ rows (the ntile-cut
  *    straddle case that defeats a per-value row_number).
  *
  * The result is bit-identical to the single-task window — the
  * DuckDB oracle twins keep plain `ntile`/`row_number`; this changes
  * the PLAN, not the answer. Preconditions: `v` and `tie` are
  * non-null integral columns, `tie` unique within (parts, v) — the
  * types are `require`d at plan-build time and the data contracts
  * (no nulls, unique tie) are asserted IN-PLAN with `raise_error`
  * branches that evaluate only on violating rows, so a breach fails
  * loudly instead of silently corrupting ranks.
  */
object DistributedRank {
  private val BITS = 20

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"DistributedRank: column $c must be integral, got $dt")
  }

  /** df + `out` = 1-based BIGINT rank under (parts | v ASC, tie ASC). */
  def withRank(df: DataFrame, parts: Seq[String], v: String, tie: String,
               out: String): DataFrame = {
    requireIntegral(df, v); requireIntegral(df, tie)
    val p = parts.map(col)
    // ---- term A: rows strictly below this value ---------------------
    val hist = df.groupBy((p :+ col(v)): _*).agg(count(lit(1)).as("__c"))
      .withColumn("__rng", shiftright(col(v), BITS))
    val perRng = hist.groupBy((p :+ col("__rng")): _*)
      .agg(sum(col("__c")).as("__rc"))
    val offW = Window.partitionBy(p: _*).orderBy(col("__rng"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = perRng
      .withColumn("__off", sum(col("__rc")).over(offW) - col("__rc"))
      .drop("__rc")
    val inRngW = Window.partitionBy((p :+ col("__rng")): _*).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val below = hist.join(offs, parts :+ "__rng")
      .withColumn("__below",
        col("__off") + sum(col("__c")).over(inRngW) - col("__c"))
      .select((p :+ col(v) :+ col("__below")): _*)
    // ---- term B: position among same-value ties by the unique key ---
    // the null contract rides the __trng projection: every input row
    // passes through it, so a null v/tie fails the whole job loudly
    val keyed = df.withColumn("__trng",
      when(col(v).isNotNull && col(tie).isNotNull, shiftright(col(tie), BITS))
        .otherwise(raise_error(lit(
          s"DistributedRank: null $v/$tie violates the non-null contract"))))
    val tcnt = keyed.groupBy((p :+ col(v) :+ col("__trng")): _*)
      .agg(count(lit(1)).as("__tc"))
    val toffW = Window.partitionBy((p :+ col(v)): _*).orderBy(col("__trng"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fuse term A into the (parts, v, __trng)-grain frame: both terms
    // key on (parts, v), so joining `below` HERE (aggregate ⋈
    // aggregate, bounded rows) leaves ONE row-scale join below —
    // joining it onto `keyed` directly would shuffle the full frame
    // a second time
    val toffs = tcnt
      .withColumn("__toff", sum(col("__tc")).over(toffW) - col("__tc"))
      .drop("__tc")
      .join(below, parts :+ v)
    val posW = Window.partitionBy((p :+ col(v) :+ col("__trng")): _*)
      .orderBy(col(tie))
    // tie uniqueness within (parts, v): duplicate ties share __trng,
    // so they are ADJACENT under posW's ordering — the lag probe
    // rides the same Window node as the rank (no extra shuffle or
    // aggregation; the former count-vs-countDistinct check cost a
    // second row-scale two-phase aggregate) and adds 0 on valid rows
    keyed.join(toffs, parts ++ Seq(v, "__trng"))
      .withColumn(out,
        col("__below") + col("__toff") + row_number().over(posW).cast("long") +
          when(lag(col(tie), 1).over(posW) === col(tie), raise_error(lit(
            s"DistributedRank: $tie is not unique within (${parts.mkString(",")}, $v)")))
            .otherwise(lit(0L)))
      .drop("__trng", "__toff", "__below")
  }

  /** df + `out` = exact `ntile(k)` bucket (1..k BIGINT) under
    * (parts | v ASC, tie ASC): the rank measured against the k−1 cut
    * ranks cut_b = b·(n div k) + least(b, n mod k) — Spark's and
    * DuckDB's shared ntile size rule (the first n mod k buckets carry
    * the extra row). The per-parts row count rides as a broadcast. */
  def withNtile(df: DataFrame, parts: Seq[String], v: String, tie: String,
                k: Int, out: String): DataFrame = {
    val nPer = df.groupBy(parts.map(col): _*).agg(count(lit(1)).as("__n"))
    val withN =
      if (parts.isEmpty) df.crossJoin(broadcast(nPer))
      else df.join(broadcast(nPer), parts)
    val ranked = withRank(withN, parts, v, tie, "__rk")
    val score = (1 until k).map { b =>
      when(col("__rk") >
        lit(b.toLong) * expr(s"__n div $k") +
          least(lit(b.toLong), expr(s"__n % $k")), 1L).otherwise(0L)
    }.reduce(_ + _) + lit(1L)
    ranked.withColumn(out, score).drop("__rk", "__n")
  }
}
