package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Hashing
import TextAnalysis.{toks, toksSql}

/** Sketch operators: approximate distinct counting and embedding
  * compression — the "big data in small state" side of an analytics
  * engine, built so both engines compute bit-identical results
  * (deterministic md5-derived hashes, integer mins/sums, and a fixed
  * IEEE op order for the final estimates).
  *
  * Scale shape: distinct_sketch is distinct → two map-side-combining
  * groupBys (the (source, bucket) key space is sources × 256 — every
  * partition pre-mins before the shuffle, so the shuffle carries at
  * most |partitions| × |keys| rows regardless of N). embed_quantize
  * is a pure narrow map. No windows, no low-cardinality funnels.
  */
object Sketches {

  private val P = 256                           // sketch buckets per group
  private val M = 1152921504606846976L          // 2^60 — phash value space

  private val pr4 = graft.util.Exact.pround4 _
  private val pr4Sql = graft.util.Exact.pround4Sql _

  /** Approximate distinct 3-gram shingles per source via a bucket-min
    * sketch (PCSA/KMV family): hash every distinct shingle into
    * [0, 2^60), keep the MIN hash of each of 256 buckets, and
    * estimate n ≈ P² · M / Σ mins (E[min of m uniforms] = M/(m+1),
    * harmonic combination across buckets). The exact count rides
    * along so the result exposes the sketch's relative error.
    *
    * Regime: the estimator assumes n >> P (every bucket hit several
    * times). Shingles per source are thousands even at test scale —
    * the cardinality a sketch is FOR; a group whose true n ~ P would
    * need linear counting, which takes ln() and therefore cannot be
    * oracle-checked bit-exactly (libm — see Retrieval). The sum of
    * mins is summed exactly (DECIMAL/HUGEINT — 256 · 2^60 can
    * overflow a BIGINT) and both engines cast the exact integer to
    * DOUBLE with the same IEEE nearest rounding before the one
    * division. */
  def distinctSketch(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .select(col("source"), explode_outer(
        when(size(col("t")) >= 3,
          transform(sequence(lit(1), size(col("t")) - 2),
            i => Hashing.phash(concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2)), "kmv_")))
          .otherwise(array().cast("array<long>"))).as("h"))
      .filter(col("h").isNotNull)
      .select(col("source"), col("h"))
      .distinct()
      .transform(graft.util.Fence.lineage)
    val sketch = pairs
      .groupBy(col("source"), (col("h") % P).as("b"))
      .agg(min(col("h")).as("mn"))
      .groupBy(col("source"))
      .agg(sum(col("mn").cast("decimal(28,0)")).cast("double").as("sum_mins"),
        count(lit(1)).as("n_buckets"))
    val exact = pairs.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    exact.join(sketch, Seq("source"))
      .select(col("source"), col("n_exact"), col("n_buckets"),
        floor(lit(P.toDouble) * lit(P.toDouble) * (lit(M.toDouble) / col("sum_mins")))
          .cast("long").as("n_est"))
      .withColumn("rel_err", pr4(
        abs(col("n_est").cast("double") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")))
      .orderBy(col("source"))
  }

  val distinctSketchSql: String =
    s"""WITH pairs AS (
         SELECT DISTINCT source, unnest(
           CASE WHEN len(t) >= 3
                THEN list_transform(generate_series(1, len(t) - 2),
                       i -> ${Hashing.phashSql("concat_ws(' ', t[i], t[i + 1], t[i + 2])", "kmv_")})
                ELSE [] END) AS h
         FROM (SELECT source, ${toksSql("text")} AS t FROM documents)),
       sk AS (
         SELECT source, h % $P AS b, min(h) AS mn FROM pairs GROUP BY source, h % $P),
       sketch AS (
         SELECT source, CAST(sum(mn) AS DOUBLE) AS sum_mins,
                count(*) AS n_buckets
         FROM sk GROUP BY source),
       exact AS (SELECT source, count(*) AS n_exact FROM pairs GROUP BY source)
       SELECT e.source, CAST(e.n_exact AS BIGINT) AS n_exact,
         CAST(s.n_buckets AS BIGINT) AS n_buckets,
         CAST(floor(CAST($P AS DOUBLE) * CAST($P AS DOUBLE) * (CAST($M AS DOUBLE) / s.sum_mins)) AS BIGINT) AS n_est,
         ${pr4Sql(s"abs(CAST(floor(CAST($P AS DOUBLE) * CAST($P AS DOUBLE) * (CAST($M AS DOUBLE) / s.sum_mins)) AS BIGINT) - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE)")} AS rel_err
       FROM exact e JOIN sketch s ON e.source = s.source
       ORDER BY e.source"""

  /** Sketch MERGEABILITY — the property that makes a sketch a
    * distributed-systems object rather than a statistic: bucket-min
    * sketches built independently per source (the shape partial
    * sketches arrive in from executors, days, or shards) merge by a
    * plain bucket-wise MIN, and the merged sketch is IDENTICAL to the
    * one built over the union directly (min is associative and
    * commutative). This query builds both, proves the equality as a
    * result column, and scores the merged estimate against the exact
    * global cardinality. At 100 TB this is the whole point: per-shard
    * sketches are tiny (P longs), ship to one place, and reaggregate
    * losslessly — the raw shingle stream never re-shuffles.
    *
    * Scale shape: one distinct-(source, h) pass (shared, fenced — it
    * feeds the per-source sketch, the direct sketch, and the exact
    * count), then everything downstream runs on ≤ sources × P rows. */
  def sketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .select(col("source"), explode_outer(
        when(size(col("t")) >= 3,
          transform(sequence(lit(1), size(col("t")) - 2),
            i => Hashing.phash(concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2)), "kmv_")))
          .otherwise(array().cast("array<long>"))).as("h"))
      .filter(col("h").isNotNull)
      .select(col("source"), col("h"))
      .distinct()
      .transform(graft.util.Fence.lineage)
    val perSource = pairs
      .groupBy(col("source"), (col("h") % P).as("b"))
      .agg(min(col("h")).as("mn"))
      .transform(graft.util.Fence.lineage)
    def est(df: DataFrame): DataFrame = df.agg(
      floor(lit(P.toDouble) * lit(P.toDouble) *
        (lit(M.toDouble) / sum(col("mn").cast("decimal(28,0)")).cast("double")))
        .cast("long").as("est"))
    val merged = est(perSource.groupBy(col("b")).agg(min(col("mn")).as("mn")))
      .withColumnRenamed("est", "n_est_merged")
    val direct = est(pairs.groupBy((col("h") % P).as("b")).agg(min(col("h")).as("mn")))
      .withColumnRenamed("est", "n_est_direct")
    val nSrc = perSource.select(col("source")).distinct()
      .agg(count(lit(1)).cast("long").as("n_sources"))
    val exact = pairs.select(col("h")).distinct()
      .agg(count(lit(1)).cast("long").as("n_exact"))
    nSrc.crossJoin(exact).crossJoin(merged).crossJoin(direct)
      .select(col("n_sources"), col("n_exact"),
        col("n_est_direct"), col("n_est_merged"),
        when(col("n_est_merged") === col("n_est_direct"), 1L).otherwise(0L)
          .as("merge_lossless"),
        pr4(abs(col("n_est_merged").cast("double") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err"))
      .orderBy(col("n_exact"))
  }

  val sketchUnionSql: String = {
    val estOf = (from: String) =>
      s"CAST(floor(CAST($P AS DOUBLE) * CAST($P AS DOUBLE) * (CAST($M AS DOUBLE) / (SELECT CAST(sum(mn) AS DOUBLE) FROM $from))) AS BIGINT)"
    s"""WITH pairs AS (
         SELECT DISTINCT source, unnest(
           CASE WHEN len(t) >= 3
                THEN list_transform(generate_series(1, len(t) - 2),
                       i -> ${Hashing.phashSql("concat_ws(' ', t[i], t[i + 1], t[i + 2])", "kmv_")})
                ELSE [] END) AS h
         FROM (SELECT source, ${toksSql("text")} AS t FROM documents)),
       persrc AS (
         SELECT source, h % $P AS b, min(h) AS mn FROM pairs GROUP BY source, h % $P),
       mergedsk AS (SELECT b, min(mn) AS mn FROM persrc GROUP BY b),
       directsk AS (SELECT h % $P AS b, min(h) AS mn FROM pairs GROUP BY h % $P),
       scalars AS (
         SELECT
           (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM persrc) AS n_sources,
           (SELECT CAST(count(DISTINCT h) AS BIGINT) FROM pairs) AS n_exact,
           ${estOf("directsk")} AS n_est_direct,
           ${estOf("mergedsk")} AS n_est_merged)
       SELECT n_sources, n_exact, n_est_direct, n_est_merged,
         CAST(CASE WHEN n_est_merged = n_est_direct THEN 1 ELSE 0 END AS BIGINT)
           AS merge_lossless,
         ${pr4Sql("abs(CAST(n_est_merged AS DOUBLE) - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)")}
           AS rel_err
       FROM scalars ORDER BY n_exact"""
  }

  /** Symmetric int8 max-abs quantization of the embedding column over
    * the EXACT milli-quantized integer base ([[Similarity.quant]] —
    * the same portability device the ANN family uses): per vector,
    * scale = max|q|, int8 code = floor(q·127/scale + 0.5), and the
    * reconstruction MSE of the dequantized codes in milli-units².
    * The per-element error sum is a LEFT FOLD (Spark `aggregate`,
    * DuckDB `list_reduce`) — a fixed summation order, so the double
    * accumulation is bit-identical in both engines. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("q", Similarity.quant(col("embedding")))
      .withColumn("amax", array_max(transform(col("q"), abs(_))))
    val deq = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") * 127.0 / col("amax").cast("double") + 0.5) *
        (col("amax").cast("double") / 127.0)
    e.select(col("vec_id"), col("amax"),
        when(col("amax") > 0, pr4(
          aggregate(col("q"), lit(0.0),
            (acc, x) => acc + (deq(x) - x.cast("double")) * (deq(x) - x.cast("double"))) /
            size(col("q")).cast("double")))
          .as("mse_milli"))
      .orderBy(col("vec_id"))
  }

  val embedQuantizeSql: String = {
    val q = Similarity.quantSql
    val deq = (x: String) =>
      s"floor(CAST($x AS DOUBLE) * 127.0 / CAST(amax AS DOUBLE) + 0.5) * (CAST(amax AS DOUBLE) / 127.0)"
    val err = s"(${deq("x")} - CAST(x AS DOUBLE)) * (${deq("x")} - CAST(x AS DOUBLE))"
    s"""WITH e AS (
         SELECT vec_id, $q AS q FROM embeddings),
       a AS (
         SELECT vec_id, q, list_max(list_transform(q, x -> abs(x))) AS amax FROM e)
       SELECT vec_id, CAST(amax AS BIGINT) AS amax,
         CASE WHEN amax > 0 THEN
           ${pr4Sql(s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(q, x -> $err)), (acc, v) -> acc + v) / CAST(len(q) AS DOUBLE)")}
         END AS mse_milli
       FROM a ORDER BY vec_id"""
  }

  private val CM_ROWS = 4
  private val CM_COLS = 2048
  private val HH_TOPK = 20

  /** Count-Min heavy hitters: the frequency-sketch complement to
    * [[distinctSketch]]'s cardinality sketch. Every token occurrence
    * lands in one cell per row (4 salted hashes into 2048 columns);
    * a token's estimate is the MIN of its 4 cells — never below the
    * true count (other tokens only ADD to a cell), which is the CM
    * guarantee the spec asserts. The exact counts ride along to
    * expose each hitter's overcount; a production deployment keeps
    * only the sketch (4·2048 integers however large the corpus — the
    * groupBy key space is the CELL GRID, so the shuffle is map-side
    * combined to ≤ 8192 rows per partition regardless of N) and
    * queries it without the exact pass. */
  def heavyHittersCm(spark: SparkSession, dir: String): DataFrame = {
    def rcArray(tokenCol: org.apache.spark.sql.Column) =
      array((0 until CM_ROWS).map(r => struct(lit(r).as("r"),
        (Hashing.phash(tokenCol, s"cm${r}_") % CM_COLS).as("c"))): _*)
    val tok = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode_outer(toks(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      // referenced by the exact pass AND the sketch build
      .transform(graft.util.Fence.lineage)
    val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
    val cells = tok
      .select(explode_outer(rcArray(col("token"))).as("rc"))
      .filter(col("rc").isNotNull)
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val top = exact.orderBy(col("n_exact").desc, col("token")).limit(HH_TOPK)
    top
      .select(col("token"), col("n_exact"),
        explode_outer(rcArray(col("token"))).as("rc"))
      .filter(col("rc").isNotNull)
      .select(col("token"), col("n_exact"),
        col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(cells), Seq("r", "c"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cnt")).as("n_cm"))
      .withColumn("overcount", col("n_cm") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  val heavyHittersCmSql: String = {
    def occRow(r: Int, src: String) =
      s"SELECT $r AS r, ${Hashing.phashSql("token", s"cm${r}_")} % $CM_COLS AS c" +
        (if (src.isEmpty) " FROM tok" else s", token, n_exact FROM $src")
    val occ = (0 until CM_ROWS).map(r => occRow(r, "")).mkString("\n         UNION ALL ")
    val probes = (0 until CM_ROWS).map(r => occRow(r, "top")).mkString("\n         UNION ALL ")
    s"""WITH tok AS (
         SELECT unnest(${toksSql("text")}) AS token FROM documents),
       occ AS (
         $occ),
       cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY r, c),
       exact AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM tok GROUP BY token),
       top AS (SELECT token, n_exact FROM exact ORDER BY n_exact DESC, token LIMIT $HH_TOPK),
       probes AS (
         $probes)
       SELECT p.token, p.n_exact, CAST(min(cells.cnt) AS BIGINT) AS n_cm,
         CAST(min(cells.cnt) - p.n_exact AS BIGINT) AS overcount
       FROM probes p JOIN cells ON p.r = cells.r AND p.c = cells.c
       GROUP BY p.token, p.n_exact
       ORDER BY p.n_exact DESC, p.token"""
  }
}
