package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (BASELINE.json north-star): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH bucketed variant as the
  * scale path.
  *
  * Numeric strategy: embeddings are quantized to integer milli-units
  * (`floor(x*1000+0.5)` — standard int-quantization) so every dot
  * product and norm is EXACT 64-bit integer arithmetic, identical in
  * any engine and under any summation order; only the final
  * `dot/(|a||b|)` touches floating point, on identical inputs. That
  * is what lets cosine similarity itself be oracle-checked.
  *
  * Scale notes:
  *  - brute force: the query set is broadcast (it is small by
  *    definition); candidates stream by, ranked with a per-query
  *    window — per-partition top-k then a k-row merge, no all-pairs
  *    shuffle. Cost is O(|Q|·N) — the exact baseline you periodically
  *    run to measure recall;
  *  - LSH: each vector maps to a bucket id from sign-bits of 8
  *    hyperplane dots; candidate generation becomes an equi-join on
  *    the bucket id (shuffle on bucket, never a cross join). With B
  *    buckets the pair count drops ~B× at equal recall per probe.
  */
object Similarity {

  private val DIM = 64
  private val PLANES = 8
  private val NQUERIES = 8
  private val TOPK = 5

  /** Deterministic ±1 hyperplane matrices derived from md5 — a
    * public, seed-reproducible construction (no RNG, same values in
    * the SQL twin because they are embedded as literals). Two
    * independent tables: a vector pair split by a near-zero dot in
    * one table almost surely shares a bucket in the other. */
  private def planesFor(tag: String): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(PLANES, DIM) { (p, d) =>
      val h = md.digest(s"${tag}_${p}_$d".getBytes("UTF-8"))
      if ((h.last & 1) == 1) 1 else -1
    }
  }
  private[ext] val planes: Array[Array[Int]] = planesFor("pl")
  private[ext] val planes2: Array[Array[Int]] = planesFor("p2")

  /** float vector → exact integer milli-quantized vector. */
  private def quant(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  private val quantSql: String =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  private def norm2(a: Column): Column = dot(a, a)

  /** Portable 6-dp rounding. */
  private def pr6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000

  /** Exact cosine top-k: query vectors vec_id < 8 against the full
    * table. */
  def knnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).withColumn("qv", quant(col("embedding")))
    val q = e.filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("qid"), col("qv").as("qvec"))
    val c = e.select(col("vec_id"), col("qv").as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", pr6(
        dot(col("qvec"), col("cvec")).cast("double") /
          (sqrt(norm2(col("qvec")).cast("double")) * sqrt(norm2(col("cvec")).cast("double")))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOPK)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val knnBruteforceSql: String =
    s"""WITH e AS (SELECT vec_id, $quantSql AS qv FROM embeddings),
       q AS (SELECT vec_id AS qid, qv AS qvec FROM e WHERE vec_id < $NQUERIES),
       scored AS (
         SELECT q.qid, e.vec_id,
           floor(CAST(list_sum(list_transform(generate_series(1, $DIM), i -> qvec[i] * qv[i])) AS DOUBLE) /
                 (sqrt(CAST(list_sum(list_transform(qvec, x -> x * x)) AS DOUBLE)) *
                  sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cosine
         FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
       ranked AS (
         SELECT qid, vec_id, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         FROM scored)
       SELECT qid, rank, vec_id AS neighbor_id, cosine
       FROM ranked WHERE rank <= $TOPK ORDER BY qid, rank"""

  /** LSH bucket id: sign bit per hyperplane dot, packed. */
  private def bucketWith(ps: Array[Array[Int]])(qv: Column): Column =
    (0 until PLANES).map { p =>
      val w = array(ps(p).map(lit(_)): _*)
      when(dot(w.cast("array<long>"), qv) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def bucket(qv: Column): Column = bucketWith(planes)(qv)
  private def bucket2(qv: Column): Column = bucketWith(planes2)(qv)

  private def bucketSqlWith(ps: Array[Array[Int]], qv: String): String =
    (0 until PLANES).map { p =>
      val w = ps(p).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(generate_series(1, $DIM), i -> ($w)[i] * $qv[i])) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def bucketSql(qv: String): String = bucketSqlWith(planes, qv)
  private def bucket2Sql(qv: String): String = bucketSqlWith(planes2, qv)

  /** ANN via LSH buckets: candidates share the query's bucket; rank
    * by exact (quantized) cosine within the bucket. Compared to
    * [[knnBruteforce]] this replaces the O(N) scan per query with a
    * bucket equi-join. */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("qv", quant(col("embedding")))
      .withColumn("bucket", bucket(col("qv")))
    val q = e.filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("qid"), col("qv").as("qvec"), col("bucket"))
    val c = e.select(col("vec_id"), col("qv").as("cvec"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))   // bucket equi-join, not a cross join
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", pr6(
        dot(col("qvec"), col("cvec")).cast("double") /
          (sqrt(norm2(col("qvec")).cast("double")) * sqrt(norm2(col("cvec")).cast("double")))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOPK)
      .select(col("qid"), col("bucket"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Embedding-cosine near-duplicate detection — the vector-space
    * dedup mode (complementing exact/MinHash/SimHash/Jaccard in
    * [[Dedup]]). A twin corpus is synthesized in-query (vec_id%7==0
    * gets a copy with dim 1 nudged by +0.01 → cosine ≈ 0.9999);
    * candidates come from TWO independent hyperplane-LSH bucket
    * joins (a pair split by one near-zero hyperplane dot in table 1
    * almost surely shares its bucket in table 2) and must clear an
    * exact quantized-cosine threshold. The bucket joins keep the
    * candidate count far below the cross join; adding tables trades
    * compute for recall the standard multi-table LSH way. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val twins = base.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 1, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val e = base.unionAll(twins)
      .withColumn("qv", quant(col("embedding")))
      .withColumn("b1", bucket(col("qv")))
      .withColumn("b2", bucket2(col("qv")))
      .select(col("vec_id"), col("qv"), col("b1"), col("b2"))
      .repartition(spark.sparkContext.defaultParallelism)
    val r = e.as("r")
    // multi-probe: the left side also probes every hamming-1 bucket,
    // so a pair is missed only if >= 2 hyperplane dots flip sign in
    // BOTH tables — vanishingly unlikely for near-identical vectors
    def probes(k: String) = e.select(col("vec_id"), col("qv"),
      explode(array(col(k) +: (0 until PLANES).map(b =>
        col(k).bitwiseXOR(lit(1L << b))): _*)).as("probe"))
    def table(k: String) =
      probes(k).as("l")
        .join(r, col("l.probe") === col(s"r.$k") && col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("id1"), col("r.vec_id").as("id2"),
          col("l.qv").as("qv1"), col("r.qv").as("qv2"))
    table("b1").unionAll(table("b2"))
      .dropDuplicates("id1", "id2")
      .withColumn("cosine", pr6(
        dot(col("qv1"), col("qv2")).cast("double") /
          (sqrt(norm2(col("qv1")).cast("double")) * sqrt(norm2(col("qv2")).cast("double")))))
      .filter(col("cosine") >= 0.99)
      .select(col("id1"), col("id2"), col("cosine"))
      .orderBy(col("id1"), col("id2"))
  }

  val dedupEmbeddingSql: String =
    s"""WITH base AS (
         SELECT vec_id, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 100000 AS vec_id,
           list_transform(generate_series(1, $DIM),
             i -> CASE WHEN i = 2 THEN embedding[i] + CAST(0.01 AS FLOAT) ELSE embedding[i] END) AS embedding
         FROM embeddings WHERE vec_id % 7 = 0),
       e AS (
         SELECT vec_id, $quantSql AS qv, ${bucketSql(quantSql)} AS b1,
                ${bucket2Sql(quantSql)} AS b2
         FROM base),
       p1 AS (
         SELECT vec_id, qv, unnest([b1, xor(b1, 1), xor(b1, 2), xor(b1, 4), xor(b1, 8), xor(b1, 16), xor(b1, 32), xor(b1, 64), xor(b1, 128)]) AS probe
         FROM e),
       p2 AS (
         SELECT vec_id, qv, unnest([b2, xor(b2, 1), xor(b2, 2), xor(b2, 4), xor(b2, 8), xor(b2, 16), xor(b2, 32), xor(b2, 64), xor(b2, 128)]) AS probe
         FROM e),
       cand AS (
         SELECT DISTINCT l.vec_id AS id1, r.vec_id AS id2, l.qv AS qv1, r.qv AS qv2
         FROM p1 l JOIN e r ON l.probe = r.b1 AND l.vec_id < r.vec_id
         UNION
         SELECT DISTINCT l.vec_id AS id1, r.vec_id AS id2, l.qv AS qv1, r.qv AS qv2
         FROM p2 l JOIN e r ON l.probe = r.b2 AND l.vec_id < r.vec_id),
       p AS (
         SELECT id1, id2,
           floor(CAST(list_sum(list_transform(generate_series(1, $DIM), i -> qv1[i] * qv2[i])) AS DOUBLE) /
                 (sqrt(CAST(list_sum(list_transform(qv1, x -> x * x)) AS DOUBLE)) *
                  sqrt(CAST(list_sum(list_transform(qv2, x -> x * x)) AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cosine
         FROM cand)
       SELECT id1, id2, cosine FROM p WHERE cosine >= 0.99 ORDER BY id1, id2"""

  val knnLshSql: String =
    s"""WITH e AS (
         SELECT vec_id, $quantSql AS qv, ${bucketSql(quantSql)} AS bucket
         FROM embeddings),
       q AS (SELECT vec_id AS qid, qv AS qvec, bucket FROM e WHERE vec_id < $NQUERIES),
       scored AS (
         SELECT q.qid, q.bucket, e.vec_id,
           floor(CAST(list_sum(list_transform(generate_series(1, $DIM), i -> qvec[i] * e.qv[i])) AS DOUBLE) /
                 (sqrt(CAST(list_sum(list_transform(qvec, x -> x * x)) AS DOUBLE)) *
                  sqrt(CAST(list_sum(list_transform(e.qv, x -> x * x)) AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cosine
         FROM e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.qid),
       ranked AS (
         SELECT qid, bucket, vec_id, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         FROM scored)
       SELECT qid, bucket, rank, vec_id AS neighbor_id, cosine
       FROM ranked WHERE rank <= $TOPK ORDER BY qid, rank"""
}
