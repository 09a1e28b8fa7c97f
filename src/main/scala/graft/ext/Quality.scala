package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Hashing
import TextAnalysis.{toks, toksSql}

/** Corpus-quality operators beyond per-document surface stats
  * ([[TextAnalysis]]): within-document REPETITION signals (the
  * Gopher-style "fraction of duplicated n-grams" filters every
  * pretraining pipeline applies) and the cross-source n-gram OVERLAP
  * matrix (which sources are near-copies of which — scraped mirrors,
  * shared boilerplate — the corpus-curation view of contamination).
  *
  * Scale shape: both operators are explode → hash-keyed groupBy.
  * repetition_stats shuffles (doc_id, bigram_hash) pairs — key
  * cardinality ~tokens-per-corpus, no skew beyond document length.
  * source_overlap shuffles DISTINCT (shingle_hash, source) pairs and
  * self-joins per shingle; the per-key fanout is bounded by the
  * source count (20 here), so the join output is O(distinct shingles
  * × overlapping-source pairs), never quadratic in documents.
  */
object Quality {

  private val pr4 = graft.util.Exact.pround4 _
  private val pr4Sql = graft.util.Exact.pround4Sql _

  // thresholds applied to the ROUNDED fractions, so both engines
  // compare identical multiples of 1e-4 — no boundary-ulp flips
  private val DUP_FRAC_MAX = 0.5
  private val TOP_FRAC_MAX = 0.2

  /** Within-document repetition: for each doc, the fraction of bigram
    * occurrences that are repeats of an already-seen bigram
    * (dup_bigram_frac) and the share of the single most frequent
    * bigram (top_bigram_frac), plus the Gopher-style keep/drop flag.
    * Documents with fewer than 2 tokens have no bigrams → NULL
    * fractions and repetitive = false. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .withColumn("n", size(col("t")))
      // guard: Spark sequence(1, 0) DESCENDS ([1,0]) where DuckDB
      // generate_series(1, 0) is empty — gate on n >= 2 in both
      .withColumn("bgs", when(col("n") >= 2,
        transform(sequence(lit(1), col("n") - 1),
          i => Hashing.phash(
            concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)),
            "rep_") % 4294967296L))
        .otherwise(array().cast("array<long>")))
      .select(col("doc_id"), col("bgs"))
    val cnt = d.select(col("doc_id"), explode_outer(col("bgs")).as("bh"))
      .groupBy(col("doc_id"), col("bh"))
      .agg(count(lit(1)).as("c"))
    val tot = nullif(col("tot").cast("double"), lit(0.0))
    cnt.groupBy(col("doc_id"))
      .agg(
        sum(when(col("bh").isNotNull, col("c")).otherwise(0L)).as("tot"),
        sum(when(col("bh").isNotNull && col("c") > 1, col("c")).otherwise(0L)).as("dup"),
        max(when(col("bh").isNotNull, col("c"))).as("mx"))
      .select(
        col("doc_id"),
        col("tot").as("n_bigrams"),
        pr4(col("dup").cast("double") / tot).as("dup_bigram_frac"),
        pr4(col("mx").cast("double") / tot).as("top_bigram_frac"),
        coalesce(
          pr4(col("dup").cast("double") / tot) > DUP_FRAC_MAX ||
          pr4(col("mx").cast("double") / tot) > TOP_FRAC_MAX,
          lit(false)).as("repetitive"))
      .orderBy(col("doc_id"))
  }

  val repetitionStatsSql: String = {
    val bg = s"${Hashing.phashSql("concat_ws(' ', t[i], t[i + 1])", "rep_")} % 4294967296"
    s"""WITH d AS (
         SELECT doc_id, ${toksSql("text")} AS t, len(${toksSql("text")}) AS n
         FROM documents),
       bgs AS (
         SELECT doc_id,
           CASE WHEN n >= 2
                THEN list_transform(generate_series(1, n - 1), i -> $bg)
                ELSE [] END AS bgs
         FROM d),
       occ AS (SELECT doc_id, unnest(bgs) AS bh FROM bgs),
       cnt AS (SELECT doc_id, bh, count(*) AS c FROM occ GROUP BY doc_id, bh),
       agg AS (
         SELECT b.doc_id,
           CAST(coalesce(sum(c.c), 0) AS BIGINT) AS tot,
           CAST(coalesce(sum(CASE WHEN c.c > 1 THEN c.c ELSE 0 END), 0) AS BIGINT) AS dup,
           max(c.c) AS mx
         FROM bgs b LEFT JOIN cnt c ON b.doc_id = c.doc_id
         GROUP BY b.doc_id)
       SELECT doc_id, tot AS n_bigrams,
         ${pr4Sql("dup / nullif(CAST(tot AS DOUBLE), 0.0)")} AS dup_bigram_frac,
         ${pr4Sql("mx / nullif(CAST(tot AS DOUBLE), 0.0)")} AS top_bigram_frac,
         coalesce(${pr4Sql("dup / nullif(CAST(tot AS DOUBLE), 0.0)")} > $DUP_FRAC_MAX
               OR ${pr4Sql("mx / nullif(CAST(tot AS DOUBLE), 0.0)")} > $TOP_FRAC_MAX,
               false) AS repetitive
       FROM agg ORDER BY doc_id"""
  }

  private val OVERLAP_GRAM = 8   // same span as Corpus.decontaminate

  // duplicate_spans: a doc whose 8-gram positions are >20% cross-doc
  // duplicated is flagged (threshold on the ROUNDED fraction)
  private val DUP_SPAN_MAX = 0.2

  /** Exact-substring duplication signal (the Lee et al. 2107.06499
    * "deduplicating training data" shape, at 8-token granularity):
    * for every document, how many of its 8-gram positions carry a
    * gram that also appears in at least one OTHER document, and the
    * flagged verdict on that fraction. Complements [[sourceOverlap]]
    * (source-pair containment) and [[Corpus.decontaminate]]
    * (train/eval) with the per-document curation view.
    *
    * Scale shape: explode → two hash-keyed groupBys → one equi-join
    * on the gram hash. Everything shuffles on the 60-bit gram hash
    * (high cardinality, no skew beyond genuinely viral spans), and
    * the join fans out only to the occurrence count of each gram —
    * linear in corpus size, never pairwise. */
  def duplicateSpans(spark: SparkSession, dir: String): DataFrame = {
    val g = OVERLAP_GRAM
    val occ = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .select(col("doc_id"), explode_outer(
        when(size(col("t")) >= g,
          transform(sequence(lit(1), size(col("t")) - (g - 1)),
            i => Hashing.phash(concat_ws(" ",
              (0 until g).map(k => element_at(col("t"), i + k)): _*), "ds_")))
          .otherwise(array().cast("array<long>"))).as("h"))
    // per-(doc, gram) occurrence counts; h IS NULL keeps short docs
    val cnt = occ.groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("c"))
      // referenced twice (per-doc rollup + the distinct-doc side) —
      // materialize once so the explode pipeline does not run twice
      .transform(graft.util.Fence.lineage)
    // grams seen in >= 2 distinct documents
    val dups = cnt.filter(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(true).as("dup"))
    val tot = nullif(col("tot").cast("double"), lit(0.0))
    cnt.join(dups, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("h").isNotNull, col("c")).otherwise(0L)).as("tot"),
        sum(when(col("dup"), col("c")).otherwise(0L)).as("dup"))
      .select(
        col("doc_id"),
        col("tot").as("n_grams"),
        col("dup").as("dup_grams"),
        pr4(col("dup").cast("double") / tot).as("dup_frac"),
        coalesce(pr4(col("dup").cast("double") / tot) > DUP_SPAN_MAX,
          lit(false)).as("flagged"))
      .orderBy(col("doc_id"))
  }

  val duplicateSpansSql: String = {
    val g = OVERLAP_GRAM
    val gram = (0 until g).map(k => s"t[i + $k]").mkString(", ")
    s"""WITH d AS (
         SELECT doc_id, ${toksSql("text")} AS t, len(${toksSql("text")}) AS n
         FROM documents),
       occ AS (
         SELECT doc_id, unnest(
           CASE WHEN n >= $g
                THEN list_transform(generate_series(1, n - ${g - 1}),
                       i -> ${Hashing.phashSql(s"concat_ws(' ', $gram)", "ds_")})
                ELSE [NULL] END) AS h
         FROM d),
       cnt AS (SELECT doc_id, h, count(*) AS c FROM occ GROUP BY doc_id, h),
       dups AS (
         SELECT h, true AS dup FROM cnt WHERE h IS NOT NULL
         GROUP BY h HAVING count(*) >= 2)
       SELECT c.doc_id,
         CAST(coalesce(sum(CASE WHEN c.h IS NOT NULL THEN c.c ELSE 0 END), 0) AS BIGINT) AS n_grams,
         CAST(coalesce(sum(CASE WHEN d.dup THEN c.c ELSE 0 END), 0) AS BIGINT) AS dup_grams,
         ${pr4Sql("sum(CASE WHEN d.dup THEN c.c ELSE 0 END) / nullif(CAST(sum(CASE WHEN c.h IS NOT NULL THEN c.c ELSE 0 END) AS DOUBLE), 0.0)")} AS dup_frac,
         coalesce(${pr4Sql("sum(CASE WHEN d.dup THEN c.c ELSE 0 END) / nullif(CAST(sum(CASE WHEN c.h IS NOT NULL THEN c.c ELSE 0 END) AS DOUBLE), 0.0)")} > $DUP_SPAN_MAX,
           false) AS flagged
       FROM cnt c LEFT JOIN dups d ON c.h = d.h
       GROUP BY c.doc_id ORDER BY c.doc_id"""
  }

  /** Cross-source overlap matrix: for every source pair, how many
    * DISTINCT 8-token shingle hashes they share, their distinct
    * totals, and containment = shared / min(total) — 1.0 means the
    * smaller source is entirely boilerplate of the larger. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val g = OVERLAP_GRAM
    val sh = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .select(col("source"), explode_outer(
        when(size(col("t")) >= g,
          transform(sequence(lit(1), size(col("t")) - (g - 1)),
            i => Hashing.phash(concat_ws(" ",
              (0 until g).map(k => element_at(col("t"), i + k)): _*), "ov_")))
          .otherwise(array().cast("array<long>"))).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
      // referenced 3× (totals + both join sides) — fence so the
      // explode+distinct pipeline materializes once
      .transform(graft.util.Fence.lineage)
    val totals = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val l = sh.as("l"); val r = sh.as("r")
    l.join(r, col("l.h") === col("r.h") && col("l.source") < col("r.source"))
      .groupBy(col("l.source").as("source_a"), col("r.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals).withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "n_a"), Seq("source_a"))
      .join(broadcast(totals).withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "n_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        pr4(col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceOverlapSql: String = {
    val g = OVERLAP_GRAM
    val gram = (0 until g).map(k => s"t[i + $k]").mkString(", ")
    s"""WITH d AS (
         SELECT source, ${toksSql("text")} AS t, len(${toksSql("text")}) AS n
         FROM documents),
       sh AS (
         SELECT DISTINCT source, unnest(
           CASE WHEN n >= $g
                THEN list_transform(generate_series(1, n - ${g - 1}),
                       i -> ${Hashing.phashSql(s"concat_ws(' ', $gram)", "ov_")})
                ELSE [] END) AS h
         FROM d),
       totals AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
       pairs AS (
         SELECT l.source AS source_a, r.source AS source_b, count(*) AS n_shared
         FROM sh l JOIN sh r ON l.h = r.h AND l.source < r.source
         GROUP BY l.source, r.source)
       SELECT p.source_a, p.source_b, CAST(p.n_shared AS BIGINT) AS n_shared,
         CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
         ${pr4Sql("p.n_shared / CAST(least(ta.n, tb.n) AS DOUBLE)")} AS containment
       FROM pairs p
       JOIN totals ta ON ta.source = p.source_a
       JOIN totals tb ON tb.source = p.source_b
       ORDER BY p.source_a, p.source_b"""
  }

  private val CONT_RARE_MAX = 10   // blocking shingles: 2 <= df <= 10
  private val CONT_NUM = 9         // containment >= 9/10, exact rational

  /** Document-level CONTAINMENT pairs — the asymmetric-duplicate
    * detector the whole symmetric dedup family is blind to: a short
    * document embedded in a longer one (syndicated article + added
    * commentary, quoted post, boilerplate page) has containment
    * |A∩B|/min(|A|,|B|) ≈ 1 but Jaccard ≈ |A|/|B| — far below any
    * MinHash/SimHash threshold, and symmetric-LSH candidates miss it
    * with the same probability. An injected prefix-half corpus
    * (doc_id%11==0 → its first half as id+200000, containment exactly
    * 1.0, Jaccard ≈ 0.5) pins the blindspot.
    *
    * Candidates come from RARE-SHINGLE BLOCKING (the entity-resolution
    * standard): two docs are candidates iff they share an 8-gram whose
    * corpus document-frequency is in [2, 10]. A contained doc shares
    * ALL its shingles — rare ones included — with its container, so
    * recall does not depend on any symmetric similarity; and the pair
    * volume is bounded by Σ_h df(h)² ≤ 10·Σ df(h) — linear in corpus
    * size. Hot shingles (df > 10 — boilerplate) are excluded exactly
    * like blocking stop-words; the at-scale containment index
    * (LSH Ensemble, VLDB'16 2331) is the next rung when the rare band
    * itself is too wide. Verification is exact set intersection over
    * the shingle-hash arrays, joined back by doc id — candidate
    * frames carry only ids. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val g = OVERLAP_GRAM
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("text"))
    val halves = base.filter(col("doc_id") % 11 === 0)
      .withColumn("t", toks(col("text")))
      .select(col("source"), (col("doc_id") + 200000).as("doc_id"),
        concat_ws(" ", slice(col("t"), lit(1),
          greatest(floor(size(col("t")) / 2), lit(1)).cast("int"))).as("text"))
    val d = base.unionAll(halves)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .withColumn("sh",
        when(size(col("t")) >= g,
          array_distinct(transform(sequence(lit(1), size(col("t")) - (g - 1)),
            i => Hashing.phash(concat_ws(" ",
              (0 until g).map(k => element_at(col("t"), i + k)): _*), "cnt_"))))
          .otherwise(array().cast("array<long>")))
      .select(col("doc_id"), col("sh"))
      // referenced by the df build, the candidate explode, and both
      // verify sides — materialize the shingle pipeline once
      .transform(graft.util.Fence.lineage)
    val occ = d.select(col("doc_id"), explode_outer(col("sh")).as("h"))
      .filter(col("h").isNotNull)
    val rare = occ.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= CONT_RARE_MAX)
      .select(col("h"))
    val rocc = occ.join(rare, Seq("h"))
    val cand = rocc.as("l")
      .join(rocc.as("r"),
        col("l.h") === col("r.h") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    val sets = d.select(col("doc_id"), col("sh"))
    cand
      .join(sets.select(col("doc_id").as("id1"), col("sh").as("s1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("sh").as("s2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("cmin", least(size(col("s1")), size(col("s2"))))
      // exact rational threshold referencing `inter` once in the
      // filter (the rounded form would inline array_intersect twice
      // through the join-condition pushdown)
      .filter(col("cmin") > 0 && col("inter") * 10 >= col("cmin") * CONT_NUM)
      .withColumn("containment",
        floor(col("inter").cast("double") / col("cmin") * 10000 + 0.5) / 10000)
      .select(col("id1"), col("id2"), col("inter").cast("long").as("n_shared"),
        col("cmin").cast("long").as("n_smaller"), col("containment"))
      .orderBy(col("id1"), col("id2"))
  }

  val containmentPairsSql: String = {
    val g = OVERLAP_GRAM
    val gram = (0 until g).map(k => s"t[i + $k]").mkString(", ")
    s"""WITH halves AS (
         SELECT source, doc_id + 200000 AS doc_id,
           array_to_string(list_slice(t, 1, greatest(len(t) // 2, 1)), ' ') AS text
         FROM (SELECT source, doc_id, ${toksSql("text")} AS t
               FROM documents WHERE doc_id % 11 = 0)),
       all_docs AS (
         SELECT source, doc_id, text FROM documents
         UNION ALL SELECT source, doc_id, text FROM halves),
       d AS (
         SELECT doc_id,
           CASE WHEN len(t) >= $g
                THEN list_distinct(list_transform(generate_series(1, len(t) - ${g - 1}),
                       i -> ${Hashing.phashSql(s"concat_ws(' ', $gram)", "cnt_")}))
                ELSE [] END AS sh
         FROM (SELECT doc_id, ${toksSql("text")} AS t FROM all_docs)),
       occ AS (SELECT doc_id, unnest(sh) AS h FROM d),
       rare AS (
         SELECT h FROM (SELECT h, count(*) AS df FROM occ GROUP BY h)
         WHERE df BETWEEN 2 AND $CONT_RARE_MAX),
       cand AS (
         SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
         FROM occ l JOIN occ r ON l.h = r.h AND l.doc_id < r.doc_id
         WHERE l.h IN (SELECT h FROM rare)),
       scored AS (
         SELECT c.id1, c.id2,
           len(list_intersect(a.sh, b.sh)) AS inter,
           least(len(a.sh), len(b.sh)) AS cmin
         FROM cand c
         JOIN d a ON a.doc_id = c.id1
         JOIN d b ON b.doc_id = c.id2)
       SELECT id1, id2, CAST(inter AS BIGINT) AS n_shared,
         CAST(cmin AS BIGINT) AS n_smaller,
         floor(CAST(inter AS DOUBLE) / cmin * 10000 + 0.5) / 10000 AS containment
       FROM scored WHERE cmin > 0 AND inter * 10 >= cmin * $CONT_NUM
       ORDER BY id1, id2"""
  }

  // ---- N-gram novelty curve ----------------------------------------

  /** Per-document n-gram NOVELTY — the dataset-diversity signal a
    * corpus-growth study plots: processing documents in doc_id order,
    * what fraction of each document's distinct 8-gram shingles has
    * never appeared in ANY earlier document? A corpus of fresh
    * content holds a high curve; a crawl re-scraping itself decays
    * toward zero — the aggregate complement to pairwise dedup (it
    * sees *mass* turning stale, not who duplicates whom).
    *
    * First-occurrence is a groupBy, not a window: each shingle's
    * min(doc_id) is its debut, and a document's novel count is the
    * number of its shingles debuting in it. Integer novelty in ppm.
    *
    * Scale shape: one explode to DISTINCT (shingle-hash, doc) pairs,
    * one shingle-keyed min-aggregate (map-side combined), one join
    * back on the hash, one doc-keyed rollup — every shuffle keyed on
    * hash or doc id, nothing quadratic, no ordering dependence beyond
    * the debut min. Reported per SOURCE (p50-style per-doc rows would
    * be fine too; the per-source rollup keeps the gate output small):
    * docs, total distinct shingle slots, novel mass, novelty_ppm. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("t", toks(col("text")))
      .select(col("source"), col("doc_id"), explode_outer(
        when(size(col("t")) >= 8,
          array_distinct(transform(sequence(lit(1), size(col("t")) - 7),
            i => Hashing.phash(concat_ws(" ",
              (0 until 8).map(o => element_at(col("t"), i + o)): _*), "nov_"))))
          .otherwise(array().cast("array<long>"))).as("h"))
      .filter(col("h").isNotNull)
      .transform(graft.util.Fence.lineage)
    val debut = pairs.groupBy(col("h")).agg(min(col("doc_id")).as("debut"))
    pairs.join(debut, Seq("h"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("debut") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_shingles")).cast("long").as("n_shingles"),
        sum(col("n_novel")).cast("long").as("n_novel"))
      .withColumn("novelty_ppm",
        floor(col("n_novel") * 1000000.0 / nullif(col("n_shingles"), lit(0L)))
          .cast("long"))
      .orderBy(col("source"))
  }

  val ngramNoveltySql: String = {
    val gram = (1 to 8).map(o => s"t[i + ${o - 1}]").mkString("concat_ws(' ', ", ", ", ")")
    s"""WITH p AS (
         SELECT DISTINCT source, doc_id, unnest(
           CASE WHEN len(t) >= 8
                THEN list_distinct(list_transform(generate_series(1, len(t) - 7),
                       i -> ${Hashing.phashSql(gram, "nov_")}))
                ELSE [] END) AS h
         FROM (SELECT source, doc_id, ${toksSql("text")} AS t FROM documents)),
       debut AS (SELECT h, min(doc_id) AS debut FROM p GROUP BY h),
       perdoc AS (
         SELECT p.source, p.doc_id, count(*) AS n_shingles,
           sum(CASE WHEN d.debut = p.doc_id THEN 1 ELSE 0 END) AS n_novel
         FROM p JOIN debut d USING (h)
         GROUP BY p.source, p.doc_id)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_shingles) AS BIGINT) AS n_shingles,
         CAST(sum(n_novel) AS BIGINT) AS n_novel,
         CAST(floor(sum(n_novel) * 1000000.0 / nullif(sum(n_shingles), 0))
           AS BIGINT) AS novelty_ppm
       FROM perdoc GROUP BY source ORDER BY source"""
  }

  // ---- Adaptive per-source length gate ------------------------------

  /** Per-source adaptive quality gate: keep documents whose token
    * count lies within the source's own [p5, p95] band. Every corpus
    * mixes sources with wildly different length profiles, so a global
    * cutoff either guts the short-form source or keeps the long-form
    * source's junk — the production rule derives cutoffs PER SOURCE,
    * from the data, in-query (no driver-side probe; the CLAUDE.md
    * convention). The discrete percentile is exact integer logic:
    * p5 = min length whose running count clears n/20
    * (`cum*20 >= n` — cross-multiplication, no doubles, no engine
    * percentile function whose interpolation differs cross-engine).
    *
    * Scale shape: one narrow tokenize map, then everything runs on
    * the (source, n_tok) HISTOGRAM — the window sorts per-source
    * distinct lengths, not rows (the value_quantiles trick), the
    * cutoff agg collapses it to one row per source, and the kept-mass
    * rollup is a second tiny agg over the same histogram. The raw
    * corpus is scanned exactly once. */
  def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val h = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("source"), size(toks(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"), col("n_tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
      // referenced by the cutoff agg AND the kept-mass rollup
      .transform(graft.util.Fence.lineage)
    val cuts = h.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("cum") * 20 >= col("n"), col("n_tok"))).as("lo_tok"),
        min(when(col("cum") * 20 >= col("n") * 19, col("n_tok"))).as("hi_tok"))
    h.join(broadcast(cuts), Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).cast("long").as("n_docs"),
        max(col("lo_tok")).cast("long").as("lo_tok"),
        max(col("hi_tok")).cast("long").as("hi_tok"),
        sum(when(col("n_tok").between(col("lo_tok"), col("hi_tok")), col("c"))
          .otherwise(0L)).cast("long").as("n_kept"))
      .withColumn("n_dropped", (col("n_docs") - col("n_kept")).cast("long"))
      .orderBy(col("source"))
  }

  val qualityGateSql: String =
    s"""WITH d AS (
         SELECT source, CAST(len(${toksSql("text")}) AS BIGINT) AS n_tok
         FROM documents),
       h AS (
         SELECT source, n_tok, count(*) AS c FROM d GROUP BY source, n_tok),
       r AS (
         SELECT source, n_tok, c,
           sum(c) OVER (PARTITION BY source ORDER BY n_tok
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c) OVER (PARTITION BY source) AS n
         FROM h),
       cuts AS (
         SELECT source, max(n) AS n_docs,
           min(CASE WHEN cum * 20 >= n THEN n_tok END) AS lo_tok,
           min(CASE WHEN cum * 20 >= n * 19 THEN n_tok END) AS hi_tok
         FROM r GROUP BY source)
       SELECT r.source, CAST(max(ct.n_docs) AS BIGINT) AS n_docs,
         CAST(max(ct.lo_tok) AS BIGINT) AS lo_tok,
         CAST(max(ct.hi_tok) AS BIGINT) AS hi_tok,
         CAST(sum(CASE WHEN r.n_tok BETWEEN ct.lo_tok AND ct.hi_tok
           THEN r.c ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(max(ct.n_docs) - sum(CASE WHEN r.n_tok BETWEEN ct.lo_tok AND ct.hi_tok
           THEN r.c ELSE 0 END) AS BIGINT) AS n_dropped
       FROM r JOIN cuts ct USING (source)
       GROUP BY r.source ORDER BY r.source"""

  /** Quantile normalization of document length within each source —
    * the rank transform that makes per-source quality scores
    * COMPARABLE before mixing corpora (a 2,000-char doc is long for
    * tweets, short for books; mixture weighting on raw scores
    * silently favors verbose sources). Each doc gets its source-
    * conditional midrank percentile in exact ppm:
    * (2·cum_before + cnt_at_value)·500000 div n — ties share one
    * midrank, the distribution-free convention.
    *
    * Scale shape: the percentile derives from the per-(source, len)
    * HISTOGRAM (map-side combined), the cumulative window sorts only
    * distinct lengths per source, and the transform rejoins raw rows
    * on the (source, len) key — raw rows are never globally sorted,
    * the property that separates this from a naive percent_rank
    * window over 10⁹ documents. Output is capped to the 40 most
    * extreme docs per tail by rank for presentation; the transform
    * itself is full-corpus. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("len"))
    val hist = docs.groupBy(col("source"), col("len"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("source"))
    val ranked = hist
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select(col("source"), col("len"),
        expr("(2 * cum_before + cnt) * 500000 div n").as("pct_ppm"))
    val j = docs.join(ranked, Seq("source", "len"))
      .select(col("doc_id"), col("source"), col("len"), col("pct_ppm"))
      .transform(graft.util.Fence.lineage) // both tail heads read it
    j.orderBy(col("pct_ppm"), col("doc_id"))
      .limit(40)
      .unionByName(
        j.orderBy(col("pct_ppm").desc, col("doc_id").desc).limit(40))
      .orderBy(col("pct_ppm"), col("doc_id"))
  }

  val quantileNormalizeSql: String =
    """WITH d AS (
         SELECT doc_id, source, n_chars AS len FROM documents),
       h AS (
         SELECT source, len, count(*) AS cnt FROM d GROUP BY source, len),
       r AS (
         SELECT source, len,
           CAST((2 * coalesce(sum(cnt) OVER (PARTITION BY source
               ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) + cnt) * 500000
             // sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS pct_ppm
         FROM h),
       j AS (
         SELECT d.doc_id, d.source, d.len, r.pct_ppm
         FROM d JOIN r ON r.source = d.source AND r.len = d.len),
       lo AS (SELECT * FROM j ORDER BY pct_ppm, doc_id LIMIT 40),
       hi AS (SELECT * FROM j ORDER BY pct_ppm DESC, doc_id DESC LIMIT 40)
       SELECT * FROM (SELECT * FROM lo UNION ALL SELECT * FROM hi)
       ORDER BY pct_ppm, doc_id"""
}
