package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Hashing

/** Deduplication operators (BASELINE.json north-star): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard — each shaped for 100 TB:
  *
  *  - exact: one hash-groupBy (single shuffle on the content hash);
  *  - MinHash+LSH: signatures are a narrow map; candidates come from
  *    an equi-JOIN on (band, band_hash) buckets — never a cross join —
  *    then only candidates pay the exact-Jaccard verification. This
  *    is the canonical shingle→minhash→band→bucket-join pipeline;
  *  - SimHash: explode tokens → one groupBy(doc) with 16 conditional
  *    sums → bit-pack; near-dups collide in equal/adjacent buckets;
  *  - n-gram Jaccard: pairwise only *within* a pre-bucket (source),
  *    the join-key trick that keeps pair counts bounded.
  *
  * All hashing goes through [[Hashing.phash]] so every operator has a
  * DuckDB oracle — the sketches themselves are checked, not just row
  * counts.
  *
  * The synthetic `documents` rows are mutually-random word salads, so
  * a corpus of true near-duplicates is synthesized in-query: every
  * doc_id % 5 == 0 gains a twin (doc_id + 1000000) with one token
  * appended. LSH must find exactly those pairs (and exact-dedup must
  * NOT merge them).
  */
object Dedup {

  /** Corpus with injected near-duplicate twins (deterministic). */
  private[graft] def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val twins = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zqxj")).as("text"))
    // the documents table is one small parquet split; spread the
    // CPU-bound shingling/hashing across cores (cheap narrow shuffle)
    d.unionAll(twins).repartition(spark.sparkContext.defaultParallelism)
  }

  private val corpusSql: String =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id, concat(text, ' zqxj') AS text
         FROM documents WHERE doc_id % 5 = 0)"""

  /** Exact dedup: md5-content groupBy; keeper = min(doc_id).
    * Twins differ by a token, so they must NOT merge here. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper_id"))

  val dedupExactSql: String =
    s"""WITH $corpusSql
       SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM corpus GROUP BY md5(text) ORDER BY keeper_id"""

  // ---- MinHash + LSH ------------------------------------------------
  //
  // Why the MinHash banding is NOT corpus-adaptive the way
  // [[simhashPairsOf]]'s is: simhash's two band layouts are
  // OUTPUT-EQUIVALENT (both give complete recall at hamming ≤ 3 and
  // the exact bit_count verify decides membership), so its N-derived
  // knob can only change the physical plan. MinHash banding has no
  // such equivalence — with K = b·r fixed, widening bands (r 2→4)
  // moves the S-curve threshold s* = (1/b)^(1/r) from 0.35 to 0.71,
  // ABOVE the 0.5 verify threshold: pairs at jaccard ≈ 0.5 would
  // surface with P ≈ 0.23 instead of ≈ 0.9 — a recall change in the
  // RESULT, not a plan change. The measured superlinearity of this
  // family on replica corpora is, correspondingly, not a false-
  // candidate problem a band knob could fix: bucket mass there comes
  // from signature-identical replica clusters whose pairs verify
  // (output itself grows ~M²), and the 60-bit band hash adds no
  // spurious collisions of its own. The output-preserving scale
  // levers are therefore the ones this pipeline already uses — the
  // emit-once band-prefix guard (no pair-dedup shuffle), id-only
  // candidate frames, staged signatures — plus, at a real 10⁹-doc
  // deployment, running EXACT dedup first so signature-identical
  // clusters collapse to one representative before LSH ever bands
  // them (the standard exact-then-near pipeline order; dedupExact
  // and dedupGroups are those stages here), which removes the M²
  // replica term without touching near-dup semantics.

  private val K = 16        // minhash functions
  private val BANDS = 8     // LSH bands of 2 rows each
  private val ROWS = K / BANDS

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word 3-gram shingles. */
  private[graft] def shingles(c: Column): Column = {
    val t = tokens(c)
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
    .otherwise(array(c))
  }

  private val shinglesSql: String =
    """CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
       THEN list_transform(generate_series(1, len(string_split_regex(trim(text), '\s+')) - 2),
              i -> concat_ws(' ', string_split_regex(trim(text), '\s+')[i],
                             string_split_regex(trim(text), '\s+')[i+1],
                             string_split_regex(trim(text), '\s+')[i+2]))
       ELSE [text] END"""

  /** Affine MinHash family: one md5 per shingle reduced to 32 bits,
    * then K independent `(a_i*h + b_i) mod P` permutations — the
    * standard trick that makes K minhashes cost one strong hash.
    * All arithmetic stays < 2^63 (a < 2^31, h < 2^32) so both engines
    * compute it exactly. Coefficients are md5-derived constants,
    * embedded identically in the SQL twin. */
  private[graft] val MODP = 4294967311L   // prime > 2^32
  private[graft] val affine: Seq[(Long, Long)] = (0 until K).map { i =>
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long =
      BigInt(1, md.digest(s.getBytes("UTF-8"))).longValue.abs
    (h(s"a_$i") % 2147483646L + 1L, h(s"b_$i") % MODP)
  }

  /** doc → (doc_id, hs DISTINCT 32-bit shingle hashes, sig ARRAY<LONG>
    * of K minhashes). The verify step downstream intersects `hs`, not
    * the shingle strings: both engines hash identically so the oracle
    * stays in lockstep, the Jaccard is exact modulo 2^-32 collisions,
    * and the verify joins shuffle longs instead of ~30-char strings.
    * Ends in a repartition barrier: downstream consumers (the band
    * explode and the self-join) reference `sig`/`hs` many times, and
    * without a materialization boundary the optimizer inlines the
    * whole md5+minhash pipeline once per reference. */
  private[graft] def signaturesOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("sh", shingles(col("text")))
      .withColumn("hs", array_distinct(
        transform(col("sh"), s => Hashing.phash(s) % 4294967296L)))
      // fused native expression — one pass over hs with K running
      // minima, vs K transform+array_min array materializations
      // (identical semantics; see graft.functions.MinHashSig)
      .withColumn("sig", graft.functions.MinHashSig(col("hs"), affine, MODP))
      .select(col("doc_id"), col("hs"), col("sig"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      // the repartition alone does NOT stop PushDownPredicates: the
      // band explode's inferred generate-filter would travel through
      // the exchange onto the raw scan with the whole md5+minhash
      // pipeline inlined (single-split-serial — the CLAUDE.md trap)
      .transform(graft.util.Fence.lineage)

  /** Staged MinHash signature table — the "index build" artifact the
    * whole LSH family consumes (pair mining, threshold calibration,
    * split-leakage audit, fuzzy-edit blocking, the signature dump
    * itself). Computed once per (session, corpus) and persisted via
    * [[graft.util.StagedCache]] — five operators each re-deriving the
    * shingle→hash→K-minima pipeline is exactly the repeated work a
    * production pipeline avoids by writing the signature parquet
    * once. Same immutable-corpus contract and lifecycle as the
    * keeper table ([[keeperTable]]); [[invalidateStaged]] drops both. */
  private val sigCache = new graft.util.StagedCache

  private def signatures(spark: SparkSession, dir: String): DataFrame =
    sigCache.getOrCompute(spark, dir) {
      signaturesOf(corpus(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private[graft] def stagedSigKeys: Set[(SparkSession, String)] =
    sigCache.stagedKeys

  private val signaturesSql: String = {
    val mins = affine.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $MODP))"
    }.mkString(",\n           ")
    s"""sh AS (SELECT doc_id, $shinglesSql AS sh FROM corpus),
       hs AS (SELECT doc_id, list_distinct(list_transform(sh, s -> ${Hashing.phashSql("s")} % 4294967296)) AS hs FROM sh),
       sigs AS (SELECT doc_id, hs, [$mins] AS sig FROM hs)"""
  }

  /** Array of the BANDS per-band LSH bucket hashes of `sig`. */
  private[graft] def bandHashes(saltPrefix: String): Column =
    array((0 until BANDS).map { b =>
      Hashing.phash(concat_ws("_",
        (0 until ROWS).map(r => element_at(col("sig"), b * ROWS + r + 1).cast("string")): _*),
        s"$saltPrefix${b}_")
    }: _*)

  /** True iff no band BEFORE `band` also matches — the emit-once
    * guard that replaces a pair-dedup shuffle: a near-dup pair
    * colliding in k bands would otherwise reach the candidate set k
    * times (measured ~4× at sf0.1). `band` is 0-based. Written as a
    * flat AND-chain of guarded element compares, NOT slice+zip_with+
    * forall: the guard runs once per RAW joined row (2.07M at sf0.1
    * for ngram_jaccard), and the array-allocating form was the single
    * largest cost in the whole pipeline (~1s of its 3.5s). */
  private[graft] def firstMatchingBand(bhs1: Column, bhs2: Column, band: Column): Column =
    (0 until BANDS - 1).map { i =>
      band <= i || element_at(bhs1, i + 1) =!= element_at(bhs2, i + 1)
    }.reduce(_ && _)

  /** SQL twin of [[firstMatchingBand]] (1-based prefix positions). */
  private def firstMatchingBandSql(l: String, r: String): String =
    s"len(list_filter(generate_series(1, CAST($l.band AS BIGINT)), i -> $l.bhs[i] = $r.bhs[i])) = 0"

  /** MinHash signature dump (itself oracle-checked: the sketches are
    * bit-identical across engines). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir)
      .select(col("doc_id") +: (0 until K).map(i =>
        element_at(col("sig"), i + 1).as(s"h$i")): _*)
      .orderBy(col("doc_id"))

  val minhashSignaturesSql: String = {
    val cols = (0 until K).map(i => s"sig[${i + 1}] AS h$i").mkString(", ")
    s"""WITH $corpusSql, $signaturesSql
       SELECT doc_id, $cols FROM sigs ORDER BY doc_id"""
  }

  /** Verified LSH near-dup pairs (jaccard >= 0.5, unordered) over a
    * signature frame — shared by [[dedupMinhashLsh]] and
    * [[dedupGroups]].
    *
    * Banded rows carry (doc_id, bhs, band, bh) — band_hash = phash of
    * the band's signature rows; the shingle arrays are joined back by
    * doc_id at the verify step, exactly like the DuckDB twin, and the
    * bhs prefix filter emits each pair only from its first matching
    * band (no pair-dedup shuffle). The references to `sig` share one
    * physical shuffle via ReuseExchange. */
  /** Emit-once LSH candidate pairs (id1 < id2) from a signature
    * frame — the shared blocking stage of [[lshPairsOf]] (Jaccard
    * verify) and [[fuzzyEditOf]] (edit-distance verify). */
  private[graft] def lshCandidatesOf(sig: DataFrame): DataFrame = {
    val banded = sig.withColumn("bhs", bandHashes("band"))
      .select(col("doc_id"), col("bhs"),
        posexplode_outer(col("bhs")).as(Seq("band", "bh")))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.doc_id") < col("r.doc_id") &&
        firstMatchingBand(col("l.bhs"), col("r.bhs"), col("l.band")))
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
  }

  private[graft] def lshPairsOf(sig: DataFrame): DataFrame = {
    val cand = lshCandidatesOf(sig)
    // hs is already the DISTINCT shingle-hash set, so |A∪B| comes
    // from sizes (|A|+|B|-|A∩B|) — half the per-pair array work of
    // materializing the union, over longs instead of shingle strings
    val sh = sig.select(col("doc_id"), col("hs").as("shd"))
    cand
      .join(sh.select(col("doc_id").as("id1"), col("shd").as("sh1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("shd").as("sh2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      // exact integer unfold of floor(j*10000+0.5)/10000 >= 0.5
      // (j >= 9999/20000) — see ngramJaccardOf for why
      .filter(col("inter") * 29999 >= (size(col("sh1")) + size(col("sh2"))) * 9999)
      .withColumn("jaccard",
        floor(col("inter").cast("double") /
              (size(col("sh1")) + size(col("sh2")) - col("inter")) * 10000 + 0.5) / 10000)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** LSH near-dup pairs: band the signature, bucket-join on
    * (band, band_hash), verify candidates with exact shingle Jaccard.
    * Output: the verified near-duplicate pairs (jaccard >= 0.5). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshPairsOf(signatures(spark, dir)).orderBy(col("id1"), col("id2"))

  /** CTE chain `sh .. cand(id1, id2)` — the SQL twin of
    * [[lshCandidatesOf]], downstream of a CTE named `corpus`. */
  private val lshCandCtes: String = {
    val bhList = (0 until BANDS).map { b =>
      val parts = (0 until ROWS).map(r => s"CAST(sig[${b * ROWS + r + 1}] AS VARCHAR)").mkString(", ")
      Hashing.phashSql(s"concat_ws('_', $parts)", s"band${b}_")
    }.mkString("[", ",\n           ", "]")
    val bandRows = (0 until BANDS).map { b =>
      s"SELECT doc_id, bhs, $b AS band, bhs[${b + 1}] AS bh FROM sigs2"
    }.mkString("\n         UNION ALL\n         ")
    s"""$signaturesSql,
       sigs2 AS (SELECT doc_id, $bhList AS bhs FROM sigs),
       banded AS (
         $bandRows),
       cand AS (
         SELECT l.doc_id AS id1, r.doc_id AS id2
         FROM banded l JOIN banded r
           ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
          AND ${firstMatchingBandSql("l", "r")})"""
  }

  /** CTE chain `sh .. j(id1, id2, jaccard)` — the SQL twin of
    * [[lshPairsOf]], downstream of a CTE named `corpus`. */
  private val lshPairsCtes: String =
    s"""$lshCandCtes,
       shd AS (SELECT doc_id, hs AS shd FROM hs),
       j AS (
         SELECT c.id1, c.id2,
           floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE) /
                 (len(a.shd) + len(b.shd) - len(list_intersect(a.shd, b.shd)))
                 * 10000 + 0.5) / 10000 AS jaccard
         FROM cand c
         JOIN shd a ON a.doc_id = c.id1
         JOIN shd b ON b.doc_id = c.id2)"""

  val dedupMinhashLshSql: String =
    s"""WITH $corpusSql,
       $lshPairsCtes
       SELECT id1, id2, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY id1, id2"""

  /** Near-duplication rate BY SOURCE: what share of each source's
    * documents has at least one verified near-dup anywhere in the
    * corpus — the per-feed contamination scoreboard a crawl operator
    * watches (a source whose dup ppm climbs is re-scraping itself or
    * mirroring another feed). Reuses the STAGED signature table and
    * the shared emit-once pair generator, so the marginal cost over
    * [[dedupMinhashLsh]] is one id-distinct and one broadcast-sized
    * join per source row; rate is exact ppm.
    *
    * Scale shape: dup ids are (id)-only frames; the documents side
    * never carries text past its (id, source) projection. */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val pairs = lshPairsOf(signatures(spark, dir))
      .filter(col("jaccard") >= 0.5)
    val dup = pairs.select(col("id1").as("doc_id"))
      .unionAll(pairs.select(col("id2").as("doc_id")))
      .distinct()
      .withColumn("is_dup", lit(1L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(dup, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).cast("long").as("n_dup_docs"))
      .withColumn("dup_ppm",
        floor(col("n_dup_docs").cast("double") * 1000000 / col("n_docs"))
          .cast("long"))
      .orderBy(col("source"))
  }

  val dupRateBySourceSql: String =
    s"""WITH $corpusSql,
       $lshPairsCtes,
       dup AS (
         SELECT DISTINCT doc_id FROM (
           SELECT id1 AS doc_id FROM j WHERE jaccard >= 0.5
           UNION ALL
           SELECT id2 AS doc_id FROM j WHERE jaccard >= 0.5)),
       g AS (
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup_docs
         FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
         GROUP BY d.source)
       SELECT source, n_docs, n_dup_docs,
         CAST(floor(CAST(n_dup_docs AS DOUBLE) * 1000000 / n_docs) AS BIGINT)
           AS dup_ppm
       FROM g ORDER BY source"""

  /** Three-kind corpus for [[dedupPipeline]]: base docs + EXACT
    * copies (`doc_id%3==0` at +2,000,000 — above every replica id
    * range AND the +1,000,000 twin offset — byte-identical text, the
    * mirror/re-crawl class) + NEAR twins (`doc_id%5==0` at
    * +1,000,000, one appended token). Exact copies must collapse in
    * the hash stage; near twins must survive it and be caught by the
    * LSH stage. */
  private[graft] def corpus3(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val copies = d.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
    val twins = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zqxj")).as("text"))
    d.unionAll(copies).unionAll(twins)
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** EXACT-THEN-NEAR pipeline composition — the production lever the
    * MinHash family's scaladoc names instead of a band knob (see the
    * block comment above [[dedupExact]]'s LSH section): run the cheap
    * hash-groupBy collapse FIRST so content-identical clusters reach
    * the LSH stage as ONE representative each, removing the M²
    * replica term from the banded self-join without touching near-dup
    * semantics (the `pull_report.pl` precedent — decorrelate the
    * cheap collapse before the expensive pass). Reports each stage's
    * in/out doc counts: stage 1 = exact md5 collapse (keeper =
    * min(doc_id), min(text) is well-defined — all texts in a group
    * are identical), stage 2 = verified LSH near-dup pass over the
    * SURVIVORS with the greedy keep-lowest rule (a doc is removable
    * iff it appears as the higher id of a verified pair; the full
    * component resolution is [[dedupGroups]]' job).
    *
    * Scale shape: one content-hash groupBy (map-side partial) + the
    * standard staged-signature LSH over the strictly smaller survivor
    * set — the collapse and signature build are STAGED once per
    * (session, corpus) via [[pipelineSigs]], the same pattern as the
    * raw corpus's [[sigCache]]; the three 1-row stage counts ride
    * broadcast cross joins and the 2-row report explodes from a
    * single assembled row, so every aggregate runs exactly once. */
  /** Staged SURVIVOR signature table for [[dedupPipeline]] — the
    * md5 collapse + shingle→minhash build runs once per (session,
    * corpus) exactly like [[sigCache]] does for the raw corpus; a
    * production pipeline writes the collapsed corpus and its
    * signature parquet once and every near-dup pass reads them. One
    * row per survivor, so the stage-1 output count reads off this
    * table for free. */
  private val pipeSigCache = new graft.util.StagedCache

  private def pipelineSigs(spark: SparkSession, dir: String): DataFrame =
    pipeSigCache.getOrCompute(spark, dir) {
      val survivors = corpus3(spark, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"))
        .select(col("doc_id"), col("text"))
      signaturesOf(survivors)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  def dedupPipeline(spark: SparkSession, dir: String): DataFrame = {
    val raw = corpus3(spark, dir)
    val sig = pipelineSigs(spark, dir)
    val pairs = lshPairsOf(sig).select(col("id1"), col("id2"))
    val nRaw = raw.agg(count(lit(1)).as("n_raw"))
    // the signature table carries exactly one row per survivor
    val nSurv = sig.agg(count(lit(1)).as("n_surv"))
    val nRm = pairs.agg(countDistinct(col("id2")).as("n_rm"))
    nRaw.crossJoin(broadcast(nSurv)).crossJoin(broadcast(nRm))
      .select(explode_outer(array(
        struct(lit("1_exact").as("stage"),
          col("n_raw").cast("long").as("n_in"),
          col("n_surv").cast("long").as("n_out")),
        struct(lit("2_near").as("stage"),
          col("n_surv").cast("long").as("n_in"),
          (col("n_surv") - col("n_rm")).cast("long").as("n_out")))).as("s"))
      .filter(col("s").isNotNull)
      .select(col("s.stage").as("stage"), col("s.n_in").as("n_in"),
        col("s.n_out").as("n_out"))
      .orderBy(col("stage"))
  }

  val dedupPipelineSql: String =
    s"""WITH raw AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id, concat(text, ' zqxj') AS text
         FROM documents WHERE doc_id % 5 = 0),
       corpus AS (
         SELECT min(doc_id) AS doc_id, min(text) AS text
         FROM raw GROUP BY md5(text)),
       $lshPairsCtes,
       nr AS (SELECT CAST(count(*) AS BIGINT) AS n_raw FROM raw),
       ns AS (SELECT CAST(count(*) AS BIGINT) AS n_surv FROM corpus),
       rm AS (SELECT CAST(count(DISTINCT id2) AS BIGINT) AS n_rm
              FROM j WHERE jaccard >= 0.5)
       SELECT stage, n_in, n_out FROM (
         SELECT '1_exact' AS stage, nr.n_raw AS n_in, ns.n_surv AS n_out
         FROM nr, ns
         UNION ALL
         SELECT '2_near' AS stage, ns.n_surv AS n_in,
           ns.n_surv - rm.n_rm AS n_out
         FROM ns, rm)
       ORDER BY stage"""

  /** Dedup THRESHOLD CALIBRATION sweep — the report a team reads
    * before picking its near-dup cutoff: over ONE banded-LSH
    * candidate set (recall floor 0.5, same generator as
    * [[dedupMinhashLsh]]), the verified pair count and the
    * would-be-dropped doc count (docs appearing as the higher id of a
    * qualifying pair, the keep-lowest-id policy) at every threshold
    * from 50% to 95%. Each threshold test is the same exact integer
    * unfold as the operators use (`inter·(20000+200t−1) ≥
    * (|A|+|B|)·(200t−1)` ⟺ rounded-jaccard ≥ t/100) — no double
    * comparisons, so the sweep is bit-identical cross-engine and
    * NEVER disagrees with what [[dedupMinhashLsh]] at that threshold
    * would return.
    *
    * Scale shape: the candidate generation + verify runs ONCE (the
    * expensive part, identical to the 0.5 dedup); the sweep itself
    * is a 10-way literal explode of the verified (inter, sz) pair
    * rows into a 10-key map-side-combined groupBy — linear in
    * verified pairs, which the banding already bounds. */
  def dedupThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val sig = signatures(spark, dir)
    val cand = lshCandidatesOf(sig)
    val sh = sig.select(col("doc_id"), col("hs").as("shd"))
    val sized = cand
      .join(sh.select(col("doc_id").as("id1"), col("shd").as("sh1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("shd").as("sh2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("inter"),
        (size(col("sh1")) + size(col("sh2"))).cast("long").as("sz"))
      .filter(col("inter") * 29999 >= col("sz") * 9999)
    sized
      .select(col("id2"), col("inter"), col("sz"),
        explode(array((50L to 95L by 5L).map(lit): _*)).as("threshold_pct"))
      .filter(col("inter") * (col("threshold_pct") * 200 + 19999) >=
              col("sz") * (col("threshold_pct") * 200 - 1))
      .groupBy(col("threshold_pct"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id2")).as("n_docs_dropped"))
      .orderBy(col("threshold_pct"))
  }

  val dedupThresholdSweepSql: String =
    s"""WITH $corpusSql,
       $lshCandCtes,
       sized AS (
         SELECT c.id1, c.id2,
           CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter,
           CAST(len(a.hs) + len(b.hs) AS BIGINT) AS sz
         FROM cand c
         JOIN hs a ON a.doc_id = c.id1
         JOIN hs b ON b.doc_id = c.id2),
       base AS (SELECT * FROM sized WHERE inter * 29999 >= sz * 9999),
       t AS (SELECT CAST(unnest([50, 55, 60, 65, 70, 75, 80, 85, 90, 95]) AS BIGINT) AS threshold_pct)
       SELECT threshold_pct,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT id2) AS BIGINT) AS n_docs_dropped
       FROM base CROSS JOIN t
       WHERE inter * (threshold_pct * 200 + 19999) >= sz * (threshold_pct * 200 - 1)
       GROUP BY threshold_pct ORDER BY threshold_pct"""

  // ---- Split-leakage audit ------------------------------------------

  /** Train/val/test split-leakage audit — the composition check a
    * training pipeline runs AFTER assigning splits and BEFORE
    * training: near-duplicate pairs whose two members landed in
    * DIFFERENT splits leak evaluation data into training (the
    * benchmark-contamination failure mode at the near-dup level,
    * where [[graft.ext.Corpus.decontaminate]] handles the exact
    * n-gram level). Reuses the banded-LSH verified pairs of
    * [[dedupMinhashLsh]] unchanged, assigns each member its split via
    * the SAME content-independent hash rule as
    * [[graft.ext.Corpus.splitAssign]] (a narrow map on the id — no
    * join against a split table needed, which is the point of a
    * deterministic split function), and rolls up pair counts per
    * unordered split pair with a leak flag.
    *
    * Scale shape: identical to dedup_minhash_lsh (the dominant cost)
    * plus one map-side-combined groupBy on a ≤6-row key space. */
  /** The deterministic content-independent split rule shared by
    * [[splitLeakage]] (which applies it per DOC and counts the leaks
    * that causes) and [[leakageFreeSplit]] (which applies it per
    * near-dup COMPONENT, making leaks impossible) — same rule as
    * [[graft.ext.Corpus.splitAssign]]. */
  private def splitOf(id: Column): Column = {
    val h = graft.util.Hashing.phash(id.cast("string"), "split_") % 1000
    when(h < 980, lit("train")).when(h < 990, lit("val")).otherwise(lit("test"))
  }

  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    lshPairsOf(signatures(spark, dir))
      .select(col("id1"), col("id2"),
        splitOf(col("id1")).as("s1"), splitOf(col("id2")).as("s2"))
      .select(least(col("s1"), col("s2")).as("split_a"),
        greatest(col("s1"), col("s2")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        max(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
          .as("leaked"))
      .orderBy(col("split_a"), col("split_b"))
  }

  val splitLeakageSql: String = {
    def splitOfSql(id: String): String = {
      val h = s"(${graft.util.Hashing.phashSql(s"CAST($id AS VARCHAR)", "split_")} % 1000)"
      s"CASE WHEN $h < 980 THEN 'train' WHEN $h < 990 THEN 'val' ELSE 'test' END"
    }
    s"""WITH $corpusSql,
       $lshPairsCtes,
       pairs AS (SELECT id1, id2 FROM j WHERE jaccard >= 0.5),
       tagged AS (
         SELECT least(${splitOfSql("id1")}, ${splitOfSql("id2")}) AS split_a,
                greatest(${splitOfSql("id1")}, ${splitOfSql("id2")}) AS split_b
         FROM pairs)
       SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(max(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END) AS BIGINT) AS leaked
       FROM tagged GROUP BY split_a, split_b ORDER BY split_a, split_b"""
  }

  // ---- Edit-distance near-dup (LSH-blocked levenshtein) -------------

  /** Edit-distance near-dup pairs over an LSH-blocked candidate set —
    * the candidate-then-verify composition a typo-level dedup runs in
    * production: [[lshCandidatesOf]] bounds the pair count (banded
    * equi-join, never all-pairs), and only candidates pay the O(n·m)
    * levenshtein verification. Both engines implement classical
    * unit-cost Levenshtein, so the distance is integer-exact
    * cross-engine. Keeps pairs with relative edit distance <= 20%
    * (integer cross-multiplication `lev*5 <= max(len)` — no doubles).
    * The lev/len projection sits behind a lineage fence: `lev` feeds
    * both the threshold filter and the output, and CollapseProject +
    * PushDownPredicates would otherwise inline the full DP once per
    * reference (and push it into the join). Recall is bounded by the
    * LSH blocking — an edit-close pair with disjoint shingles is
    * invisible, the documented trade of every blocked fuzzy dedup. */
  private[graft] def fuzzyEditOf(docs: DataFrame): DataFrame =
    fuzzyEditFromSig(signaturesOf(docs), docs)

  /** (candidate pairs, verified output) of the fuzzy-edit pipeline
    * over one shared signature build — the [[graft.tools.ProfileNgram]]
    * stage handle. */
  private[graft] def fuzzyEditStagesOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val sig = signaturesOf(docs)
    (lshCandidatesOf(sig), fuzzyEditFromSig(sig, docs))
  }

  private def fuzzyEditFromSig(sig: DataFrame, docs: DataFrame): DataFrame = {
    val cand = lshCandidatesOf(sig)
    val t = docs.select(col("doc_id"), col("text"))
    cand
      .join(t.select(col("doc_id").as("id1"), col("text").as("t1")), Seq("id1"))
      .join(t.select(col("doc_id").as("id2"), col("text").as("t2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("t1"), col("t2"),
        length(col("t1")).cast("long").as("len1"),
        length(col("t2")).cast("long").as("len2"))
      // length pre-gate: lev >= |len1 - len2|, so a length gap above
      // the threshold can never pass — prunes those candidates for the
      // price of two lengths, BEFORE anyone pays the O(n·m) DP (the
      // result is provably unchanged; at sf1 this is most of the cost)
      .filter(abs(col("len1") - col("len2")) * 5 <=
        greatest(col("len1"), col("len2")))
      .select(col("id1"), col("id2"),
        levenshtein(col("t1"), col("t2")).cast("long").as("lev"),
        col("len1"), col("len2"))
      // MATERIALIZING fence, deliberately not Fence.barrier: the
      // global orderBy below SAMPLES its input for range bounds, so
      // an unmaterialized DP pipeline would execute twice (measured:
      // 3.6 s → 5.6 s at sf1 with the zero-cost barrier)
      .transform(graft.util.Fence.lineage)
      .filter(col("lev") * 5 <= greatest(col("len1"), col("len2")))
      .orderBy(col("id1"), col("id2"))
  }

  def dedupFuzzyEdit(spark: SparkSession, dir: String): DataFrame =
    fuzzyEditFromSig(signatures(spark, dir), corpus(spark, dir))

  val dedupFuzzyEditSql: String =
    s"""WITH $corpusSql,
       $lshCandCtes
       SELECT c.id1, c.id2,
         CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
         CAST(len(a.text) AS BIGINT) AS len1,
         CAST(len(b.text) AS BIGINT) AS len2
       FROM cand c
       JOIN corpus a ON a.doc_id = c.id1
       JOIN corpus b ON b.doc_id = c.id2
       WHERE abs(len(a.text) - len(b.text)) * 5 <= greatest(len(a.text), len(b.text))
         AND levenshtein(a.text, b.text) * 5 <= greatest(len(a.text), len(b.text))
       ORDER BY id1, id2"""

  // ---- Connected-components dedup groups ---------------------------

  /** Two-twin corpus for [[dedupGroups]]: every doc_id%5==0 doc gains
    * twin A (+1,000,000) and every doc_id%10==0 doc ALSO gains twin B
    * (+200,000, a different appended token), so the near-dup graph
    * holds triangles {orig, A, B}, pairs {orig, A}, and singletons —
    * transitivity actually gets exercised. */
  private[graft] def corpus2(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val twinA = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zqxj")).as("text"))
    val twinB = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" qk7w")).as("text"))
    d.unionAll(twinA).unionAll(twinB)
      .repartition(spark.sparkContext.defaultParallelism)
  }

  private val corpus2Sql: String =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id, concat(text, ' zqxj') AS text
         FROM documents WHERE doc_id % 5 = 0
         UNION ALL
         SELECT doc_id + 200000 AS doc_id, concat(text, ' qk7w') AS text
         FROM documents WHERE doc_id % 10 = 0)"""

  /** Canonical-keeper assignment — the actual end product of a dedup
    * pipeline: LSH near-dup PAIRS become connected components, and
    * every doc maps to its component's min doc_id. Implemented as
    * distributed min-label propagation: each iteration is one join +
    * one groupBy (both shuffles on high-cardinality doc ids), and the
    * iteration count is bounded by the component diameter — O(log N)
    * with path-doubling variants (large-star/small-star) if deep
    * chains ever appear; near-dup graphs in practice are shallow.
    * Each iteration ends in an EAGER localCheckpoint so the plan does
    * not grow exponentially; at cluster scale use a reliable
    * checkpoint dir or a staging write instead (see
    * [[graft.util.Fence]] for the trade-off).
    *
    * The DuckDB twin computes the same fixpoint with a recursive CTE
    * over the identical edge set, so the grouping itself is
    * oracle-checked, not just the pair list. */
  def dedupGroups(spark: SparkSession, dir: String): DataFrame =
    keeperTable(spark, dir).orderBy(col("doc_id"))

  /** Memoized keeper assignment shared by [[dedupGroups]] and
    * [[dedupGroupSizes]] — the LSH + label-propagation pipeline runs
    * ONCE per (session, corpus) and every consumer reads the persisted
    * (doc_id, keeper_id) table. This is the staged-keeper pattern of a
    * production dedup run (compute the assignment, write it, derive
    * every report from the staged table); locally the stage is a
    * MEMORY_AND_DISK persist — recomputable on block loss, unlike a
    * local checkpoint — and at cluster scale the same role is played
    * by the staging parquet the job would write anyway.
    *
    * Lifecycle via [[graft.util.StagedCache]]: the corpus at `dir`
    * must be immutable while staged — rewriting it in-session requires
    * [[invalidateStaged]] first, and session teardown should call
    * [[graft.util.Staged.clearSession]] so the persisted blocks are
    * freed rather than accumulating across corpora. */
  private val keeperCache = new graft.util.StagedCache

  /** Drop the staged keeper table for `dir` (unpersisting its blocks)
    * — required before re-running dedup over a rewritten corpus. */
  def invalidateStaged(spark: SparkSession, dir: String): Unit = {
    keeperCache.invalidate(spark, dir)
    pairCache.invalidate(spark, dir)
    sigCache.invalidate(spark, dir)
    pipeSigCache.invalidate(spark, dir)
  }

  /** Staged VERIFIED near-dup pair list over [[corpus2]] — the edge
    * set [[keeperAssignment]] propagates AND the pair generator
    * [[leakageFreeSplit]]'s certificate audits. Staged alongside the
    * keeper table so the certificate reads the pairs the keeper table
    * was actually built from instead of re-running the dominant LSH
    * cost a second time per query. */
  private val pairCache = new graft.util.StagedCache

  private def verifiedPairs2(spark: SparkSession, dir: String): DataFrame =
    pairCache.getOrCompute(spark, dir) {
      lshPairsOf(signaturesOf(corpus2(spark, dir)))
        .select(col("id1"), col("id2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private[graft] def stagedKeeperKeys: Set[(SparkSession, String)] =
    keeperCache.stagedKeys

  private def keeperTable(spark: SparkSession, dir: String): DataFrame =
    keeperCache.getOrCompute(spark, dir) {
      keeperAssignment(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def keeperAssignment(spark: SparkSession, dir: String): DataFrame = {
    val docs = corpus2(spark, dir)
    // lshPairsOf already enforces the 0.5 threshold via its integer
    // predicate — re-filtering on the computed jaccard would inline a
    // second array_intersect per pair (the pushed-filter trap). The
    // pair list is itself staged ([[verifiedPairs2]]) so the leakage
    // certificate can re-read it without re-running the LSH.
    val pairs = verifiedPairs2(spark, dir)
    val edges = pairs.unionAll(
      pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    // iterate ONLY over edge-touched nodes: near-dup subgraphs are a
    // small fraction of any real corpus, so the per-iteration joins
    // run on |V(edges)| rows, not |corpus| — singletons rejoin at the
    // end as their own keeper. Init fuses round 1: every edge-touched
    // node starts at min(id, min(neighbors)) off ONE groupBy of the
    // symmetric edge list — replacing distinct + identity labels + a
    // full join-propagate round (two shuffles and two jobs) with a
    // single shuffle.
    val (labels, rounds) = minLabelComponentsWithRounds(edges)
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("keeper_id"),
        lit(rounds.toLong).as("cc_rounds"))
  }

  /** Min-label connected components over a SYMMETRIC `(id1, id2)`
    * edge list → `(id, label)` for every edge-touched node, where
    * `label` is the component's minimum id.
    *
    * Each round does two things: (1) one-hop MIN-LABEL PROPAGATION
    * (each node takes the min of its own and its neighbors' labels —
    * one join + one groupBy, both shuffling |V(edges)| rows), then
    * (2) one POINTER-JUMPING step on the label forest (`id → label`
    * composed with itself, so a node inherits its label's label —
    * the large-star/path-doubling move of the published CC-in-
    * MapReduce constructions). Propagation alone needs diameter
    * rounds — a 30-hop near-dup chain would blow the iteration cap;
    * with the jump the covered distance better-than-doubles per
    * round, so convergence is O(log diameter) and the cap of 20
    * rounds handles diameters past 2^20 — at which point the input
    * is not a near-dup graph but a bug, and the loud `require` is
    * the right answer (the oracle computes the true fixpoint, so a
    * silent cap would hash-mismatch anyway).
    *
    * Labels are monotone non-increasing and every label is itself an
    * edge-touched node of the same component, so the jump join is a
    * self-join on the label frame; convergence (`no label moved this
    * round`) reads off the same materializing count() that realizes
    * the non-eager checkpoint — one action per round. */
  private[graft] def minLabelComponents(edges: DataFrame): DataFrame =
    minLabelComponentsWithRounds(edges)._1

  /** [[minLabelComponents]] plus the ROUNDS-USED certificate: the
    * number of propagate+jump rounds the loop executed, including the
    * final verifying round where nothing moved. The count is known on
    * the driver once the (already-eager) per-round convergence counts
    * have run, so callers can ride it into the result as a literal —
    * and the DuckDB twins recompute the SAME number by unrolling the
    * identical kernel ([[ccRoundsSimCtes]]), making the certificate
    * oracle-checked rather than self-reported. */
  private[graft] def minLabelComponentsWithRounds(
      edges: DataFrame): (DataFrame, Int) = {
    var labels = edges.groupBy(col("id1").as("id"))
      .agg(min(col("id2")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("label"))
      .localCheckpoint(eager = false)
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      // the old label rides the aggregate as `prev` (each id has
      // exactly one non-null prev0), so convergence reads off the
      // checkpointed result — no extra join against the old frame
      val prop = edges.join(labels, edges("id1") === labels("id"))
        .select(edges("id2").as("id"), col("label"),
          lit(null).cast("long").as("prev0"))
      val next = labels.withColumn("prev0", col("label"))
        .unionAll(prop)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), min(col("prev0")).as("prev"))
      // pointer jump: follow id → label → label's label. A label with
      // no row of its own (the component min labels itself) keeps its
      // value via the left join + coalesce.
      val jumpTo = next.select(col("id").as("jid"), col("label").as("jlabel"))
      val jumped = next.join(jumpTo, next("label") === jumpTo("jid"), "left")
        .select(next("id"),
          least(next("label"), coalesce(col("jlabel"), next("label")))
            .as("label"),
          col("prev"))
        .localCheckpoint(eager = false)
      // min-label is monotone non-increasing: any strict decrease
      // means another round is needed. count() (not isEmpty) both
      // answers that and fully materializes the non-eager checkpoint
      // in the SAME job — one action per iteration instead of an
      // eager-checkpoint job followed by a convergence job
      converged = jumped.filter(col("label") < col("prev")).count() == 0L
      labels = jumped.select(col("id"), col("label"))
      iter += 1
    }
    require(converged,
      s"dedupGroups: label propagation did not converge in $iter iterations")
    (labels, iter)
  }

  /** DuckDB twin of the [[minLabelComponentsWithRounds]] ROUND COUNT:
    * an unrolled simulation of the exact propagate+jump kernel over a
    * symmetric CTE `edges(a, b)`, emitting a 1-row CTE
    * `ccr(cc_rounds)` = the first round in which no label strictly
    * decreased (NULL past `maxRounds`, which hash-mismatches loudly —
    * the SQL analogue of the Spark-side `require`). `edges` should be
    * MATERIALIZED by the caller: each round references it once. */
  private[graft] def ccRoundsSimCtes(maxRounds: Int): String = {
    val steps = (1 to maxRounds).map { i =>
      s"""n$i AS (
         SELECT id, min(label) AS label, min(prev0) AS prev FROM (
           SELECT id, label, label AS prev0 FROM l${i - 1}
           UNION ALL
           SELECT e.b AS id, l.label AS label, CAST(NULL AS BIGINT) AS prev0
           FROM edges e JOIN l${i - 1} l ON l.id = e.a) u
         GROUP BY id),
       j$i AS MATERIALIZED (
         SELECT n.id AS id, least(n.label, coalesce(t.label, n.label)) AS label,
           n.prev AS prev
         FROM n$i n LEFT JOIN n$i t ON t.id = n.label),
       l$i AS (SELECT id, label FROM j$i),
       mv$i AS (SELECT count(*) AS moved FROM j$i WHERE label < prev)"""
    }.mkString(",\n       ")
    val cases = (1 to maxRounds).map(i =>
      s"WHEN (SELECT moved FROM mv$i) = 0 THEN $i").mkString("\n         ")
    s"""l0 AS (SELECT a AS id, least(a, min(b)) AS label FROM edges GROUP BY a),
       $steps,
       ccr AS (SELECT CAST(CASE
         $cases
         END AS BIGINT) AS cc_rounds)"""
  }

  val dedupGroupsSql: String =
    s"""WITH RECURSIVE $corpus2Sql,
       $lshPairsCtes,
       nodes AS (SELECT doc_id AS id FROM corpus),
       edges AS MATERIALIZED (
         SELECT id1 AS a, id2 AS b FROM j WHERE jaccard >= 0.5
         UNION ALL
         SELECT id2 AS a, id1 AS b FROM j WHERE jaccard >= 0.5),
       reach AS (
         SELECT id, id AS label FROM nodes
         UNION
         SELECT e.b AS id, r.label AS label
         FROM reach r JOIN edges e ON e.a = r.id),
       ${ccRoundsSimCtes(6)}
       SELECT id AS doc_id, min(label) AS keeper_id,
         (SELECT cc_rounds FROM ccr) AS cc_rounds
       FROM reach GROUP BY id ORDER BY doc_id"""

  /** Leakage-FREE split assignment — the FIX whose failure mode
    * [[splitLeakage]] audits: instead of hashing each doc into a
    * split (which strands the two halves of a near-dup pair on
    * opposite sides of the train/test wall), hash the doc's near-dup
    * COMPONENT — every member of a duplicate cluster inherits its
    * keeper's split, so no verified near-dup pair can ever cross
    * splits. This is the group-split rule every careful eval
    * pipeline uses (split by cluster/source/url-group, never by
    * item). Reads the staged keeper table ([[keeperTable]] — the
    * propagation does not re-run), applies the SAME hash rule as
    * [[splitLeakage]] to `keeper_id`, and reports per-split doc and
    * component counts PLUS an in-result certificate: the actual
    * count of verified near-dup pairs whose members landed in
    * different splits — zero by construction, but COMPUTED over the
    * same pair generator the keeper table is built from ([[corpus2]]'s
    * staged verified pairs — note [[splitLeakage]] audits the
    * one-twin corpus instead), not assumed (the join_cardinality
    * convention).
    *
    * Scale shape: two groupBys over the staged (doc_id, keeper_id)
    * table plus the certificate's two id-keyed joins on the STAGED
    * pair list (the LSH does not re-run here); the 1-row certificate
    * rides a broadcast cross join. */
  def leakageFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    val k = keeperTable(spark, dir)
      .select(col("doc_id"), col("keeper_id"),
        splitOf(col("keeper_id")).as("split"))
    val sp = k.select(col("doc_id"), col("split"))
    val cross = verifiedPairs2(spark, dir)
      .join(sp.select(col("doc_id").as("id1"), col("split").as("sa")), Seq("id1"))
      .join(sp.select(col("doc_id").as("id2"), col("split").as("sb")), Seq("id2"))
      .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)), lit(0L))
        .cast("long").as("cross_split_pairs"))
    k.groupBy(col("split"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("keeper_id")).cast("long").as("n_components"))
      .crossJoin(broadcast(cross))
      .select(col("split"), col("n_docs"), col("n_components"),
        col("cross_split_pairs"))
      .orderBy(col("split"))
  }

  val leakageFreeSplitSql: String = {
    def splitOfSql(id: String): String = {
      val h = s"(${graft.util.Hashing.phashSql(s"CAST($id AS VARCHAR)", "split_")} % 1000)"
      s"CASE WHEN $h < 980 THEN 'train' WHEN $h < 990 THEN 'val' ELSE 'test' END"
    }
    s"""WITH t AS (
         SELECT doc_id, keeper_id, ${splitOfSql("keeper_id")} AS split
         FROM ($dedupGroupsSql)),
       px AS (
         WITH $corpus2Sql,
         $lshPairsCtes
         SELECT id1, id2 FROM j WHERE jaccard >= 0.5),
       cert AS (
         SELECT CAST(coalesce(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS cross_split_pairs
         FROM px JOIN t a ON a.doc_id = px.id1 JOIN t b ON b.doc_id = px.id2)
       SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT keeper_id) AS BIGINT) AS n_components,
         (SELECT cross_split_pairs FROM cert) AS cross_split_pairs
       FROM t GROUP BY split ORDER BY split"""
  }

  /** Component-size histogram over [[dedupGroups]] — the summary
    * every dedup run reports (how much of the corpus sits in how-big
    * near-dup clusters, and the doc count a keep-one policy frees).
    * Two more groupBys over the staged (doc_id, keeper_id) table
    * ([[keeperTable]] — the propagation does NOT re-run here): keyed
    * on keeper_id (cardinality ~ corpus) then on the tiny size
    * domain — both trivially partial-aggregated. */
  def dedupGroupSizes(spark: SparkSession, dir: String): DataFrame =
    keeperTable(spark, dir)
      .groupBy(col("keeper_id")).agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("group_size") - 1).as("n_removable"))
      .orderBy(col("group_size"))

  val dedupGroupSizesSql: String =
    s"""SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(group_size - 1) AS BIGINT) AS n_removable
       FROM (
         SELECT keeper_id, CAST(count(*) AS BIGINT) AS group_size
         FROM ($dedupGroupsSql) GROUP BY keeper_id)
       GROUP BY group_size ORDER BY group_size"""

  /** Keep-policy resolution over the near-dup components — the
    * KEEP-LONGEST rule of production corpus dedup (keep the longest
    * member of each duplicate cluster, C4/RefinedWeb-style), replacing
    * [[dedupGroups]]' min-id canonical label with a content-aware
    * choice. Reads the same staged keeper table ([[keeperTable]] — no
    * recompute), joins member lengths, and resolves each component's
    * argmax with ONE struct-max aggregate (`max(struct(n_chars,
    * -doc_id))` — longest wins, ties to the lower id) instead of a
    * window: partial aggregation collapses each component to one row
    * per partition before the exchange, so the shuffle carries
    * ~|components| rows where a row_number window would shuffle every
    * member. */
  def dedupKeepLongest(spark: SparkSession, dir: String): DataFrame = {
    val lens = corpus2(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    keeperTable(spark, dir)
      .join(lens, Seq("doc_id"))
      .groupBy(col("keeper_id").as("component_id"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("b"),
        count(lit(1)).as("n_members"))
      .select(col("component_id"), (-col("b.neg_id")).as("keep_id"),
        col("b.n_chars").as("keep_chars"), col("n_members"))
      .orderBy(col("component_id"))
  }

  val dedupKeepLongestSql: String =
    s"""WITH lens AS (
         WITH $corpus2Sql
         SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM corpus),
       m AS (
         SELECT g.keeper_id AS component_id, g.doc_id, l.n_chars
         FROM ($dedupGroupsSql) g JOIN lens l USING (doc_id)),
       r AS (
         SELECT component_id, doc_id, n_chars,
           row_number() OVER (PARTITION BY component_id
             ORDER BY n_chars DESC, doc_id) AS rk,
           count(*) OVER (PARTITION BY component_id) AS n_members
         FROM m)
       SELECT component_id, doc_id AS keep_id, n_chars AS keep_chars,
         CAST(n_members AS BIGINT) AS n_members
       FROM r WHERE rk = 1 ORDER BY component_id"""

  /** Incremental dedup — the production shape: a NEW batch of
    * documents checked against the EXISTING corpus (not a self-join).
    * Both sides run through one shared signature pipeline; the new
    * batch's ids sit above 300,000, so the plain attribute predicates
    * `id1 < 300000 && id2 >= 300000` push below the banded join and
    * each join side scans only its half — candidates are new×old
    * only, never old×old. A daily 1% increment against a 100 TB index
    * therefore pays 1% of the self-join's candidate volume.
    *
    * The new batch is synthesized deterministically (every doc_id%6==0
    * doc re-arrives with one appended token — a near-dup the pipeline
    * must catch) so the oracle can rebuild it. */
  /** Id floor separating the synthetic new batch from the corpus.
    * Far above any test-scale id (sf1's max replica doc_id is ~50k),
    * and the pipeline REQUIRES the corpus to stay below it — a silent
    * violation would misclassify high-id originals as new arrivals
    * identically in both engines, so the oracle could never catch it.
    * The contract is asserted IN the pipeline (a `raise_error` branch
    * on the corpus-side doc_id, evaluated only on violating rows) —
    * not by a driver-side max() probe, which would cost a whole extra
    * scan job per run at any scale. */
  private val NEW_BATCH_FLOOR = 10000000L

  def dedupIncremental(spark: SparkSession, dir: String): DataFrame =
    dedupIncrementalOf(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** [[dedupIncremental]] over an arbitrary (doc_id, text) corpus —
    * the guard-contract test entry point. */
  private[graft] def dedupIncrementalOf(docs: DataFrame): DataFrame =
    incrementalStagesOf(docs)._2

  /** (old×new candidate pairs, verified output) of the incremental
    * dedup pipeline over one shared signature build — the
    * [[graft.tools.ProfileNgram]] stage handle. */
  private[graft] def incrementalStagesOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val d = docs
      .select(
        when(col("doc_id") < NEW_BATCH_FLOOR, col("doc_id"))
          .otherwise(raise_error(concat(
            lit(s"dedupIncremental: corpus doc_ids must stay below $NEW_BATCH_FLOOR, got "),
            col("doc_id").cast("string"))).cast("long"))
          .as("doc_id"),
        col("text"))
    val newBatch = d.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + NEW_BATCH_FLOOR).as("doc_id"),
        concat(col("text"), lit(" vv9")).as("text"))
    val inc = d.unionAll(newBatch)
      .repartition(spark.sparkContext.defaultParallelism)
    val sig = signaturesOf(inc)
    val cand = lshCandidatesOf(sig)
      .filter(col("id1") < NEW_BATCH_FLOOR && col("id2") >= NEW_BATCH_FLOOR)
    val out = lshPairsOf(sig)
      .filter(col("id1") < NEW_BATCH_FLOOR && col("id2") >= NEW_BATCH_FLOOR)
      .select(col("id2").as("new_id"), col("id1").as("old_id"), col("jaccard"))
      .orderBy(col("new_id"), col("old_id"))
    (cand, out)
  }

  val dedupIncrementalSql: String =
    s"""WITH corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + $NEW_BATCH_FLOOR AS doc_id, concat(text, ' vv9') AS text
         FROM documents WHERE doc_id % 6 = 0),
       $lshPairsCtes
       SELECT id2 AS new_id, id1 AS old_id, jaccard
       FROM j WHERE jaccard >= 0.5 AND id1 < $NEW_BATCH_FLOOR AND id2 >= $NEW_BATCH_FLOOR
       ORDER BY new_id, old_id"""

  // ---- SimHash ------------------------------------------------------

  private val SIMBITS = 64

  /** 64-bit SimHash per document: explode distinct tokens, one
    * groupBy(doc) with the 64 bit-vote counters packed into 16-bit
    * lanes (four per aggregated word), bit-pack. The two
    * independent bit sources for the low and high 32 bits are the two
    * 60-bit halves of ONE md5 per token (hex chars 1-15 and 17-31 —
    * the phash/phashHiSql pair in the oracle twin). Packing adds
    * distinct powers of two, so no carry and no overflow; bit 63's
    * term is Long.MinValue, which is the correct two's-complement bit
    * pattern in both engines. */
  private[graft] def simhashOf(docs: DataFrame): DataFrame =
    simhashOf(docs, Nil)

  /** [[simhashOf]] with CARRY columns: extra per-document constants
    * (e.g. an event timestamp) ride the doc-keyed aggregate as
    * `max(c)` instead of joining back on doc_id afterwards — the
    * carry widens each pre-aggregation token row by one value, but
    * removes a whole exchange + join (and a second computation of
    * the feed) from the consumer (guide §2.4). Caller contract: each
    * carry column is single-valued per doc_id. */
  private[graft] def simhashOf(docs: DataFrame,
                               carry: Seq[String]): DataFrame = {
    // ONE md5 per token, split into two 60-bit words (hex chars 1-15
    // and 17-31) — the 64 bit-votes only need 32 bits of each, and an
    // explicit shared digest column halves the hashing cost vs two
    // independently-salted phash calls
    val tok = docs
      .select(col("doc_id") +: carry.map(col) :+
        explode(array_distinct(tokens(col("text")))).as("t"): _*)
      .withColumn("h1", graft.util.Hashing.phash(col("t"), "sim_"))
      .withColumn("h2", graft.util.Hashing.phashHi(col("t"), "sim_"))
    // The 64 bit-vote counters ride in 16-BIT LANES, four per word:
    // word w lane i counts set-bits of simhash bit j = 4w+i, and one
    // sum() per word accumulates all four counters carry-free while
    // every per-doc distinct-token count stays under 2^16 (contract
    // below). The former one-sum-per-bit layout shuffled 64 long
    // buffers per document — 4.3× the bytes — with NO group reduction
    // (doc_id is the group key), guide §2.3. The ±1 vote total is
    // recovered as 2·c_j − T from the set-bit count and the token
    // count, so the packed form is bit-identical.
    def lane(j: Int): Column = {
      val h = if (j < 32) col("h1") else col("h2")
      shiftleft(shiftright(h, j % 32).bitwiseAND(lit(1L)), 16 * (j % 4))
    }
    val wordSums = (0 until SIMBITS / 4).map { w =>
      sum((0 until 4).map(i => lane(4 * w + i)).reduce(_ + _)).as(s"w$w")
    }
    val sums = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("tc"),
        wordSums ++ carry.map(c => max(col(c)).as(c)): _*)
    def cj(j: Int): Column =
      shiftright(col(s"w${j / 4}"), 16 * (j % 4)).bitwiseAND(lit(0xffffL))
    val packed = (0 until SIMBITS).map(j =>
      when(cj(j) * 2 > col("tc"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id") +:
      (when(col("tc") <= 60000L, packed)
        .otherwise(raise_error(concat(lit("simhashOf: doc "),
          col("doc_id").cast("string"), lit(" has "),
          col("tc").cast("string"),
          lit(" distinct tokens — 16-bit vote lanes overflow"))))
        .as("simhash")) +: carry.map(col): _*)
  }

  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashOf(corpus(spark, dir)).orderBy(col("doc_id"))

  /** Pure-Scala SimHash of one document — EXACTLY the [[simhashOf]]
    * construction (same `sim_` md5 salt, same 60-bit hex windows,
    * same ±1 vote and bit-packing rule; ExtSpec asserts bit-equality
    * against the distributed query on the real corpus). Exists so a
    * STREAMING kernel ([[graft.streaming.StreamEtl.nearDupStream]])
    * can hash an arriving document inside `flatMapGroupsWithState`
    * without a pre-aggregation stage. */
  private val simMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[graft] def simhash64(text: String): Long = {
    // Streaming hot path (one call per arriving document): the digest
    // is thread-local, not per-call, and the two 60-bit words come
    // straight from the digest bytes — hex chars [0,15) are bytes 0-6
    // plus the high nibble of byte 7, chars [16,31) are bytes 8-14
    // plus the high nibble of byte 15 — so no per-byte hex formatting
    // or string parsing allocates per token.
    val md = simMd.get()
    val votes = new Array[Int](SIMBITS)
    text.trim.split("\\s+").distinct.foreach { t =>
      md.reset()
      val d = md.digest(("sim_" + t).getBytes("UTF-8"))
      var h1 = 0L
      var k = 0
      while (k < 7) { h1 = (h1 << 8) | (d(k) & 0xffL); k += 1 }
      h1 = (h1 << 4) | ((d(7) >>> 4) & 0xfL)
      var h2 = 0L
      k = 8
      while (k < 15) { h2 = (h2 << 8) | (d(k) & 0xffL); k += 1 }
      h2 = (h2 << 4) | ((d(15) >>> 4) & 0xfL)
      var j = 0
      while (j < SIMBITS) {
        val h = if (j < 32) h1 else h2
        if (((h >>> (j % 32)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    (0 until SIMBITS).foldLeft(0L)((acc, j) =>
      if (votes(j) > 0) acc | (1L << j) else acc)
  }

  /** DuckDB CTE chain ending in `sims(doc_id, simhash)`. */
  private[graft] val simhashCte: String = {
    val sums = (0 until SIMBITS).map { j =>
      val h = if (j < 32) "h1" else "h2"
      s"sum(CASE WHEN ($h // ${1L << (j % 32)}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n           ")
    val pack = (0 until SIMBITS).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""tok AS (
         SELECT doc_id, ${Hashing.phashSql("t", "sim_")} AS h1,
                ${Hashing.phashHiSql("t", "sim_")} AS h2
         FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS t
               FROM corpus)),
       sums AS (
         SELECT doc_id,
           $sums
         FROM tok GROUP BY doc_id),
       sims AS (
         SELECT doc_id, CAST($pack AS BIGINT) AS simhash FROM sums)"""
  }

  val simhashSql: String =
    s"""WITH $corpusSql,
       $simhashCte
       SELECT doc_id, simhash FROM sims ORDER BY doc_id"""

  /** Corpus size above which [[simhashPairsOf]] switches from the
    * 4×16-bit exact-match banding to the 2×32-bit flip-probe banding
    * (both complete at hamming ≤ 3, so the switch never changes the
    * result — see the scaladoc below). Crossover math: the narrow
    * scheme's in-join candidate fan is ~skew·N²/2¹⁷ per band
    * (measured 370M joined rows at N = 600k on the replica corpus)
    * while the wide scheme's probe fan is a flat 66 rows per doc;
    * the wide scheme wins once N²-collision work outgrows the 66·N
    * probe shuffle — around N ≈ 2×10⁵ on skewed real corpora. */
  private[graft] val SIM_WIDE_N = 200000L

  /** Most bands any supported layout uses (the narrow 4×16 rung) —
    * sizes [[simhashPairsOf]]'s emit-once guard chain. */
  private[graft] val SIM_MAX_BANDS = 4

  /** SimHash near-dup pairs (hamming ≤ 3), with a CORPUS-ADAPTIVE
    * band layout derived in-query from N (the dedup_semantic
    * √N-knob pattern — a 1-row count aggregate broadcast, no driver
    * probe):
    *
    *  - N < [[SIM_WIDE_N]]: 4×16-bit bands, candidates = exact band
    *    equality (pigeonhole: hamming ≤ 3 leaves ≥ 1 of 4 bands
    *    intact — complete recall). ~N²/2¹⁷ candidates per band.
    *  - N ≥ [[SIM_WIDE_N]]: 2×32-bit bands with single-bit-flip
    *    probing (Norouzi-style multi-index at tolerance 1): the left
    *    side emits each band value plus its 32 one-bit flips (66
    *    probe rows per doc), the right side its exact band values;
    *    a pair surfaces iff some band differs in ≤ 1 bit. Pigeonhole
    *    again: 3 errors over 2 bands leave one band with ≤ 1 error —
    *    complete recall at hamming ≤ 3, but false candidates now
    *    need 31 of 32 band bits to agree (~33·N²/2³² vs N²/2¹⁷ —
    *    four orders of magnitude fewer at any skew).
    *
    * Both rungs feed the same exact `bit_count(xor)` verify, so the
    * OUTPUT is scheme-independent (complete candidate recall + exact
    * verify) — the DuckDB twin keeps the narrow plan at every scale
    * and ExtSpec pins cross-scheme equality on the real corpus. The
    * knob therefore changes only the physical plan, never results —
    * strictly stronger than a result-bending parameter.
    *
    * Candidate post-processing is shuffle-free: the hamming verify
    * and an emit-once first-matching-band guard (`band_i` differs by
    * > tol bits for every i < band, a masked bit_count per joined
    * row) run INSIDE the join projection — the former dropDuplicates
    * pass shuffled 298M candidate rows for 181 s at N = 600k and is
    * gone. shiftright is an arithmetic shift (simhash may be negative
    * with bit 63 set): mask after shifting; DuckDB's `>>`
    * sign-extends identically and the mask lands the same way. */
  private[graft] def simhashPairsOf(docs: DataFrame,
                                    bandsOverride: Option[Int] = None): DataFrame = {
    val spark = docs.sparkSession
    val sims = simhashOf(docs)
      .repartition(spark.sparkContext.defaultParallelism)
      .transform(graft.util.Fence.lineage)
    // nb ∈ {4 narrow, 2 wide} from the corpus size — in-query, like
    // dedup_semantic's C = max(32, √N)
    bandsOverride.foreach(nb => require(nb == 2 || nb == 4,
      s"simhashPairsOf supports 64-bit layouts of 2 or 4 bands, got $nb"))
    val nbKnob = bandsOverride match {
      case Some(nb) => spark.range(1).select(lit(nb).as("nb"))
      case None => sims.agg(count(lit(1)).as("n"))
        .select(when(col("n") >= SIM_WIDE_N, 2).otherwise(4).as("nb"))
    }
    val s2 = sims.crossJoin(broadcast(nbKnob))
      .withColumn("w", (lit(64) / col("nb")).cast("int"))
      .withColumn("mask", when(col("nb") === 2, lit(4294967295L)).otherwise(lit(65535L)))
      .withColumn("tol", when(col("nb") === 2, lit(1)).otherwise(lit(0)))
    def bandVal(b: Column) = call_function("shiftright", col("simhash"), b * col("w"))
      .bitwiseAND(col("mask"))
    // right side: one exact band value per band
    val rside = s2.select(col("doc_id").as("id2"), col("simhash").as("s2"),
        explode_outer(transform(sequence(lit(0), col("nb") - 1),
          b => struct(b.as("band"), bandVal(b).as("bv")))).as("bb"))
      .filter(col("bb").isNotNull)
      .select(col("id2"), col("s2"), col("bb.band").as("band2"), col("bb.bv").as("probe2"))
    // left side: each band value plus its tol·w one-bit flips
    val lside = s2.select(col("doc_id").as("id1"), col("simhash").as("s1"),
        col("w"), col("mask"), col("tol"),
        explode_outer(flatten(transform(sequence(lit(0), col("nb") - 1), b =>
          transform(sequence(lit(0), col("tol") * col("w")), pi =>
            struct(b.as("band"), when(pi === 0, bandVal(b)).otherwise(
              bandVal(b).bitwiseXOR(call_function("shiftleft", lit(1L), pi - 1)))
              .as("probe")))))).as("bb"))
      .filter(col("bb").isNotNull)
      .select(col("id1"), col("s1"), col("bb.band").as("band"),
        col("bb.probe").as("probe"),
        col("w"), col("mask"), col("tol"))
    // emit-once: no band BEFORE this one already matches within tol —
    // a masked bit_count per joined row, never a pair-dedup shuffle.
    // The chain carries SIM_MAX_BANDS-1 terms; a term for i >= nb-1
    // is vacuously true via `band <= i` (band < nb always), so the
    // guard is correct for ANY nb <= SIM_MAX_BANDS — the i*w shift
    // only evaluates when band > i, i.e. i <= nb-2, keeping i*w <=
    // 64-2w < 64 (never the mod-64 wrap). A layout with more bands
    // must raise SIM_MAX_BANDS or the guard silently under-checks.
    val diff = col("s1").bitwiseXOR(col("s2"))
    val noEarlierBand = (0 until SIM_MAX_BANDS - 1).map { i =>
      col("band") <= i ||
        call_function("bit_count",
          diff.bitwiseAND(call_function("shiftleft", col("mask"), lit(i) * col("w"))))
          .cast("int") > col("tol")
    }.reduce(_ && _)
    lside.join(rside,
        col("band") === col("band2") && col("probe") === col("probe2") &&
        col("id1") < col("id2"))
      .withColumn("hamming", expr("bit_count(s1 ^ s2)").cast("long"))
      .filter(col("hamming") <= 3 && noEarlierBand)
      .select(col("id1"), col("id2"), col("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsOf(corpus(spark, dir))

  /** CTE chain `banded .. shp(id1, id2, hamming)` over a `sims` CTE —
    * factored so [[dedupMethodOverlapSql]] can run the same pair
    * pipeline over a different corpus definition. */
  private val simhashPairsCtes: String = {
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 16}) & 65535 AS bv FROM sims")
      .mkString("\n         UNION ALL\n         ")
    s"""banded AS (
         $bandRows),
       cand AS (
         SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
                l.simhash AS s1, r.simhash AS s2
         FROM banded l JOIN banded r
           ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id),
       shp AS (
         SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(s1, s2)) <= 3)"""
  }

  val simhashPairsSql: String =
    s"""WITH $corpusSql,
       $simhashCte,
       $simhashPairsCtes
       SELECT id1, id2, hamming FROM shp
       ORDER BY id1, id2"""

  /** n-gram (unigram-set) Jaccard near-dup pairs within a source.
    *
    * Candidate generation goes through the SAME banded MinHash LSH
    * pipeline as [[dedupMinhashLsh]] (K=16 affine minhashes over the
    * unigram set, 8 bands × 2 rows, bucket equi-join) — exact Jaccard
    * is only the verify step on candidates. Round 1 did all-pairs
    * within a `source` bucket; `source` has fixed tiny cardinality,
    * so that was O((N/20)²) — quadratic in N. Here the join key is
    * (band, band_hash): high-cardinality, linear-ish at any N.
    *
    * Recall at the 0.8 threshold: P(candidate) = 1-(1-s²)⁸ ≥ 0.9997
    * for unigram-Jaccard s ≥ 0.8 — and identical in both engines,
    * since the minhash family is the same deterministic arithmetic. */
  private[graft] def ngramJaccardOf(docs: DataFrame): DataFrame =
    ngramStagesOf(docs)._2

  /** (candidate pairs, verified output) of the ngram-Jaccard
    * pipeline over ONE shared signature build — the stage handle
    * [[graft.tools.ProfileNgram]] uses to measure whether this
    * family's at-scale growth is candidate-driven (a blocking
    * problem) or output-driven (true pairs). */
  private[graft] def ngramStagesOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val d = docs
      // verify runs on the 32-bit token hashes, not the token strings:
      // |A∩B| over distinct hash sets equals the string intersection
      // modulo 2^-32 collisions, BOTH engines hash identically (so the
      // oracle stays in lockstep), and the two verify joins shuffle
      // 8-byte longs instead of token strings. ONE distinct pass, on
      // the hashes — distinct tokens and distinct token-hashes are the
      // same set under that same collision caveat
      .select(col("source"), col("doc_id"), array_distinct(
        transform(tokens(col("text")), t => Hashing.phash(t, "ng_") % 4294967296L))
        .as("hs"))
      .withColumn("sig", graft.functions.MinHashSig(col("hs"), affine, MODP))
      // barrier: the band explode references `sig` 8× and the verify
      // references `hs` — fence the minhash pipeline so the optimizer
      // can't inline it once per reference (single-split test parquet)
      .repartition(spark.sparkContext.defaultParallelism)
      .transform(graft.util.Fence.lineage)
    // banded rows carry (source, doc_id, bhs, band, bh) — the token
    // sets join back by doc_id at the verify step like the SQL twin.
    // A true near-dup collides in MOST of the 8 bands (measured: 2.07M
    // raw candidate rows → 545k unique pairs at sf0.1), so each pair
    // is emitted only from its FIRST matching band — the bhs prefix
    // filter below — which deletes the whole pair-dedup shuffle. That
    // is why bhs (8 longs) rides the banded rows: 64 bytes buys the
    // exactly-once guarantee.
    val sigB = d.withColumn("bhs", bandHashes("ngband"))
      .select(col("source"), col("doc_id"), col("bhs"))
    val banded = sigB.select(col("source"), col("doc_id"), col("bhs"),
      posexplode_outer(col("bhs")).as(Seq("band", "bh")))
    val l = banded.as("l"); val r = banded.as("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.source") === col("r.source") && col("l.doc_id") < col("r.doc_id") &&
        firstMatchingBand(col("l.bhs"), col("r.bhs"), col("l.band")))
      .select(col("l.source").as("source"), col("l.doc_id").as("id1"),
        col("r.doc_id").as("id2"))
    // hs is distinct, so |A∪B| = |A|+|B|-|A∩B| — half the per-pair
    // array work of materializing the union (the verify step dominates
    // here: the sf0.1 corpus holds ~148k true near-dup pairs, so
    // candidates are O(100k), each paying the array ops)
    val toks = d.select(col("doc_id"), col("hs"))
    val out = cand
      .join(toks.select(col("doc_id").as("id1"), col("hs").as("ts1")), Seq("id1"))
      .join(toks.select(col("doc_id").as("id2"), col("hs").as("ts2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("ts1"), col("ts2"))))
      // exact integer unfold of floor(j*10000+0.5)/10000 >= 0.8
      // (j >= 15999/20000; a borderline tie needs |A∪B| >= 20000 —
      // impossible here), referencing `inter` ONCE: the filter gets
      // pushed into the join condition, and the rounded-jaccard form
      // would evaluate array_intersect twice per candidate there
      .filter(col("inter") * 35999 >= (size(col("ts1")) + size(col("ts2"))) * 15999)
      .withColumn("jaccard",
        floor(col("inter").cast("double") /
              (size(col("ts1")) + size(col("ts2")) - col("inter")) * 10000 + 0.5) / 10000)
      .select(col("source"), col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("source"), col("id1"), col("id2"))
    (cand, out)
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardOf(Tables.documents(spark, dir))

  // ---- Cross-document exact-substring coverage ---------------------

  private[graft] val SUB_K = 8

  /** Per-source cross-document EXACT-SUBSTRING duplication — the
    * train-data metric of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better", exact-substring dedup):
    * what fraction of each source's tokens sits inside a ≥[[SUB_K]]-
    * token run that also appears verbatim in ANOTHER document. This
    * is the cross-doc complement of `repetition_stats` (within-doc
    * bigram repetition) and of the set-level Jaccard family — a pair
    * can have near-zero Jaccard yet share one long quoted paragraph,
    * which is exactly what this surfaces (boilerplate, licence
    * blocks, syndicated passages).
    *
    * Distributed shape (the suffix-array of the paper becomes a
    * hash-shuffle): explode each doc's [[SUB_K]]-gram starts (linear
    * in corpus tokens), one groupBy(gram_hash) marks hashes seen in
    * ≥ 2 distinct docs, a back-join flags repeated starts, and the
    * covered-token count is an interval-union computed per doc from
    * REPEATED STARTS ONLY — Σ min(K, gap to previous start) via one
    * lag window partitioned by doc (never a per-position frame). At
    * 100 TB every stage is keyed by gram hash or doc id; nothing is
    * quadratic and no token string rides past its 60-bit hash.
    *
    * Outputs per source: docs, token mass, covered mass, coverage
    * ppm, and how many docs are majority-duplicated (the paper's
    * drop candidates). The %5 twin corpus guarantees the fixture has
    * true cross-doc runs; the guard on short docs uses the
    * sequence-descends-below-2 lesson from bpe_learn. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame = {
    val d0 = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val twins = d0.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("source"),
        concat(col("text"), lit(" zqxj")).as("text"))
    val d = d0.unionAll(twins)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("l"))
      .withColumn("n_tok", size(col("l")).cast("long"))
      .transform(graft.util.Fence.lineage)
    // n_tok deliberately NOT carried: the lineage fence is a hard
    // pruning boundary, so a dead column would be materialized for
    // every gram; the final rollup reads n_tok from `d` directly
    val grams = d.select(col("doc_id"),
        explode_outer(when(size(col("l")) >= SUB_K,
          transform(sequence(lit(1), size(col("l")) - SUB_K + 1),
            j => struct(j.as("j"),
              Hashing.phash(concat_ws(" ", slice(col("l"), j, lit(SUB_K))), "sg_")
                .as("gh"))))
          .otherwise(array())).as("g"))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), col("g.j").as("j"), col("g.gh").as("gh"))
      .transform(graft.util.Fence.lineage)
    // "appears in >= 2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id):
    // min/max partial-aggregate map-side and need ONE exchange on gh,
    // where countDistinct(doc_id) planned a second full shuffle of
    // the (gh, doc_id) gram frame (guide §2.3/§2.4)
    val rep = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("d1"), max(col("doc_id")).as("d2"))
      .filter(col("d1") =!= col("d2"))
      .select(col("gh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("j"))
    val covered = grams.join(rep, Seq("gh"))
      .withColumn("prev", lag(col("j"), 1).over(w))
      .withColumn("add",
        when(col("prev").isNull, lit(SUB_K.toLong))
          .otherwise(least(lit(SUB_K.toLong), col("j") - col("prev"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("add")).cast("long").as("cov"))
    d.select(col("doc_id"), col("source"), col("n_tok"))
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("cov"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("cov")).cast("long").as("covered_tokens"),
        sum(when(col("cov") * 2 > col("n_tok"), 1L).otherwise(0L))
          .cast("long").as("n_docs_majority_dup"))
      .withColumn("coverage_ppm",
        floor(col("covered_tokens").cast("double") * 1000000 / col("n_tokens"))
          .cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("covered_tokens"), col("coverage_ppm"), col("n_docs_majority_dup"))
      .orderBy(col("source"))
  }

  val substringDedupSql: String =
    s"""WITH d AS (
         SELECT doc_id, source,
           string_split_regex(trim(text), '\\s+') AS l
         FROM (
           SELECT doc_id, source, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, source,
             concat(text, ' zqxj') AS text
           FROM documents WHERE doc_id % 5 = 0)),
       dd AS (SELECT doc_id, source, l, CAST(len(l) AS BIGINT) AS n_tok FROM d),
       g AS (
         SELECT doc_id, u.g.j AS j, u.g.gh AS gh FROM (
           SELECT doc_id, unnest(CASE WHEN len(l) >= $SUB_K THEN
             list_transform(generate_series(1, len(l) - $SUB_K + 1),
               j -> struct_pack(j := j, gh := ${Hashing.phashSql(
                 s"array_to_string(list_slice(l, j, j + $SUB_K - 1), ' ')", "sg_")}))
             ELSE [] END) AS g
           FROM dd) u),
       rep AS (
         SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
       rs AS (
         SELECT g.doc_id, g.j,
           lag(g.j) OVER (PARTITION BY g.doc_id ORDER BY g.j) AS prev
         FROM g JOIN rep ON g.gh = rep.gh),
       cov AS (
         SELECT doc_id, CAST(sum(CASE WHEN prev IS NULL THEN $SUB_K
           ELSE least($SUB_K, j - prev) END) AS BIGINT) AS cov
         FROM rs GROUP BY doc_id)
       SELECT dd.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dd.n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(COALESCE(cov.cov, 0)) AS BIGINT) AS covered_tokens,
         CAST(floor(CAST(sum(COALESCE(cov.cov, 0)) AS DOUBLE) * 1000000 /
           sum(dd.n_tok)) AS BIGINT) AS coverage_ppm,
         CAST(sum(CASE WHEN COALESCE(cov.cov, 0) * 2 > dd.n_tok
           THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_majority_dup
       FROM dd LEFT JOIN cov ON dd.doc_id = cov.doc_id
       GROUP BY dd.source ORDER BY dd.source"""

  /** CTE chain `d .. ngj(source, id1, id2, jaccard)` — the SQL twin
    * of [[ngramJaccardOf]] over `documents`, reusable by downstream
    * pipeline twins ([[graft.ext.Corpus]]). */
  private[ext] val ngramPairsCtes: String = {
    val mins = affine.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $MODP))"
    }.mkString(",\n           ")
    val bhList = (0 until BANDS).map { b =>
      val parts = (0 until ROWS).map(r => s"CAST(sig[${b * ROWS + r + 1}] AS VARCHAR)").mkString(", ")
      Hashing.phashSql(s"concat_ws('_', $parts)", s"ngband${b}_")
    }.mkString("[", ",\n           ", "]")
    val bandRows = (0 until BANDS).map { b =>
      s"SELECT source, doc_id, bhs, $b AS band, bhs[${b + 1}] AS bh FROM ngsigs2"
    }.mkString("\n         UNION ALL\n         ")
    s"""d AS (
         SELECT source, doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS ts
         FROM documents),
       hs AS (SELECT source, doc_id, ts,
                list_distinct(list_transform(ts, t -> ${Hashing.phashSql("t", "ng_")} % 4294967296)) AS hs
              FROM d),
       ngsigs AS (SELECT source, doc_id, [$mins] AS sig FROM hs),
       ngsigs2 AS (SELECT source, doc_id, $bhList AS bhs FROM ngsigs),
       ngbanded AS (
         $bandRows),
       ngcand AS (
         SELECT l.source AS source, l.doc_id AS id1, r.doc_id AS id2
         FROM ngbanded l JOIN ngbanded r
           ON l.band = r.band AND l.bh = r.bh AND l.source = r.source
          AND l.doc_id < r.doc_id
          AND ${firstMatchingBandSql("l", "r")}),
       ngj AS (
         SELECT c.source, c.id1, c.id2,
           floor(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
                 (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                 * 10000 + 0.5) / 10000 AS jaccard
         FROM ngcand c
         JOIN hs a ON a.doc_id = c.id1
         JOIN hs b ON b.doc_id = c.id2)"""
  }

  val ngramJaccardSql: String =
    s"""WITH $ngramPairsCtes
       SELECT source, id1, id2, jaccard FROM ngj WHERE jaccard >= 0.8
       ORDER BY source, id1, id2"""

  /** Method-agreement report between the two near-dup pair
    * generators — the evaluation a curation team runs before picking
    * a dedup method (the [[graft.ext.Similarity]] `ann_recall`
    * counterpart for the dedup family). Both pipelines run over the
    * SAME raw corpus (no injected twins, unlike their standalone
    * queries) and their pair sets full-outer join on (id1, id2):
    * ngram-Jaccard >= 0.8 is the high-precision set-overlap view,
    * SimHash hamming <= 3 the cheap bit-signature view — the
    * disagreement counts are each method's blind spots, and
    * agreement_ppm is the exact-integer Jaccard of the two pair
    * sets. Cost is the two generators plus one join of their
    * (small) pair frames. */
  def dedupMethodOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val a = ngramJaccardOf(docs)
      .select(col("id1"), col("id2")).withColumn("in_a", lit(1))
    val b = simhashPairsOf(docs.select(col("doc_id"), col("text")))
      .select(col("id1"), col("id2")).withColumn("in_b", lit(1))
    a.join(b, Seq("id1", "id2"), "full")
      .agg(
        sum(coalesce(col("in_a"), lit(0))).as("n_ngram"),
        sum(coalesce(col("in_b"), lit(0))).as("n_simhash"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
          .otherwise(0L)).as("n_both"))
      .withColumn("agreement_ppm",
        floor(col("n_both") * 1000000.0 /
          nullif(col("n_ngram") + col("n_simhash") - col("n_both"), lit(0L)))
          .cast("long"))
      .orderBy(col("n_ngram"))
  }

  val dedupMethodOverlapSql: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       $simhashCte,
       $simhashPairsCtes,
       $ngramPairsCtes,
       a AS (SELECT id1, id2 FROM ngj WHERE jaccard >= 0.8),
       b AS (SELECT id1, id2 FROM shp),
       m AS (
         SELECT a.id1 IS NOT NULL AS in_a, b.id1 IS NOT NULL AS in_b
         FROM a FULL OUTER JOIN b ON a.id1 = b.id1 AND a.id2 = b.id2)
       SELECT
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_ngram,
         CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash,
         CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(floor(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) * 1000000.0 /
           nullif(sum(CASE WHEN in_a THEN 1 ELSE 0 END)
                + sum(CASE WHEN in_b THEN 1 ELSE 0 END)
                - sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END), 0)) AS BIGINT)
           AS agreement_ppm
       FROM m ORDER BY n_ngram"""

  // ---- Content-defined chunking (CDC) sub-document dedup -----------

  private val CDC_W = 8    // boundary window (chars)
  private val CDC_D = 32   // boundary divisor → ~32-char expected chunks

  /** Content-defined chunking dedup — sub-document granularity, the
    * level below [[dedupExact]] (whole doc) and [[lshPairsOf]]
    * (near-dup doc). A boundary falls after position i whenever the
    * hash of the trailing [[CDC_W]]-char window divides [[CDC_D]] —
    * so boundaries are CONTENT-defined and re-synchronize after an
    * insertion/deletion, which is the whole point: two documents
    * sharing a long run of text produce identical chunks for the
    * shared run no matter where it sits (a fixed-size splitter loses
    * alignment after the first edit). Classic rungs not needed at
    * this corpus: min/max chunk clamps, and a true rolling (Rabin)
    * hash instead of the per-position window hash — both noted for
    * the 100 TB path; the per-row cost is O(len) either way and the
    * map stays narrow and embarrassingly parallel.
    *
    * Per source: chunk count, distinct-chunk count (duplicated-chunk
    * mass = n_chunks − n_distinct), and an order-independent checksum
    * of all chunk hashes (per-chunk hash bounded < 2^30 so the BIGINT
    * sum can never overflow — the set-valued-result convention).
    *
    * Scale shape: one narrow projection computes boundary positions
    * (lineage-fenced — the bounds array is referenced three times by
    * the slicer and CollapseProject would inline the per-position md5
    * pipeline once per reference), one explode, one (source) groupBy
    * with a single distinct-agg expand. */
  private[graft] def cdcChunksOf(docs: DataFrame): DataFrame = {
    val n = length(col("text"))
    val bpos = when(n >= CDC_W,
        filter(sequence(lit(CDC_W), n),
          i => Hashing.phash(col("text").substr(i - (CDC_W - 1), lit(CDC_W)), "cdc_")
            % CDC_D === 0))
      .otherwise(array().cast("array<int>"))
    val bounds = concat(array(lit(0)), bpos, array(n))
    val chunks = transform(sequence(lit(1), size(col("bounds")) - 1),
      i => col("text").substr(element_at(col("bounds"), i) + 1,
        element_at(col("bounds"), i + 1) - element_at(col("bounds"), i)))
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("source"), col("text"), bounds.as("bounds"))
      .transform(graft.util.Fence.lineage)
      .select(col("source"), explode_outer(chunks).as("chunk"))
      .filter(col("chunk").isNotNull && length(col("chunk")) > 0)
      .select(col("source"), Hashing.phash(col("chunk"), "cdck_").as("ch"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        countDistinct(col("ch")).cast("long").as("n_distinct_chunks"),
        sum(pmod(col("ch"), lit(1073741789L))).cast("long").as("chunk_checksum"))
      .withColumn("n_dup_chunks",
        (col("n_chunks") - col("n_distinct_chunks")).cast("long"))
      .orderBy(col("source"))
  }

  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(Tables.documents(spark, dir).select(col("source"), col("text")))

  val cdcChunksSql: String =
    s"""WITH d AS (SELECT source, text, len(text) AS n FROM documents),
       b AS (SELECT source, text,
         list_concat(list_concat([0],
           list_filter(generate_series($CDC_W, n),
             i -> ${Hashing.phashSql(s"substr(text, i - ${CDC_W - 1}, $CDC_W)", "cdc_")} % $CDC_D = 0)),
           [n]) AS bounds
         FROM d),
       c AS (SELECT source,
         list_transform(generate_series(1, len(bounds) - 1),
           i -> substr(text, bounds[i] + 1, bounds[i + 1] - bounds[i])) AS chunks
         FROM b),
       e AS (SELECT source, unnest(chunks) AS chunk FROM c),
       f AS (SELECT source, ${Hashing.phashSql("chunk", "cdck_")} AS ch
         FROM e WHERE len(chunk) > 0)
       SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(DISTINCT ch) AS BIGINT) AS n_distinct_chunks,
         CAST(sum(ch % 1073741789) AS BIGINT) AS chunk_checksum,
         CAST(count(*) - count(DISTINCT ch) AS BIGINT) AS n_dup_chunks
       FROM f GROUP BY source ORDER BY source"""

  /** Boilerplate PREFIX clustering — the crawl-cleaning pass that
    * catches templated openings exact/near dedup both miss: documents
    * sharing the same normalized first-8-token prefix (cookie
    * banners, licence headers, forum signatures) cluster on a single
    * 60-bit prefix fingerprint. Reported per cluster (size > 1):
    * member count, the kept (minimum) doc_id, distinct sources
    * touched, and a SET-CHECKSUM of the member ids (sorted-as-strings
    * concat → phash, the winnow_fingerprint convention) so the
    * cluster MEMBERSHIP is oracle-checked without an engine-ordered
    * array column.
    *
    * Scale shape: one narrow normalize+slice map (no explode — the
    * prefix is a bounded `slice`), ONE groupBy on the fingerprint
    * with map-side combine, and the size>1 filter drops the unique
    * mass before the presentation sort. At 100 TB: a single shuffle
    * keyed by a 60-bit int, cluster rows ≪ corpus rows. */
  def dedupPrefix(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        Hashing.phash(concat_ws(" ", slice(split(norm, " "), 1, 8)), "pfx_")
          .as("prefix_fp"))
      .groupBy(col("prefix_fp"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("doc_id")).as("keep_doc_id"),
        countDistinct(col("source")).cast("long").as("n_sources"),
        Hashing.phash(concat_ws(",",
          sort_array(collect_list(col("doc_id").cast("string")))))
          .as("members_hash"))
      .filter(col("n_docs") > 1)
      .orderBy(col("prefix_fp"))
  }

  val dedupPrefixSql: String =
    s"""WITH d AS (
         SELECT doc_id, source,
           ${Hashing.phashSql(
             "array_to_string(list_slice(string_split(trim(regexp_replace(" +
             "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), 1, 8), ' ')",
             "pfx_")} AS prefix_fp
         FROM documents),
       g AS (
         SELECT prefix_fp, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keep_doc_id,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           ${Hashing.phashSql(
             "array_to_string(list_sort(list(CAST(doc_id AS VARCHAR))), ',')")}
             AS members_hash
         FROM d GROUP BY prefix_fp)
       SELECT prefix_fp, n_docs, keep_doc_id, n_sources, members_hash
       FROM g WHERE n_docs > 1 ORDER BY prefix_fp"""
}
