package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Hashing

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (BASELINE.json north-star; SURVEY.md §7.2
  * module 6): quality scoring, language ID, token counting, document
  * fingerprinting.
  *
  * Everything is built from codegen'd builtins (split /
  * regexp_extract_all / higher-order array functions) — no UDFs, so
  * the whole family stays inside WholeStageCodegen and is a narrow
  * per-row map at any scale: zero shuffles except the final
  * presentation ORDER BY and the one groupBy in token_count.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** tokens = trim + split on runs of whitespace (identical semantics
    * in both engines). Shared with [[Corpus]]. */
  private[ext] def toks(c: Column): Column = split(trim(c), "\\s+")
  private[ext] def toksSql(x: String): String = s"string_split_regex(trim($x), '\\s+')"

  /** Portable 4-dp rounding — one shared definition. */
  private val pr4 = graft.util.Exact.pround4 _
  private val pr4Sql = graft.util.Exact.pround4Sql _

  /** Per-document quality metrics: token count, average token length,
    * punctuation ratio, stopword ratio, and a composite quality score
    * (length/punct/stopword heuristics — the classic pre-training
    * quality filters). */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("toks", toks(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_punct",
        length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
      .withColumn("n_stop", size(filter(col("toks"),
        t => t.isInCollection(stopwords))))
      .withColumn("char_sum", aggregate(col("toks"), lit(0),
        (acc, x) => acc + length(x)))
    // nullif divisors: an empty document must yield NULL metrics in
    // BOTH engines, not an ANSI DIVIDE_BY_ZERO in Spark only
    val nTok = nullif(col("n_tokens").cast("double"), lit(0.0))
    val nCh  = nullif(col("n_chars").cast("double"), lit(0.0))
    d.select(
      col("doc_id"),
      col("n_chars"),
      col("n_tokens").cast("long").as("n_tokens"),
      pr4(col("char_sum").cast("double") / nTok).as("avg_token_len"),
      pr4(col("n_punct").cast("double") / nCh).as("punct_ratio"),
      pr4(col("n_stop").cast("double") / nTok).as("stopword_ratio"),
      pr4(col("n_stop").cast("double") / nTok * 0.5 +
          least(col("n_tokens").cast("double") / 100, lit(1.0)) * 0.3 +
          (lit(1.0) - col("n_punct").cast("double") / nCh) * 0.2)
        .as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val textStatsSql: String = {
    val sw = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
         SELECT doc_id, n_chars, ${toksSql("text")} AS toks,
           len(${toksSql("text")}) AS n_tokens,
           len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
           len(list_filter(${toksSql("text")}, t -> t IN ($sw))) AS n_stop,
           list_aggregate(list_transform(${toksSql("text")}, x -> len(x)), 'sum') AS char_sum
         FROM documents)
       SELECT doc_id, n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
         ${pr4Sql("CAST(char_sum AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0)")} AS avg_token_len,
         ${pr4Sql("CAST(n_punct AS DOUBLE) / nullif(CAST(n_chars AS DOUBLE), 0)")} AS punct_ratio,
         ${pr4Sql("CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0)")} AS stopword_ratio,
         ${pr4Sql("CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0) * 0.5 + least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.3 + (1.0 - CAST(n_punct AS DOUBLE) / nullif(CAST(n_chars AS DOUBLE), 0)) * 0.2")} AS quality_score
       FROM d ORDER BY doc_id"""
  }

  /** Language-ID by marker-word voting (n-gram heuristic class;
    * deterministic argmax with fixed tie-break order). The labeled
    * `lang` column rides along so accuracy is inspectable. */
  private[ext] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"))

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).withColumn("toks", toks(col("text")))
    val scored = markers.foldLeft(d) { case (df, (lang, ws)) =>
      df.withColumn(s"score_$lang",
        size(filter(col("toks"), t => t.isInCollection(ws))))
    }
    // deterministic argmax: en beats de beats fr beats es on ties
    val pred =
      when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr") &&
           col("score_en") >= col("score_es") && col("score_en") > 0, "en")
      .when(col("score_de") >= col("score_fr") && col("score_de") >= col("score_es") &&
            col("score_de") > 0, "de")
      .when(col("score_fr") >= col("score_es") && col("score_fr") > 0, "fr")
      .when(col("score_es") > 0, "es")
      .otherwise("unknown")
    scored.select(col("doc_id"), col("lang").as("labeled_lang"),
        pred.as("pred_lang"),
        col("score_en").cast("long").as("score_en"),
        col("score_de").cast("long").as("score_de"))
      .orderBy(col("doc_id"))
  }

  val langIdSql: String = {
    def sc(lang: String): String = {
      val ws = markers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(${toksSql("text")}, t -> t IN ($ws)))"
    }
    s"""WITH d AS (
         SELECT doc_id, lang, ${sc("en")} AS score_en, ${sc("de")} AS score_de,
                ${sc("fr")} AS score_fr, ${sc("es")} AS score_es
         FROM documents)
       SELECT doc_id, lang AS labeled_lang,
         CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en > 0 THEN 'en'
              WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
              WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
              WHEN score_es > 0 THEN 'es'
              ELSE 'unknown' END AS pred_lang,
         CAST(score_en AS BIGINT) AS score_en,
         CAST(score_de AS BIGINT) AS score_de
       FROM d ORDER BY doc_id"""
  }

  /** Classifier EVALUATION for [[langId]] — the confusion matrix
    * against the table's gold `lang` labels, the report every
    * filtering pipeline publishes before trusting a heuristic gate:
    * per (gold, predicted) cell its doc count and the gold class's
    * recall in exact ppm (`n_cell / n_gold`, integer division — no
    * doubles), plus a per-cell token mass so the reader sees how much
    * CORPUS each confusion costs, not just how many docs.
    *
    * Scale shape: one narrow map (the same marker-scoring expressions
    * as [[langId]]) into one map-side-combined groupBy whose key
    * space is |langs|² — nothing global. */
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    val scored = langId(spark, dir)
      .select(col("doc_id"), col("labeled_lang"), col("pred_lang"))
    val toksLen = Tables.documents(spark, dir)
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_toks"))
    val cells = scored.join(toksLen, Seq("doc_id"))
      .groupBy(col("labeled_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val golds = cells.groupBy(col("labeled_lang"))
      .agg(sum(col("n_docs")).as("n_gold"))
    cells.join(broadcast(golds), Seq("labeled_lang"))
      .select(col("labeled_lang"), col("pred_lang"), col("n_docs"),
        col("n_tokens"),
        // `div`, not `/`: Spark's `/` on BIGINTs returns DOUBLE; the
        // ppm must stay an exact integer division like DuckDB's `//`
        expr("n_docs * 1000000 div n_gold").cast("long").as("recall_ppm"))
      .orderBy(col("labeled_lang"), col("pred_lang"))
  }

  val langIdEvalSql: String =
    s"""WITH li AS ($langIdSql),
       tl AS (SELECT doc_id, CAST(len(${toksSql("text")}) AS BIGINT) AS n_toks
              FROM documents),
       cells AS (
         SELECT labeled_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
         FROM li JOIN tl USING (doc_id)
         GROUP BY labeled_lang, pred_lang),
       golds AS (
         SELECT labeled_lang, CAST(sum(n_docs) AS BIGINT) AS n_gold
         FROM cells GROUP BY labeled_lang)
       SELECT labeled_lang, pred_lang, n_docs, n_tokens,
         CAST(n_docs * 1000000 // n_gold AS BIGINT) AS recall_ppm
       FROM cells JOIN golds USING (labeled_lang)
       ORDER BY labeled_lang, pred_lang"""

  /** Token counting per source: whitespace tokens vs a BPE-ish
    * regex tokenizer (letter runs / digit runs / single symbols) —
    * the cheap proxy for "how many tokens does this corpus cost". */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ws_tokens", size(toks(col("text"))).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("ws_tokens")).as("ws_tokens"),
           sum(col("bpe_tokens")).as("bpe_tokens"))
      .orderBy(col("source"))

  val tokenCountSql: String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(${toksSql("text")})) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens
       FROM documents GROUP BY source ORDER BY source"""

  /** PII detection + redaction — the compliance pass every
    * training-data pipeline runs before anything else. Synthetic PII
    * is injected in-query (the word-salad fixtures contain none):
    * every doc_id%4==0 doc gains an email, every doc_id%6==0 an IPv4.
    * Detection counts per source and redaction replaces matches with
    * typed placeholders; the redacted-length checksum proves the
    * rewrite byte-identically in both engines. Pure regexp_replace —
    * narrow, codegen'd, trivially parallel at any scale. */
  private val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("text2", concat(col("text"),
        when(col("doc_id") % 4 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0,
          concat(lit(" from 10.1."), ((col("doc_id") % 250) + 1).cast("string"), lit(".7")))
          .otherwise(lit(""))))
      .withColumn("n_emails", size(regexp_extract_all(col("text2"), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(col("text2"), lit(ipRe), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text2"), emailRe, "<EMAIL>"), ipRe, "<IP>"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_emails")).as("n_emails"),
           sum(col("n_ips")).as("n_ips"),
           sum(length(col("redacted"))).cast("long").as("redacted_chars"))
      .orderBy(col("source"))
  }

  val piiRedactSql: String =
    s"""WITH d AS (
         SELECT source,
           concat(text,
             CASE WHEN doc_id % 4 = 0
                  THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com')
                  ELSE '' END,
             CASE WHEN doc_id % 6 = 0
                  THEN concat(' from 10.1.', CAST((doc_id % 250) + 1 AS VARCHAR), '.7')
                  ELSE '' END) AS text2
         FROM documents),
       r AS (
         SELECT source,
           len(regexp_extract_all(text2, '$emailRe')) AS n_emails,
           len(regexp_extract_all(text2, '$ipRe')) AS n_ips,
           len(regexp_replace(regexp_replace(text2, '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g')) AS redacted_chars
         FROM d)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_emails) AS BIGINT) AS n_emails,
         CAST(sum(n_ips) AS BIGINT) AS n_ips,
         CAST(sum(redacted_chars) AS BIGINT) AS redacted_chars
       FROM r GROUP BY source ORDER BY source"""

  /** Document fingerprint: minimum rolling 8-char-shingle hash
    * (MinHash with k=1 — the content-defined fingerprint used for
    * near-dup candidate grouping). Identical [[Hashing.phash]] on
    * both sides. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism) // single-split table, md5-heavy map
      // fused native 8-gram hash stream ([[graft.functions.ShingleHashes]]):
      // one pass, thread-local digest, no per-shingle string/hex
      // allocation — bit-identical to the composed transform+phash
      // form (FunctionsSpec), so the oracle is untouched
      .withColumn("hs", graft.functions.ShingleHashes(col("text"), 8))
      .withColumn("fp", array_min(col("hs")))
    d.select(col("doc_id"), col("fp").as("fingerprint"),
        size(col("hs")).cast("long").as("n_shingles"))
      // materializing fence: the presentation sort SAMPLES its input
      // for range bounds — without the fence the md5-per-shingle map
      // above runs twice (once for sampling, once for the sort)
      .transform(graft.util.Fence.lineage)
      .orderBy(col("doc_id"))
  }

  val docFingerprintSql: String =
    s"""SELECT doc_id,
       list_min(list_transform(
         list_transform(generate_series(1, greatest(len(text) - 7, 1)),
                        i -> substr(text, CAST(i AS INT), 8)),
         s -> ${Hashing.phashSql("s")})) AS fingerprint,
       CAST(greatest(len(text) - 7, 1) AS BIGINT) AS n_shingles
       FROM documents ORDER BY doc_id"""

  private val WINNOW_W = 4

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03 —
    * the MOSS algorithm): over the ordered char-8-gram hash stream,
    * keep the MINIMUM of every [[WINNOW_W]]-wide window; the distinct
    * minima are the document's fingerprint set. Guarantees every
    * shared substring of length >= 8+W-1 contributes a shared
    * fingerprint while storing only ~2/(W+1) of the shingles — the
    * standard index-size/recall trade for substring-level dedup at
    * scale (the full shingle set never leaves the row; only the
    * winnowed minima would feed an inverted index). Pure narrow map;
    * the fingerprint SET is oracle-checked via a sorted-concat hash,
    * so the comparison is order-insensitive on both engines. */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val w = WINNOW_W
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism) // single-split table, md5-heavy map
      .withColumn("hs", graft.functions.ShingleHashes(col("text"), 8, "wn_"))
      .withColumn("n", size(col("hs")))
      // fused native winnowing ([[graft.functions.WindowMinima]]):
      // sorted distinct window minima in ONE primitive loop — the
      // composed slice+array_min form allocated a w-array per window
      // (FunctionsSpec asserts set parity; output is already sorted)
      .withColumn("fps", graft.functions.WindowMinima(col("hs"), w))
      .select(col("doc_id"),
        col("n").cast("long").as("n_shingles"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        (floor(size(col("fps")).cast("double") / col("n") * 10000 + 0.5) / 10000)
          .as("keep_frac"),
        Hashing.phash(concat_ws(",",
          transform(col("fps"), x => x.cast("string"))), "wnh_")
          .as("fp_hash"))
      // materializing fence before the presentation sort — its
      // range-bound sampling would otherwise run the md5+winnow map
      // twice (the docFingerprint measurement)
      .transform(graft.util.Fence.lineage)
      .orderBy(col("doc_id"))
  }

  val winnowFingerprintSql: String = {
    val w = WINNOW_W
    s"""WITH h AS (
         SELECT doc_id, list_transform(generate_series(1, greatest(len(text) - 7, 1)),
             i -> ${Hashing.phashSql("substr(text, CAST(i AS INT), 8)", "wn_")}) AS hs
         FROM documents),
       f AS (
         SELECT doc_id, len(hs) AS n,
           list_distinct(CASE WHEN len(hs) >= $w
             THEN list_transform(generate_series(1, len(hs) - ${w - 1}),
                    i -> list_min(list_slice(hs, i, i + ${w - 1})))
             ELSE [list_min(hs)] END) AS fps
         FROM h)
       SELECT doc_id, CAST(n AS BIGINT) AS n_shingles,
         CAST(len(fps) AS BIGINT) AS n_fingerprints,
         floor(CAST(len(fps) AS DOUBLE) / n * 10000 + 0.5) / 10000 AS keep_frac,
         ${Hashing.phashSql(
           "array_to_string(list_transform(list_sort(fps), x -> CAST(x AS VARCHAR)), ',')",
           "wnh_")} AS fp_hash
       FROM f ORDER BY doc_id"""
  }

  // ---- Windowed token co-occurrence --------------------------------

  private val COOC_WIN  = 5    // max position distance within a doc
  private val COOC_TOPK = 50

  /** Windowed token CO-OCCURRENCE — collocation mining, the
    * distributional-semantics primitive (PMI's integer-safe cousin):
    * for every unordered token pair occurring within [[COOC_WIN]]
    * positions, the co-count and both NEIGHBOR RATES
    * `co/count(a)` in exact ppm (expected b-partners per occurrence
    * of a — can exceed 1e6, since one occurrence has up to 2·WIN
    * partners; it is a rate, not a probability). The classic PMI normalizes
    * by p(a)p(b) — a T-squared factor that cannot stay in exact
    * BIGINTs at corpus scale and would need logs besides; the
    * conditional form ranks collocations just as well and stays pure
    * integer.
    *
    * Scale shape: the pair generator is a per-row nested transform —
    * at most [[COOC_WIN]] pairs per token position, LINEAR in corpus
    * tokens, never vocab-squared (only observed pairs materialize).
    * One (a, b)-keyed count with map-side combine, two vocab-bounded
    * broadcast joins for the unigram counts, TakeOrderedAndProject
    * head. */
  private def pairsFrom(t: Column): Column = {
    val n = size(t)
    when(n >= 2, flatten(
        transform(sequence(lit(1), n - 1), i =>
          transform(sequence(i + 1, least(i + COOC_WIN, n)), j =>
            struct(least(element_at(t, i), element_at(t, j)).as("a"),
              greatest(element_at(t, i), element_at(t, j)).as("b"))))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  def tokenCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan + tokenize serves both rollups: the token-array frame
    // is fenced and the pair explode and the unigram explode both read
    // it (the qualityGate/invertedIndex single-scan discipline)
    val d = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(toks(col("text")).as("t"))
      .transform(graft.util.Fence.lineage)
    val occ = d
      .select(explode_outer(pairsFrom(col("t"))).as("p"))
      .filter(col("p").isNotNull && col("p")("a") =!= col("p")("b"))
      .groupBy(col("p")("a").as("tok_a"), col("p")("b").as("tok_b"))
      .agg(count(lit(1)).as("n_co"))
    val uni = d
      .select(explode_outer(col("t")).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    occ
      .join(broadcast(uni.select(col("tok").as("tok_a"), col("n").as("n_a"))),
        Seq("tok_a"))
      .join(broadcast(uni.select(col("tok").as("tok_b"), col("n").as("n_b"))),
        Seq("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("n_co").cast("long").as("n_co"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        floor(col("n_co") * 1000000.0 / col("n_a")).cast("long").as("b_per_a_ppm"),
        floor(col("n_co") * 1000000.0 / col("n_b")).cast("long").as("a_per_b_ppm"))
      .orderBy(col("n_co").desc, col("tok_a"), col("tok_b"))
      .limit(COOC_TOPK)
  }

  val tokenCooccurrenceSql: String =
    s"""WITH d AS (SELECT ${toksSql("text")} AS t FROM documents),
       p AS (
         SELECT unnest(flatten(
           list_transform(generate_series(1, len(t) - 1), i ->
             list_transform(generate_series(i + 1, least(i + $COOC_WIN, len(t))), j ->
               struct_pack(a := least(t[i], t[j]), b := greatest(t[i], t[j])))))) AS p
         FROM d WHERE len(t) >= 2),
       occ AS (
         SELECT p.a AS tok_a, p.b AS tok_b, count(*) AS n_co
         FROM p WHERE p.a <> p.b GROUP BY p.a, p.b),
       uni AS (
         SELECT tok, count(*) AS n
         FROM (SELECT unnest(t) AS tok FROM d) GROUP BY tok)
       SELECT o.tok_a, o.tok_b, CAST(o.n_co AS BIGINT) AS n_co,
         CAST(ua.n AS BIGINT) AS n_a, CAST(ub.n AS BIGINT) AS n_b,
         CAST(floor(o.n_co * 1000000.0 / ua.n) AS BIGINT) AS b_per_a_ppm,
         CAST(floor(o.n_co * 1000000.0 / ub.n) AS BIGINT) AS a_per_b_ppm
       FROM occ o
       JOIN uni ua ON ua.tok = o.tok_a
       JOIN uni ub ON ub.tok = o.tok_b
       ORDER BY n_co DESC, tok_a, tok_b LIMIT $COOC_TOPK"""

  // ---- Markup stripping (web-corpus main-text extraction) ----------

  /** HTML-strip pipeline over a deterministically synthesized page
    * per document (the corpus text wrapped in head/nav/main/footer
    * chrome — the test tables hold plain text, so the page is built
    * in-query; at production scale the input IS the crawled HTML and
    * only the strip half runs). Stages mirror a real main-text
    * extractor: drop <head> wholesale (scripts, styles, title), drop
    * nav/footer boilerplate blocks, strip remaining tags, collapse
    * whitespace. Because the page wraps the original text exactly,
    * clean text == source text is an invariant the spec asserts, and
    * the oracle checks content via [[Hashing.phash]].
    *
    * Scale shape: pure per-row regexp map — narrow, codegen'd, no
    * shuffle but the presentation sort. All regexes use syntax with
    * identical semantics in Java regex and RE2 (non-greedy spans,
    * negated char classes; `.` matches-no-newline in both). */
  def stripMarkup(spark: SparkSession, dir: String): DataFrame = {
    val page = concat(
      lit("<html><head><title>"), col("source"),
      lit("</title><script type=\"text/javascript\">track("), col("doc_id").cast("string"),
      lit(");</script></head><body><nav class=\"top\">Home | About | Contact</nav><main><p>"),
      col("text"),
      lit("</p></main><footer>Copyright 2026 Example Corp</footer></body></html>"))
    val clean = trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      page,
      "<head>.*?</head>", " "),
      "<nav[^>]*>.*?</nav>|<footer[^>]*>.*?</footer>", " "),
      "<[^>]*>", " "),
      "\\s+", " "))
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism) // single-split table, regex-heavy map
      .select(col("doc_id"), length(page).as("raw_len"),
        length(clean).as("clean_len"),
        pr4(length(clean).cast("double") /
          nullif(length(page).cast("double"), lit(0.0))).as("retained_frac"),
        Hashing.phash(clean, "sm_").as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  val stripMarkupSql: String = {
    val page = "'<html><head><title>' || source || " +
      "'</title><script type=\"text/javascript\">track(' || doc_id || " +
      "');</script></head><body><nav class=\"top\">Home | About | Contact</nav><main><p>' || " +
      "text || '</p></main><footer>Copyright 2026 Example Corp</footer></body></html>'"
    val clean = "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      "page, '<head>.*?</head>', ' ', 'g'), " +
      "'<nav[^>]*>.*?</nav>|<footer[^>]*>.*?</footer>', ' ', 'g'), " +
      "'<[^>]*>', ' ', 'g'), " +
      "'\\s+', ' ', 'g'))"
    s"""WITH p AS (SELECT doc_id, $page AS page FROM documents),
       c AS (SELECT doc_id, page, $clean AS clean FROM p)
       SELECT doc_id, CAST(len(page) AS BIGINT) AS raw_len,
         CAST(len(clean) AS BIGINT) AS clean_len,
         ${pr4Sql("CAST(len(clean) AS DOUBLE) / nullif(CAST(len(page) AS DOUBLE), 0)")} AS retained_frac,
         ${Hashing.phashSql("clean", "sm_")} AS clean_hash
       FROM c ORDER BY doc_id"""
  }
  private val FH_BUCKETS = 64L

  /** Hashing-trick collision audit — the table you read BEFORE fixing
    * the feature width of a hashed-bag-of-words model: every corpus
    * token maps to `phash(token) mod 64`, and each bucket reports how
    * many distinct tokens collided into it, their total occurrence
    * mass, the dominant token (struct-max argmax), and the dominant
    * token's share of the bucket in ppm — a bucket whose top token
    * owns <<10\u2076 ppm is blending unrelated features. Load is also
    * reported vs the uniform share (10\u2076 = perfectly level).
    *
    * Scale shape: one explode into a token-keyed counting groupBy
    * (vocab-sized shuffle, map-side combined), then the bucket rollup
    * shuffles \u2264|vocab| rows onto a 64-key space; totals ride a 1-row
    * broadcast. */
  def featureHash(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism) // single-split table, CPU-bound explode
      .select(explode_outer(toks(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("long").as("n_occ_total"))
    vocab
      .withColumn("bucket", pmod(Hashing.phash(col("token"), "fh_"), lit(FH_BUCKETS)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("cnt")).cast("long").as("n_occ"),
        max(struct(col("cnt"), col("token"))).as("m"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_tokens"), col("n_occ"),
        col("m")("token").as("top_token"),
        col("m")("cnt").cast("long").as("top_occ"),
        expr("m.cnt * 1000000 div n_occ").as("top_share_ppm"),
        expr(s"n_occ * ${FH_BUCKETS}000000 div n_occ_total").as("load_ppm"))
      .orderBy(col("bucket"))
  }

  val featureHashSql: String =
    s"""WITH occ AS (
         SELECT unnest(${toksSql("text")}) AS token FROM documents),
       v AS (SELECT token, count(*) AS cnt FROM occ GROUP BY token),
       t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_occ_total FROM v),
       b AS (
         SELECT ${Hashing.phashSql("token", "fh_")} % $FH_BUCKETS AS bucket,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(cnt) AS BIGINT) AS n_occ,
           max(struct_pack(cnt := cnt, token := token)) AS m
         FROM v GROUP BY 1)
       SELECT bucket, n_tokens, n_occ,
         m.token AS top_token,
         CAST(m.cnt AS BIGINT) AS top_occ,
         CAST(m.cnt * 1000000 // n_occ AS BIGINT) AS top_share_ppm,
         CAST(n_occ * ${FH_BUCKETS}000000 // n_occ_total AS BIGINT)
           AS load_ppm
       FROM b CROSS JOIN t ORDER BY bucket"""

  private val BURST_TOPK = 50

  /** Term burstiness — Church & Gale's cf/df contrast (also Katz's
    * "burstiness"): for the 50 highest-collection-frequency terms,
    * how many times a term repeats INSIDE the documents it touches
    * (cf/df in exact milli) vs how widely it spreads (df share of
    * the corpus in ppm). Function words spread wide and repeat
    * little; topical/content words clump — the signal separating
    * stopword lists, keyword candidates, and tokenizer merge
    * priorities WITHOUT any language resource.
    *
    * Scale shape: one explode into a (token, doc) frame, ONE
    * two-level aggregate (per-token df via count of distinct docs is
    * avoided — the (token, doc) groupBy collapses first, map-side
    * combined, then df = count and cf = sum per token);
    * TakeOrderedAndProject caps the head at 50 with a token
    * tie-break. */
  def termBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode_outer(toks(col("text"))).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("long").as("n_docs"))
    perDoc.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("tf")).cast("long").as("cf"))
      .crossJoin(broadcast(nDocs))
      .select(col("token"), col("df"), col("cf"),
        expr("cf * 1000 div df").as("burstiness_milli"),
        expr("df * 1000000 div n_docs").as("df_ppm"))
      .orderBy(col("cf").desc, col("token"))
      .limit(BURST_TOPK)
  }

  val termBurstinessSql: String =
    s"""WITH occ AS (
         SELECT doc_id, unnest(${toksSql("text")}) AS token FROM documents),
       pd AS (
         SELECT token, doc_id, count(*) AS tf
         FROM occ WHERE token IS NOT NULL AND token <> ''
         GROUP BY token, doc_id),
       nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       t AS (
         SELECT token, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf
         FROM pd GROUP BY token)
       SELECT token, df, cf,
         CAST(cf * 1000 // df AS BIGINT) AS burstiness_milli,
         CAST(df * 1000000 // n_docs AS BIGINT) AS df_ppm
       FROM t CROSS JOIN nd
       ORDER BY cf DESC, token LIMIT $BURST_TOPK"""
}
