package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the quality / retrieval operators. */
class QualitySpec extends AnyFunSuite {
  import TestSpark._

  test("repetition_stats fractions are consistent and bounded") {
    val rows = SparkEntry.queries("repetition_stats")(spark, sf).collect()
    val n = graft.model.Tables.documents(spark, sf).count()
    assert(rows.length == n)   // one row per document, short docs included
    rows.foreach { r =>
      val tot = r.getLong(1)
      if (tot == 0) {
        assert(r.isNullAt(2) && r.isNullAt(3) && !r.getBoolean(4))
      } else {
        val dup = r.getDouble(2); val top = r.getDouble(3)
        assert(dup >= 0.0 && dup <= 1.0, s"dup_frac out of range: $r")
        // the most frequent bigram is itself duplicated whenever dup>0
        assert(top > 0.0 && top <= 1.0, s"top_frac out of range: $r")
        // both fractions are rounded to 4 dp, so allow that granularity
        assert(dup == 0.0 || top >= 2.0 / tot - 1e-4, s"top vs dup inconsistent: $r")
        assert(r.getBoolean(4) == (dup > 0.5 || top > 0.2), s"flag mismatch: $r")
      }
    }
  }

  test("repetition_stats flags a degenerate all-same-token document") {
    // "x x x ... x" (50 tokens): every bigram identical -> dup_frac 1.0
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    Seq((1L, Seq.fill(50)("x").mkString(" "), "en", "srcT", 99L),
        (2L, "a b c d e f g h", "en", "srcT", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("repetition_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) == 1.0 && out(1L).getBoolean(4))
    assert(out(2L).getDouble(2) == 0.0 && !out(2L).getBoolean(4))
  }

  test("source_overlap is symmetric-complete and containment-bounded") {
    val rows = SparkEntry.queries("source_overlap")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))   // each unordered pair once
      val shared = r.getLong(2); val na = r.getLong(3); val nb = r.getLong(4)
      assert(shared >= 1 && shared <= math.min(na, nb), s"bad counts: $r")
      val cont = r.getDouble(5)
      assert(cont > 0.0 && cont <= 1.0, s"containment out of range: $r")
    }
  }

  test("source_overlap finds a planted boilerplate copy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ov").toString
    val boiler = (1 to 20).map(i => s"tok$i").mkString(" ")
    Seq((1L, boiler, "en", "srcA", 99L),
        (2L, boiler + " trailing extra words here", "en", "srcB", 99L),
        (3L, (100 to 130).map(i => s"zz$i").mkString(" "), "en", "srcC", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("source_overlap")(spark, dir).collect()
    // srcA (13 shingles) fully contained in srcB; srcC overlaps nothing
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    assert(r.getDouble(5) == 1.0, s"containment should be 1.0: $r")
  }

  test("duplicate_spans fractions are consistent and bounded") {
    val rows = SparkEntry.queries("duplicate_spans")(spark, sf).collect()
    val n = graft.model.Tables.documents(spark, sf).count()
    assert(rows.length == n)   // one row per document, short docs included
    rows.foreach { r =>
      val tot = r.getLong(1); val dup = r.getLong(2)
      assert(dup >= 0 && dup <= tot, s"dup_grams out of range: $r")
      if (tot == 0) assert(r.isNullAt(3) && !r.getBoolean(4))
      else {
        val frac = r.getDouble(3)
        assert(frac >= 0.0 && frac <= 1.0, s"dup_frac out of range: $r")
        assert(r.getBoolean(4) == (frac > 0.2), s"flag mismatch: $r")
      }
    }
  }

  test("duplicate_spans catches a planted cross-document copy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsp").toString
    val copied = (1 to 12).map(i => s"span$i").mkString(" ")
    Seq((1L, copied, "en", "s", 9L),                              // fully copied
        (2L, copied + " unique tail here now", "en", "s", 9L),    // mostly copied
        (3L, (50 to 75).map(i => s"uq$i").mkString(" "), "en", "s", 9L), // unique
        (4L, "too short", "en", "s", 9L))                         // < 8 tokens
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("duplicate_spans")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) == 1.0 && out(1L).getBoolean(4))
    assert(out(2L).getLong(2) == 5 && out(2L).getBoolean(4))  // the 5 grams inside `copied`
    assert(out(3L).getLong(2) == 0 && !out(3L).getBoolean(4))
    assert(out(4L).getLong(1) == 0 && out(4L).isNullAt(3) && !out(4L).getBoolean(4))
  }

  test("corpus_mixture shares and weights are consistent") {
    val rows = SparkEntry.queries("corpus_mixture")(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getLong(4))
    // floors lose < 1 ppm per stratum
    assert(shares.sum <= 1000000 && shares.sum > 1000000 - rows.length)
    rows.foreach { r =>
      assert(r.getLong(5) >= 1 && r.getLong(5) <= 1000000, s"weight out of range: $r")
    }
    // flattening: strata above the uniform share are capped at 1x,
    // strata below get upsampled proportionally
    val nStrata = rows.length
    rows.foreach { r =>
      val above = r.getLong(4) > 1000000L / nStrata
      if (above) assert(r.getLong(5) < 1000000, s"over-share stratum not downweighted: $r")
    }
  }

  test("curriculum_buckets tiers are contiguous and complete") {
    val rows = SparkEntry.queries("curriculum_buckets")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val scored = SparkEntry.queries("text_stats")(spark, sf)
      .filter(col("quality_score").isNotNull).count()
    assert(total == scored, s"bucketed $total of $scored scored docs")
    assert(rows.map(_.getLong(0)).forall(t => t >= 1 && t <= 4))
    // score ranges must not interleave across tiers
    val byTier = rows.groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.map(_.getDouble(3)).min, rs.map(_.getDouble(4)).max))
    (1L to 3L).foreach { t =>
      if (byTier.contains(t) && byTier.contains(t + 1))
        assert(byTier(t)._2 <= byTier(t + 1)._1 + 1e-12,
          s"tier $t max ${byTier(t)._2} above tier ${t + 1} min ${byTier(t + 1)._1}")
    }
  }

  test("bm25_topk ranks higher-tf docs first at equal length") {
    val rows = SparkEntry.queries("bm25_topk")(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending")
    assert(scores.forall(_ > 0))
    // ties broken by doc_id ascending
    rows.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(2) == b.getLong(2)) assert(a.getLong(0) < b.getLong(0))
    }
  }

  test("keyword_topk prefers rare dense terms over stopwords") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kw").toString
    // "zebra" appears 3x in doc 1 only; "the" is everywhere — tf-idf
    // must rank zebra first despite equal tf
    Seq((1L, "the zebra the zebra the zebra", "en", "s", 9L),
        (2L, "the quick brown fox the lazy dog", "en", "s", 9L),
        (3L, "the and of in the and of in", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("keyword_topk")(spark, dir).collect()
    val doc1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(doc1.head.getString(2) == "zebra",
      s"doc 1 top keyword should be zebra: ${doc1.map(_.getString(2)).toSeq}")
    // every doc gets at most 3 keywords, ranks contiguous from 1
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // scores within a doc are non-increasing by rank
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val s = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("distinct_sketch estimate lands within the bucket-min error bound") {
    // sf0.01: every source holds >1000 distinct shingles, the n >> P
    // regime the estimator is specified for (P=256 -> sigma ~ 6%)
    val rows = SparkEntry.queries("distinct_sketch")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // E[empty] = 256·(1-1/256)^n ≈ 1.3 at n=1355 — allow a few
      assert(r.getLong(2) >= 248, s"too many unhit buckets: $r")
      assert(r.getDouble(4) <= 0.25,
        s"sketch error beyond 4 sigma: $r")
    }
  }

  test("embed_quantize reconstruction error stays within int8 step size") {
    val rows = SparkEntry.queries("embed_quantize")(spark, sf).collect()
    assert(rows.length == graft.model.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val amax = r.getLong(1)
      assert(amax > 0)
      val mse = r.getDouble(2)
      // per-element |err| <= step/2 = amax/254 (+ rounding slack)
      val bound = math.pow(amax.toDouble / 254.0 + 1.0, 2)
      assert(mse >= 0.0 && mse <= bound, s"mse $mse beyond bound $bound: $r")
    }
  }

  test("value_quantiles are monotone and consistent with exact ranks") {
    val rows = SparkEntry.queries("value_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    val events = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val (p50, p95, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p95 && p95 <= p99, s"quantiles not monotone: $r")
      val vs = events(t)
      assert(n == vs.length)
      // grid quantile must sit within one grid step of the exact
      // rank-selected value
      def exact(p: Double) = vs(math.ceil(p * n).toInt - 1)
      assert(math.abs(p50 - exact(0.50)) <= 0.001 + 1e-9, s"p50 off: $r vs ${exact(0.50)}")
      assert(math.abs(p99 - exact(0.99)) <= 0.001 + 1e-9, s"p99 off: $r vs ${exact(0.99)}")
    }
  }

  test("bm25_topk on a synthetic corpus prefers the term-dense doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm").toString
    val filler = (1 to 20).map(i => s"w$i").mkString(" ")
    Seq((1L, s"hash join stream hash join stream $filler", "en", "s", 9L),
        (2L, s"hash $filler", "en", "s", 9L),
        (3L, s"$filler $filler", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("bm25_topk")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      s"expected docs 1,2 (doc 3 has no query terms): ${out.mkString(",")}")
  }

  test("ngram_novelty accounts for every distinct shingle exactly once") {
    val rows = SparkEntry.queries("ngram_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)}: novel > total")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
    }
    // every distinct corpus shingle debuts in exactly one document, so
    // the novel mass across all sources IS the distinct shingle count
    import org.apache.spark.sql.functions._
    val t = split(trim(col("text")), "\\s+")
    val distinctShingles = graft.model.Tables.documents(spark, sf)
      .select(explode_outer(when(size(t) >= 8,
        transform(sequence(lit(1), size(t) - 7),
          i => concat_ws(" ", (0 until 8).map(o => element_at(t, i + o)): _*)))
        .otherwise(array().cast("array<string>"))).as("s"))
      .filter(col("s").isNotNull)
      .select(col("s")).distinct().count()
    assert(rows.map(_.getLong(3)).sum == distinctShingles,
      "novel mass does not equal the distinct shingle count")
  }

  test("token_cooccurrence counts a planted adjacent pair exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cooc").toString
    // "alpha beta" adjacent 4 times; gamma never within 5 of alpha
    val far = (1 to 10).map(i => s"pad$i").mkString(" ")
    Seq((1L, s"alpha beta $far alpha beta", "en", "s", 9L),
        (2L, s"alpha beta $far gamma", "en", "s", 9L),
        (3L, s"beta alpha $far gamma", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("token_cooccurrence")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("alpha", "beta"))
    assert(ab.getLong(2) == 4L, s"alpha-beta co-count: ${ab.getLong(2)}")
    assert(ab.getLong(3) == 4L && ab.getLong(4) == 4L)   // 4 alphas, 4 betas
    assert(ab.getLong(5) == 1000000L && ab.getLong(6) == 1000000L)
    assert(!out.contains(("alpha", "gamma")), "distant pair leaked into the window")
    // rate bound: each occurrence has at most 2*WIN partners
    out.values.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) * 10 && r.getLong(2) <= r.getLong(4) * 10)
    }
  }
}
