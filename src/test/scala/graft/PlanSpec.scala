package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regression guards: the scale properties this
  * engine's operators are built around are PLAN properties, not
  * result properties — a future Catalyst version or refactor could
  * keep every oracle green while silently reintroducing a cartesian
  * product or a global sort. These assertions pin the shapes.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("LSH candidate generation never degrades to a cross join") {
    for (q <- Seq("dedup_minhash_lsh", "ngram_jaccard", "simhash_pairs",
                  "dedup_embedding", "dedup_incremental")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
      // simhash_pairs carries the 1-row band-layout knob (count →
      // nb) as a broadcast cross join — the repo's in-query-knob
      // convention; any OTHER nested loop (an unbroadcast build, a
      // row-scale product) is still a degradation
      if (p.contains("BroadcastNestedLoopJoin"))
        assert(q == "simhash_pairs" && p.contains("BroadcastExchange"),
          s"$q plan has a nested-loop join")
    }
  }

  test("keeper-table consumers read the staged cache, not the propagation") {
    // dedup_group_sizes and dedup_keep_longest must derive from the
    // persisted (doc_id, keeper_id) stage — a refactor that re-runs
    // LSH + label propagation per consumer would still be green under
    // the oracle, just N× the cost
    for (q <- Seq("dedup_group_sizes", "dedup_keep_longest")) {
      val p = planOf(q)
      assert(p.contains("InMemoryTableScan"),
        s"$q does not read the staged keeper table")
    }
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort+limit") {
    assert(planOf("topk_assets").contains("TakeOrderedAndProject"))
  }

  test("knn_ivf rank filters push down as WindowGroupLimit") {
    assert(planOf("knn_ivf").contains("WindowGroupLimit"))
  }

  test("knn_bruteforce's only cross join is against the broadcast query set") {
    val p = planOf("knn_bruteforce")
    // the O(|Q|·N) scan is the operator's definition — but the small
    // side must be the broadcast build side, never a shuffled product
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("bm25_topk top-k is TakeOrderedAndProject over a broadcast stats row") {
    val p = planOf("bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), "bm25 fell back to global sort+limit")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "corpus stats row is not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("value_quantiles windows run over the histogram, not the raw events") {
    // the Window's child subtree must contain the histogram aggregate:
    // if a refactor ever feeds raw rows to the window, the per-type
    // funnel comes back. The executed plan prints parents above
    // children (AQE hides WindowExec from collect()), so assert an
    // aggregate PRINTS BELOW the window node
    val p = planOf("value_quantiles")
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, "no window in the plan")
    assert(p.indexOf("HashAggregate", wIdx) > wIdx,
      "no aggregate below the window — raw rows reach the window")
  }

  test("source_overlap fans out from one materialized shingle set") {
    val p = planOf("source_overlap")
    assert(!p.contains("CartesianProduct"), "source pair join degraded")
    // the fenced distinct materializes once and is scanned per consumer
    assert(p.contains("Scan ExistingRDD"), "lineage fence missing — " +
      "the explode+distinct pipeline would run once per consumer")
  }

  test("kmeans assignment passes are broadcast joins over a fenced quantization") {
    val p = planOf("kmeans_embeddings")
    // centroids (K x DIM) must be the broadcast side of both
    // assignment passes — a shuffled product here would scale with N
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "centroids are not broadcast")
    assert(!p.contains("CartesianProduct"), "assignment degraded to a cartesian")
    // the milli-quantization is referenced by seeds + both passes —
    // the fence must keep it from recomputing per consumer
    assert(p.contains("Scan ExistingRDD"), "quantization fence missing")
  }

  test("strip_markup is a narrow regexp map with no mid-plan exchange") {
    val p = planOf("strip_markup")
    // one repartition barrier after the scan, then map work only —
    // any aggregate or join in this plan is a regression
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "strip_markup grew a join or aggregate")
  }

  test("duplicate_spans joins stay hash-keyed equi-joins") {
    val p = planOf("duplicate_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram-hash join degraded to a product")
  }

  test("ann_recall composes the two kNN plans without a product join") {
    val p = planOf("ann_recall")
    // the only nested-loop join allowed is knn_bruteforce's own
    // broadcast query scan; the recall join itself is an equi-join
    assert(!p.contains("CartesianProduct"))
  }

  test("keyword_topk per-doc heads push down as WindowGroupLimit") {
    val p = planOf("keyword_topk")
    assert(p.contains("WindowGroupLimit"),
      "rank<=3 did not push into the window — full (doc, token) space sorts")
    assert(p.contains("Scan ExistingRDD"), "occurrence fence missing — " +
      "the explode would run once per aggregate")
  }

  test("interval_join stays a bucket equi-join, never a theta nested loop") {
    val p = planOf("interval_join")
    // the naive start<=ts<=end form plans as BroadcastNestedLoopJoin
    // — the O(N) interval side must never be a broadcast build side
    assert(!p.contains("CartesianProduct"), "interval join has a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval join degraded to a theta nested-loop join")
  }

  test("rolling_window partitions on user_id — no single-partition window") {
    val plan = SparkEntry.queries("rolling_window")(spark, sf)
      .queryExecution.executedPlan.toString
    // a Window with an empty partition spec moves all rows to one
    // partition (Spark even warns); assert the window operator line
    // carries the user_id partition key (tree lines are '+- Window
    // [...windowspecdefinition(user_id...], [user_id], [es ASC...')
    val wLine = plan.linesIterator.find(_.contains("windowspecdefinition")).getOrElse("")
    assert(wLine.contains("windowspecdefinition(user_id"),
      s"window not keyed by user_id: $wLine")
  }

  test("embedding_outliers: broadcast centroid join, per-label head pushed down") {
    val p = planOf("embedding_outliers")
    assert(p.contains("WindowGroupLimit"), "rank<=5 did not push down")
    assert(p.contains("BroadcastExchange"), "centroid frame is not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("column_profile: per-column pruned scans, no Expand fan-out") {
    val p = planOf("column_profile")
    // the single-wide-aggregate alternative plans through Expand
    // (row fan-out x12, measured 18.7s vs ~1s at sf0.1)
    assert(!p.contains("Expand"), "profile regressed to the Expand multi-distinct plan")
    // each scan must be pruned to exactly one column (ReadSchema has
    // a single field) — together the 11 scans read ~one table width
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    assert(schemas.forall(s => !s.substring(s.indexOf("ReadSchema")).contains(",")),
      s"a profile scan reads more than one column")
  }

  test("bpe_pair_counts aggregates twice with a final TakeOrderedAndProject") {
    val p = planOf("bpe_pair_counts")
    assert(p.contains("TakeOrderedAndProject"), "pair head fell back to global sort+limit")
    // word-collapse THEN pair aggregate: two exchanges, both hash-keyed
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2,
      "vocab-collapse stage missing — pairs aggregate over raw corpus tokens")
  }

  test("bloom_decontaminate membership joins are broadcasts, never shuffles of the corpus") {
    val p = planOf("bloom_decontaminate")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastExchange"), "lit-position / eval-shingle set not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a corpus-side shuffle join appeared — the filter side must broadcast")
  }

  test("domain_cap ranks via WindowGroupLimit in both phases") {
    val p = planOf("domain_cap")
    val hits = "WindowGroupLimit".r.findAllIn(p).size
    // partial + final per phase: the rank filter must prune BEFORE each
    // exchange, or a whole domain rides the shuffle
    assert(hits >= 2, s"expected both cap phases to push WindowGroupLimit, found $hits")
  }

  test("epoch_plan joins the weights broadcast-side") {
    val p = planOf("epoch_plan")
    assert(p.contains("BroadcastExchange"), "stratum weights not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("retention_cohorts joins the cohort sizes broadcast-side") {
    val p = planOf("retention_cohorts")
    assert(p.contains("BroadcastExchange"), "cohort-size frame not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_semantic: broadcast centroid assignment, equi-joined cells") {
    val p = planOf("dedup_semantic")
    assert(!p.contains("CartesianProduct"), "cell pair join degraded to a product")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "centroid table not broadcast")
    assert(p.contains("Scan ExistingRDD"), "quantization fence missing")
  }

  test("containment_pairs: hash-keyed blocking joins over one fenced shingle set") {
    val p = planOf("containment_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Scan ExistingRDD"), "shingle fence missing — " +
      "the explode pipeline would run once per consumer")
  }

  test("inverted_index prunes posting heads via WindowGroupLimit pre-shuffle") {
    val p = planOf("inverted_index")
    val hits = "WindowGroupLimit".r.findAllIn(p).size
    // partial + final: a stopword's full posting list must never ride
    // the window exchange — only POSTINGS rows per term may survive
    assert(hits >= 2, s"expected partial+final WindowGroupLimit, found $hits")
    assert(p.contains("TakeOrderedAndProject"), "dictionary cap is a global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q19's disjunctive predicate pushes per-side conjuncts to both scans") {
    val p = planOf("q19_discount_revenue")
    // the OR-of-ANDs straddles the join, but each side's extractable
    // OR must reach its parquet scan — losing this re-reads the full
    // fact table at 100 TB
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), Or("),
      "lineitem scan lost the extracted quantity-band OR filter")
    assert(p.contains("EqualTo(p_brand,Brand#1)"),
      "part scan lost the extracted brand/size OR filter")
    assert(!p.contains("CartesianProduct"))
  }

  test("q10 caps output via TakeOrderedAndProject, nation broadcast") {
    val p = planOf("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), "top-20 fell back to a global sort")
    assert(p.contains("BroadcastExchange"), "nation dim not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("round-5 additions never degrade to cartesian products") {
    // BroadcastNestedLoopJoin is tolerated ONLY as the physical form
    // of a 1-row scalar/knob broadcast cross join (the in-query
    // derived-knob convention); an unbroadcast cartesian never is
    for (q <- Seq("pagerank_links", "resample_hourly", "mad_outliers",
                  "sketch_union", "vocab_coverage", "shard_plan",
                  "asof_nearest", "cdc_chunks", "dedup_fuzzy_edit",
                  "quality_gate", "tokenize_bpe", "mixture_alpha")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
    }
    // the one pair generator in the batch must not even nested-loop
    assert(!planOf("dedup_fuzzy_edit").contains("BroadcastNestedLoopJoin"),
      "fuzzy-edit candidates came from a nested-loop join")
  }

  test("round-6 additions never degrade to cartesian products") {
    // same tolerance as the round-5 guard: BroadcastNestedLoopJoin
    // only as a 1-row scalar broadcast cross join
    for (q <- Seq("q7_volume_shipping", "q8_market_share", "q22_idle_customers",
                  "boolean_search", "phrase_search", "zipf_fit",
                  "k_anonymity", "event_order_audit", "split_leakage",
                  "pq_quantize", "importance_weights", "importance_resample",
                  "degree_distribution", "profile_drift", "blocklist_filter",
                  "rollup_maintenance", "triangle_count", "forget_audit")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
    }
    // the pair/path enumerators must not even nested-loop
    for (q <- Seq("split_leakage", "triangle_count", "pq_quantize")) {
      val p = planOf(q)
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      // triangle_count carries two 1-row scalar cross joins (tri,
      // edge counts); its triangle JOINS themselves must be hash/sort
      assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
             p.contains("ShuffledHashJoin"), s"$q has no equi-join at all")
      if (q != "triangle_count")
        assert(bnl == 0, s"$q pair generation nested-loops ($bnl)")
    }
  }

  test("phrase_search is a narrow per-doc map — no exchange before the sort") {
    val p = planOf("phrase_search")
    // one repartition (the single-split-table convention) and the
    // final sort are the only exchanges; no join, no aggregate
    assert(!p.contains("Join"), "phrase matching must not join")
    assert(!p.contains("HashAggregate"), "phrase matching must not aggregate")
  }

  test("q22 anti-join builds the dated order side, threshold broadcast") {
    val p = planOf("q22_idle_customers")
    assert(p.contains("LeftAnti"), "no-orders predicate must be a left_anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("resample_hourly aggregates hours partially — no raw-row window") {
    val p = planOf("resample_hourly")
    // the only Window must run over the dense hour grid (post-agg);
    // the hourly rollup itself is a partial+final HashAggregate
    assert(p.contains("partial_count") || p.contains("partial"),
      "hourly rollup lost its map-side partial aggregation")
    assert("Window ".r.findAllIn(p).size <= 1,
      "more than the carry window appeared — a raw-row window snuck in")
  }

  test("mad_outliers joins only broadcast per-type scalars") {
    val p = planOf("mad_outliers")
    assert(p.contains("BroadcastExchange"), "median/MAD frames not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a shuffle join appeared — the histogram rollups must broadcast")
  }

  test("winnow_fingerprint is a pure narrow map — no joins at any scale") {
    val p = planOf("winnow_fingerprint")
    assert(!p.toLowerCase.contains("join"), "a join appeared in a per-row map op")
  }

  test("ref_integrity is one full-outer equi-join, not two anti-joins") {
    val p = planOf("ref_integrity")
    assert(!p.contains("CartesianProduct"))
    assert("FullOuter".r.findAllIn(p).size >= 1, "full-outer join shape lost")
    assert("Join".r.findAllIn(p).size <= 2, // one join + possible AQE reprint
      "more joins than the single planned full-outer")
  }

  test("filters and pruning reach the parquet scan in the flagship report") {
    val p = SparkEntry.queries("report_metrics")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), "no pushed filters on the scan")
    assert(!p.toLowerCase.contains("cartesianproduct"))
  }

  test("late round-6 additions keep their planned shapes") {
    // ivf_cell_balance carries a 1-row scalar cross join (the in-plan
    // total) — tolerated like triangle_count's; everything else must
    // be cartesian-free
    for (q <- Seq("q2_min_cost_supplier", "tokenizer_fertility",
                  "lm_quality_buckets", "dedup_prefix", "merge_upsert",
                  "topk_brands_per_nation", "session_gap_stats")) {
      assert(!planOf(q).contains("CartesianProduct"),
        s"$q plan has a cartesian product")
    }
    // q2's correlated-min decorrelation must stay a partial-agg
    // argmax, not a rank window over (part, supplier) rows
    val q2 = planOf("q2_min_cost_supplier")
    assert(!q2.contains("Window"), "q2 reintroduced a rank window")
    assert(!q2.contains("CartesianProduct"))
    // the per-group top-k must push the rank cut into the window sort
    assert(planOf("topk_brands_per_nation").contains("WindowGroupLimit"),
      "dense_rank<=3 did not push down as WindowGroupLimit")
    // MERGE classification is ONE full-outer equi-join over the key
    val m = planOf("merge_upsert")
    assert("FullOuter".r.findAllIn(m).size >= 1, "merge lost its full-outer join")
    assert(!m.contains("CartesianProduct"))
    // the gap profile is a window + agg — never a timeline self-join
    assert(!planOf("session_gap_stats").toLowerCase.contains("join"),
      "session_gap_stats joined instead of using the lag window")
    // skew_report: TakeOrdered head over the counts frame, 1-row
    // scalar cross join tolerated, nothing sorts globally
    val sk = planOf("skew_report")
    assert(sk.contains("TakeOrderedAndProject"),
      "skew_report lost its top-k head")
    // latency_percentiles windows run over the histogram — the only
    // aggregates below the windows must be the (type, gap) histogram
    assert(!planOf("latency_percentiles").contains("CartesianProduct"))
    assert(!planOf("cohort_ltv").contains("CartesianProduct"))
    // multi-grain rollup must be ONE Expand pass, not three scans
    val tg = planOf("time_grain_rollup")
    assert(tg.contains("Expand"), "grouping sets lost the Expand")
    assert("Scan parquet".r.findAllIn(tg).size <= 1,
      "time_grain_rollup scans the fact more than once")
    // the ADC scan must join the bounded lookup, never nested-loop
    // the corpus against itself (the exact-baseline crossJoin against
    // the 8-row broadcast query frame is the knn_bruteforce shape)
    assert(!planOf("pq_recall").contains("CartesianProduct"))
  }

  test("round-6 batch ops: no cartesian products, no nested-loop joins") {
    for (q <- Seq("pit_features", "skyline_parts", "overdispersion",
                  "link_prediction", "source_assortativity", "k_core",
                  "feature_hash", "calibration_bins", "mann_whitney",
                  "changepoint_daily", "kaplan_meier", "term_burstiness",
                  "quantile_normalize")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
      // broadcast nested-loop against a 1-row scalar frame is the
      // sanctioned pattern; a SHUFFLED nested loop never is
      assert(!p.contains("ShuffledNestedLoop"), s"$q has a shuffled nested loop")
    }
  }

  test("priority_sample and term_burstiness cap heads via TakeOrderedAndProject") {
    assert(planOf("priority_sample").contains("TakeOrderedAndProject"))
    assert(planOf("term_burstiness").contains("TakeOrderedAndProject"))
    assert(planOf("link_prediction").contains("TakeOrderedAndProject"))
  }

  test("pit_features: all windows share ONE user-keyed exchange and sort") {
    val p = planOf("pit_features")
    // Catalyst may emit separate Window nodes for the lag frame and
    // the strictly-prior sum frame, but they must share a single
    // hash exchange on user_id and a single per-partition sort — a
    // second exchange would mean the features re-shuffle per frame
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges")
    val sorts = "\\+- Sort \\[".r.findAllIn(p).length
    assert(sorts <= 2, s"pit_features grew extra sorts: $sorts")
  }

  test("skyline_parts windows share one p_type sort, no self-join") {
    val p = planOf("skyline_parts")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "skyline must be window-only, not a dominance self-join")
  }

  test("quantile_normalize rejoins on the histogram key, never sorts raw rows globally") {
    val p = planOf("quantile_normalize")
    // the only global sorts allowed are the two bounded presentation
    // heads (TakeOrderedAndProject) — not a full-corpus Sort
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("round-7 additions keep broadcast-only products and no cartesians") {
    // media_audio / media_audio_segments are narrow kernel maps;
    // pruning_audit, rebalance_plan, sample_allocation carry 1-row or
    // |sources|-row broadcast knobs — a shuffled product would mean a
    // knob frame grew to row scale
    for (q <- Seq("media_audio", "media_audio_segments", "pruning_audit",
                  "rebalance_plan", "sample_allocation")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
      if (p.contains("BroadcastNestedLoopJoin"))
        assert(p.contains("BroadcastExchange"),
          s"$q nested-loop join without a broadcast build side")
    }
  }

  test("snapshot_diff joins versions once on the key with no cartesian") {
    val p = planOf("snapshot_diff")
    assert(!p.contains("CartesianProduct"), "snapshot_diff plan has a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the version reconciliation is ONE full-outer equi-join; a second
    // row-scale join would mean the payload leaked past the hash
    val joins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size
    assert(joins == 1, s"snapshot_diff has $joins row-scale joins, want 1")
  }

  test("retrieval_mrr heads are TakeOrdered, never a global corpus sort") {
    val p = planOf("retrieval_mrr")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "per-query heads must compile to TakeOrderedAndProject")
    // stats ride a broadcast; the only exchanges are the fence
    // repartition and the bounded-head singles
    assert(p.contains("BroadcastExchange"), "corpus stats must broadcast")
  }

  test("customer-grain ntile/rank queries never window the raw customer frame") {
    // rfm_segments / revenue_concentration / value_deciles went through
    // DistributedRank: the ONLY unpartitioned windows allowed are the
    // chunk-offset prefix sums, which order by the synthetic __rng chunk
    // id over a per-chunk AGGREGATE frame (bounded by value-domain/2^20,
    // not by |customers|). A windowspecdefinition whose FIRST argument
    // is already a sort order (contains ASC/DESC before the first comma)
    // has an empty partition spec — every such window must be a __rng one.
    for (q <- Seq("rfm_segments", "revenue_concentration", "value_deciles")) {
      val p = planOf(q)
      val specs = "windowspecdefinition\\(([^,]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(specs.nonEmpty, s"$q lost its windows entirely")
      val unpartitioned = specs.filter(a => a.contains(" ASC") || a.contains(" DESC"))
      unpartitioned.foreach { a =>
        assert(a.startsWith("__rng"),
          s"$q has an unpartitioned window over a non-chunk frame: $a")
      }
    }
  }

  test("round-8 additions: broadcast-only products, no row-scale cartesians") {
    // label_propagation / hits_scores / embedding_pca / freshness_audit
    // all carry 1-row knob frames (max, load watermark, v) as
    // broadcast cross joins; a CartesianProduct or an unbroadcast
    // nested loop would mean a knob frame grew to row scale
    for (q <- Seq("label_propagation", "hits_scores", "embedding_pca",
                  "freshness_audit", "media_neardup")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
      if (p.contains("BroadcastNestedLoopJoin"))
        assert(p.contains("BroadcastExchange"),
          s"$q nested-loop join without a broadcast build side")
    }
    // the iterative kernels must keep every row-scale window out:
    // label counts and rank sums are groupBy aggregates, not windows
    for (q <- Seq("label_propagation", "hits_scores"))
      assert(!planOf(q).contains("windowspecdefinition"),
        s"$q should aggregate, not window")
  }
}
