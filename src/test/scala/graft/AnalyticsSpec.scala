package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 analytics additions: brute-force cross-checks and
  * invariants the DuckDB oracle can't express (the oracle twin proves
  * cross-engine agreement; these prove the SEMANTICS against an
  * independent in-memory reimplementation on sf0.001). */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("interval_union matches a brute-force sweep-line merge") {
    val got = SparkEntry.queries("interval_union")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // independent reimplementation: collect the same deterministic
    // intervals and merge per user with a sorted sweep
    val iv = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_id") % 7 === 0)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(2) + (1 + r.getLong(1) % 4) * 1800))
    val want = iv.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      var islands = 0; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s0, e0) =>
        if (islands == 0 || s0 > curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = s0; curE = e0
        } else if (e0 > curE) curE = e0
      }
      covered += curE - curS
      u -> ((covered, islands.toLong, rows.length.toLong))
    }
    assert(got == want)
  }

  test("scd2_history: contiguous versions, one current state, last state wins") {
    val rows = SparkEntry.queries("scd2_history")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      val versions = vs.map(_.getLong(1)).sorted
      assert(versions.toSeq == (1L to versions.length).toSeq)
      assert(vs.count(_.getLong(5) == 1L) == 1)
      // adjacent versions must actually change state
      val ordered = vs.sortBy(_.getLong(1)).map(_.getString(2))
      ordered.zip(ordered.tail).foreach { case (a, b) => assert(a != b) }
    }
    // the current state equals the (ts, event_id)-last event's type
    // (read via Tables.events — the raw parquet may be TIMESTAMP_NTZ)
    val lastTypes = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, es) =>
        u -> es.maxBy(r => (r.getTimestamp(1).getTime, r.getLong(2))).getString(3)
      }
    val currents = rows.filter(_.getLong(5) == 1L)
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(currents == lastTypes)
  }

  test("rfm_segments: cells partition the customer base, codes in range") {
    val rows = SparkEntry.queries("rfm_segments")(spark, sf).collect()
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == nCust)
    rows.foreach { r =>
      val code = r.getString(0)
      assert(code.length == 3 && code.forall(c => c >= '1' && c <= '5'))
    }
  }

  test("rate_anomaly never flags without a full 24h baseline") {
    val rows = SparkEntry.queries("rate_anomaly")(spark, sf).collect()
    rows.foreach { r =>
      val trailHours = r.getLong(4); val flag = r.getLong(5)
      if (flag == 1L) assert(trailHours == 24L)
      assert(trailHours >= 0L && trailHours <= 24L)
    }
    assert(rows.nonEmpty)
  }

  test("path_mining agrees with a brute-force trigram count") {
    val got = SparkEntry.queries("path_mining")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val events = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("event_type"))
      .collect()
    val want = events
      .groupBy(r => (r.getLong(0), r.getDate(1)))
      .toSeq
      .flatMap { case (_, es) =>
        val types = es.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(3)))
          .map(_.getString(4)).toSeq
        types.sliding(3).filter(_.length == 3).map(_.mkString(">"))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (tri, n) => assert(want(tri) == n) }
    // the head really is the head
    val wantTop = want.values.max
    assert(got.head._2 == wantTop)
  }

  test("asof_forward is W-invariant and bounded by nearest coverage") {
    val a = graft.report.AsOf.asofForwardW(spark, sf, 3600L).collect()
    val b = graft.report.AsOf.asofForwardW(spark, sf, 7200L).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // forward can never match MORE events than nearest (nearest falls
    // back to the backward candidate when no forward rate exists)
    val fwd = a.map(r => r.getString(0) -> r.getLong(2)).toMap
    val near = graft.report.AsOf.asofNearestW(spark, sf, 3600L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    fwd.foreach { case (t, n) => assert(n <= near(t)) }
  }

  test("embedding_norms covers every vector exactly once") {
    val rows = SparkEntry.queries("embedding_norms")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // min <= max
      assert(r.getLong(4) >= r.getLong(3)) // sum >= max
    }
  }

  test("behavior_diversity: gini zero iff single-type user") {
    val rows = SparkEntry.queries("behavior_diversity")(spark, sf).collect()
    rows.foreach { r =>
      val nTypes = r.getLong(2); val gini = r.getLong(5)
      assert((nTypes == 1L) == (gini == 0L))
      assert(gini >= 0L && gini < 1000000L)
      assert(r.getLong(4) <= r.getLong(1)) // dominant_n <= n_events
    }
  }

  test("q21_waiting_suppliers: descending head, bounded at 20") {
    val rows = SparkEntry.queries("q21_waiting_suppliers")(spark, sf).collect()
    assert(rows.length <= 20)
    val ns = rows.map(_.getLong(1))
    ns.zip(ns.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("zorder_layout: spans bounded, totals preserved, morton interleave exact") {
    val rows = SparkEntry.queries("zorder_layout")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // z-locality: every bucket's span on each dim must be well under
    // the full key range (the whole point of the curve) — allow the
    // coarse top buckets some slack
    val maxPart = rows.map(_.getLong(3)).max
    assert(rows.count(r => r.getLong(6) <= maxPart / 2) > rows.length / 2)
    // independent morton check on one value pair
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    assert(spread(0xFFFFL) == 0x55555555L && spread(1L) == 1L)
  }

  test("multitouch_attribution conserves purchase credit") {
    val rows = SparkEntry.queries("multitouch_attribution")(spark, sf).collect()
    val nPurchases = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    // every purchase hands out ≤ 1e6 micro-credits (floor remainder
    // lost), 'none' purchases exactly 1e6 — total bounded by n·1e6
    val credits = rows.map(_.getLong(2)).sum
    assert(credits <= nPurchases * 1000000L)
    assert(credits > nPurchases * 1000000L / 2)
  }

  test("dim_stats covers all 64 dimensions with exact totals") {
    val rows = SparkEntry.queries("dim_stats")(spark, sf).collect()
    assert(rows.length == 64)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(4) <= r.getLong(5)) // min <= max
    }
  }

  test("markov_transitions rows are stochastic per from-state") {
    val rows = SparkEntry.queries("markov_transitions")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, ts) =>
      // ppm rows sum to ≤ 1e6 (floor loss < |types| ppm) and > 1e6 - 25
      val total = ts.map(_.getLong(4)).sum
      assert(total <= 1000000L && total > 1000000L - 25L)
      // counts roll up to the shared from_n
      assert(ts.map(_.getLong(2)).sum == ts.head.getLong(3))
    }
    assert(rows.nonEmpty)
  }

  test("revenue_concentration bands nest and end at 100% of revenue mass") {
    val rows = SparkEntry.queries("revenue_concentration")(spark, sf).collect()
      .sortBy(_.getLong(0))
    val cents = rows.map(_.getLong(2))
    cents.zip(cents.tail).foreach { case (a, b) => assert(a <= b) }
    val shares = rows.map(_.getLong(3))
    assert(shares.last <= 1000000L && shares.head > 0L)
    // top-1% of a skewed base must out-earn its uniform share
    assert(shares.head * 100 > 1000000L)
  }

  test("mom_growth deltas reconcile with the lagged series") {
    val rows = SparkEntry.queries("mom_growth")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) == r.getLong(4))
    }
    // consecutive months chain: this month's cents is next month's prev
    rows.sliding(2).foreach {
      case Array(a, b) =>
        if (ymNext(a.getLong(0)) == b.getLong(0))
          assert(a.getLong(2) == b.getLong(3))
      case _ =>
    }
  }

  private def ymNext(ym: Long): Long =
    if (ym % 100 == 12) (ym / 100 + 1) * 100 + 1 else ym + 1

  test("grouping_sets_revenue: three set families reconcile to one total") {
    val rows = SparkEntry.queries("grouping_sets_revenue")(spark, sf).collect()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(1L, 2L, 3L))
    val grand = byGid(3L).head.getLong(4)
    assert(byGid(1L).map(_.getLong(4)).sum == grand)
    assert(byGid(2L).map(_.getLong(4)).sum == grand)
  }

  test("active_users_rolling matches a brute-force window count") {
    val got = SparkEntry.queries("active_users_rolling")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val pud = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = pud.map(_._2)
    val (mind, maxd) = (days.min, days.max)
    var d = mind
    while (!d.isAfter(maxd)) {
      val dau = pud.count(_._2 == d).toLong
      val wau = pud.filter(p => !p._2.isAfter(d) && !p._2.isBefore(d.minusDays(6)))
        .map(_._1).distinct.length.toLong
      val mau = pud.filter(p => !p._2.isAfter(d) && !p._2.isBefore(d.minusDays(27)))
        .map(_._1).distinct.length.toLong
      assert(got(d) == ((dau, wau, mau)), s"day $d")
      d = d.plusDays(1)
    }
    assert(got.size == java.time.temporal.ChronoUnit.DAYS.between(mind, maxd) + 1)
  }

  test("label_separability pair algebra is exact against brute force") {
    val rows = SparkEntry.queries("label_separability")(spark, sf).collect()
    val intra = rows.filter(_.getString(2) == "intra")
    val inter = rows.filter(_.getString(2) == "inter")
    assert(intra.nonEmpty && inter.nonEmpty)
    // doubled pair counts are the exact combinatorics
    val ns = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy(col("label")).count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    intra.foreach(r => assert(r.getLong(3) == ns(r.getLong(0)) * (ns(r.getLong(0)) - 1)))
    inter.foreach(r => assert(r.getLong(3) == 2 * ns(r.getLong(0)) * ns(r.getLong(1))))
    // the pair algebra matches a brute-force pair sum on one label
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("label") === 0).collect()
      .map(_.getSeq[Float](1).toArray.map(x => math.floor(x * 1000 + 0.5).toLong))
    val brute = (for {
      i <- e.indices; j <- e.indices if i != j
    } yield e(i).zip(e(j)).map { case (a, b) => a * b }.sum).sum
    val row0 = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 0L).get
    assert(row0.getLong(4) == brute)
  }

  test("new_vs_returning reconciles with reach_curve day by day") {
    val nvr = SparkEntry.queries("new_vs_returning")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(2)).toMap
    val rc = SparkEntry.queries("reach_curve")(spark, sf).collect()
    rc.foreach { r =>
      assert(nvr(r.getDate(0).toLocalDate) == r.getLong(1))
    }
  }

  test("kfold_assign folds partition each source and balance near ideal") {
    val rows = SparkEntry.queries("kfold_assign")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (src, fs) =>
      assert(fs.map(_.getLong(2)).sum == docs(src))
      assert(fs.map(_.getLong(1)).distinct.length == fs.length)
    }
  }

  test("reach_curve is monotone and ends at the total user count") {
    val rows = SparkEntry.queries("reach_curve")(spark, sf).collect()
    val cums = rows.map(_.getLong(2))
    cums.zip(cums.tail).foreach { case (a, b) => assert(a < b || a == b - 0) }
    val total = spark.read.parquet(s"$sf/events.parquet")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(cums.last == total)
    assert(rows.map(_.getLong(1)).sum == total)
  }

  private def phashJvm(s0: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s0.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("skyline_parts equals the brute-force O(n^2) dominance sweep") {
    val got = SparkEntry.queries("skyline_parts")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .collect()
      .map(r => (r.getAs[String]("p_type"), r.getAs[Long]("p_partkey"),
        math.floor(r.getAs[Double]("p_retailprice") * 100 + 0.5).toLong,
        r.getAs[Int]("p_size").toLong))
    val want = parts.filter { case (t, k, price, size) =>
      !parts.exists { case (t2, k2, p2, s2) =>
        t2 == t && k2 != k && p2 <= price && s2 >= size &&
          (p2 < price || s2 > size)
      }
    }.map { case (t, k, p0, sz) => (t, k, p0, sz) }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("priority_sample: top-k by recomputed priorities, tau from k+1, ht >= w") {
    val rows = SparkEntry.queries("priority_sample")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, w) =>
      val u = phashJvm("pri_" + id.toString) % 1000000L + 1L
      (id, w, w * 1000000L / u)
    }.sortBy { case (id, _, pri) => (-pri, id) }
    val want = keyed.take(100)
    assert(rows.length == math.min(100, docs.length))
    rows.zip(want).foreach { case (r, (id, w, pri)) =>
      assert(r.getLong(1) == id && r.getLong(2) == w && r.getLong(3) == pri)
    }
    val tau = if (keyed.length > 100) keyed(100)._3 else 0L
    rows.foreach { r =>
      assert(r.getLong(4) == math.max(r.getLong(2), tau)) // ht_weight
      assert(r.getLong(4) >= r.getLong(2))
    }
  }

  test("pit_features: strictly-prior frame never counts the label row or later") {
    val rows = SparkEntry.queries("pit_features")(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("s"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    assert(rows.length == ev.count(_._4 == "purchase"))
    rows.foreach { r =>
      val (eid, uid) = (r.getLong(0), r.getLong(1))
      val all = byUser(uid).sortBy(t => (t._3, t._2))
      val idx = all.indexWhere(_._2 == eid)
      val prior = all.take(idx)
      assert(r.getLong(5) == prior.length.toLong)               // n_prior_events
      assert(r.getLong(6) == prior.count(_._4 == "view").toLong)
      assert(r.getLong(7) == prior.count(_._4 == "click").toLong)
      if (prior.isEmpty) {
        assert(r.getString(3) == "none" && r.getLong(4) == -1L)
      } else {
        assert(r.getString(3) == prior.last._4)
        assert(r.getLong(4) == all(idx)._3 - prior.last._3)
      }
    }
  }

  test("link_prediction equals brute-force common-neighbor scoring") {
    val got = SparkEntry.queries("link_prediction")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val m = ids.size.toLong
    val und = ids.flatMap(i => Seq(13L, 26L, 39L).map(k => (i, (i * 7 + k) % m)))
      .filter { case (a, b) => ids(b) && a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val nbrs = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val cands = (for {
      (u, nu) <- nbrs.toSeq; (v, nv) <- nbrs.toSeq
      if u < v && !und((u, v))
      cn = (nu & nv).size.toLong
      if cn > 0
    } yield (u, v, cn, nu.size.toLong, nv.size.toLong,
      cn * 1000000L / (nu.size + nv.size - cn)))
      .sortBy { case (u, v, cn, _, _, _) => (-cn, u, v) }
    assert(got.toSeq == cands.take(20))
  }

  test("overdispersion: zero-filled daily Fano factor matches brute force") {
    val got = SparkEntry.queries("overdispersion")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L).cast("long")
          .as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val days = ev.map(_._2).distinct
    val d = days.length.toLong
    ev.map(_._1).distinct.foreach { t =>
      val counts = ev.filter(_._1 == t).groupBy(_._2).map(_._2.length.toLong)
      val xs = days.map(day =>
        ev.count(e => e._1 == t && e._2 == day).toLong)
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val varNum = d * sxx - sx * sx
      val (nDays, total, meanMilli, vn, fano) = got(t)
      assert(nDays == d && total == sx)
      assert(meanMilli == sx * 1000 / d)
      assert(vn == varNum)
      assert(fano == varNum * 1000000L / (d * sx))
      assert(counts.sum == sx)
    }
  }

  test("ab_test_lift: exact rational z-squared vs BigInt recompute") {
    val r = SparkEntry.queries("ab_test_lift")(spark, sf).head()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val byU = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      (phashJvm("ab_" + u.toString) % 2, rows.exists(_._2 == "purchase"))
    }
    val nA = byU.count(_._1 == 0L).toLong
    val cA = byU.count(t => t._1 == 0L && t._2).toLong
    val nB = byU.count(_._1 == 1L).toLong
    val cB = byU.count(t => t._1 == 1L && t._2).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nA, cA, nB, cB)))
    assert(r.getLong(4) == cA * 1000000L / nA)
    assert(r.getLong(5) == cB * 1000000L / nB)
    val denom = BigInt(nA) * nB * (cA + cB) * (nA + nB - cA - cB)
    if (denom == 0) {
      // degenerate experiment (all or none converted): z2 must be NULL,
      // never a division error or a fabricated number
      assert(r.isNullAt(7))
    } else {
      val num = (BigInt(cA) * nB - BigInt(cB) * nA)
      assert(BigInt(r.getLong(7)) == num * num * (nA + nB) * 1000 / denom)
    }
  }

  test("source_assortativity: edge masses reconcile and Q terms are exact") {
    val rows = SparkEntry.queries("source_assortativity")(spark, sf).collect()
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = ids.size.toLong
    val und = ids.keySet
      .flatMap(i => Seq(13L, 26L, 39L).map(k => (i, (i * 7 + k) % m)))
      .filter { case (a, b) => ids.contains(b) && a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val mEdges = und.size.toLong
    // invariants: sum(d_c) = 2m, sum(e_c) = m (every edge lands in
    // exactly one intra bucket or none), and each row's ppm columns
    // are the floor-divs of the recomputed masses
    assert(rows.map(_.getLong(1)).sum == 2 * mEdges)
    val eIntra = und.count { case (a, b) => ids(a) == ids(b) }.toLong
    assert(rows.map(_.getLong(2)).sum == eIntra)
    rows.foreach { r =>
      val (dc, ec) = (r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == ec * 1000000L / mEdges)
      assert(r.getLong(4) == dc * dc * 1000000L / (4 * mEdges * mEdges))
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
    }
  }

  test("mann_whitney: U_A + U_B = n_A*n_B and matches brute-force ranks") {
    val r = SparkEntry.queries("mann_whitney")(spark, sf).head()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .map(x => (phashJvm("ab_" + x.getLong(0).toString) % 2,
        math.floor(x.getDouble(1) * 100 + 0.5).toLong))
    val (nA, nB) = (ev.count(_._1 == 0L).toLong, ev.count(_._1 == 1L).toLong)
    assert(r.getLong(0) == nA && r.getLong(1) == nB)
    assert(r.getLong(2) + r.getLong(3) == 2 * nA * nB)
    // brute force: doubled rank sum of arm A over the pooled sample
    val sorted = ev.map(_._2).sorted
    def midrank2(v: Long): Long = {
      val lo = sorted.indexWhere(_ == v); val hi = sorted.lastIndexWhere(_ == v)
      // 2 * average of 1-based ranks lo+1 .. hi+1
      (lo + 1 + hi + 1).toLong
    }
    val rA2 = ev.filter(_._1 == 0L).map(t => midrank2(t._2)).sum
    assert(r.getLong(2) == rA2 - nA * (nA + 1))
    assert(r.getLong(4) == (rA2 - nA * (nA + 1)) * 1000000L / (2 * nA * nB))
  }

  test("bootstrap_ci: ordered CI brackets the point estimate plausibly") {
    val r = SparkEntry.queries("bootstrap_ci")(spark, sf).head()
    val vals = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("value").collect()
      .map(x => math.floor(x.getDouble(0) * 100 + 0.5).toLong)
    assert(r.getLong(0) == vals.length.toLong)
    assert(r.getLong(1) == vals.sum * 1000 / vals.length)
    assert(r.getLong(2) == 32L)
    val (lo, hi) = (r.getLong(3), r.getLong(4))
    assert(lo <= hi)
    // resample means must stay inside the sample's own value range
    assert(lo >= vals.min * 1000 && hi <= vals.max * 1000)
  }

  test("changepoint_daily equals the brute-force best split per type") {
    val got = SparkEntry.queries("changepoint_daily")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val days = ev.map(_._2).distinct.sorted
    ev.map(_._1).distinct.foreach { t =>
      val xs = days.map(d => ev.count(e => e._1 == t && e._2 == d).toLong)
      val n = xs.length.toLong; val sTot = xs.sum
      val best = (1 until xs.length).map { k =>
        val n1 = k.toLong; val s1 = xs.take(k).sum
        val num = (BigInt(s1) * s1 * (n - n1) +
          BigInt(sTot - s1) * (sTot - s1) * n1) * n -
          BigInt(sTot) * sTot * n1 * (n - n1)
        val gain = (num * 1000 / (BigInt(n1) * (n - n1) * n)).toLong
        (gain, days(k - 1), n1)
      }.maxBy { case (g, d, _) => (g, -d) }
      val (splitDay, nDays, nLeft, gain) = got(t)
      assert(nDays == n)
      assert((gain, splitDay, nLeft) == ((best._1, best._2, best._3)))
    }
  }

  test("kaplan_meier: risk sets telescope and survival matches brute force") {
    val rows = SparkEntry.queries("kaplan_meier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byU = ev.groupBy(_._1).toSeq.map { case (u, ds) =>
      val days = ds.map(_._2)
      (phashJvm("ab_" + u.toString) % 2, days.min, days.max)
    }
    val m = byU.map(_._3).max
    byU.map(_._1).distinct.foreach { arm =>
      val subj = byU.filter(_._1 == arm)
        .map { case (_, f, l) => (l - f, if (l <= m - 8) 1L else 0L) }
      val grid = subj.map(_._1).distinct.sorted
      var rem = subj.length.toLong
      var s0 = 1000000L
      grid.foreach { t =>
        val d = subj.count(x => x._1 == t && x._2 == 1L).toLong
        val c = subj.count(x => x._1 == t && x._2 == 0L).toLong
        s0 = s0 * (rem - d) / rem
        val row = rows.find(r => r._1 == arm && r._2 == t).get
        assert(row._3 == rem && row._4 == d && row._5 == c && row._6 == s0)
        rem -= d + c
      }
      assert(rem == 0L)
    }
  }

  test("term_burstiness: cf >= df, ratios exact, head really is the cf head") {
    val rows = SparkEntry.queries("term_burstiness")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.foreach { r =>
      val (df, cf) = (r.getLong(1), r.getLong(2))
      assert(cf >= df && df >= 1)
      assert(r.getLong(3) == cf * 1000 / df)
      assert(r.getLong(3) >= 1000L)
      assert(r.getLong(4) == df * 1000000 / nDocs)
    }
    val cfs = rows.map(_.getLong(2))
    cfs.zip(cfs.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("quantile_normalize: midrank ppm matches brute force per source") {
    val rows = SparkEntry.queries("quantile_normalize")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    rows.foreach { r =>
      val (src, len, ppm) = (r.getString(1), r.getLong(2), r.getLong(3))
      val lens = bySource(src).map(_._3)
      val below = lens.count(_ < len).toLong
      val at = lens.count(_ == len).toLong
      assert(ppm == (2 * below + at) * 500000L / lens.length)
      assert(ppm > 0L && ppm <= 1000000L)
    }
    assert(rows.length == math.min(80, docs.length))
  }

  test("theil_sen_trend equals the brute-force pairwise-slope median") {
    val got = SparkEntry.queries("theil_sen_trend")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val OFF = 1000000000000000L
    ev.map(_._1).distinct.foreach { t =>
      val daily = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, rows) => (d, rows.map(_._3).sum) }.sortBy(_._1)
      val slopes = for {
        i <- daily.indices; j <- daily.indices if i < j
      } yield {
        val (d1, x1) = daily(i); val (d2, x2) = daily(j)
        (((x2 - x1) * 1000000L + OFF * (d2 - d1)) / (d2 - d1) - OFF, d1, d2)
      }
      val sorted = slopes.sortBy { case (sl, d1, d2) => (sl, d1, d2) }
      val median = sorted((sorted.length + 1) / 2 - 1)._1
      val (nPairs, slope) = got(t)
      assert(nPairs == slopes.length.toLong)
      assert(slope == median)
    }
  }

  test("session_entry_conversion reconciles with sessionize totals") {
    val rows = SparkEntry.queries("session_entry_conversion")(spark, sf)
      .collect()
    val sess = SparkEntry.queries("sessionize")(spark, sf).collect()
    // every session counted exactly once across entry types, and every
    // event lands in exactly one session
    assert(rows.map(_.getLong(1)).sum == sess.map(_.getLong(1)).sum)
    assert(rows.map(_.getLong(3)).sum == sess.map(_.getLong(2)).sum)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // converted <= sessions
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("l_diversity: masses reconcile with k_anonymity and brute force") {
    val rows = SparkEntry.queries("l_diversity")(spark, sf).collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment", "c_nationkey", "c_acctbal").collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        if (r.getDouble(2) < 0) "debt"
        else if (r.getDouble(2) < 5000) "mid" else "high"))
    val byClass = cust.groupBy(_._1).toSeq
      .map { case (_, ms) => (ms.map(_._2).distinct.length.toLong, ms.length.toLong) }
    assert(rows.map(_.getLong(2)).sum == cust.length.toLong)
    rows.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) == byClass.count(_._1 == l).toLong)
      assert(r.getLong(2) == byClass.filter(_._1 == l).map(_._2).sum)
      assert(r.getLong(3) == (if (l < 3) 1L else 0L))
    }
  }

  test("deseasonalized_trend: residual moments match brute force") {
    val got = SparkEntry.queries("deseasonalized_trend")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    ev.map(_._1).distinct.foreach { t =>
      val daily = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, rs) => (d, rs.map(_._3).sum) }.sortBy(_._1)
      val wdMean = daily.groupBy(_._1 % 7).map { case (w, ds) =>
        w -> ds.map(_._2).sum * 1000L / ds.length
      }
      val d0 = daily.map(_._1).min
      val pts = daily.map { case (d, x) => (d - d0, x * 1000L - wdMean(d % 7)) }
      val n = pts.length.toLong
      val (sd, sr) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sdr = pts.map(p => p._1 * p._2).sum
      val sdd = pts.map(p => p._1 * p._1).sum
      val (nD, num, den, q) = got(t)
      assert(nD == n && num == n * sdr - sd * sr && den == n * sdd - sd * sd)
      assert(q == num * 1000 / den) // JVM / truncates toward zero too
    }
  }

  test("seasonal_strength: variance numerators and reduced ratio match brute force") {
    val got = SparkEntry.queries("seasonal_strength")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    ev.map(_._1).distinct.foreach { t =>
      val daily = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, rs) => (d, rs.map(_._3).sum / 100) }.sortBy(_._1)
      val wdMean = daily.groupBy(_._1 % 7).map { case (w, ds) =>
        w -> ds.map(_._2).sum / ds.length
      }
      val n = daily.length.toLong
      val xs = daily.map(_._2)
      val rs = daily.map { case (d, x) => x - wdMean(d % 7) }
      val vo = n * xs.map(x => x * x).sum - xs.sum * xs.sum
      val vr = n * rs.map(r => r * r).sum - rs.sum * rs.sum
      val (nD, gotVo, gotVr, strength) = got(t)
      assert(nD == n && gotVo == vo && gotVr == vr)
      val sc = math.max(1L, vo / 1000000000L)
      val want = math.max(0L,
        if (vo / sc == 0) 0L else (vo / sc - vr / sc) * 1000000L / (vo / sc))
      assert(strength == want)
      assert(strength >= 0L && strength <= 1000000L)
    }
  }

  test("supplier_hhi: bounded by [1/n, 1] and matches brute force") {
    val rows = SparkEntry.queries("supplier_hhi")(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * (1 - r.getDouble(2)) * 100 + 0.5).toLong))
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val bySupp = li.groupBy(_._1).map { case (k, rs) =>
      (k, rs.map(_._2).sum / 100)
    }
    val byNation = bySupp.toSeq.groupBy { case (k, _) => sup(k) }
    rows.foreach { row =>
      val nk = nat.find(_._2 == row.getString(0)).get._1
      val revs = byNation(nk).map(_._2)
      val total = revs.sum
      val sc = math.max(1L, total / 1000000L)
      val want = revs.map(r => (r / sc) * (r / sc)).sum * 1000000L /
        ((total / sc) * (total / sc))
      assert(row.getLong(1) == revs.length.toLong)
      assert(row.getLong(2) == total)
      assert(row.getLong(3) == want)
      // HHI in [1/n, ~1+rounding]
      assert(row.getLong(3) >= 1000000L / revs.length - 1)
      assert(row.getLong(3) <= 1000000L + 10000L)
    }
  }

  test("autocorr_daily: moments match brute force, acf bounded by |1000|") {
    val rows = SparkEntry.queries("autocorr_daily")(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    rows.foreach { row =>
      val (t, k) = (row.getString(0), row.getLong(1))
      val daily = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, rs) => (d, rs.map(_._3).sum / 100) }.toMap
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d + k).map(y => (x, y))
      }
      val n = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      assert(row.getLong(2) == n)
      assert(row.getLong(3) == n * sxy - sx * sy)
      assert(math.abs(row.getLong(4)) <= 1000L)
    }
    assert(rows.length == ev.map(_._1).distinct.length * 2)
  }

  test("cuped_lift: theta and adjusted lift match a BigInt recompute") {
    val r = SparkEntry.queries("cuped_lift")(spark, sf).head()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
          .cast("long").as("day"), col("event_type")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val m = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    val users = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
      (phashJvm("ab_" + u.toString) % 2,
        rs.count(_._2 < m).toLong,
        rs.count(t => t._2 >= m && t._3 == "purchase").toLong)
    }.filter(_._2 > 0)
    val n = users.length.toLong
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val a = users.filter(_._1 == 0L); val b = users.filter(_._1 == 1L)
    val (nA, nB) = (a.length.toLong, b.length.toLong)
    assert((r.getLong(0), r.getLong(1)) == ((nA, nB)))
    val thNum = n * sxy - sx * sy; val thDen = n * sxx - sx * sx
    assert((r.getLong(2), r.getLong(3)) == ((thNum, thDen)))
    val (sxA, syA) = (a.map(_._2).sum, a.map(_._3).sum)
    val (sxB, syB) = (b.map(_._2).sum, b.map(_._3).sum)
    assert(r.getLong(4) == (syA * nB - syB * nA) * 1000 / (nA * nB))
    val num = (BigInt(syA) * nB - BigInt(syB) * nA) * thDen -
      BigInt(thNum) * (BigInt(sxA) * nB - BigInt(sxB) * nA)
    assert(BigInt(r.getLong(5)) == num * 1000 / (BigInt(nA) * nB * thDen))
  }

  test("srm_daily: chi-square matches brute force over distinct users") {
    val rows = SparkEntry.queries("srm_daily")(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(to_date(col("ts").cast("timestamp")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toString, phashJvm("ab_" + r.getLong(1)) % 2))
    rows.foreach { r =>
      val d = r.getDate(0).toString
      val nA = ev.count(e => e._1 == d && e._2 == 0L).toLong
      val nB = ev.count(e => e._1 == d && e._2 == 1L).toLong
      assert(r.getLong(1) == nA && r.getLong(2) == nB)
      val chi = (nA - nB) * (nA - nB) * 1000 / (nA + nB)
      assert(r.getLong(3) == chi)
      assert(r.getLong(4) == (if (chi > 3841) 1L else 0L))
    }
  }

  test("burn_rate_alerts: page implies both windows over budget") {
    val rows = SparkEntry.queries("burn_rate_alerts")(spark, sf).collect()
    rows.foreach { r =>
      val (page, b1, b24) = (r.getLong(5), r.getLong(3), r.getLong(4))
      if (page == 1L) {
        // 1100 milli = 1.1x; the flag uses exact cross-multiplication,
        // the milli columns floor — page implies both floors >= 1100
        assert(b1 >= 1100L && b24 >= 1100L)
      }
      assert(b1 >= 0L && b24 >= 0L)
    }
    // the trailing window really telescopes: first row's 24h == its own hour
    val first = rows.head
    assert(first.getLong(3) == first.getLong(4))
  }

  test("quantile_treatment_effect: deciles match sorted-array selection") {
    val r = SparkEntry.queries("quantile_treatment_effect")(spark, sf).head()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .map(x => (phashJvm("ab_" + x.getLong(0)) % 2,
        math.floor(x.getDouble(1) * 100 + 0.5).toLong))
    def decile(arm: Long, d: Int): Long = {
      val vs = ev.filter(_._1 == arm).map(_._2).sorted
      // smallest value whose cumulative count covers d/10 of the mass
      vs(((vs.length * d + 9) / 10) - 1)
    }
    (1 to 9).foreach { d =>
      val base = (d - 1) * 3
      assert(r.getLong(base) == decile(0L, d), s"a_q${d}0")
      assert(r.getLong(base + 1) == decile(1L, d), s"b_q${d}0")
      assert(r.getLong(base + 2) == r.getLong(base) - r.getLong(base + 1))
    }
    // deciles are monotone within each arm
    (1 to 8).foreach { d =>
      assert(r.getLong((d - 1) * 3) <= r.getLong(d * 3))
    }
  }

  test("discount_elasticity: bands partition lineitem, means exact") {
    val rows = SparkEntry.queries("discount_elasticity")(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_discount", "l_quantity", "l_extendedprice").collect()
      .map(r => (math.floor(r.getDouble(0) * 100 + 0.5).toLong,
        r.getDouble(1).toLong,
        math.floor(r.getDouble(2) * (1 - r.getDouble(0)) * 100 + 0.5).toLong))
    assert(rows.map(_.getLong(1)).sum == li.length.toLong)
    rows.foreach { r =>
      val band = li.filter(_._1 == r.getLong(0))
      assert(r.getLong(1) == band.length.toLong)
      assert(r.getLong(2) == band.map(_._2).sum * 1000 / band.length)
      assert(r.getLong(3) == band.map(_._3).sum)
      assert(r.getLong(4) == band.map(_._3).sum / band.length)
    }
  }
  test("rebalance_plan: HRW movement targets only the new shards and beats mod") {
    val r = SparkEntry.queries("rebalance_plan")(spark, sf).head()
    val n = r.getAs[Long]("n_rows")
    val modMoved = r.getAs[Long]("mod_moved"); val hrwMoved = r.getAs[Long]("hrw_moved")
    assert(n > 0 && hrwMoved < modMoved,
      s"rendezvous must move fewer rows than mod ($hrwMoved vs $modMoved)")
    // HRW theory: a row moves iff its 16-shard argmax is one of the 4
    // NEW shards -> expected moved fraction ~4/16; allow wide slack
    val frac = hrwMoved.toDouble / n
    assert(frac > 0.15 && frac < 0.35, s"HRW moved fraction off theory: $frac")
    assert(r.getAs[Long]("hrw_max_load") >= r.getAs[Long]("hrw_min_load"))
    // independent brute-force twin on a sample of keys: shard 2p takes
    // md5 hex chars 1-15, shard 2p+1 chars 17-31 (the low/high split)
    val keys = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").limit(200).collect().map(_.getLong(0)).distinct
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shardHash(k: Long, sh: Int): Long = {
      val hex = md5hex(s"$k#${sh / 2}")
      java.lang.Long.parseLong(
        if (sh % 2 == 0) hex.substring(0, 15) else hex.substring(16, 31), 16)
    }
    var moversSeen = 0
    keys.foreach { k =>
      def arg(nSh: Int) = (0 until nSh).maxBy(sh => (shardHash(k, sh), sh.toLong))
      if (arg(12) != arg(16)) {
        moversSeen += 1
        // every mover's destination must be a NEW shard (12..15)
        assert(arg(16) >= 12, s"mover landed on an old shard for key $k")
      }
    }
    assert(moversSeen >= 0) // sample sanity (the hash twin ran)
  }

  test("sample_allocation: allocations exhaust the budget within floor loss") {
    val rows = SparkEntry.queries("sample_allocation")(spark, sf).collect()
    val k = rows.length
    val ney = rows.map(_.getAs[Long]("neyman_n")).sum
    val prop = rows.map(_.getAs[Long]("proportional_n")).sum
    assert(ney <= 10000 && ney >= 10000 - k, s"neyman sum $ney out of floor band")
    assert(prop <= 10000 && prop >= 10000 - k, s"proportional sum $prop out of floor band")
    // a source with zero spread must get zero Neyman budget share only
    // if its sd is zero; all sds here are nonnegative
    rows.foreach(r => assert(r.getAs[Long]("sd_milli") >= 0))
  }
}
