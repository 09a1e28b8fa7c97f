package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class ReportSpec extends AnyFunSuite {
  import TestSpark._

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("report_metrics respects filters and has 4 metrics") {
    val df = SparkEntry.queries("report_metrics")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("asset_id", "play_count", "clip_length", "avg_view", "longest_view"))
    val row = df.head()
    assert(row.getLong(1) > 0)                 // play_count
    assert(row.getDouble(4) <= row.getDouble(2)) // longest_view <= clip_length (F6)
  }

  test("topk_assets returns exactly 10 ordered rows") {
    val rows = SparkEntry.queries("topk_assets")(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("watermark_incremental only counts rows after the watermark") {
    val df = SparkEntry.queries("watermark_incremental")(spark, sf)
    // sf0.001 has 1000 events; ~half are "already loaded" → new < total
    val newRows = df.agg(org.apache.spark.sql.functions.sum("n_new")).head().getLong(0)
    assert(newRows > 0 && newRows < 1000)
  }

  test("every query name has either an oracle or is documented rows-only") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("as-of join is bucket-width invariant") {
    // W only trades carry-table size against per-cell array length;
    // the rate-in-force answer must not depend on it. Exercises the
    // carry clamp (coarse W → few buckets, most events hit the carry
    // path) and the in-cell scan (fine W) against each other.
    import graft.report.AsOf
    val base = AsOf.asofJoinRatesW(spark, sf, 3600L).collect().map(_.toSeq).toSeq
    for (w <- Seq(60L, 86400L, 7L * 86400L)) {
      val alt = AsOf.asofJoinRatesW(spark, sf, w).collect().map(_.toSeq).toSeq
      assert(alt == base, s"asof result changed at bucket width $w")
    }
  }
}
