package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.StarEtl

class EtlSpec extends AnyFunSuite {
  import TestSpark._

  test("runBatch writes all 7 star tables with consistent counts") {
    val out = Files.createTempDirectory("graft_etl").toString
    val counts = StarEtl.runBatch(spark, sf, out)
    assert(counts.keySet == Set("access", "file", "client", "network",
      "stats_mask1", "stats_mask2", "stats_mask3"))
    // hub tables are 1:1 with input lines (1000 events at sf0.001)
    assert(counts("access") == 1000)
    assert(counts("file") == 1000)
    assert(counts("client") == 1000)
    assert(counts("network") == 1000)
    // stats satellites are 0..n per line
    assert(counts("stats_mask1") > 0 && counts("stats_mask2") > 0 &&
      counts("stats_mask3") > 0)
    // satellites join back to the hub on the natural key, losslessly
    val access = spark.read.parquet(s"$out/access")
    val file = spark.read.parquet(s"$out/file")
    assert(access.join(file, "line_id").count() == 1000)
    val s1 = spark.read.parquet(s"$out/stats_mask1")
    assert(s1.join(access, s1("event_id") === access("line_id")).count() ==
      counts("stats_mask1"))
  }

  test("star summary matches the written tables") {
    val summary = StarEtl.starSummary(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary("access") == 1000)
    assert(summary("stats_mask1") ==
      SparkEntry.queries("parse_stats")(spark, sf)
        .filter(col("stat_type") === "Stat1").count())
  }
}
