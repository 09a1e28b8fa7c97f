package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing — the 100 TB technique for the
  * recurring `file ⋈ access` (lineitem ⋈ orders) join: bucket both
  * tables on the join key at write time and the per-query shuffle
  * disappears (SURVEY.md §7.1 "bucketing for co-located joins"). */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact tables join without a shuffle exchange") {
    // warehouse dir is a temp dir configured in TestSpark (static conf)
    graft.model.Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    graft.model.Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read co-located buckets: no shuffle
      // between the scans and the SortMergeJoin
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val shufflesBeforeAgg = "Exchange hashpartitioning\\((l|o)_orderkey".r
        .findAllIn(plan).length
      assert(shufflesBeforeAgg == 0,
        s"join key shuffle present despite bucketing:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("directory-partitioned writes prune partitions at the scan") {
    // the other write-layout lever: partitionBy at write time means a
    // type-filtered read opens ONLY that type's directory — at 100 TB
    // the difference between scanning one partition and the corpus
    val base = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.model.Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    val q = spark.read.parquet(base)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)).as("n"))
    val n = q.head().getLong(0)
    val expected = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(n == expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"event_type filter did not become a partition filter:\n$plan")
    // pruning must happen at the FILE level, not as a row filter: the
    // executed scan (unwrapped from AQE) reads strictly fewer files
    // than the directory holds
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = finalPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val allFiles = spark.read.parquet(base).inputFiles.length
    assert(allFiles >= 2, "partitioned write produced a single file — test is vacuous")
    assert(scan.metrics("numFiles").value < allFiles,
      s"scan read all $allFiles files — no pruning")
  }
}
