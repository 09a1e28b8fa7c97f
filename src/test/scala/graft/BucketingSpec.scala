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
}
