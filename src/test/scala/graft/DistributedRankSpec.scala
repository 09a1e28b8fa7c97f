package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.report.DistributedRank

/** Equivalence proof for the chunked-prefix-sum rank: on adversarial
  * synthetic frames (heavy ties, negatives, chunk-boundary values,
  * non-contiguous keys) the distributed rank must be bit-identical to
  * the single-task window it replaces — including ntile's uneven
  * bucket-size rule for every n mod k residue. */
class DistributedRankSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // values straddle chunk boundaries (±2^20) and repeat heavily so
  // both the chunk-offset path and the tie path carry real weight;
  // keys are unique but shuffled and sparse
  private lazy val frame = {
    val vals = Seq(-3000000L, -1048577L, -1048576L, -1L, 0L, 1L,
      7L, 7L, 7L, 1048575L, 1048576L, 1048577L, 5000000L)
    val rows = (0 until 500).map { i =>
      (i * 37L % 1009L * 1000L + i, vals(i % vals.length) + (i % 3) * 7L,
        s"seg${i % 4}")
    }
    spark.createDataFrame(rows).toDF("key", "v", "seg")
      .repartition(4)
  }

  test("withRank matches row_number over (v, key) — global order") {
    val expected = frame.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("key"))).cast("long"))
    val actual = DistributedRank.withRank(frame, Nil, "v", "key", "rk")
    assert(actual.select("key", "rk").except(expected.select("key", "rk"))
      .isEmpty, "distributed rank diverged from the window rank")
  }

  test("withRank matches row_number within partitions") {
    val expected = frame.withColumn("rk",
      row_number().over(Window.partitionBy(col("seg"))
        .orderBy(col("v"), col("key"))).cast("long"))
    val actual = DistributedRank.withRank(frame, Seq("seg"), "v", "key", "rk")
    assert(actual.select("seg", "key", "rk")
      .except(expected.select("seg", "key", "rk")).isEmpty)
  }

  test("withNtile matches ntile for every residue class of n mod k") {
    // 500 rows: n mod 5 = 0, n mod 7 = 3, n mod 9 = 5 — uneven buckets
    for (k <- Seq(5, 7, 9)) {
      val expected = frame.withColumn("b",
        ntile(k).over(Window.orderBy(col("v"), col("key"))).cast("long"))
      val actual = DistributedRank.withNtile(frame, Nil, "v", "key", k, "b")
      assert(actual.select("key", "b").except(expected.select("key", "b"))
        .isEmpty, s"ntile($k) diverged")
    }
  }

  test("withNtile matches segment-partitioned ntile") {
    val expected = frame.withColumn("b",
      ntile(10).over(Window.partitionBy(col("seg"))
        .orderBy(col("v"), col("key"))).cast("long"))
    val actual =
      DistributedRank.withNtile(frame, Seq("seg"), "v", "key", 10, "b")
    assert(actual.select("seg", "key", "b")
      .except(expected.select("seg", "key", "b")).isEmpty)
  }

  test("non-integral rank columns are rejected at plan-build time") {
    val bad = frame.withColumn("vd", col("v").cast("double"))
    val e = intercept[IllegalArgumentException] {
      DistributedRank.withRank(bad, Nil, "vd", "key", "rk")
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("a non-unique tie key fails loudly instead of corrupting ranks") {
    // duplicate (v, key) pairs: the in-plan count(*) vs count(distinct)
    // guard must raise, not emit equal ranks silently
    val dup = frame.unionAll(frame.limit(3))
    val e = intercept[Exception] {
      DistributedRank.withRank(dup, Nil, "v", "key", "rk")
        .agg(sum(col("rk"))).head()
    }
    assert(e.getMessage.contains("not unique") ||
      Option(e.getCause).exists(_.getMessage.contains("not unique")))
  }

  test("a null tie key fails the non-null contract loudly") {
    val withNull = frame.unionAll(
      spark.createDataFrame(Seq((null.asInstanceOf[java.lang.Long], 5L, "seg0")))
        .toDF("key", "v", "seg").selectExpr("CAST(key AS BIGINT) AS key", "v", "seg"))
    val e = intercept[Exception] {
      DistributedRank.withRank(withNull, Nil, "v", "key", "rk")
        .agg(sum(col("rk"))).head()
    }
    assert(e.getMessage.contains("non-null contract") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null contract")))
  }

  test("negated metric gives the DESC order the rfm recency path uses") {
    val expected = frame.withColumn("rk",
      row_number().over(Window.orderBy(col("v").desc, col("key"))).cast("long"))
    val actual = DistributedRank.withRank(
      frame.withColumn("nv", -col("v")), Nil, "nv", "key", "rk")
    assert(actual.select("key", "rk").except(expected.select("key", "rk"))
      .isEmpty)
  }
}
