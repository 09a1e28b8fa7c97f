package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.report.Intervals

/** The fold-based series operators (cusum_drift, ewma_smooth,
  * kaplan_meier) are exact because their per-group collect_list
  * arrays are calendar-bounded — an IMPLICIT property of the grouping
  * key. These tests prove the in-plan raise_error contract fires
  * loudly on a synthetic over-long series (a key-cardinality bug
  * would otherwise OOM one task silently at scale), using the real
  * SERIES_CAP, not a test-sized one. */
class SeriesContractSpec extends AnyFunSuite {
  import TestSpark._

  private val over = Intervals.SERIES_CAP + 1

  private def messageChain(t: Throwable): String = {
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }

  private def assertRaises(body: => Unit, op: String): Unit = {
    val e = intercept[Throwable](body)
    val msg = messageChain(e)
    assert(msg.contains("calendar-bound contract violated") && msg.contains(op),
      s"expected the $op series contract to fire, got: ${msg.take(300)}")
  }

  test("cusumDrift fails loudly past the calendar bound") {
    val events = spark.range(over).select(
      lit("drifted").as("event_type"),
      timestamp_seconds(col("id") * 86400L).as("ts"))
    assertRaises(Intervals.cusumDriftOf(events).collect(), "cusumDrift")
  }

  test("ewmaSmooth fails loudly past the calendar bound") {
    val events = spark.range(over).select(
      lit("drifted").as("event_type"),
      timestamp_seconds(col("id") * 86400L).as("ts"),
      lit(1.5).as("value"))
    assertRaises(Intervals.ewmaSmoothOf(events).collect(), "ewmaSmooth")
  }

  test("kaplanMeier fails loudly past the calendar bound") {
    // one user per duration 0..~2·cap: the arm hash splits users
    // roughly in half, so each arm still sees > cap DISTINCT durations
    val events = spark.range(2L * over + 64L).select(
      col("id").as("user_id"),
      explode(array(lit(0L), col("id"))).as("day"))
      .select(col("user_id"), timestamp_seconds(col("day") * 86400L).as("ts"))
    assertRaises(Intervals.kaplanMeierOf(events).collect(), "kaplanMeier")
  }

  test("the guarded operators stay green on calendar-bounded data") {
    for (q <- Seq("cusum_drift", "ewma_smooth", "kaplan_meier")) {
      assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q returned no rows")
    }
  }
}
