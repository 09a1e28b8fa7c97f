package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.parse.Style5
import graft.streaming.StreamEtl

/** Streaming parity tests (SURVEY.md §5.4): file-source incremental
  * pickup (S2/F1 semantics) and exactly-once across restarts. */
class StreamSpec extends AnyFunSuite {
  import TestSpark._

  test("ingestStream parses a rotated file once and only once") {
    val base = Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; val cp = s"$base/cp"; val out = s"$base/out"
    new java.io.File(in).mkdirs()

    // "rotate" file 1: first 300 rendered lines
    val lines = Style5.renderedLines(spark, sf).cache()
    lines.filter(col("event_id") < 300).select("line")
      .coalesce(1).write.mode("overwrite").text(s"$in/f1")
    StreamEtl.ingestStream(spark, s"$in/*", cp, out).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 300, s"expected 300 rows, got $n1")

    // "rotate" file 2: next 200 lines; restart picks up ONLY the new file
    lines.filter(col("event_id") >= 300 && col("event_id") < 500).select("line")
      .coalesce(1).write.mode("overwrite").text(s"$in/f2")
    StreamEtl.ingestStream(spark, s"$in/*", cp, out).awaitTermination()
    val n2 = spark.read.parquet(out).count()
    assert(n2 == 500, s"expected 500 rows after second rotation, got $n2")

    // parsed fields match the batch parser on the same universe
    val streamed = spark.read.parquet(out)
    val batch = SparkEntry.queries("parse_file")(spark, sf)
      .filter(col("event_id") < 500)
    assert(streamed.agg(sum("bytes_sent")).head().getLong(0) ==
           batch.agg(sum("bytes_sent")).head().getLong(0))
  }

  test("hourlyCounts is a valid streaming plan") {
    val base = Files.createTempDirectory("graft_stream2").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Style5.renderedLines(spark, sf).filter(col("event_id") < 100)
      .select("line").coalesce(1).write.mode("overwrite").text(s"$in/f1")
    val q = StreamEtl.hourlyCounts(spark, s"$in/*")
      .writeStream.format("memory").queryName("hourly_test")
      .option("checkpointLocation", s"$base/cp")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode only emits watermark-closed windows; the plan
    // running to completion (with state) is what we assert here
    assert(spark.table("hourly_test").columns.length == 4)
  }
}
