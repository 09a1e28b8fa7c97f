package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.StarEtl

/** Sink-format round trips (S7-S11 analog — the reference's only
  * sink is MySQL INSERT; the Spark rebuild targets any
  * DataFrameWriter format). Parquet is the primary sink (used by
  * StarEtl and Verify); csv/json/orc round-trip here. */
class SinksSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val file = StarEtl.wideParsed(spark, sf)
    .select("line_id", "method", "path", "name", "status_code", "bytes_sent")

  private def roundTrip(fmt: String, writeOpts: Map[String, String] = Map.empty,
                        readOpts: Map[String, String] = Map.empty): Unit = {
    val out = Files.createTempDirectory(s"graft_sink_$fmt").toString + "/t"
    file.write.options(writeOpts).format(fmt).save(out)
    val back = spark.read.options(readOpts).format(fmt).load(out)
    assert(back.count() == 1000, s"$fmt round trip lost rows")
    assert(back.agg(sum("bytes_sent").cast("long")).head().getLong(0) ==
      file.agg(sum("bytes_sent").cast("long")).head().getLong(0),
      s"$fmt round trip altered values")
  }

  test("csv sink round-trips")  {
    roundTrip("csv",
      writeOpts = Map("header" -> "true"),
      readOpts = Map("header" -> "true", "inferSchema" -> "true"))
  }
  test("json sink round-trips") { roundTrip("json") }
  test("orc sink round-trips")  { roundTrip("orc") }

  test("partitioned parquet sink prunes on the partition column") {
    val out = Files.createTempDirectory("graft_sink_part").toString + "/t"
    file.withColumn("status_class", (col("status_code") / 100).cast("int"))
      .write.partitionBy("status_class").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("status_class") === 4)
    // partition pruning: only the status_class=4 directory is read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(plan.contains("PartitionFilters: [isnotnull(status_class"),
      s"partition filter not pushed:\n${plan.take(500)}")
  }
}
