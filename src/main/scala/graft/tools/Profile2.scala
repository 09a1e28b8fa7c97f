package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.parse.Style5
import graft.streaming.StreamEtl

/** Dev tool: isolate parseLines cost components. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val lines = Style5.renderedLines(spark, dir).withColumnRenamed("line", "value")
    t("warmup")(lines.limit(10).count())
    t("render_count")(lines.agg(count(lit(1))).head())
    val shape = Style5.timestampShapeRe + "\"[^\"]*\" \\d+ \\d+ .*\\d$"
    t("render_shape_filter")(lines.filter(col("value").rlike(shape)).agg(count(lit(1))).head())
    t("render_size_filter")(lines.filter(
      size(Style5.spaceMatches(col("value"))) >= 8).agg(count(lit(1))).head())
    t("full_parseLines_sum")(StreamEtl.parseLines(lines)
      .agg(count(lit(1)), sum(col("bytes_sent"))).head())
    t("parse_no_filter")(lines.select(
      element_at(Style5.dropHead(Style5.spaceMatches(col("value"))), 2).cast("long").as("b"))
      .agg(sum(col("b"))).head())
    spark.stop()
  }
}
