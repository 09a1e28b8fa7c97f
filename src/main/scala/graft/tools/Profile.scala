package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time sub-plans of hot queries (not part of the driver
  * contract). Usage: sbt "runMain graft.tools.Profile [sfDir]". */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val lines = graft.parse.Style5.renderedLines(spark, dir)
    t("warmup")(lines.limit(10).count())
    val b = lines.withColumn("b",
      regexp_extract_all(col("line"), lit("\\[([^\\]]*)\\]"), lit(1)))
    val pre = b.withColumn("stats",
        slice(col("b"), lit(4), greatest(size(col("b")) - 3, lit(0))))
      .select(col("event_id"), col("stats"))
    t("stats_array_noop")(pre.write.format("noop").mode("overwrite").save())
    t("stats_array_to_parquet")(pre.write.mode("overwrite").parquet("/tmp/prof_stats"))
    val fromPq = spark.read.parquet("/tmp/prof_stats")
    t("explode_from_parquet")(fromPq.select(col("event_id"),
      explode(col("stats")).as("stat")).write.format("noop").mode("overwrite").save())
    t("explode_from_parquet_fields")(fromPq.select(col("event_id"),
        explode(col("stats")).as("stat"))
      .select(col("event_id"),
        regexp_extract(col("stat"), "^(Stat[1-3]):", 1).as("tag"),
        regexp_extract(col("stat"), "^Stat1:\\s+(\\d+)", 1).cast("long").as("f1"))
      .write.format("noop").mode("overwrite").save())
    // variant A: repartition barrier before explode
    val exA = b.withColumn("stats",
        slice(col("b"), lit(4), greatest(size(col("b")) - 3, lit(0))))
      .select(col("event_id"), col("stats"))
      .repartition(32)
      .select(col("event_id"), explode(col("stats")).as("stat"))
    t("explode_repartition_barrier")(exA.write.format("noop").mode("overwrite").save())
    // variant B: transform-parse into structs, then explode
    val exB = b.withColumn("stats",
        slice(col("b"), lit(4), greatest(size(col("b")) - 3, lit(0))))
      .withColumn("parsed", transform(col("stats"), st => struct(
        regexp_extract(st, "^(Stat[1-3]):", 1).as("tag"),
        regexp_extract(st, "^Stat1:\\s+(\\d+)", 1).as("f1"))))
      .select(col("event_id"), explode(col("parsed")).as("p"))
      .select(col("event_id"), col("p.tag"), col("p.f1"))
    t("explode_structs")(exB.write.format("noop").mode("overwrite").save())
    // variant C: barrier + full field extraction after explode
    val exC = b.withColumn("stats",
        slice(col("b"), lit(4), greatest(size(col("b")) - 3, lit(0))))
      .select(col("event_id"), col("stats"))
      .repartition(32)
      .select(col("event_id"), explode(col("stats")).as("stat"))
      .select(col("event_id"),
        regexp_extract(col("stat"), "^(Stat[1-3]):", 1).as("tag"),
        regexp_extract(col("stat"), "^Stat1:\\s+(\\d+)", 1).cast("long").as("f1"),
        regexp_extract(col("stat"), "^Stat2:(?:\\s+\\d+){8}\\s+(\\d+[.]?\\d*)", 1).as("f2"))
    t("explode_barrier_fields")(exC.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
