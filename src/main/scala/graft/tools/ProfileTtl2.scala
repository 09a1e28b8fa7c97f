package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-JVM A/B of nearDupTtlBatch's ts_ms attach: join-back vs
  * carry-through-aggregate. Round-robin, 3 samples each. */
object ProfileTtl2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val DAY_MS = 86400000L
    val OFF = 20000000L
    def feed(): DataFrame = {
      val ev = graft.model.Tables.events(spark, dir)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      val base = ev.select(col("event_id").as("id"), col("ts_ms"),
        concat(lit("e"), col("event_id").cast("string")).as("text"))
      val twins = ev.filter(pmod(col("event_id"), lit(97)) === 0)
        .select((col("event_id") + OFF).as("id"),
          (col("ts_ms") + pmod(col("event_id"), lit(5)) * DAY_MS).as("ts_ms"),
          concat(lit("e"), col("event_id").cast("string")).as("text"))
      base.unionAll(twins)
    }
    // variant A: the old join-back sims frame
    def simsJoin(): DataFrame = {
      val docs = feed().select(col("id").as("doc_id"), col("text"), col("ts_ms"))
      graft.ext.Dedup.simhashOf(docs.select(col("doc_id"), col("text")))
        .join(docs.select(col("doc_id"), col("ts_ms")), Seq("doc_id"))
        .withColumn("day", expr(s"ts_ms div $DAY_MS"))
    }
    // variant B: carry
    def simsCarry(): DataFrame = {
      val docs = feed().select(col("id").as("doc_id"), col("text"), col("ts_ms"))
      graft.ext.Dedup.simhashOf(docs, carry = Seq("ts_ms"))
        .withColumn("day", expr(s"ts_ms div $DAY_MS"))
    }
    def time(name: String, f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[$name] $t%.2f s"); t
    }
    // warmup
    time("warmA", simsJoin); time("warmB", simsCarry)
    val as = (1 to 3).map(_ => time("A-join", simsJoin))
    val bs = (1 to 3).map(_ => time("B-carry", simsCarry))
    println(f"A join-back  min=${as.min}%.2f  B carry min=${bs.min}%.2f")
    spark.stop()
  }
}
