package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of nearDupTtlBatch (not part of
  * the driver contract). Usage: scripts/run_main.sh graft.tools.ProfileTtl [sfDir] */
object ProfileTtl {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.model.Tables.events(spark, dir).limit(10).count()

    val DAY_MS = 86400000L
    val TTL_TWIN_OFF = 20000000L
    val ev = graft.model.Tables.events(spark, dir)
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"))
    val base = ev.select(col("event_id").as("id"), col("ts_ms"),
      concat(lit("e"), col("event_id").cast("string")).as("text"))
    val twins = ev.filter(pmod(col("event_id"), lit(97)) === 0)
      .select((col("event_id") + TTL_TWIN_OFF).as("id"),
        (col("ts_ms") + pmod(col("event_id"), lit(5)) * DAY_MS).as("ts_ms"),
        concat(lit("e"), col("event_id").cast("string")).as("text"))
    val feed = base.unionAll(twins)
    val docs = feed.select(col("id").as("doc_id"), col("text"), col("ts_ms"))
    t("1_feed")(feed)
    val sims0 = graft.ext.Dedup.simhashOf(docs.select(col("doc_id"), col("text")))
    t("2_simhash")(sims0)
    val sims = sims0
      .join(docs.select(col("doc_id"), col("ts_ms")), Seq("doc_id"))
      .withColumn("day", expr(s"ts_ms div $DAY_MS"))
    t("3_sims_joined")(sims)
    val bandRows = sims.select(col("doc_id"), col("simhash"), col("ts_ms"), col("day"),
        explode_outer(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("bv"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bv").as("bv"),
        col("doc_id"), col("simhash"), col("ts_ms"), col("day"))
    t("4_bandRows")(bandRows)
    val grouped = bandRows.groupBy(col("band"), col("bv"), col("day"))
      .agg(max(col("ts_ms")).as("dmax"))
    t("5_sess_grouped")(grouped)
    (1 to 2).foreach { i =>
      t(s"full_query_$i")(graft.SparkEntry.queries("near_dup_ttl_batch")(spark, dir))
    }
    spark.stop()
  }
}
