package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for dedup_groups: where do its ~5s go at
  * sf0.1 — LSH pair generation, the propagation loop, or the final
  * keeper join? */
object ProfileG {
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
    t("warmup")(spark.range(10).count())
    val docs = graft.ext.Dedup.corpus2(spark, dir)
    t("docs_count")(println(s"  docs=${docs.count()}"))
    t("docs_count_2nd")(println(s"  docs=${docs.count()}"))
    // the PRODUCTION signature pipeline — no hand-inlined stage copies
    // that could drift from signaturesOf
    t("signatures_noop")(graft.ext.Dedup.signaturesOf(docs)
      .write.format("noop").mode("overwrite").save())
    t("signatures_noop_2nd")(graft.ext.Dedup.signaturesOf(docs)
      .write.format("noop").mode("overwrite").save())
    t("pairs_checkpoint") {
      val pairs = graft.ext.Dedup.lshPairsOf(graft.ext.Dedup.signaturesOf(docs))
        .select(col("id1"), col("id2")).localCheckpoint()
      println(s"  pairs=${pairs.count()}")
    }
    t("full_query")(graft.ext.Dedup.dedupGroups(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("full_query_2nd")(graft.ext.Dedup.dedupGroups(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
