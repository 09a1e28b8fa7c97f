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
    import graft.ext.Dedup
    val sh = docs.withColumn("sh", Dedup.shingles(col("text")))
    t("shingles_noop")(sh.write.format("noop").mode("overwrite").save())
    val hs = sh.withColumn("hs",
      transform(col("sh"), s => graft.util.Hashing.phash(s) % 4294967296L))
    t("hs_noop")(hs.write.format("noop").mode("overwrite").save())
    val sig = hs.withColumn("sig", array(Dedup.affine.map { case (a, b) =>
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % Dedup.MODP))
    }: _*)).select(col("doc_id"), col("sh"), col("sig"))
    t("sig_noop")(sig.write.format("noop").mode("overwrite").save())
    t("signatures_noop")(graft.ext.Dedup.signaturesOf(docs)
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
