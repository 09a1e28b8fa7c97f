package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for ngram_jaccard at sf0.1. */
object ProfileN {
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
    import graft.ext.Dedup
    import graft.util.Hashing
    val docs = graft.model.Tables.documents(spark, dir)
    t("docs")(println(s"  docs=${docs.count()}"))
    // the signature stage EXACTLY as ngramJaccardOf builds it — any
    // drift here and the timings stop measuring production code
    def dOf() = docs
      .select(col("source"), col("doc_id"), array_distinct(
        transform(split(trim(col("text")), "\\s+"), t => Hashing.phash(t, "ng_") % 4294967296L))
        .as("hs"))
      .withColumn("sig", array(Dedup.affine.map { case (a, b) =>
        array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % Dedup.MODP))
      }: _*))
      .repartition(spark.sparkContext.defaultParallelism)
      .transform(graft.util.Fence.lineage)
    t("sig_noop")(dOf().write.format("noop").mode("overwrite").save())
    t("sig_noop_2nd")(dOf().write.format("noop").mode("overwrite").save())
    // candidate generation only: the PRODUCTION banded join
    // (Dedup.bandHashes + Dedup.firstMatchingBand), no verify
    def candOf() = {
      val d = dOf()
      val sigB = d.withColumn("bhs", Dedup.bandHashes("ngband"))
        .select(col("source"), col("doc_id"), col("bhs"))
      val banded = sigB.select(col("source"), col("doc_id"), col("bhs"),
        posexplode_outer(col("bhs")).as(Seq("band", "bh")))
      val l = banded.as("l"); val r = banded.as("r")
      l.join(r,
          col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.source") === col("r.source") && col("l.doc_id") < col("r.doc_id") &&
          Dedup.firstMatchingBand(col("l.bhs"), col("r.bhs"), col("l.band")))
        .select(col("l.source").as("source"), col("l.doc_id").as("id1"),
          col("r.doc_id").as("id2"))
    }
    t("cand_count")(println(s"  cand=${candOf().count()}"))
    t("cand_count_2nd")(println(s"  cand=${candOf().count()}"))
    t("full")(Dedup.ngramJaccard(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("full_2nd")(Dedup.ngramJaccard(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
