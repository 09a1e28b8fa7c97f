package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timings of the simhash near-dup pipeline
  * (not part of the driver contract). Usage:
  *   scripts/run_main.sh graft.tools.ProfileSim [sfDir]
  */
object ProfileSim {
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
    val docs = graft.ext.Dedup.corpus(spark, dir)
    t("corpus_count")(println("  n=" + docs.count()))
    val sims = graft.ext.Dedup.simhashOf(docs)
      .repartition(spark.sparkContext.defaultParallelism)
    t("simhashOf_noop")(sims.write.format("noop").mode("overwrite").save())
    val simsP = sims.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("simhash_persist")(println("  sims=" + simsP.count()))
    val banded = simsP.select(col("doc_id"), col("simhash"),
      explode_outer(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("bv"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val l = banded.as("l"); val r = banded.as("r")
    val raw = l.join(r,
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"),
        col("l.simhash").as("s1"), col("r.simhash").as("s2"))
    t("raw_candidates_count")(println("  rawcand=" + raw.count()))
    val dd = raw.dropDuplicates("id1", "id2")
    t("dropdup_count")(println("  dd=" + dd.count()))
    val ham = dd.withColumn("hamming", expr("bit_count(s1 ^ s2)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("id1"), col("id2"), col("hamming"))
    t("verified_count")(println("  pairs=" + ham.count()))
    t("full_orderBy_noop")(
      ham.orderBy(col("id1"), col("id2"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
