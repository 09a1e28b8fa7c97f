package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ext.Dedup
import graft.util.Hashing

/** Dev tool: stage-by-stage cost decomposition of the ngram_jaccard
  * pipeline (tokenize → phash → minhash sigs → band explode →
  * candidate join → verify) so optimization effort lands where the
  * time actually goes. */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE4 $name: min ${times.min}%.2f s")
    }

    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        array_distinct(split(trim(col("text")), "\\s+")).as("ts"))
      .repartition(spark.sparkContext.defaultParallelism)
    t("warmup")(base.limit(10).count())
    t("tokenize")(base.agg(sum(size(col("ts")))).head())
    val hs = base.withColumn("hs",
      transform(col("ts"), x => Hashing.phash(x, "ng_") % 4294967296L))
    t("phash")(hs.agg(sum(size(col("hs")))).head())
    val sig = hs.withColumn("sig", array(Dedup.affine.map { case (a, b) =>
        array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % Dedup.MODP))
      }: _*)).drop("hs")
      .repartition(spark.sparkContext.defaultParallelism)
    t("sigs")(sig.agg(sum(element_at(col("sig"), 1))).head())
    val banded = sig.select(col("source"), col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          Hashing.phash(concat_ws("_",
            element_at(col("sig"), b * 2 + 1).cast("string"),
            element_at(col("sig"), b * 2 + 2).cast("string")),
            s"ngband${b}_").as("bh"))
      }: _*)).as("bb"))
      .select(col("source"), col("doc_id"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    t("banded")(banded.agg(count(lit(1))).head())
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.source") === col("r.source") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.source").as("source"), col("l.doc_id").as("id1"),
        col("r.doc_id").as("id2"))
    t("cand_join")(println("  raw cand rows: " + cand.count()))
    val dd = cand.dropDuplicates("id1", "id2")
    t("cand_dedup")(println("  deduped cand rows: " + dd.count()))
    val toks = base.select(col("doc_id"), col("ts"))
    val verified = dd
      .join(toks.select(col("doc_id").as("id1"), col("ts").as("ts1")), Seq("id1"))
      .join(toks.select(col("doc_id").as("id2"), col("ts").as("ts2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("ts1"), col("ts2"))))
      .withColumn("jaccard",
        floor(col("inter").cast("double") /
              (size(col("ts1")) + size(col("ts2")) - col("inter")) * 10000 + 0.5) / 10000)
      .filter(col("jaccard") >= 0.8)
    t("verify_full")(println("  verified rows: " + verified.count()))
    t("query_full")(Dedup.ngramJaccard(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
