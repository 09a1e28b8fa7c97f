package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage timings of the ngram-Jaccard LSH pipeline.
  * Usage: scripts/run_main.sh graft.tools.ProfileNgram [sfDir] */
object ProfileNgram {
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
    val full = graft.ext.Dedup.ngramJaccardOf(
      graft.model.Tables.documents(spark, dir))
    t("ngram_full_noop")(full.write.format("noop").mode("overwrite").save())
    println("  out=" + full.count())
    spark.stop()
  }
}
