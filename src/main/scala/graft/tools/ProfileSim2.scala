package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: cross-scheme equivalence + timing of the adaptive
  * simhash banding. Usage:
  *   scripts/run_main.sh graft.tools.ProfileSim2 <smallDir> [bigDir]
  */
object ProfileSim2 {
  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.ext.Dedup.corpus(spark, small)
    val narrow = graft.ext.Dedup.simhashPairsOf(docs, Some(4)).collect()
    val wide = graft.ext.Dedup.simhashPairsOf(docs, Some(2)).collect()
    println(s"narrow=${narrow.length} wide=${wide.length}")
    val nset = narrow.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wset = wide.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"EQUAL=${nset == wset} onlyNarrow=${(nset -- wset).size} onlyWide=${(wset -- nset).size}")
    args.drop(1).headOption.foreach { big =>
      val bdocs = graft.ext.Dedup.corpus(spark, big)
      t("adaptive_pairs_big") {
        val df = graft.ext.Dedup.simhashPairsOf(bdocs)
        df.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
