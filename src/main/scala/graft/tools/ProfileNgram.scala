package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: CANDIDATE-vs-OUTPUT stage profile of the staged-signature
  * text-LSH family (ngram_jaccard / dedup_incremental /
  * dedup_fuzzy_edit). The family's measured at-scale superlinearity is
  * claimed OUTPUT-driven (replica corpora densify true pairs ~M²) —
  * this tool checks that claim directly: if the candidate count
  * dominates the verified count, the blocking stage (not the data) is
  * the problem and the band discussion in Dedup.scala reopens.
  *
  * Usage: scripts/run_main.sh graft.tools.ProfileNgram [sfDir]
  * Prints one PROFILE line per stage and a final ratio line per op.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timedCount(name: String, df: DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PROFILE $name: $n%,d rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      n
    }

    def profile(op: String, stages: (DataFrame, DataFrame)): Unit = {
      val nCand = timedCount(s"${op}_candidates", stages._1)
      val nOut = timedCount(s"${op}_verified", stages._2)
      println(f"PROFILE $op: candidate/verified ratio = " +
        f"${nCand.toDouble / math.max(nOut, 1)}%.2f " +
        f"(cand=$nCand%,d verified=$nOut%,d)")
    }

    val docs = graft.model.Tables.documents(spark, dir)
    profile("ngram_jaccard", graft.ext.Dedup.ngramStagesOf(docs))
    profile("dedup_incremental", graft.ext.Dedup.incrementalStagesOf(docs))
    profile("dedup_fuzzy_edit",
      graft.ext.Dedup.fuzzyEditStagesOf(graft.ext.Dedup.corpus(spark, dir)))
    spark.stop()
  }
}
