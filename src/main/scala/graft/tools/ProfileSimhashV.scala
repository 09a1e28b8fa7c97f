package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B variants of the simhashOf aggregation layout. */
object ProfileSimhashV {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(df: => DataFrame): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROFILE $name: $best%.2f s")
    }
    val docs = graft.ext.Dedup.corpus(spark, dir)
    docs.limit(5).count()
    def tokBase: DataFrame = docs
      .select(col("doc_id"), explode(array_distinct(split(trim(col("text")), "\\s+"))).as("t"))
      .withColumn("hx", md5(concat(lit("sim_"), col("t"))))
      .withColumn("h1", conv(substring(col("hx"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("hx"), 17, 15), 16, 10).cast("long"))

    // V0: old layout — 64 conditional sums
    def v0(tok: DataFrame): DataFrame = {
      val bitSums = (0 until 64).map { j =>
        val h = if (j < 32) col("h1") else col("h2")
        sum(when(shiftright(h, j % 32) % 2 === 1, 1).otherwise(-1)).as(s"s$j")
      }
      val sums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      val packed = (0 until 64).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      sums.select(col("doc_id"), packed.as("simhash"))
    }
    // V1: packed 16-bit lanes
    def v1(tok: DataFrame): DataFrame = {
      def lane(j: Int): Column = {
        val h = if (j < 32) col("h1") else col("h2")
        shiftleft(shiftright(h, j % 32).bitwiseAND(lit(1L)), 16 * (j % 4))
      }
      val wordSums = (0 until 16).map { w =>
        sum((0 until 4).map(i => lane(4 * w + i)).reduce(_ + _)).as(s"w$w")
      }
      val sums = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("tc"), wordSums: _*)
      def cj(j: Int): Column =
        shiftright(col(s"w${j / 4}"), 16 * (j % 4)).bitwiseAND(lit(0xffffL))
      val packed = (0 until 64).map(j =>
        when(cj(j) * 2 > col("tc"), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      sums.select(col("doc_id"), packed.as("simhash"))
    }
    t("v0_plain")(v0(tokBase))
    t("v1_plain")(v1(tokBase))
    t("v0_fenced")(v0(graft.util.Fence.barrier(tokBase.select(col("doc_id"), col("h1"), col("h2")))))
    t("v1_fenced")(v1(graft.util.Fence.barrier(tokBase.select(col("doc_id"), col("h1"), col("h2")))))
    t("v0_repart")(v0(tokBase.select(col("doc_id"), col("h1"), col("h2"))
      .repartition(spark.sparkContext.defaultParallelism)))
    t("v1_repart")(v1(tokBase.select(col("doc_id"), col("h1"), col("h2"))
      .repartition(spark.sparkContext.defaultParallelism)))
    // the committed simhashOf (packed + raise_error contract)
    t("committed_noop")(graft.ext.Dedup.simhashOf(docs))
    t("committed_orderBy")(graft.ext.Dedup.simhashOf(docs).orderBy(col("doc_id")))
    t("v1_orderBy")(v1(tokBase).orderBy(col("doc_id")))
    def banded(sims: DataFrame): DataFrame = sims.select(col("doc_id"), col("simhash"),
      explode_outer(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("bv"))
      }: _*)).as("bb"))
    t("committed_banded")(banded(graft.ext.Dedup.simhashOf(docs)))
    t("v1_banded")(banded(v1(tokBase)))
    t("v0_banded")(banded(v0(tokBase)))
    spark.stop()
  }
}
