package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B the composed conv(md5) phash vs the native Md5Word,
  * in codegen'd projections and inside interpreted HOF lambdas. */
object ProfileHash {
  def main(args: Array[String]): Unit = {
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(df: => DataFrame): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROFILE $name: $best%.2f s")
    }
    def oldHash(c: Column, salt: String): Column =
      conv(substring(md5(concat(lit(salt), c)), 1, 15), 16, 10).cast("long")
    def newHash(c: Column, salt: String): Column =
      graft.functions.Md5Word(c, salt, hi = false)
    val base = spark.range(3000000)
      .select(concat(lit("tok_"), col("id").cast("string")).as("s"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(eager = true)
    t("proj_old")(base.select(oldHash(col("s"), "x_").as("h")))
    t("proj_new")(base.select(newHash(col("s"), "x_").as("h")))
    t("proj_old2")(base.select(oldHash(col("s"), "x_").as("h")))
    t("proj_new2")(base.select(newHash(col("s"), "x_").as("h")))
    val arr = spark.range(200000)
      .select(transform(sequence(lit(1), lit(15)),
        i => concat(lit("w"), (col("id") + i).cast("string"))).as("a"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(eager = true)
    t("hof_old")(arr.select(transform(col("a"), s => oldHash(s, "y_")).as("h")))
    t("hof_new")(arr.select(transform(col("a"), s => newHash(s, "y_")).as("h")))
    t("hof_old2")(arr.select(transform(col("a"), s => oldHash(s, "y_")).as("h")))
    t("hof_new2")(arr.select(transform(col("a"), s => newHash(s, "y_")).as("h")))
    spark.stop()
  }
}
