package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage timings of rebalance_plan (not driver contract). */
object ProfileReb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.util.{Fence, Hashing}
    import graft.model.Tables
    def t(name: String)(df: => DataFrame): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROFILE $name: $best%.2f s")
    }
    Tables.lineitem(spark, dir).limit(5).count()
    val keys = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("w"))
    t("1_keys")(keys)
    val key = col("l_orderkey").cast("string")
    val withMd5 = keys.select(
      Seq(col("w"), Hashing.phash(key, "rb_").as("h0")) ++
        (0 to 7).map(p => md5(concat(key, lit(s"#$p"))).as(s"m$p")): _*)
    t("2_md5s")(withMd5)
    val fenced = Fence.barrier(withMd5)
    def shardStruct(s: Int) = {
      val off = if (s % 2 == 0) 1 else 17
      struct(conv(substring(col(s"m${s / 2}"), off, 15), 16, 10)
        .cast("long").as("h"), lit(s.toLong).as("s"))
    }
    val structs = (0 until 16).map(shardStruct)
    val per = fenced.select(col("w"),
      pmod(col("h0"), lit(12L)).as("mod_old"),
      pmod(col("h0"), lit(16L)).as("mod_new"),
      greatest(structs.take(12): _*).getField("s").as("hrw_old"),
      greatest(structs: _*).getField("s").as("hrw_new"))
    t("3_per")(per)
    (1 to 2).foreach { i =>
      t(s"full_$i")(graft.SparkEntry.queries("rebalance_plan")(spark, dir))
    }
    spark.stop()
  }
}
