package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Exact

/** Dev tool: decompose the topk_assets bench outlier (VERDICT r01
  * task 5). Usage: sbt "runMain graft.tools.Profile3 [sfDir]". */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Tables.region(spark, dir).count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    t("part_scan")(noop(p))
    t("li_scan_3cols")(noop(li.select("l_partkey", "l_extendedprice", "l_discount")))
    val agg = li.groupBy(col("l_partkey"))
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_plays"))
    t("groupby_only")(noop(agg))
    t("groupby_plain_double")(noop(
      li.groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_plays"))))
    val joined = agg.join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .select(col("p_partkey").as("asset_id"), col("p_name").as("asset_name"),
              col("revenue"), col("n_plays"))
    t("groupby_join")(noop(joined))
    t("full_topk")(noop(joined.orderBy(col("revenue").desc, col("asset_id")).limit(10)))
    t("full_topk_again")(noop(joined.orderBy(col("revenue").desc, col("asset_id")).limit(10)))
    t("topk_no_broadcast_hint")(noop(
      agg.join(p, col("l_partkey") === p("p_partkey"))
        .select(col("p_partkey").as("asset_id"), col("p_name").as("asset_name"),
                col("revenue"), col("n_plays"))
        .orderBy(col("revenue").desc, col("asset_id")).limit(10)))
    spark.stop()
  }
}
