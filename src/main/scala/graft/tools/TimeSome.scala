package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing of a subset of SparkEntry.queries (noop sink,
  * min-of-3 like Bench) — builder-side A/B tool. */
object TimeSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Tables.events(spark, sfDir).limit(10).count()
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 3).foreach { _ =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        samples(n) = (System.nanoTime() - t0) / 1e9 :: samples(n)
      }
    }
    names.foreach { n => println(f"[time] $n%-24s ${samples(n).min}%.2f s") }
    spark.stop()
  }
}
