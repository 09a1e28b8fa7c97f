package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries (min of 3, noop sink
  * — same methodology as graft.Bench) without paying for the full
  * bench sweep.
  *
  * Usage: sbt "runMain graft.tools.ProfileQ q1 q2 ..."
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.max(2, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.model.Tables.region(spark, dir).count()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILEQ $name: min ${times.min}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
