package graft.tools
import org.apache.spark.sql.SparkSession
object CountQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { dir =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"COUNT $name $dir: $n%,d rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
