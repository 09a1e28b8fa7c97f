package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: hamming-distance stats of noise twins under the DCT
  * pHash vs the positional-bucket aHash (same noised corpus). */
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.ext.Multimodal.ppmPhashTwinTable(spark, dir)
    val ph = graft.ext.Multimodal.phashImagesOf(m).collect()
      .map(f => f.media_id -> f.phash).toMap
    val ah = graft.ext.Multimodal.fingerprintImagesOf(m).collect()
      .map(f => f.media_id -> f.sig).toMap
    val baseIds = ph.keys.filter(id => id < 1000000L && id % 6 == 0 &&
      ph.contains(id + 1000000L)).toSeq.sorted
    def stats(name: String, sig: Map[Long, Long]): Unit = {
      val hams = baseIds.map(id =>
        java.lang.Long.bitCount(sig(id) ^ sig(id + 1000000L)))
      val hist = hams.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted
      println(s"$name: n=${hams.length} sum=${hams.sum} max=${hams.max} " +
        s"le1=${hams.count(_ <= 1)} hist=$hist")
    }
    stats("phash(8bit)", ph)
    stats("ahash(16bit)", ah)
    // how many brightness twins exit media_neardup's ±1 luminance band
    val tot = graft.ext.Multimodal.fingerprintImagesOf(m).collect()
      .map(f => f.media_id -> f.lum_total).toMap
    val shifts = baseIds.map(id =>
      math.abs(tot(id + 1000000L) / 256L - tot(id) / 256L))
    val shist = shifts.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted
    println(s"tband shift hist=$shist escapes(>=2)=${shifts.count(_ >= 2)}")
    spark.stop()
  }
}
