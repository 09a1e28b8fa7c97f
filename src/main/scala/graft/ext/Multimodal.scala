package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Hashing

/** Multimodal-column plumbing (BASELINE.json north-star): media as
  * opaque `binary` columns with typed metadata, batch-shaped
  * decode / feature-extract / frame-sample operators.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * STUB — a deterministic fake (hash-derived "brightness", computed
  * length-based "frames"). Everything around it is real Spark
  * plumbing: the binary column, the metadata struct, the per-batch
  * `mapPartitions` kernel shape (one kernel instance per partition,
  * streaming over rows — exactly where a JNI/FFmpeg/torch call would
  * sit), and the pure-expression feature path that stays in codegen.
  *
  * Scale: media bytes dominate row width, so the operators project
  * the binary column as late as possible (column pruning keeps scans
  * narrow until decode), and decode parallelism is partition-level —
  * the 100 TB path is "repartition to decoder count, mapPartitions,
  * write features", no shuffle of raw bytes beyond the repartition.
  */
object Multimodal {

  /** Documents dressed as a media table: text bytes play the blob
    * (deterministic, so the oracle can check the plumbing). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height"),
        when(col("doc_id") % 3 === 0, "h264")
          .when(col("doc_id") % 3 === 1, "vp9").otherwise("av1").as("codec"))
        .as("meta"))

  /** Pure-expression feature extraction over the media table
    * (codegen path; oracle-checked): sizes, frame sampling counts,
    * and the stubbed "decode" features derived from the blob hash. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(spark, dir)
      .withColumn("n_bytes", octet_length(col("blob")).cast("long"))
      .withColumn("n_frames", (col("n_bytes") % 30 + 1).cast("long"))
      // sample every 5th frame: ceil(n_frames / 5)
      .withColumn("n_sampled", ((col("n_frames") + 4) / 5).cast("long"))
      // STUB decode: "brightness" = blob-hash bucket (a real decoder
      // would run here, per partition batch)
      .withColumn("fake_brightness", Hashing.phash(col("blob").cast("string"), "px_") % 256)
    m.select(col("media_id"), col("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.codec").as("codec"), col("n_frames"), col("n_sampled"),
        col("fake_brightness"))
      .orderBy(col("media_id"))
  }

  val mediaFeaturesSql: String =
    s"""WITH m AS (
         SELECT doc_id AS media_id, text,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(n_chars % 1920 AS INTEGER) AS width,
           CAST(n_chars % 1080 AS INTEGER) AS height,
           CASE WHEN doc_id % 3 = 0 THEN 'h264'
                WHEN doc_id % 3 = 1 THEN 'vp9' ELSE 'av1' END AS codec
         FROM documents)
       SELECT media_id, n_bytes, width, height, codec,
         CAST(n_bytes % 30 + 1 AS BIGINT) AS n_frames,
         CAST((n_bytes % 30 + 1 + 4) // 5 AS BIGINT) AS n_sampled,
         ${Hashing.phashSql("text", "px_")} % 256 AS fake_brightness
       FROM m ORDER BY media_id"""

  /** Exact binary dedup over the media table — content-hash groupBy
    * on the blob bytes, the image/audio counterpart of the text
    * `dedup_exact` pass, plus the storage accounting a curation run
    * reports (copies beyond the keeper are reclaimable bytes). One
    * shuffle on the content hash; the blob itself never shuffles —
    * only (hash, id, n_bytes) rides the exchange, so row width stays
    * bytes-free no matter how large the media get. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = mediaTable(spark, dir)
    // the raw corpus has no byte-exact copies (its twins differ by a
    // suffix token) — inject exact replicas deterministically so the
    // dedup path has real positives and the oracle rebuilds them
    val copies = base.filter(col("media_id") % 7 === 0)
      .select((col("media_id") + 500000).as("media_id"), col("blob"), col("meta"))
    val m = base.unionAll(copies).select(
      col("media_id"),
      Hashing.phash(col("blob").cast("string"), "blob_").as("content_key"),
      octet_length(col("blob")).cast("long").as("n_bytes"))
    m.groupBy(col("content_key"))
      .agg(count(lit(1)).as("n_copies"),
           min(col("media_id")).as("keeper_id"),
           // copies of one content share a byte size — any aggregate
           // of n_bytes is THE size; min is deterministic
           min(col("n_bytes")).as("n_bytes"))
      .filter(col("n_copies") >= 2)
      .withColumn("reclaimable_bytes", (col("n_copies") - 1) * col("n_bytes"))
      .select(col("keeper_id"), col("content_key"), col("n_copies"),
        col("n_bytes"), col("reclaimable_bytes"))
      .orderBy(col("keeper_id"))
  }

  val mediaDedupSql: String =
    s"""WITH b AS (
         SELECT doc_id AS media_id, text FROM documents
         UNION ALL
         SELECT doc_id + 500000 AS media_id, text FROM documents
         WHERE doc_id % 7 = 0),
       m AS (
         SELECT media_id,
           ${Hashing.phashSql("text", "blob_")} AS content_key,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         FROM b),
       g AS (
         SELECT content_key, CAST(count(*) AS BIGINT) AS n_copies,
           min(media_id) AS keeper_id, min(n_bytes) AS n_bytes
         FROM m GROUP BY content_key)
       SELECT keeper_id, content_key, n_copies, n_bytes,
         CAST((n_copies - 1) * n_bytes AS BIGINT) AS reclaimable_bytes
       FROM g WHERE n_copies >= 2 ORDER BY keeper_id"""

  /** Decoded-frame record produced by the batch kernel. */
  case class FrameFeature(media_id: Long, frame_idx: Int, brightness: Double)

  /** The mapPartitions decode kernel shape: one decoder instance per
    * partition, rows streamed through it. The decode itself is a
    * STUB (deterministic fake) — swap `fakeDecode` for the real
    * codec call; the batching, schema and partition layout are the
    * production shape. */
  def decodeFrames(spark: SparkSession, dir: String, parallelism: Int = 8): Dataset[FrameFeature] = {
    import spark.implicits._
    val m = mediaTable(spark, dir)
      .select(col("media_id").cast("long"), col("blob"))
      .repartition(parallelism)   // decoder-count partitioning, not data-size
    m.as[(Long, Array[Byte])].mapPartitions { rows =>
      // per-partition decoder init would happen HERE (expensive setup once)
      def fakeDecode(blob: Array[Byte], frame: Int): Double =
        (blob((frame * 7) % blob.length) & 0xff) / 255.0   // STUB
      rows.flatMap { case (id, blob) =>
        if (blob.isEmpty) Iterator.empty   // empty media: nothing to decode
        else {
          val nFrames = (blob.length % 30) + 1
          (0 until nFrames by 5).iterator.map(f => FrameFeature(id, f, fakeDecode(blob, f)))
        }
      }
    }
  }
}
