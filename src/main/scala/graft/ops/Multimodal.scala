package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, batch feature extraction over partitions.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch iteration shape (mapPartitions processes a whole partition per
  * task, mirroring a Pandas-UDF batch), deterministic output. The actual
  * codec is STUBBED (this container has no image/audio libraries): decode
  * is a deterministic fake that derives "pixels" from the payload bytes.
  * Swap [[MediaCodec.decodeStub]] for a real codec in production; nothing
  * else changes.
  */
object Multimodal {

  /** Typed media record: opaque payload + metadata, the schema a 100 TB
    * media lake would carry (payload in parquet binary or external blobs). */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      width: Int,
      height: Int,
      payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      byte_entropy: Double,
      thumb_8x8_mean: Double)

  object MediaCodec {
    /** STUB: a real implementation would decode payload -> pixel matrix.
      * This deterministic fake treats payload bytes as the "pixels". */
    def decodeStub(payload: Array[Byte], width: Int, height: Int): Array[Int] = {
      val n = math.max(width * height, 1)
      Array.tabulate(n)(i => java.lang.Byte.toUnsignedInt(payload(i % payload.length)))
    }

    /** STUB resize: average-pool the fake pixel array down to t×t. */
    def resizeStub(pixels: Array[Int], t: Int): Array[Double] = {
      val stride = math.max(pixels.length / (t * t), 1)
      Array.tabulate(t * t) { i =>
        val from = i * stride
        val slice = pixels.slice(from, math.min(from + stride, pixels.length))
        if (slice.isEmpty) 0.0 else slice.sum.toDouble / slice.length
      }
    }
  }

  /** Derive a deterministic synthetic media table from `documents` (the
    * container ships no binary fixtures): payload = utf8 bytes of text,
    * dimensions from n_chars. Real pipelines replace this with a read of
    * the media lake; everything downstream is unchanged. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(col("n_chars"), lit(64)) + 8).cast("int").as("width"),
      (pmod(col("n_chars"), lit(48)) + 8).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batch feature extraction: one task per partition, iterating records
    * like a Pandas-UDF batch; all logic deterministic. */
  def extractFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = mediaTable(s, dir).as[MediaRecord]
    ds.mapPartitions { batch =>
      val hist = new Array[Long](256) // reused across the batch, zeroed per record
      batch.map { m =>
        val px = MediaCodec.decodeStub(m.payload, m.width, m.height)
        val n = px.length.toDouble
        java.util.Arrays.fill(hist, 0L)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); hist(px(i)) += 1; i += 1 }
        var entropy = 0.0
        i = 0
        while (i < 256) {
          if (hist(i) > 0) { val p = hist(i) / n; entropy -= p * math.log(p) / math.log(2) }
          i += 1
        }
        val thumb = MediaCodec.resizeStub(px, 8)
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
          sum / n, entropy, thumb.sum / thumb.length)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** Frame sampling for "video" payloads: chunk the payload into
    * frame-sized windows, keep every k-th — pure column algebra. */
  def sampleFrames(s: SparkSession, dir: String): DataFrame = {
    val frameSize = 32
    val every = 4
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"""filter(
             |  CASE WHEN length(payload) >= $frameSize THEN
             |    transform(sequence(0, CAST(length(payload) / $frameSize AS INT) - 1),
             |              i -> struct(i AS idx, substring(payload, i * $frameSize + 1, $frameSize) AS frame))
             |  ELSE array() END,
             |  f -> f.idx % $every = 0)""".stripMargin)).as(Seq("pos", "f")))
      .select(col("media_id"), col("f.idx").as("frame_idx"),
        length(col("f.frame")).cast("long").as("frame_bytes"),
        md5(col("f.frame")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (extractFeatures _),
    "media_frame_sample" -> (sampleFrames _)
  )

  // media features involve the stubbed codec — no SQL oracle; the
  // frame-sample op is pure byte algebra and oracle-able.
  // DuckDB has no BLOB substring; the corpus is pure ASCII (verified), so
  // slicing the VARCHAR and md5-ing it hashes the identical bytes.
  val frameSampleSql: String =
    """SELECT media_id, frame_idx, CAST(length(frame) AS BIGINT) AS frame_bytes,
      |  md5(frame) AS frame_md5
      |FROM (
      |  SELECT media_id, (i - 1) AS frame_idx,
      |    substring(payload, (i - 1) * 32 + 1, 32) AS frame
      |  FROM (
      |    SELECT doc_id AS media_id, text AS payload
      |    FROM documents WHERE doc_id % 3 = 2),
      |  LATERAL UNNEST(generate_series(1, CAST(floor(octet_length(encode(payload)) / 32) AS INT))) AS t(i))
      |WHERE frame_idx % 4 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  val oracle: Map[String, String] = Map(
    "media_frame_sample" -> frameSampleSql
  )
}
