package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The Spark-side plumbing (schema, batched partition processing, UDF
 * signatures, deterministic fan-out) is REAL and tested; the actual media
 * decode is a clearly-marked STUB (`decodeStub`) because no image/audio
 * libraries exist in this container — a production deployment swaps
 * `decodeStub` for a real decoder with the same signature, and nothing
 * else changes.
 *
 * Batch shape: rows are processed through `mapPartitions` in fixed-size
 * batches (`BatchSize`), the Scala analogue of `mapInPandas` Arrow batches
 * — the decoder is invoked once per batch so per-call setup (model load,
 * codec init) amortizes.
 */
object Multimodal {

  val BatchSize = 64
  val HistBins = 16

  final case class MediaRow(doc_id: Long, modality: String, media: Array[Byte])
  final case class FeatureRow(
      doc_id: Long,
      modality: String,
      n_bytes: Int,
      hist: Array[Long],
      hist_sum: Long,
      spaces_bin: Long)

  /** Synthesize the media table from documents: payload = utf-8 bytes of
   * the text (a deterministic opaque blob), modality round-robins over the
   * three media kinds. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("modality"),
        encode(col("text"), "utf-8").as("media"))

  /** STUB decode: a real implementation would parse the container format
   * and return pixels/samples/frames. Here: identity on bytes. The
   * surrounding batching, schema and checksum plumbing is production
   * shaped. */
  private def decodeStub(media: Array[Byte]): Array[Byte] = media

  /** THE swap point for a real decoder: one invocation per BatchSize-row
   * batch (amortizing per-call setup — model load, codec init — exactly
   * like a mapInPandas batch). The stub maps the per-item kernel; a real
   * implementation would hand the whole batch to the native library. */
  private def decodeBatch(batch: Array[Array[Byte]]): Array[Array[Byte]] =
    batch.map(decodeStub)

  /** Feature extraction over decoded payload: 16-bin byte histogram
   * (high nibble), i.e. a deterministic stand-in for an embedding. */
  private def extractFeatures(decoded: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](HistBins)
    var i = 0
    while (i < decoded.length) {
      hist((decoded(i) & 0xf0) >>> 4) += 1
      i += 1
    }
    hist
  }

  /** Batched decode + feature extraction (mapPartitions in BatchSize
   * groups — the mapInPandas batch analogue). */
  def features(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("modality"), col("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // ONE decoder invocation per batch — the amortization the
          // grouped() exists for (a per-row call would make it a no-op)
          val decoded = decodeBatch(batch.iterator.map(_.media).toArray)
          batch.iterator.zipWithIndex.map { case (r, i) =>
            val hist = extractFeatures(decoded(i))
            FeatureRow(
              r.doc_id,
              r.modality,
              decoded(i).length,
              hist,
              hist.sum,
              hist(2)) // bin 2 = bytes 0x20..0x2f (ASCII space lives here)
          }
        }
      }
  }

  /** Frame sampling: split the payload into fixed `frameBytes` chunks and
   * keep every `everyN`-th — the video-frame-sampling plumbing with a
   * byte-chunk stand-in for real frame boundaries. */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media.select(
      col("doc_id"),
      col("modality"),
      // the CASE guards empty payloads: sequence(0, -1) yields the
      // DESCENDING array [0,-1], not [], so an empty blob would otherwise
      // produce one bogus zero-length frame
      expr(
        s"""CASE WHEN octet_length(media) < 1
           |  THEN CAST(array() AS array<struct<frame_idx:int,frame:binary>>)
           |  ELSE filter(
           |    transform(sequence(0, CAST(ceil(octet_length(media) / $frameBytes.0) AS INT) - 1),
           |              i -> struct(i AS frame_idx, substring(media, i * $frameBytes + 1, $frameBytes) AS frame)),
           |    f -> f.frame_idx % $everyN = 0) END""".stripMargin).as("frames"))
}
