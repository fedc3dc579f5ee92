package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The IMAGE path is a REAL decode: payloads are genuine PNG containers and
 * `decode` parses them back to grayscale pixels via `javax.imageio`
 * (ships with the JDK — no external dependency). The AUDIO path is a REAL
 * decode too: payloads are genuine RIFF/WAVE 16-bit PCM containers parsed
 * by a pure-JVM chunk walk ([[Wav]] — public spec, no library needed).
 * Only VIDEO decode remains a clearly-marked STUB (`decodeStub`, identity
 * on bytes) because no video codec library exists in this container — a
 * production deployment swaps `decodeStub` for a real codec with the same
 * signature, and nothing else changes.
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

  /** Real PNG codec for the image modality — grayscale 16x16, lossless
   * round-trip (PNG is lossless, so decode(encode(p)) == p bit-exactly,
   * which is what lets the decoded-pixel statistics stay SQL-oracle-able:
   * the oracle recomputes them from the pixel formula without touching
   * PNG at all). */
  object Png {
    val W = 16
    val H = 16

    // ImageIO defaults to DISK-cached streams: every encode/decode would
    // create+delete a temp file in the executor hot path. These images are
    // tiny; memory caching is strictly better (and works on read-only
    // /tmp executors).
    javax.imageio.ImageIO.setUseCache(false)

    def encodeGray(pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == W * H, s"expected ${W * H} pixels, got ${pixels.length}")
      val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, W, H, pixels)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decodeGray(png: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Byte](w * h)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = raster.getSample(x, y, 0).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    /** Deterministic synthetic pixel content for doc `id` — the corpus
     * token formula reduced mod 256, so an independent SQL engine can
     * reproduce every DECODED pixel from doc_id arithmetic alone. */
    def pixelsOf(id: Long): Array[Byte] = {
      import graft.sources.TokenTable.{MulA, MulB}
      val out = new Array[Byte](W * H)
      var i = 0
      while (i < out.length) {
        out(i) = (((id + 1) * MulA + i * MulB) % 256L).toByte
        i += 1
      }
      out
    }
  }

  /** Real RIFF/WAVE PCM codec for the audio modality — 16-bit mono
   * little-endian, the public container spec (RIFF chunks: fmt + data).
   * PCM is UNCOMPRESSED, so the decoded sample byte stream is bit-equal to
   * what was encoded — which is what lets the decoded-audio statistics
   * stay SQL-oracle-able: the oracle reproduces every sample byte from
   * doc_id arithmetic without touching the container. Pure JVM (ByteBuffer
   * walk), no external codec library. */
  object Wav {
    val SampleRate = 8000
    val NumSamples = 200

    /** Deterministic synthetic 16-bit samples for doc `id` — the corpus
     * token formula reduced mod 2^16, mirroring [[Png.pixelsOf]]. */
    def samplesOf(id: Long): Array[Short] = {
      import graft.sources.TokenTable.{MulA, MulB}
      val out = new Array[Short](NumSamples)
      var i = 0
      while (i < out.length) {
        out(i) = (((id + 1) * MulA + i * MulB) % 65536L).toShort
        i += 1
      }
      out
    }

    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

    /** Canonical 44-byte RIFF/WAVE header + the little-endian PCM stream. */
    def encodePcm16(samples: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer
        .allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(Ascii)).putInt(36 + dataLen).put("WAVE".getBytes(Ascii))
      bb.put("fmt ".getBytes(Ascii)).putInt(16)
      bb.putShort(1).putShort(1) // PCM, mono
      bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate * block
      bb.putShort(2).putShort(16) // block align, bits/sample
      bb.put("data".getBytes(Ascii)).putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Decode by WALKING the chunk list (not a fixed 44-byte skip — RIFF
     * permits extra chunks like LIST/INFO before data; odd-sized chunks
     * are word-padded per spec). Returns the raw little-endian sample
     * byte stream of the data chunk; rejects non-PCM / non-16-bit. */
    def decodePcm16Bytes(wav: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourCC(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, Ascii)
      }
      require(wav.length >= 44 && fourCC() == "RIFF", "not a RIFF container")
      bb.getInt() // riff size (unvalidated: streams may understate it)
      require(fourCC() == "WAVE", "not a WAVE form")
      var pcmOk = false
      var data: Array[Byte] = null
      while (bb.remaining() >= 8 && data == null) {
        val id = fourCC()
        val size = bb.getInt()
        require(size >= 0 && size <= bb.remaining(), s"truncated chunk $id")
        id match {
          case "fmt " =>
            val fmtPos = bb.position()
            val audioFormat = bb.getShort()
            bb.getShort() // channels (mono written; any accepted for decode)
            bb.getInt(); bb.getInt(); bb.getShort()
            val bits = bb.getShort()
            require(audioFormat == 1 && bits == 16, s"not 16-bit PCM (fmt=$audioFormat bits=$bits)")
            pcmOk = true
            bb.position(fmtPos + size + (size & 1))
          case "data" =>
            require(pcmOk, "data chunk before fmt")
            data = new Array[Byte](size)
            bb.get(data)
          case _ =>
            bb.position(bb.position() + size + (size & 1)) // skip + word pad
        }
      }
      require(data != null, "no data chunk")
      data
    }

    /** Sample view of [[decodePcm16Bytes]] (tests / downstream DSP). */
    def decodePcm16(wav: Array[Byte]): Array[Short] = {
      val bytes = decodePcm16Bytes(wav)
      val out = new Array[Short](bytes.length / 2)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort(); i += 1 }
      out
    }
  }

  /** Synthesize the media table from documents: modality round-robins over
   * the three media kinds; IMAGE rows carry a real PNG encoding of the
   * deterministic pixel pattern, AUDIO rows a real RIFF/WAVE PCM container
   * of the deterministic sample pattern, video rows an opaque blob (the
   * utf-8 text bytes — the one remaining documented stub). Row-local typed
   * map — zero shuffle. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val media = modality match {
          case "image" => Png.encodeGray(Png.pixelsOf(id))
          case "audio" => Wav.encodePcm16(Wav.samplesOf(id))
          case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        MediaRow(id, modality, media)
      })
      .toDF()
  }

  /** STUB decode for video only: a real implementation would parse the
   * container and return frames. Here: identity on bytes (no video codec
   * library exists in this container — image and audio decode are real).
   * The surrounding batching, schema and checksum plumbing is production
   * shaped. */
  private def decodeStub(media: Array[Byte]): Array[Byte] = media

  /** Modality dispatch: image -> REAL PNG decode to pixels; audio -> REAL
   * RIFF/WAVE PCM decode to the sample byte stream; video -> the
   * documented stub. */
  private def decodeOne(modality: String, media: Array[Byte]): Array[Byte] =
    modality match {
      case "image" => Png.decodeGray(media)
      case "audio" => Wav.decodePcm16Bytes(media)
      case _ => decodeStub(media)
    }

  /** THE swap point for a real audio/video decoder: one invocation per
   * BatchSize-row batch (amortizing per-call setup — model load, codec
   * init — exactly like a mapInPandas batch). */
  private def decodeBatch(modalities: Array[String], batch: Array[Array[Byte]]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](batch.length)
    var i = 0
    while (i < batch.length) {
      out(i) = decodeOne(modalities(i), batch(i))
      i += 1
    }
    out
  }

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
   * groups — the mapInPandas batch analogue). Image rows' features are
   * computed over REAL decoded pixels. */
  def features(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("modality"), col("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // ONE decoder invocation per batch — the amortization the
          // grouped() exists for (a per-row call would make it a no-op)
          val decoded = decodeBatch(
            batch.iterator.map(_.modality).toArray,
            batch.iterator.map(_.media).toArray)
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
   * byte-chunk stand-in for real frame boundaries. (Callers should apply
   * this to the audio/video modalities; byte-chunking a compressed image
   * container is meaningless.) */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(media.sparkSession)
    media.select(
      col("doc_id"),
      col("modality"),
      // one codegen'd kernel call per row (frame enumeration + every-Nth
      // selection fused; empty payloads -> empty array) — replaces the
      // former transform-over-sequence + filter lambda pair so the
      // projection stays in one whole-stage-codegen span
      call_function("bin_frame_sample", col("media"), lit(frameBytes), lit(everyN))
        .as("frames"))
  }
}
