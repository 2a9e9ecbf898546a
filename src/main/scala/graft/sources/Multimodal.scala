package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder charter): media blobs are opaque
  * BINARY columns with a typed metadata struct; decode / feature-extract
  * runs batched per partition so codec init amortizes per task, not per row
  * — the Scala analog of a `mapInPandas` batch UDF.
  *
  * Decoders are REAL pure-JVM parsers (no external codec libs needed):
  *  - `audio/wav`  — RIFF/WAVE chunk walker + 16-bit PCM sample decode
  *    (channels, sample rate, amplitude stats, zero-crossing rate)
  *  - `image/bmp`  — BITMAPINFOHEADER parse + 24-bpp BGR pixel scan with
  *    4-byte row padding (dimensions, per-channel means, luma)
  *  - `text/plain` (and unknown kinds) — byte-level content statistics
  *    (ascii/whitespace/digit ratios, order-0 entropy)
  * The fixture ships no real media bytes, so WAV/BMP rows are SYNTHESIZED
  * deterministically per media_id (a sine tone / a gradient bitmap) — the
  * bytes are valid files any external tool could read; the decoders never
  * see the generator, only the bytes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
      n_bytes: Long, lang: String)
  final case class MediaFeatures(media_id: Long, kind: String, lang: String,
      n_bytes: Long, checksum: Long, feature: Array[Double])

  // ---------------------------------------------------------------- fixtures

  /** Valid 16-bit mono PCM WAV: 8 kHz sine tone whose frequency and length
    * derive from the id. */
  def synthWavBytes(id: Long): Array[Byte] = {
    val sampleRate = 8000
    val n = 256 + (math.abs(id) % 16).toInt * 16
    val freq = 220.0 + (math.abs(id) % 24) * 55.0
    val dataLen = n * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2.toShort) // block align
      .putShort(16.toShort) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toShort)
      i += 1
    }
    buf.array()
  }

  /** Valid 24-bpp BMP (BITMAPINFOHEADER, bottom-up, 4-byte row padding)
    * with a deterministic per-id pixel gradient. */
  def synthBmpBytes(id: Long): Array[Byte] = {
    val w = 8 + (math.abs(id) % 5).toInt
    val h = 6 + (math.abs(id) % 4).toInt
    val rowLen = (w * 3 + 3) / 4 * 4
    val dataLen = rowLen * h
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel offset
      .putInt(40).putInt(w).putInt(h) // info header size, dims
      .putShort(1.toShort).putShort(24.toShort) // planes, bpp
      .putInt(0).putInt(dataLen) // no compression
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        buf.put(((id * 31 + x * 7 + y * 13) % 256).toByte) // B
          .put(((id * 17 + x * 11 + y * 3) % 256).toByte) // G
          .put(((id * 23 + x * 5 + y * 19) % 256).toByte) // R
        x += 1
      }
      var pad = w * 3
      while (pad < rowLen) { buf.put(0.toByte); pad += 1 }
      y += 1
    }
    buf.array()
  }

  // ---------------------------------------------------------------- decoders

  private def polyChecksum(bytes: Array[Byte]): Long = {
    var c = 0L
    var i = 0
    while (i < bytes.length) { c = (c * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    c
  }

  /** RIFF/WAVE walker: locates `fmt ` and `data` chunks, decodes 16-bit PCM
    * samples. Features: [channels, sampleRate, nSamples, mean, rms, peak,
    * zeroCrossRate, durationSec]. */
  def decodeWav(bytes: Array[Byte]): Array[Double] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(8) == 'W' && bytes(9) == 'A', "not a RIFF/WAVE file")
    var channels = 1
    var sampleRate = 0
    var bits = 16
    var dataOff = -1
    var dataLen = 0
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val cid = new String(bytes, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4)
      if (cid == "fmt ") {
        channels = buf.getShort(pos + 10).toInt
        sampleRate = buf.getInt(pos + 12)
        bits = buf.getShort(pos + 22).toInt
      } else if (cid == "data") {
        dataOff = pos + 8; dataLen = clen
      }
      pos += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    require(dataOff > 0 && bits == 16, "no 16-bit PCM data chunk")
    val n = dataLen / 2
    var i = 0
    var sum = 0.0
    var sumSq = 0.0
    var peak = 0.0
    var crossings = 0
    var prev = 0.0
    while (i < n) {
      val s = buf.getShort(dataOff + i * 2).toDouble
      sum += s; sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) crossings += 1
      prev = s
      i += 1
    }
    val nn = math.max(n, 1)
    Array(channels.toDouble, sampleRate.toDouble, n.toDouble,
      sum / nn, math.sqrt(sumSq / nn), peak,
      if (n > 1) crossings.toDouble / (n - 1) else 0.0,
      if (sampleRate > 0) n.toDouble / sampleRate / math.max(channels, 1) else 0.0)
  }

  /** BITMAPINFOHEADER parse + 24-bpp pixel scan (bottom-up rows, 4-byte
    * padding). Features: [width, height, bpp, meanB, meanG, meanR, meanLuma,
    * nPixels]. */
  def decodeBmp(bytes: Array[Byte]): Array[Double] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
    val pixelOff = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    require(bpp == 24, s"unsupported bpp $bpp")
    val rowLen = (w * 3 + 3) / 4 * 4
    var sb = 0.0; var sg = 0.0; var sr = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      val base = pixelOff + y * rowLen
      while (x < w) {
        sb += (bytes(base + x * 3) & 0xff)
        sg += (bytes(base + x * 3 + 1) & 0xff)
        sr += (bytes(base + x * 3 + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val np = math.max(w * h, 1)
    val (mb, mg, mr) = (sb / np, sg / np, sr / np)
    Array(w.toDouble, h.toDouble, bpp.toDouble, mb, mg, mr,
      0.114 * mb + 0.587 * mg + 0.299 * mr, (w * h).toDouble)
  }

  /** Byte-level content statistics for text (or unknown) payloads:
    * [asciiPrintableRatio, whitespaceRatio, digitRatio, upperRatio,
    * order-0 entropy (bits/byte), distinctByteFrac, meanByte, length]. */
  def decodeByteStats(bytes: Array[Byte]): Array[Double] = {
    val counts = new Array[Int](256)
    var ws = 0; var digit = 0; var upper = 0; var printable = 0
    var sum = 0.0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      counts(b) += 1
      sum += b
      if (b == ' ' || b == '\t' || b == '\n' || b == '\r') ws += 1
      if (b >= '0' && b <= '9') digit += 1
      if (b >= 'A' && b <= 'Z') upper += 1
      if (b >= 32 && b < 127) printable += 1
      i += 1
    }
    val n = math.max(bytes.length, 1)
    var entropy = 0.0
    var distinct = 0
    var j = 0
    while (j < 256) {
      if (counts(j) > 0) {
        distinct += 1
        val p = counts(j).toDouble / n
        entropy -= p * math.log(p) / math.log(2)
      }
      j += 1
    }
    Array(printable.toDouble / n, ws.toDouble / n, digit.toDouble / n,
      upper.toDouble / n, entropy, distinct / 256.0, sum / n, bytes.length.toDouble)
  }

  /** Nearest-neighbor resample of a 24-bpp BMP to (outW, outH): a REAL
    * image-resize over the parsed pixel grid, emitting valid BMP bytes
    * (the media-pipeline "resize" stage, pure JVM). */
  def resizeBmp(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
    val pixelOff = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(buf.getShort(28).toInt == 24, "unsupported bpp")
    val inRow = (w * 3 + 3) / 4 * 4
    val outRow = (outW * 3 + 3) / 4 * 4
    val out = ByteBuffer.allocate(54 + outRow * outH).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + outRow * outH)
      .putInt(0).putInt(54).putInt(40).putInt(outW).putInt(outH)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(outRow * outH).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sx = x * w / outW
        val src = pixelOff + sy * inRow + sx * 3
        out.put(bytes(src)).put(bytes(src + 1)).put(bytes(src + 2))
        x += 1
      }
      var pad = outW * 3
      while (pad < outRow) { out.put(0.toByte); pad += 1 }
      y += 1
    }
    out.array()
  }

  /** Uniform frame sampling from 16-bit PCM WAV: keep every (n/outFrames)-th
    * sample and emit a valid, shorter WAV (the media-pipeline
    * "frame-sample" stage — for video this is the keyframe analog). */
  def sampleWavFrames(bytes: Array[Byte], outFrames: Int): Array[Byte] = {
    val feats = decodeWav(bytes) // validates structure
    val n = feats(2).toInt
    val take = math.min(outFrames, n)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // locate the data chunk again (decodeWav proved it exists)
    var pos = 12
    var dataOff = -1
    while (pos + 8 <= bytes.length && dataOff < 0) {
      val cid = new String(bytes, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4)
      if (cid == "data") dataOff = pos + 8
      else pos += 8 + clen + (clen & 1)
    }
    val sampleRate = feats(1).toInt
    val out = ByteBuffer.allocate(44 + take * 2).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + take * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(take * 2)
    var i = 0
    while (i < take) {
      out.putShort(buf.getShort(dataOff + (i.toLong * n / take).toInt * 2))
      i += 1
    }
    out.array()
  }

  /** Kind-dispatched decode; malformed bytes degrade to byte statistics
    * (real pipelines flag, not fail, on corrupt media). */
  def decode(kind: String, bytes: Array[Byte]): (Long, Array[Double]) = {
    val feat =
      try {
        kind match {
          case "audio/wav" => decodeWav(bytes)
          case "image/bmp" => decodeBmp(bytes)
          case _ => decodeByteStats(bytes)
        }
      } catch { case _: IllegalArgumentException => decodeByteStats(bytes) }
    (polyChecksum(bytes), feat)
  }

  // ----------------------------------------------------------------- tables

  /** Text-only media table: document text bytes as opaque blobs. At scale
    * this is a parquet/Lance-style table with a BINARY column and
    * row-group-sized blobs. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("kind"),
        col("text").cast("binary").as("media"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("lang"))

  private val wavUdf = udf((id: Long) => synthWavBytes(id))
  private val bmpUdf = udf((id: Long) => synthBmpBytes(id))

  /** Mixed-modality media table: one text/plain row per document plus a
    * synthesized-but-valid WAV and BMP row each (ids offset per modality so
    * media_id stays unique). */
  def mediaTableMultiKind(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.table(spark, dir, "documents")
    val wav = docs.select(
      (col("doc_id") + 1000000L).as("media_id"), lit("audio/wav").as("kind"),
      wavUdf(col("doc_id")).as("media"), col("lang"))
    val bmp = docs.select(
      (col("doc_id") + 2000000L).as("media_id"), lit("image/bmp").as("kind"),
      bmpUdf(col("doc_id")).as("media"), col("lang"))
    mediaTable(spark, dir).unionByName(
      wav.unionByName(bmp)
        .select(col("media_id"), col("kind"), col("media"),
          octet_length(col("media")).cast("long").as("n_bytes"), col("lang")))
  }

  /** Media transform stage (resize images, frame-sample audio, pass
    * everything else through), batched per partition — composes with
    * [[extractFeatures]] downstream exactly like a production
    * decode→transform→featurize pipeline. */
  def transformMedia(media: DataFrame, outW: Int = 4, outH: Int = 4,
                     frames: Int = 64): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val nb = r.kind match {
          case "image/bmp" => resizeBmp(r.media, outW, outH)
          case "audio/wav" => sampleWavFrames(r.media, frames)
          case _ => r.media
        }
        MediaRow(r.media_id, r.kind, nb, nb.length.toLong, r.lang)
      }
    }
  }

  /** Batched per-partition feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder/codec init would happen here
      rows.map { r =>
        val (checksum, feat) = decode(r.kind, r.media)
        MediaFeatures(r.media_id, r.kind, r.lang, r.n_bytes, checksum, feat)
      }
    }
  }
}
