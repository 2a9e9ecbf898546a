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
  /** Decoded-fingerprint frames of [[nearDupMediaPairs]], keyed by the
    * input's canonicalized analyzed plan (structural equality — no hash
    * collisions): bounded LRU, unpersist-on-evict. Same memoization
    * contract as [[graft.Tables]]: the data UNDER an input is immutable
    * for the session — after rewriting files in place, call
    * [[resetCaches]] (or `Memo.clearAll()`). A lost cold-key race leaks
    * only a CacheManager METADATA entry, not executor storage: the
    * loser's persist is lazy and its frame is discarded unmaterialized. */
  private val hashedMemo = new graft.util.Memo[
    (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    DataFrame]()(graft.util.Memo.unpersistDf)

  /** Drop the memoized fingerprint frames, releasing executor storage. */
  def resetCaches(): Unit = hashedMemo.clear()

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
      // A corrupt/crafted negative chunk length would make the position step
      // zero or negative and hang the executor; fail fast so callers'
      // degrade paths (simHashBytes fallback) can take over.
      require(clen >= 0, s"bad RIFF chunk length $clen")
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
      require(clen >= 0, s"bad RIFF chunk length $clen") // see decodeWav
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

  // ------------------------------------------------------ perceptual hashes

  /** 64-bit image difference hash (dHash): nearest-neighbor sample the
    * parsed 24-bpp pixel grid to 9×8 luma, bit (x,y) = gray(x+1,y) >
    * gray(x,y). Robust to re-encoding and small corruptions (one changed
    * pixel flips ≤2 bits), discriminative on unrelated content (~32-bit
    * expected Hamming distance) — the standard image-dedup fingerprint. */
  def dHashBmp(bytes: Array[Byte]): Long = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
    val pixelOff = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(buf.getShort(28).toInt == 24, "unsupported bpp")
    val rowLen = (w * 3 + 3) / 4 * 4
    def gray(gx: Int, gy: Int): Double = {
      val sx = gx * w / 9
      val sy = gy * h / 8
      val p = pixelOff + sy * rowLen + sx * 3
      0.114 * (bytes(p) & 0xff) + 0.587 * (bytes(p + 1) & 0xff) +
        0.299 * (bytes(p + 2) & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit audio envelope hash: mean |amplitude| over 65 equal time
    * buckets of the PCM stream, bit i = env(i+1) > env(i). Comparisons are
    * AMPLITUDE-SCALE-INVARIANT (a re-leveled copy hashes identically) and
    * robust to a few perturbed samples; unrelated signals land ~32 bits
    * apart — the audio-dedup fingerprint. */
  def envHashWav(bytes: Array[Byte]): Long = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val feats = decodeWav(bytes) // validates structure, finds sample count
    val n = feats(2).toInt
    var pos = 12
    var dataOff = -1
    while (pos + 8 <= bytes.length && dataOff < 0) {
      val cid = new String(bytes, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4)
      require(clen >= 0, s"bad RIFF chunk length $clen") // see decodeWav
      if (cid == "data") dataOff = pos + 8
      else pos += 8 + clen + (clen & 1)
    }
    val env = new Array[Double](65)
    val cnt = new Array[Int](65)
    var i = 0
    while (i < n) {
      val b = (i.toLong * 65 / math.max(n, 1)).toInt
      env(b) += math.abs(buf.getShort(dataOff + i * 2).toDouble)
      cnt(b) += 1
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      val a = if (cnt(j) == 0) 0.0 else env(j) / cnt(j)
      val c = if (cnt(j + 1) == 0) 0.0 else env(j + 1) / cnt(j + 1)
      if (c > a) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** 64-bit byte-level SimHash (4-byte shingles, splitmix-mixed): the
    * text/unknown-payload member of the perceptual family — small edits
    * move few bits, unrelated payloads land ~32 apart. Payloads too short
    * to shingle (< 4 bytes) hash their exact content instead: with zero
    * votes every such payload would land on 0L and every pair of tiny
    * unrelated blobs would report as a Hamming-0 duplicate. */
  def simHashBytes(bytes: Array[Byte]): Long = {
    if (bytes.length < 4) {
      var z = bytes.length.toLong
      var i = 0
      while (i < bytes.length) { z = (z << 8) | (bytes(i) & 0xffL); i += 1 }
      return mix64(z)
    }
    val votes = new Array[Int](64)
    var i = 0
    val end = math.max(bytes.length - 3, 0)
    while (i < end) {
      var z = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      // splitmix64 finalizer
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      var b = 0
      while (b < 64) {
        if (((z >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) hash |= 1L << b; b += 1 }
    hash
  }

  /** Kind-dispatched 64-bit perceptual fingerprint. Malformed media of any
    * shape degrades to the byte SimHash — not just declared-invalid headers
    * (IllegalArgumentException) but also bytes that pass the header checks
    * and then index out of bounds (truncated pixel/sample data, a negative
    * dimension steering the offset arithmetic): a corrupt blob must flag as
    * its byte-level self, never kill the job ([[decode]]'s rule). */
  def perceptualHash(kind: String, bytes: Array[Byte]): Long =
    try {
      kind match {
        case "image/bmp" => dHashBmp(bytes)
        case "audio/wav" => envHashWav(bytes)
        case _ => simHashBytes(bytes)
      }
    } catch { case scala.util.control.NonFatal(_) => simHashBytes(bytes) }

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

  // -------------------------------------------------- media-dedup fixtures

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 16×16 24-bpp BMP with id-seeded NOISE pixels (splitmix-mixed):
    * uncorrelated across ids, so unrelated dHashes land ~32 bits apart.
    * (The gradient fixture [[synthBmpBytes]] has monotone luma — under a
    * difference hash EVERY gradient image would collide; a dedup fixture
    * needs discriminative content.) */
  def synthNoiseBmpBytes(id: Long): Array[Byte] = {
    val w = 16; val h = 16
    val rowLen = (w * 3 + 3) / 4 * 4
    val buf = ByteBuffer.allocate(54 + rowLen * h).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowLen * h)
      .putInt(0).putInt(54).putInt(40).putInt(w).putInt(h)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(rowLen * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val z = mix64(id * 65536L + y * 16L + x)
        buf.put((z & 0xff).toByte).put(((z >>> 8) & 0xff).toByte)
          .put(((z >>> 16) & 0xff).toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < rowLen) { buf.put(0.toByte); pad += 1 }
      y += 1
    }
    buf.array()
  }

  /** 512-sample id-seeded noise PCM WAV, amplitude-scaled by `scale`:
    * [[envHashWav]] compares bucket means, so a re-leveled (`scale < 1`)
    * copy hashes IDENTICALLY — the planted audio near-dup. */
  def synthNoiseWavBytes(id: Long, scale: Double = 1.0): Array[Byte] = {
    val n = 512
    val buf = ByteBuffer.allocate(44 + n * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort)
      .putInt(8000).putInt(16000)
      .putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      val z = mix64(id * 4096L + i)
      val s = ((z % 20000L).toDouble * scale).toShort
      buf.putShort(s)
      i += 1
    }
    buf.array()
  }

  /** Copy with the (0,0) pixel re-painted — the small-corruption variant:
    * one changed source pixel moves the 9×8 dHash by ≤2 bits. */
  def corruptOnePixel(bmp: Array[Byte]): Array[Byte] = {
    val out = bmp.clone()
    val pixelOff = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN).getInt(10)
    out(pixelOff) = (~out(pixelOff)).toByte
    out(pixelOff + 1) = (~out(pixelOff + 1)).toByte
    out(pixelOff + 2) = (~out(pixelOff + 2)).toByte
    out
  }

  private val noiseBmpUdf = udf((id: Long, variantOf: Long) =>
    if (variantOf >= 0) corruptOnePixel(synthNoiseBmpBytes(variantOf))
    else synthNoiseBmpBytes(id))
  private val noiseWavUdf = udf((id: Long, variantOf: Long) =>
    if (variantOf >= 0) synthNoiseWavBytes(variantOf, scale = 0.9)
    else synthNoiseWavBytes(id))

  /** Media-dedup fixture: one noise BMP + one noise WAV per document;
    * every 7th id's media is a PLANTED NEAR-DUP of id−1's — the image a
    * one-pixel corruption, the audio a 0.9× re-leveled copy (the two
    * re-encode classes perceptual hashing exists to catch, which
    * byte-exact hashing cannot). */
  def mediaDedupTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val vOf = when(col("doc_id") % 7 === 0 && col("doc_id") > 0,
      col("doc_id") - 1).otherwise(lit(-1L))
    val bmp = docs.select((col("doc_id") + 2000000L).as("media_id"),
      lit("image/bmp").as("kind"), noiseBmpUdf(col("doc_id"), vOf).as("media"),
      col("lang"))
    val wav = docs.select((col("doc_id") + 1000000L).as("media_id"),
      lit("audio/wav").as("kind"), noiseWavUdf(col("doc_id"), vOf).as("media"),
      col("lang"))
    bmp.unionByName(wav)
      .select(col("media_id"), col("kind"), col("media"),
        octet_length(col("media")).cast("long").as("n_bytes"), col("lang"))
  }

  /** Perceptual near-dup pairs over a media frame — the media member of
    * the dedup family (lexical d3, semantic d15, spatial t28): 64-bit
    * kind-dispatched fingerprints ([[perceptualHash]]), candidates by
    * 4×16-bit BAND equi-join, exact Hamming ≤ τ verify.
    *
    * For τ ≤ 3 the banding is EXACT by pigeonhole — ≤3 differing bits
    * touch ≤3 of the 4 bands, so every true pair shares at least one
    * identical band; recall is 1.0, not probabilistic (unlike MinHash).
    * Scale shape: one linear decode pass (blobs never shuffle — 8 bytes
    * of hash per item leave the scan), candidates from per-(kind, band,
    * key) buckets — at 10⁹ images the pair space is Σ bucket² over
    * 65 536-way partitioned buckets, never n²; the verify is one codegen
    * `bit_count` on the joined longs. */
  def nearDupMediaPairs(media: DataFrame, tau: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(tau <= 3, s"tau=$tau breaks the 4-band pigeonhole exactness (max 3)")
    // persisted + MEMOIZED so the self-join's two sides — and repeated
    // invocations on the same input — share ONE decode pass (the blob
    // scan + fingerprint is the dominant cost; what survives is the
    // ~20-bytes-per-item "only hashes leave the scan" projection). The
    // memo key is the input's CANONICALIZED analyzed plan, not the
    // DataFrame object: the typed mapPartitions below embeds a fresh
    // lambda per call, so without the memo every invocation would persist
    // a brand-new never-reused frame (measured 4× slower over bench's
    // repeat passes, accumulating storage until LRU eviction).
    def fingerprint() = media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => (r.media_id, r.kind, perceptualHash(r.kind, r.media)))
    }.toDF("media_id", "kind", "phash")
    val canon = media.queryExecution.analyzed.canonicalized
    // a driver-local input (LocalRelation) would pin its full blob payload
    // inside the memo KEY — and is cheap to re-decode anyway: skip the memo
    val hashed =
      if (canon.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
        fingerprint()
      else Multimodal.hashedMemo.getOrElseUpdate((spark, canon)) {
        fingerprint()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    val banded = hashed.select(col("media_id"), col("kind"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey",
        expr("shiftrightunsigned(phash, band * 16)").bitwiseAND(lit(0xffffL)))
    val l = banded.select(col("kind"), col("band"), col("bkey"),
      col("media_id").as("id1"), col("phash").as("h1"))
    val r = banded.select(col("kind"), col("band"), col("bkey"),
      col("media_id").as("id2"), col("phash").as("h2"))
    l.join(r, Seq("kind", "band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("kind"), col("id1"), col("id2"), col("h1"), col("h2"))
      .distinct() // a pair may share up to 4 bands — count it once
      .filter(expr(s"bit_count(h1 ^ h2) <= $tau"))
      .select(col("kind"), col("id1"), col("id2"),
        expr("bit_count(h1 ^ h2)").cast("int").as("hamming"))
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
