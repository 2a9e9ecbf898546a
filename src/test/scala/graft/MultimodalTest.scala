package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal

/** Multimodal binary-column pipeline: real pure-JVM decoders (WAV/BMP/byte
  * stats) golden-tested on hand-built bytes, plus the Spark-side plumbing. */
class MultimodalTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WAV decoder: exact features from hand-built 16-bit PCM bytes") {
    // 4 samples at 8 kHz mono: 0, 1000, -1000, 500
    val samples = Seq[Short](0, 1000, -1000, 500)
    val buf = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(8)
    samples.foreach(buf.putShort)
    val f = Multimodal.decodeWav(buf.array())
    assert(f(0) == 1.0 && f(1) == 8000.0 && f(2) == 4.0)
    assert(f(3) == 125.0) // mean = (0+1000-1000+500)/4
    assert(math.abs(f(4) - math.sqrt((0.0 + 1000 * 1000 + 1000 * 1000 + 500 * 500) / 4)) < 1e-9)
    assert(f(5) == 1000.0) // peak
    assert(math.abs(f(6) - 2.0 / 3) < 1e-12) // crossings: 1000->-1000, -1000->500
    assert(f(7) == 4.0 / 8000)
  }

  test("BMP decoder: exact channel means from hand-built 24-bpp bytes") {
    // 2x2 bottom-up, rowLen = 8 (2 px * 3 B + 2 pad)
    val pix = Array[Byte]( // row 0 (bottom): (B,G,R)=(10,20,30),(40,50,60)
      10, 20, 30, 40, 50, 60, 0, 0,
      // row 1 (top): (70,80,90),(100,110,120)
      70, 80, 90, 100, 110, 120, 0, 0)
    val buf = java.nio.ByteBuffer.allocate(54 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + 16).putInt(0).putInt(54)
      .putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
      .put(pix)
    val f = Multimodal.decodeBmp(buf.array())
    assert(f(0) == 2.0 && f(1) == 2.0 && f(2) == 24.0)
    assert(f(3) == (10 + 40 + 70 + 100) / 4.0) // mean B
    assert(f(4) == (20 + 50 + 80 + 110) / 4.0) // mean G
    assert(f(5) == (30 + 60 + 90 + 120) / 4.0) // mean R
    assert(f(7) == 4.0)
  }

  test("BMP resize: nearest-neighbor resample emits a valid BMP with exact picked pixels") {
    val src = Multimodal.synthBmpBytes(3L) // 11x9
    val small = Multimodal.resizeBmp(src, 2, 2)
    val f = Multimodal.decodeBmp(small)
    assert(f(0) == 2.0 && f(1) == 2.0 && f(2) == 24.0 && f(7) == 4.0)
    // 1x1 resize picks source pixel (0,0) (bottom-left row): means == pixel
    val one = Multimodal.decodeBmp(Multimodal.resizeBmp(src, 1, 1))
    val id = 3L
    assert(one(3) == ((id * 31 + 0 + 0) % 256).toDouble) // B at (0,0)
    assert(one(4) == ((id * 17 + 0 + 0) % 256).toDouble) // G
    assert(one(5) == ((id * 23 + 0 + 0) % 256).toDouble) // R
  }

  test("WAV frame-sample: shorter valid WAV, rate preserved, frames uniform") {
    val src = Multimodal.synthWavBytes(5L)
    val n0 = Multimodal.decodeWav(src)(2).toInt
    val sampled = Multimodal.sampleWavFrames(src, 64)
    val f = Multimodal.decodeWav(sampled)
    assert(f(1) == 8000.0 && f(2) == 64.0)
    assert(64 < n0)
    // first kept sample is the source's first sample
    val b0 = java.nio.ByteBuffer.wrap(src).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val b1 = java.nio.ByteBuffer.wrap(sampled).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(b1.getShort(44) == b0.getShort(44))
  }

  test("transformMedia composes with extractFeatures (decode->transform->featurize)") {
    val out = Multimodal.extractFeatures(
      Multimodal.transformMedia(
        Multimodal.mediaTableMultiKind(spark, TestSpark.sf0001)).toDF())
      .collect()
    val byKind = out.groupBy(_.kind)
    byKind("image/bmp").foreach(r => assert(r.feature(0) == 4.0 && r.feature(1) == 4.0))
    byKind("audio/wav").foreach(r => assert(r.feature(2) == 64.0))
    byKind("text/plain").foreach(r => assert(r.n_bytes > 0)) // passthrough
  }

  test("synthesized fixtures decode as valid files with expected parameters") {
    val wf = Multimodal.decodeWav(Multimodal.synthWavBytes(7L))
    assert(wf(0) == 1.0 && wf(1) == 8000.0 && wf(2) == 256 + 7 * 16)
    assert(wf(5) > 10000 && wf(5) <= 12000) // sine peak near amplitude
    val bf = Multimodal.decodeBmp(Multimodal.synthBmpBytes(7L))
    assert(bf(0) == 8 + 7 % 5 && bf(1) == 6 + 7 % 4 && bf(2) == 24.0)
    // byte stats on pure ASCII text
    val tf = Multimodal.decodeByteStats("abc 123 ABC".getBytes("US-ASCII"))
    assert(tf(0) == 1.0) // all printable
    assert(math.abs(tf(2) - 3.0 / 11) < 1e-12)
    assert(tf(7) == 11.0)
  }

  test("media table: binary column round-trips the utf-8 byte length") {
    val m = Multimodal.mediaTable(spark, TestSpark.sf0001)
    val bad = m.filter(octet_length($"media") =!= $"n_bytes").count()
    assert(bad == 0)
    assert(m.count() == Tables.table(spark, TestSpark.sf0001, "documents").count())
  }

  test("feature extraction: deterministic, batched, schema intact") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, TestSpark.sf0001))
      .orderBy($"media_id").collect()
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, TestSpark.sf0001).repartition(7))
      .orderBy($"media_id").collect()
    assert(f1.map(_.media_id).toSeq == f2.map(_.media_id).toSeq)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    f1.foreach { r =>
      assert(r.feature.length == 8)
      assert(r.n_bytes > 0)
    }
  }

  test("m4 contract: changelog features == direct batch features; corpus files never re-read") {
    import graft.sources.GraftTable
    val tdir = java.nio.file.Files.createTempDirectory("graft-media-table")
      .resolve("t").toString
    val all = Multimodal.mediaTableMultiKind(spark, TestSpark.sf0001)
    GraftTable.create(spark, tdir,
      all.filter(col("media_id") % 10 =!= 0), Seq("media_id"))
    GraftTable.append(spark, tdir,
      all.filter(col("media_id") % 10 === 0), Seq("media_id"))

    val changes = GraftTable.readChanges(spark, tdir, 0, 1)
    // ingest cost tracks the batch: the changelog plans only v1's files
    val v0Files = GraftTable.manifest(tdir, 0).files.map(_.path).toSet
    assert(changes.inputFiles.nonEmpty &&
      changes.inputFiles.forall(f => !v0Files.exists(f.endsWith(_))),
      "changelog read must not touch corpus (v0) files")

    def canon(df: org.apache.spark.sql.DataFrame) =
      Multimodal.extractFeatures(df).collect()
        .map(f => (f.media_id, f.kind, f.n_bytes, f.checksum, f.feature.toSeq))
        .sortBy(_._1).toSeq
    assert(canon(changes) == canon(all.filter(col("media_id") % 10 === 0)),
      "features decoded from the blob column through the table must be " +
        "byte-identical to direct extraction")
  }

  test("format surface: parquet/csv/json/orc round-trip (SURVEY §2.8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = Tables.table(spark, TestSpark.sf0001, "customer")
    Seq("parquet", "json", "orc", "csv").foreach { fmt =>
      val path = s"$dir/$fmt"
      val w = src.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      val r = spark.read.format(fmt)
      val back = (if (fmt == "csv") r.option("header", "true").option("inferSchema", "true") else r)
        .load(path)
      assert(back.count() == src.count(), s"$fmt row count")
      val a = src.select($"c_custkey", $"c_name").orderBy($"c_custkey")
        .collect().map(_.toString).toSeq
      val b = back.select($"c_custkey".cast("long").as("c_custkey"), $"c_name")
        .orderBy($"c_custkey").collect().map(_.toString).toSeq
      assert(a == b, s"$fmt content")
    }
  }

  /** m5: perceptual dedup — planted variants recovered exactly, unrelated
    * content keeps a wide Hamming margin, and the pair join is a banded
    * equi-join (never a cartesian). */
  test("m5 contract: planted image/audio near-dups recovered exactly, no false pairs") {
    import org.apache.spark.sql.functions._
    val pairs = Multimodal.nearDupMediaPairs(
        Multimodal.mediaDedupTable(spark, TestSpark.sf001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // fixture: sf0.01 has doc_ids 0..499; every 7th id (>0) carries a
    // variant of id-1 → planted pairs (id-1, id) per kind
    val planted = (1 to 499).filter(i => i % 7 == 0).map(i => (i - 1, i))
    val expImg = planted.map { case (a, b) => (2000000L + a, 2000000L + b) }.toSet
    val expWav = planted.map { case (a, b) => (1000000L + a, 1000000L + b) }.toSet
    val gotImg = pairs.filter(_._1 == "image/bmp").map(p => (p._2, p._3)).toSet
    val gotWav = pairs.filter(_._1 == "audio/wav").map(p => (p._2, p._3)).toSet
    assert(gotImg == expImg, "image pairs must be exactly the planted corruption copies")
    assert(gotWav == expWav, "audio pairs must be exactly the re-leveled copies")
    // the re-leveled audio copy hashes IDENTICALLY (scale-invariance)
    assert(pairs.filter(_._1 == "audio/wav").forall(_._4 == 0))
    // one corrupted pixel moves the image dHash by at most 2 bits
    assert(pairs.filter(_._1 == "image/bmp").forall(_._4 <= 2))
  }

  test("m5 margins: unrelated noise media sit far outside tau; hashes deterministic") {
    val imgHashes = (0 until 30).filterNot(i => i % 7 == 0 && i > 0)
      .map(i => Multimodal.dHashBmp(Multimodal.synthNoiseBmpBytes(i.toLong)))
    val wavHashes = (0 until 30).filterNot(i => i % 7 == 0 && i > 0)
      .map(i => Multimodal.envHashWav(Multimodal.synthNoiseWavBytes(i.toLong)))
    def minHamming(hs: Seq[Long]): Int =
      (for { i <- hs.indices; j <- (i + 1) until hs.size }
        yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minHamming(imgHashes) > 10, "unrelated images must sit far outside tau=3")
    assert(minHamming(wavHashes) > 10, "unrelated audio must sit far outside tau=3")
    // determinism: same bytes, same fingerprint
    assert(Multimodal.dHashBmp(Multimodal.synthNoiseBmpBytes(5L)) == imgHashes(5))
    assert(Multimodal.envHashWav(Multimodal.synthNoiseWavBytes(5L)) == wavHashes(5))
    // scale invariance of the envelope hash, directly
    assert(Multimodal.envHashWav(Multimodal.synthNoiseWavBytes(11L, 0.9)) ==
      Multimodal.envHashWav(Multimodal.synthNoiseWavBytes(11L)))
  }

  test("m5 robustness: corrupt media degrades to the byte fallback, never kills the job") {
    // valid 54-byte BMP header, truncated pixel data: passes every header
    // require(), then indexes past the array — must degrade, not throw
    val truncated = Multimodal.synthNoiseBmpBytes(3L).take(80)
    assert(Multimodal.perceptualHash("image/bmp", truncated) ==
      Multimodal.simHashBytes(truncated))
    // negative height steers the pixel offset arithmetic negative
    val negH = Multimodal.synthNoiseBmpBytes(3L).clone()
    java.nio.ByteBuffer.wrap(negH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -16)
    assert(Multimodal.perceptualHash("image/bmp", negH) ==
      Multimodal.simHashBytes(negH))
    // WAV with its data chunk cut mid-sample
    val cutWav = Multimodal.synthNoiseWavBytes(3L).take(60)
    Multimodal.perceptualHash("audio/wav", cutWav) // must not throw
    // payloads too short to shingle must NOT all collapse to one hash
    val tiny = Seq(Array[Byte](), Array[Byte](1), Array[Byte](2),
      Array[Byte](1, 2), Array[Byte](2, 1)).map(Multimodal.simHashBytes)
    assert(tiny.distinct.size == tiny.size,
      "distinct tiny payloads must fingerprint distinctly (no Hamming-0 false dups)")
    assert(Multimodal.simHashBytes(Array[Byte](1, 2)) ==
      Multimodal.simHashBytes(Array[Byte](1, 2)))
    // negative RIFF chunk length: clen = -8 makes the naive chunk-walk step
    // ZERO — an infinite loop no NonFatal catch can recover. Must fail fast
    // in the decoder so the degrade paths trigger instead of hanging.
    val badChunk = Multimodal.synthNoiseWavBytes(3L).clone()
    java.nio.ByteBuffer.wrap(badChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8) // fmt chunk length
    intercept[IllegalArgumentException] { Multimodal.decodeWav(badChunk) }
    assert(Multimodal.perceptualHash("audio/wav", badChunk) ==
      Multimodal.simHashBytes(badChunk))
    // decode() degrades the same way (byte stats), never loops
    val (_, feats) = Multimodal.decode("audio/wav", badChunk)
    assert(feats.nonEmpty)
  }

  test("m5 plan: the candidate join is a banded equi-join, never a cartesian") {
    val pairs = Multimodal.nearDupMediaPairs(
      Multimodal.mediaDedupTable(spark, TestSpark.sf0001))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"banded candidate generation must plan as an equi-join:\n$plan")
  }
}
