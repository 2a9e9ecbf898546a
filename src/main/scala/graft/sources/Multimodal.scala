package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder charter): media blobs are opaque
  * BINARY columns with a typed metadata struct; decode / feature-extract
  * runs batched per partition so a real decoder amortizes model/codec init
  * per task, not per row — the Scala analog of a `mapInPandas` batch UDF.
  *
  * The decode step is a STUB: image/audio codecs are not available in this
  * container, so `decodeStub` derives deterministic fake features from the
  * raw bytes. The Spark-side plumbing — schema, binary handling, partition
  * batching, feature schema — is real and tested (MultimodalTest).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
      n_bytes: Long, lang: String)
  final case class MediaFeatures(media_id: Long, kind: String, lang: String,
      n_bytes: Long, checksum: Long, feature: Array[Double])

  /** Synthetic media table: document text bytes stand in for opaque blobs
    * (testdata ships no real media). At scale this is a parquet/Lance-style
    * table with a BINARY column and row-group-sized blobs. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("kind"),
        col("text").cast("binary").as("media"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("lang"))

  /** STUB decoder: a real implementation would decode image/audio frames
    * here (per-partition codec init, batched decode). The fake is
    * deterministic in the bytes so tests can golden-check the plumbing. */
  private def decodeStub(bytes: Array[Byte]): (Long, Array[Double]) = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = (checksum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val feat = new Array[Double](8)
    i = 0
    while (i < bytes.length) { feat(i % 8) += (bytes(i) & 0xff) / 255.0; i += 1 }
    (checksum, feat)
  }

  /** Batched per-partition feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of the (stubbed) decoder happens here
      rows.map { r =>
        val (checksum, feat) = decodeStub(r.media)
        MediaFeatures(r.media_id, r.kind, r.lang, r.n_bytes, checksum, feat)
      }
    }
  }
}
