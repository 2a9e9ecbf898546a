package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal

/** Plumbing tests for the multimodal binary-column pipeline (decode itself
  * is a documented stub). */
class MultimodalTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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
}
