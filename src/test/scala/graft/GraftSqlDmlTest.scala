package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions
import graft.sources.GraftTable

/** Round-9 directive 6: SQL DML over graft-table views (DELETE/MERGE via
  * the injected analyzer rule) and the manifest-driven sizeInBytes that
  * lets a small table auto-broadcast in joins. */
class GraftSqlDmlTest extends AnyFunSuite {

  /** Extensions-enabled session (GraftExtensionsTest pattern): getOrCreate
    * would return TestSpark's session, so clear the default first. */
  private lazy val spark: SparkSession = {
    val prev = TestSpark.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-dml-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(prev)
    SparkSession.setActiveSession(prev)
    s
  }

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-dml-$tag").resolve("t").toString

  private def mkTable(tag: String, n: Int = 200): String = {
    val tdir = freshDir(tag)
    val df = spark.range(0, n).select(
      col("id").as("doc_id"),
      concat(lit("src"), col("id") % 5).as("source"),
      (col("id") * 10).as("score"))
    GraftTable.create(spark, tdir, df, Seq("doc_id"))
    tdir
  }

  test("manifest sizeInBytes: small graft-table view auto-broadcasts; estimate tracks file bytes") {
    val tdir = mkTable("size", n = 50)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dim_v USING `graft-table` OPTIONS (path '$tdir')")
    val est = spark.table("dim_v").queryExecution.optimizedPlan.stats.sizeInBytes
    val onDisk = GraftTable.manifest(tdir, 0).files.map(_.bytes).sum
    assert(onDisk > 0 && est == onDisk,
      s"estimate must equal the manifest byte sum: est=$est disk=$onDisk")

    // a fact×dim join picks BroadcastHashJoin with the graft view as the
    // broadcast side — no hint, default 10 MB threshold
    val fact = spark.range(0, 10000).select(col("id").as("doc_id"), (col("id") % 7).as("w"))
    fact.createOrReplaceTempView("fact_v")
    val joined = spark.sql(
      "SELECT f.doc_id, d.score, f.w FROM fact_v f JOIN dim_v d ON f.doc_id = d.doc_id")
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"small table must broadcast:\n$phys")
    assert(joined.count() == 50)
  }

  test("DELETE FROM view routes to the copy-on-write delete; time travel keeps history") {
    val tdir = mkTable("del")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW del_v USING `graft-table` OPTIONS (path '$tdir')")
    spark.sql("DELETE FROM del_v WHERE source = 'src3' OR doc_id >= 190")
    // the live view sees the mutation (head resolves per scan)
    assert(spark.table("del_v").filter(col("source") === "src3").count() == 0)
    assert(spark.table("del_v").count() == 200 - 40 - 8) // 40 src3 rows + 8 non-src3 in 190..199
    // one delete commit; v0 unchanged
    val hist = GraftTable.history(spark, tdir).orderBy(col("version"))
      .select("version", "op").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(hist.toSeq == Seq((0, "create"), (1, "delete")))
    assert(GraftTable.read(spark, tdir, Some(0)).count() == 200)
    // rewritten files keep their stats bounds (derived from the head manifest)
    assert(GraftTable.manifest(tdir, 1).files.forall(_.stats.contains("doc_id")))
  }

  test("UPDATE view routes to copy-on-write updateWhere; old-row semantics; changelog-silent") {
    val tdir = mkTable("upd")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW upd_v USING `graft-table` OPTIONS (path '$tdir')")
    // swap assignment: both values must evaluate against the ORIGINAL row
    spark.sql("UPDATE upd_v SET doc_id = score, score = doc_id WHERE source = 'src2'")
    val after = spark.table("upd_v")
    assert(after.count() == 200, "UPDATE never changes cardinality")
    // src2 rows had doc_id = k, score = 10k — now doc_id = 10k, score = k
    val swapped = after.filter(col("source") === "src2")
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(swapped.length == 40 && swapped.forall { case (d, s) => d == s * 10 },
      "sequential assignment would have collapsed both columns to the same value")
    assert(after.filter(col("source") =!= "src2" && col("doc_id") * 10 =!= col("score"))
      .count() == 0, "non-matching rows untouched")
    // one changelog-invisible update commit; v0 time travel intact
    val hist = GraftTable.history(spark, tdir).orderBy(col("version"))
      .select("version", "op", "n_added_files").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(hist.toSeq == Seq((0, "create", hist(0)._3), (1, "update", 0)))
    assert(GraftTable.readChanges(spark, tdir, 0, 1).count() == 0,
      "append-mode changelog must not re-emit rewritten rows")
    assert(GraftTable.read(spark, tdir, Some(0))
      .filter(col("source") === "src2" && col("doc_id") > 200).count() == 0)
  }

  test("SQL DELETE/UPDATE write the change feed when the session enables cdc") {
    val tdir = mkTable("cdc", n = 40)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdc_v USING `graft-table` OPTIONS (path '$tdir')")
    spark.conf.set("spark.graft.cdc", "true")
    try {
      spark.sql("DELETE FROM cdc_v WHERE doc_id < 4")                        // v1
      spark.sql("UPDATE cdc_v SET score = score + 100 WHERE doc_id >= 38")   // v2
    } finally spark.conf.unset("spark.graft.cdc")
    val cdc = GraftTable.readCdc(spark, tdir, 0, 2)
    assert(cdc.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("delete" -> 4L, "update_preimage" -> 2L, "update_postimage" -> 2L))
  }

  test("MERGE INTO view routes to the one-commit upsert; non-star shapes refuse") {
    val tdir = mkTable("merge")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW m_v USING `graft-table` OPTIONS (path '$tdir')")
    spark.range(195, 210).select(
        col("id").as("doc_id"), lit("fresh").as("source"), lit(-1L).as("score"))
      .createOrReplaceTempView("m_src")
    spark.sql(
      """MERGE INTO m_v t USING m_src s ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.table("m_v")
    assert(after.count() == 210)
    assert(after.filter(col("source") === "fresh").count() == 15, "5 replaced + 10 inserted")
    assert(after.filter(col("doc_id") === 197 && col("score") === -1L).count() == 1)
    val hist = GraftTable.history(spark, tdir).select("op").collect().map(_.getString(0))
    assert(hist.toSeq == Seq("create", "upsert"), "ONE atomic merge commit")

    // refusal: a matched-only merge is not an upsert and must not become one
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO m_v t USING m_src s ON t.doc_id = s.doc_id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("keyed whole-row upsert shape"), e.getMessage)
  }

  test("MERGE refuses duplicate source keys; transient zero-file state keeps the stats declaration") {
    val tdir = mkTable("mdup", n = 30)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW md_v USING `graft-table` OPTIONS (path '$tdir')")
    // SQL MERGE contract: two source rows for one target key must RAISE,
    // never silently land duplicate rows in a keyed table
    spark.range(0, 2).selectExpr("5L AS doc_id", "'x' AS source", "id AS score")
      .createOrReplaceTempView("md_src")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO md_v USING md_src ON md_v.doc_id = md_src.doc_id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("multiple rows") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple rows")), e.getMessage)
    assert(spark.table("md_v").filter(col("doc_id") === 5L).count() == 1)

    // DELETE matching every row leaves a FILES-LESS snapshot; the stats
    // declaration must survive it — later writes stay prunable
    spark.sql("DELETE FROM md_v")
    assert(spark.table("md_v").count() == 0)
    assert(GraftTable.statsColsOf(tdir) == Seq("doc_id"),
      "a transient empty state must not erase the skipping declaration")
    spark.range(0, 10).selectExpr("id AS doc_id", "'y' AS source", "id AS score")
      .write.format("graft-table").option("path", tdir).mode("append").save()
    val head = GraftTable.currentVersion(tdir).get
    assert(GraftTable.manifest(tdir, head).files.forall(_.stats.contains("doc_id")),
      "post-empty writes must carry the recovered stats bounds")
  }

  test("DML on a versionAsOf-pinned view refuses: snapshots are immutable") {
    val tdir = mkTable("pin2")
    GraftTable.append(spark, tdir,
      spark.range(200, 220).select(col("id").as("doc_id"),
        lit("srcX").as("source"), (col("id") * 10).as("score")), Seq("doc_id"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW pin_v USING `graft-table` " +
      s"OPTIONS (path '$tdir', versionAsOf '0')")
    val e = intercept[Exception] { spark.sql("DELETE FROM pin_v WHERE doc_id = 0") }
    assert(e.getMessage.contains("snapshots are immutable"), e.getMessage)
    assert(GraftTable.read(spark, tdir).count() == 220, "nothing mutated")
  }
}
