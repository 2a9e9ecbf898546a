package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Change data feed (GraftTable.readCdc): where the append-mode changelog
  * carries only arrivals, the CDC feed also carries removals and updates —
  * written as a per-commit sidecar of exactly the changed rows when
  * `spark.graft.cdc=true`, synthesized from manifest file diffs where a
  * sidecar is unnecessary (pure appends, overwrite/restore), and REFUSING
  * where neither exists (a delete written without CDC cannot be replayed).
  * The consumer contract under test: folding the feed over a downstream
  * copy reproduces the table head exactly — deletes included. */
class GraftCdcTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-cdc-$tag").resolve("t").toString

  private def withCdc[A](body: => A): A = {
    spark.conf.set("spark.graft.cdc", "true")
    try body finally spark.conf.unset("spark.graft.cdc")
  }

  private def rows(from: Long, n: Long, src: String) =
    spark.range(from, from + n).select(col("id").as("doc_id"),
      lit(src).as("source"), (col("id") * 10).as("score"))

  test("delete/update/upsert record exact sidecars; appends synthesize inserts; feed folds to the head") {
    val tdir = freshDir("fold")
    GraftTable.create(spark, tdir, rows(0, 100, "s0"), Seq("doc_id"))          // v0
    GraftTable.append(spark, tdir, rows(100, 20, "s1"), Seq("doc_id"))         // v1
    withCdc {
      GraftTable.delete(spark, tdir, col("doc_id") < 10, Seq("doc_id"))        // v2
      GraftTable.updateWhere(spark, tdir, col("source") === "s1",
        Seq("score" -> (col("score") + 1)), Seq("doc_id"))                     // v3
      GraftTable.upsert(spark, tdir, "doc_id",
        rows(115, 10, "s2"), Seq("doc_id"))                                    // v4: 5 matched, 5 new
    }

    val cdc = GraftTable.readCdc(spark, tdir, 0, 4).cache()
    // v1 append: 20 inserts synthesized from arrival files, no sidecar
    assert(GraftTable.manifest(tdir, 1).cdcFiles.isEmpty)
    assert(cdc.filter(col("_commit_version") === 1)
      .agg(count(lit(1)), sum(when(col("_change_type") === "insert", 1).otherwise(0)))
      .collect().head.toSeq == Seq(20L, 20L))
    // v2 delete: exactly the 10 removed rows, type=delete, from the sidecar
    assert(GraftTable.manifest(tdir, 2).cdcFiles.nonEmpty)
    val del = cdc.filter(col("_commit_version") === 2)
    assert(del.agg(count(lit(1))).collect().head.getLong(0) == 10)
    assert(del.filter(col("_change_type") =!= "delete").count() == 0)
    assert(del.select("doc_id").collect().map(_.getLong(0)).toSet == (0L until 10L).toSet)
    // v3 update: 20 preimages with old scores + 20 postimages with new
    val upd = cdc.filter(col("_commit_version") === 3)
    assert(upd.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("update_preimage" -> 20L, "update_postimage" -> 20L))
    assert(upd.filter(col("_change_type") === "update_postimage")
      .filter(col("score") =!= col("doc_id") * 10 + 1).count() == 0)
    assert(upd.filter(col("_change_type") === "update_preimage")
      .filter(col("score") =!= col("doc_id") * 10).count() == 0)
    // v4 upsert: keys 115..119 matched (pre+post), 120..124 inserted
    val ups = cdc.filter(col("_commit_version") === 4)
    assert(ups.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("update_preimage" -> 5L, "update_postimage" -> 5L, "insert" -> 5L))
    assert(ups.filter(col("_change_type") === "insert")
      .select("doc_id").collect().map(_.getLong(0)).toSet == (120L to 124L).toSet)

    // THE consumer contract: folding the feed over the v0 snapshot
    // reproduces the head exactly — deletes and updates included
    val v0 = GraftTable.read(spark, tdir, Some(0))
    val inserts = cdc.filter(col("_change_type").isin("insert", "update_postimage"))
      .select("doc_id", "source", "score")
    val dels = cdc.filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col("doc_id"), col("source"), col("score"))
    val folded = v0.unionByName(inserts).exceptAll(dels)
    val head = GraftTable.read(spark, tdir)
    assert(folded.exceptAll(head).count() == 0 && head.exceptAll(folded).count() == 0,
      "replaying the CDC feed must reproduce the table head exactly")
    cdc.unpersist()
  }

  test("overwrite synthesizes delete(old)+insert(new) from the file diff; changelog untouched by CDC") {
    val tdir = freshDir("ovw")
    GraftTable.create(spark, tdir, rows(0, 50, "s0"), Seq("doc_id"))
    GraftTable.overwrite(spark, tdir, rows(500, 5, "sY"), Seq("doc_id"))
    val cdc = GraftTable.readCdc(spark, tdir, 0, 1)
    assert(cdc.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("delete" -> 50L, "insert" -> 5L))
    // no sidecar was needed — the diff reads the replaced files in place
    assert(GraftTable.manifest(tdir, 1).cdcFiles.isEmpty)
    // the append-mode changelog is unchanged by CDC existing
    assert(GraftTable.readChanges(spark, tdir, 0, 1).count() == 5)
  }

  test("streaming change feed: backfill inserts, per-commit changes with types/versions, refusal on non-CDC delete") {
    val tdir = freshDir("stream")
    GraftTable.create(spark, tdir, rows(0, 100, "s0"), Seq("doc_id"))          // v0
    val q = spark.readStream.format("graft-table").option("path", tdir)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("cdc_feed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val t = spark.table("cdc_feed")
      assert(t.count() == 100 &&
        t.filter(col("_change_type") === "insert" && col("_commit_version") === 0)
          .count() == 100,
        "backfill = the pinned snapshot as inserts at its version")

      spark.conf.set("spark.graft.cdc", "true")
      try {
        GraftTable.delete(spark, tdir, col("doc_id") < 10, Seq("doc_id"))      // v1
        GraftTable.updateWhere(spark, tdir, col("doc_id") >= 95,
          Seq("score" -> (col("score") + 1)), Seq("doc_id"))                   // v2
      } finally spark.conf.unset("spark.graft.cdc")
      GraftTable.append(spark, tdir, rows(200, 20, "s1"), Seq("doc_id"))       // v3
      GraftTable.compact(spark, tdir, targetFiles = 1, Seq("doc_id"))          // v4
      q.processAllAvailable()

      val byCommit = spark.table("cdc_feed")
        .groupBy(col("_commit_version"), col("_change_type")).count().collect()
        .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
      assert(byCommit == Map(
        (0, "insert") -> 100L, (1, "delete") -> 10L,
        (2, "update_preimage") -> 5L, (2, "update_postimage") -> 5L,
        (3, "insert") -> 20L),
        s"feed per (commit, type) drifted: $byCommit — compact must emit nothing")
      // the stream ≡ the batch feed over the same range (tail portion)
      val streamTail = spark.table("cdc_feed").filter(col("_commit_version") > 0)
        .select("doc_id", "score", "_change_type", "_commit_version")
      val batchFeed = GraftTable.readCdc(spark, tdir, 0, 4)
        .select("doc_id", "score", "_change_type", "_commit_version")
      assert(streamTail.exceptAll(batchFeed).count() == 0 &&
        batchFeed.exceptAll(streamTail).count() == 0,
        "streaming feed must equal the batch feed row-for-row")

      // a mutation written without CDC fails the stream with the refusal
      GraftTable.delete(spark, tdir, col("doc_id") === 50L, Seq("doc_id"))     // v5, no CDC
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("without CDC") ||
        Option(e.getCause).exists(_.getMessage.contains("without CDC")),
        s"stream must refuse, got: ${e.getMessage}")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS cdc_feed") }
  }

  test("cdcMirrorInto replicates a mutating table into a mirror, purges included, in source order") {
    val tdir = freshDir("src")
    val mdir = freshDir("mirror")
    GraftTable.create(spark, tdir, rows(0, 60, "s0"), Seq("doc_id"))
    val q = spark.readStream.format("graft-table").option("path", tdir)
      .option("readChangeFeed", "true").load()
      .writeStream.foreachBatch(GraftTable.cdcMirrorInto(mdir, "doc_id", "mir", Seq("doc_id")))
      .start()
    try {
      q.processAllAvailable()
      assert(GraftTable.read(spark, mdir).count() == 60)

      // one drained batch spanning several commits, including an
      // insert-then-delete of the SAME key — order must net to absent
      withCdc {
        GraftTable.append(spark, tdir, rows(100, 5, "s1"), Seq("doc_id"))      // v1: +100..104
        GraftTable.delete(spark, tdir, col("doc_id") === 102L, Seq("doc_id"))  // v2: -102
        GraftTable.upsert(spark, tdir, "doc_id", rows(58, 4, "s2"), Seq("doc_id")) // v3: 58,59 replaced; 60,61 new
      }
      q.processAllAvailable()
      val src = GraftTable.read(spark, tdir)
      val mir = GraftTable.read(spark, mdir)
      assert(mir.exceptAll(src).count() == 0 && src.exceptAll(mir).count() == 0,
        "mirror must equal the source head after a multi-commit batch")
      assert(mir.filter(col("doc_id") === 102L).count() == 0,
        "insert-then-delete in one batch must net to absent")

      // replayed version skips: the source version is the idempotence token
      assert(GraftTable.lastTxn(mdir, "mir").contains(3L))
    } finally q.stop()
  }

  test("feed edges: replay-from-inception, metadata filterEq refusal, missing-table fail-fast, offset mode marker") {
    val tdir = freshDir("edges")
    GraftTable.create(spark, tdir, rows(0, 30, "s0"), Seq("doc_id"))
    withCdc { GraftTable.delete(spark, tdir, col("doc_id") < 5, Seq("doc_id")) }
    // fromV = -1 replays from inception: the create commit's inserts surface
    val feed = GraftTable.readCdc(spark, tdir, -1, 1)
    assert(feed.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("insert" -> 30L, "delete" -> 5L))
    assert(feed.filter(col("_commit_version") === 0).count() == 30)

    // the scan builder runs at query START (load() is lazy): drive each
    // refusal through an actual started query
    def startFails(df: org.apache.spark.sql.DataFrame, needle: String): Unit = {
      val e = intercept[Exception] {
        val q = df.writeStream.format("noop")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)), s"wanted '$needle' in ${msgs(e)}")
    }
    // filterEq on a stamped metadata column would silently drop
    // synthesized rows — it must refuse up front
    startFails(spark.readStream.format("graft-table").option("path", tdir)
      .option("readChangeFeed", "true")
      .option("filterEq", "_change_type=insert").load(), "metadata column")
    // a missing table must fail the stream fast, not run forever empty
    startFails(spark.readStream.format("graft-table")
      .option("path", "/tmp/graft-no-such-table").load(), "no graft table")

    // split offsets carry their mode and round-trip it; whole-commit
    // offsets stay the mode-independent plain int
    import graft.sources.GraftStreamOffset
    val split = GraftStreamOffset(4, -1, 2, cdc = true)
    assert(GraftStreamOffset.parse(split.json) == split)
    val legacy = GraftStreamOffset.parse("""{"v":4,"idx":2}""")
    assert(!legacy.cdc && legacy.v == 4 && legacy.idx == 2)
    assert(GraftStreamOffset.parse("7") == GraftStreamOffset(7))
  }

  test("a delete written WITHOUT cdc refuses to serve the feed; vacuum keeps retained sidecars") {
    val tdir = freshDir("refuse")
    GraftTable.create(spark, tdir, rows(0, 30, "s0"), Seq("doc_id"))
    GraftTable.delete(spark, tdir, col("doc_id") < 5, Seq("doc_id")) // no CDC
    val e = intercept[IllegalStateException] {
      GraftTable.readCdc(spark, tdir, 0, 1).count()
    }
    assert(e.getMessage.contains("without CDC"), e.getMessage)

    // sidecars survive a vacuum that retains their version...
    withCdc { GraftTable.delete(spark, tdir, col("doc_id") >= 25, Seq("doc_id")) } // v2
    val sidecars = GraftTable.manifest(tdir, 2).cdcFiles.map(_.path)
    assert(sidecars.nonEmpty)
    GraftTable.vacuum(tdir, retainVersions = Int.MaxValue, retainAgeMs = 0L)
    sidecars.foreach(p => assert(Files.exists(java.nio.file.Paths.get(tdir, p)),
      s"retained commit's sidecar $p must survive vacuum"))
    assert(GraftTable.readCdc(spark, tdir, 1, 2).count() == 5)
    // ...and are reaped with their version past the horizon
    GraftTable.vacuum(tdir, retainVersions = 0, retainAgeMs = 0L)
    val head = GraftTable.currentVersion(tdir).get
    (0 until head).foreach { v =>
      GraftTable.manifest(tdir, v).cdcFiles.map(_.path).foreach { p =>
        val gone = !Files.exists(java.nio.file.Paths.get(tdir, p))
        val stillLive = GraftTable.manifest(tdir, head).cdcFiles.map(_.path).contains(p)
        assert(gone || stillLive, s"out-of-horizon sidecar $p should be reaped")
      }
    }
  }

}
