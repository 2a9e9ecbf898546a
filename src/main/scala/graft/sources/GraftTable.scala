package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Minimal snapshot/manifest table format — the versioned-table layer the
  * incremental operators key on (SCALE.md "table format"; the local,
  * zero-dependency analog of a Delta/Iceberg commit log).
  *
  * Layout under one table directory:
  * {{{
  *   <dir>/_log/v00000.manifest     one immutable manifest per snapshot
  *   <dir>/data/c00000_<salt>/...   each commit's parquet files (never rewritten)
  * }}}
  *
  * A manifest is the COMPLETE file list of its snapshot (not a delta), plus
  * the schema DDL and per-file row counts and min/max stats for designated
  * integral- and string-typed columns. That gives, with no extra I/O at
  * read time:
  *
  *  - '''snapshot isolation / time travel''': `read(dir, Some(v))` sees
  *    exactly snapshot v's files, regardless of later appends;
  *  - '''changelog reads''': `readChanges(dir, v0, v1)` = the files added
  *    between two snapshots — the incremental-ingestion batch source
  *    (Delta CDF / Iceberg incremental-scan analog);
  *  - '''manifest-level file skipping''': `scanWhere` drops whole files
  *    whose [min,max] range misses the predicate before Spark ever opens
  *    them (the coarse layer above parquet row-group pruning);
  *  - '''a free index validity key''': snapshots are immutable, so
  *    `table@version` identifies corpus content with ZERO scanning —
  *    `DocSimilarity.incrementalNearDupsTable` keys its corpus mask
  *    artifact this way instead of fingerprinting rows.
  *
  * Commits are atomic and optimistic: data files land first under a fresh
  * salted subdirectory (concurrent writers can never collide on data
  * paths), then the manifest is published via hard-link-from-temp, which
  * fails — [[java.nio.file.FileAlreadyExistsException]] — if another writer
  * published the same version first; the loser re-reads and retries against
  * the new head. On an object store the same protocol is a conditional PUT
  * (if-none-match) of the manifest key. The log is the only serialization
  * point; data writes are fully parallel.
  *
  * Rows arrive by create + append + the [[exactlyOnceAppend]] streaming
  * sink, and leave ONLY through [[delete]] (copy-on-write: matching files
  * are rewritten without the matching rows; history stays time-travelable).
  * [[compact]] may rewrite LAYOUT (same rows, fewer files); compact and
  * delete commits both contribute nothing to the changelog, which carries
  * arrivals. [[vacuum]] reclaims files no retained manifest references —
  * guarded by a modification-time retention window so an in-flight
  * commit's pre-publish data files survive a concurrent vacuum.
  */
object GraftTable {

  /** One data file of a snapshot: table-relative path, row count, and
    * min/max per stats column (absent ⇒ no pruning info, file is kept).
    * `stats` holds integral-column bounds; `strStats` holds string-column
    * bounds under Spark's binary (UTF-8 byte) ordering — the d16-style
    * text-table predicates (`source`, `lang`) prune files through these.
    * `arrival` = false marks a file holding REWRITTEN old rows (compact /
    * delete survivors / the upsert rewrite half): such files never count
    * as changelog arrivals, which is how one MERGE commit can carry both
    * updated-in-place rows and genuinely new ones. */
  final case class TableFile(path: String, records: Long,
                             stats: Map[String, (Long, Long)],
                             strStats: Map[String, (String, String)] = Map.empty,
                             arrival: Boolean = true,
                             bytes: Long = 0L)

  /** Spark's string min/max order is UTF8String BINARY order (UTF-8 byte
    * comparison, = code-point order), which differs from Java's
    * UTF-16-code-unit `compareTo` for supplementary characters — pruning
    * must compare the way the bounds were computed or it drops live files. */
  private[graft] def strCmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** `txn` = idempotence token of the commit (`appId:batchId`) for the
    * exactly-once streaming sink; None for plain commits. `cdcFiles` are
    * the commit's change-data sidecar (rows + `_change_type`, written only
    * under `spark.graft.cdc=true`): never part of the snapshot's data —
    * only [[readCdc]] reads them, and [[vacuum]] retains them with their
    * version. */
  /** `commitMs` = wall-clock commit time recorded INSIDE the manifest at
    * publish (as Delta logs commit time); 0 for pre-field manifests.
    * Time-based retention resolves against this, not file mtimes — a
    * backup/restore or rsync that perturbs mtimes must not silently shift
    * the vacuum horizon. */
  final case class Manifest(version: Int, op: String, schemaDdl: String,
                            files: Seq[TableFile], txn: Option[(String, Long)] = None,
                            cdcFiles: Seq[TableFile] = Nil, commitMs: Long = 0L)

  /** Thrown when a commit loses the optimistic race for its version slot. */
  final class CommitConflict(v: Int)
    extends RuntimeException(s"manifest v$v already published by another writer")

  private def hex(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map("%02x".format(_)).mkString
  private def unhex(h: String): String = new String(
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, StandardCharsets.UTF_8)

  private def logDir(dir: String): JPath = Paths.get(dir, "_log")
  private def manifestPath(dir: String, v: Int): JPath =
    logDir(dir).resolve(f"v$v%05d.manifest")

  /** Latest committed snapshot version, None for a non-table directory.
    *
    * A `_log/_head` hint (written best-effort on every
    * publish) makes the common path O(1) + a short forward probe instead of
    * a full directory LIST — on an object store with 10⁵ commits the LIST
    * is ~100 paged calls per query planning; the hint is one GET. The hint
    * is only ever a LOWER bound (versions are monotone; a stale or lost
    * hint just lengthens the probe), so a torn write can never serve a
    * wrong head — any unreadable hint falls back to the listing. */
  def currentVersion(dir: String): Option[Int] = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) return None
    val hinted =
      try {
        val p = ld.resolve("_head")
        if (!Files.exists(p)) None
        else {
          val v = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
          if (Files.exists(manifestPath(dir, v))) Some(v) else None
        }
      } catch { case _: Exception => None }
    hinted match {
      case Some(v0) =>
        // races only ever leave the hint BEHIND — probe forward to the tip
        var v = v0
        while (Files.exists(manifestPath(dir, v + 1))) v += 1
        Some(v)
      case None =>
        val st = Files.list(ld)
        try {
          val vs = st.iterator().asScala
            .map(_.getFileName.toString)
            .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
              s.stripPrefix("v").stripSuffix(".manifest").toInt }
            .toSeq
          if (vs.isEmpty) None else Some(vs.max)
        } finally st.close()
    }
  }

  def manifest(dir: String, v: Int): Manifest = {
    val lines = new String(Files.readAllBytes(manifestPath(dir, v)),
      StandardCharsets.UTF_8).linesIterator.toSeq
    val kv = lines.takeWhile(!_.startsWith("file\t"))
      .map(_.split('\t')).collect { case Array(k, v0) => k -> v0 }.toMap
    val allFiles = lines.filter(_.startsWith("file\t")).map { l =>
      val p = l.split('\t')
      val stats =
        if (p.length < 5 || p(4) == "-") Map.empty[String, (Long, Long)]
        else p(4).split(';').map { s =>
          val Array(c, range) = s.split("=", 2)
          val Array(mn, mx) = range.split("\\.\\.", 2)
          c -> (mn.toLong, mx.toLong)
        }.toMap
      // 6th field (absent in pre-string-stats manifests): hex-encoded UTF-8
      // string bounds — hex keeps the `;`/`=`/`..` separators unambiguous
      val strStats =
        if (p.length < 6 || p(5) == "-") Map.empty[String, (String, String)]
        else p(5).split(';').map { s =>
          val Array(c, range) = s.split("=", 2)
          val Array(mn, mx) = range.split("\\.\\.", 2)
          c -> (unhex(mn), unhex(mx))
        }.toMap
      // 7th field (absent in pre-sizing manifests): on-disk file bytes —
      // feeds the relation's sizeInBytes so small tables auto-broadcast;
      // 0 = unknown, the relation then reports the safe default size
      val bytes = if (p.length < 7 || p(6) == "-") 0L else p(6).toLong
      (p(1), TableFile(p(2), p(3).toLong, stats, strStats,
        arrival = p(1) != "rewrite", bytes = bytes))
    }
    // kind "cdc" = change-data sidecar files (rows + _change_type): part of
    // the commit's metadata, never of the snapshot's data file set
    val (cdc, files) = allFiles.partition(_._1 == "cdc")
    val txn = kv.get("txn").map { t =>
      val i = t.lastIndexOf(':'); (t.substring(0, i), t.substring(i + 1).toLong)
    }
    Manifest(kv("version").toInt, kv("op"), kv("schema"), files.map(_._2), txn,
      cdcFiles = cdc.map(_._2),
      // a corrupted value degrades like a missing field (0 = "no recorded
      // time", callers fall back to mtime) — commit time is advisory
      // metadata and must never make a manifest unreadable
      commitMs = kv.get("commitMs")
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(0L))
  }

  /** The change feed's metadata column names — reserved at schema ENTRY
    * (create / additive evolution): a table carrying them as data would
    * make every CDC sidecar and feed read ambiguous. Checked only where a
    * NEW column enters a schema, so rewrites of a pre-existing schema
    * (delete/update/compact on an old table) are never bricked. */
  private val ReservedCols = Seq(ChangeTypeCol, "_commit_version")
  private def requireNoReserved(names: Iterable[String]): Unit =
    ReservedCols.foreach(c => require(!names.exists(_ == c),
      s"column name '$c' is reserved for the change feed"))

  /** Create snapshot v0. Fails if the table already exists. */
  def create(s: SparkSession, dir: String, df: DataFrame,
             statsCols: Seq[String] = Nil): Int = {
    require(currentVersion(dir).isEmpty, s"table already exists at $dir")
    commit(s, dir, df, statsCols, version = 0, op = "create", prev = Nil)
  }

  /** Guarded build-once create (the query-side shared-table pattern,
    * centralized): create snapshot v0 from `build` iff the table does not
    * exist yet; `build` is never evaluated on the warm path. In-process
    * races serialize on the GraftTable lock; a CROSS-process race loses
    * the optimistic v0 publish and falls through to read the winner's
    * table (both writers built the same frame by contract). */
  def getOrCreate(s: SparkSession, dir: String, statsCols: Seq[String])
                 (build: => DataFrame): String = this.synchronized {
    if (currentVersion(dir).isEmpty)
      try create(s, dir, build, statsCols)
      catch {
        // a concurrent PROCESS won the v0 slot (create's own existence
        // re-check throws IllegalArgumentException when it loses the race
        // before the publish; the publish itself throws CommitConflict)
        case _: CommitConflict => ()
        case _: IllegalArgumentException if currentVersion(dir).nonEmpty => ()
      }
    dir
  }

  /** [[getOrCreate]] plus a one-shot v0→v1 UPGRADE commit (append /
    * delete / merge) applied iff the table is still at v0 — the shared
    * shape of the d16/d17/m4-style two-snapshot fixtures. A cross-process
    * race on the upgrade loses the optimistic publish and falls through
    * iff the winner already moved the head past v0 (both processes build
    * the same upgrade by contract). */
  def getOrCreateUpgraded(s: SparkSession, dir: String, statsCols: Seq[String])
                         (build: => DataFrame)(upgrade: => Unit): String =
    this.synchronized {
      getOrCreate(s, dir, statsCols)(build)
      if (currentVersion(dir).contains(0))
        try upgrade
        catch { case _: CommitConflict if currentVersion(dir).exists(_ > 0) => () }
      dir
    }

  /** Append one batch as snapshot current+1. Throws [[CommitConflict]] if a
    * concurrent writer takes the slot first (data files are never clobbered
    * either way — retry by calling append again).
    *
    * Schema evolution is ADDITIVE: a batch may carry new columns (the new
    * snapshot's schema is old ∪ new, and readers see null for the new
    * columns in pre-evolution files — parquet-by-schema semantics), it may
    * omit existing columns (they read as null in the batch's files), but
    * it may never CHANGE an existing column's type — history would become
    * unreadable under one schema, so that throws. */
  def append(s: SparkSession, dir: String, df: DataFrame,
             statsCols: Seq[String] = Nil): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, head)
    commit(s, dir, df, statsCols, version = head + 1, op = "append",
      prev = m.files, prevSchema = Some(StructType.fromDDL(m.schemaDdl)))
  }

  /** Stats columns of the head snapshot = the union of columns its files
    * carry bounds for. The skipping schema is not persisted separately —
    * the file bounds ARE the declaration — so writers arriving through a
    * surface with no statsCols parameter (SQL DML, INSERT INTO, the
    * DataFrameWriter) re-derive it from here to keep mutated/extended
    * tables prunable. */
  def statsColsOf(dir: String): Seq[String] = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no graft table at $dir"))
    // the head snapshot may carry no bounds at all — files-less (a delete
    // that matched every row, an empty overwrite) or bounds-less (an
    // all-null stats column, string bounds past the 64-char cap): the
    // skipping declaration lives in file bounds, so walk back to the most
    // recent snapshot whose files CARRY any — a transient boundless state
    // must not permanently erase the declaration for every later write.
    // A table genuinely created without statsCols walks to v0 and
    // correctly yields Nil.
    (head to 0 by -1).iterator.map(v => manifest(dir, v).files)
      .find(fs => fs.exists(f => f.stats.nonEmpty || f.strStats.nonEmpty))
      .map(fs => (fs.flatMap(_.stats.keys) ++ fs.flatMap(_.strStats.keys))
        .distinct.sorted)
      .getOrElse(Nil)
  }

  /** Truncate-and-load as ONE atomic commit: the new snapshot lists only
    * the fresh files (old files stay on disk for time travel until
    * vacuum). The fresh files count as ARRIVALS — an overwrite is a
    * (re-)ingest, so a tailing changelog stream sees the new rows once,
    * exactly as Delta's remove+add treats them. Schema may evolve
    * additively against the PREVIOUS snapshot (type changes refuse:
    * history must stay readable under one schema). */
  def overwrite(s: SparkSession, dir: String, df: DataFrame,
                statsCols: Seq[String] = Nil): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, head)
    commit(s, dir, df, statsCols, version = head + 1, op = "overwrite",
      prev = Nil, prevSchema = Some(StructType.fromDDL(m.schemaDdl)))
  }

  /** Idempotent append for exactly-once streaming sinks
    * (`writeStream.foreachBatch(GraftTable.sinkInto(dir, appId))`): the
    * (appId, batchId) token is recorded in the commit's manifest, so a
    * re-delivered micro-batch after crash recovery (batchId ≤ the app's
    * last committed) is a NO-OP instead of a double append — the
    * transactional-sink shape SCALE.md maps to Delta's `txn` action. The
    * first batch of a fresh sink creates the table. Conflicts with OTHER
    * writers re-check the token and retry. */
  def exactlyOnceAppend(s: SparkSession, dir: String, df: DataFrame,
                        appId: String, batchId: Long,
                        statsCols: Seq[String] = Nil): Int = {
    while (true) {
      val headOpt = currentVersion(dir)
      if (lastTxn(dir, appId).exists(_ >= batchId)) return headOpt.get
      val (v, op, prevFiles, prevSchema) = headOpt match {
        case Some(h) =>
          val m = manifest(dir, h)
          (h + 1, "append", m.files, Some(StructType.fromDDL(m.schemaDdl)))
        case None => (0, "create", Seq.empty[TableFile], Option.empty[StructType])
      }
      try return commit(s, dir, df, statsCols, v, op, prevFiles,
        txn = Some(appId -> batchId), prevSchema = prevSchema)
      catch { case _: CommitConflict => () } // other writer won; re-check
    }
    throw new IllegalStateException("unreachable")
  }

  /** Idempotent truncate-and-load for exactly-once COMPLETE-mode streaming
    * sinks (each micro-batch carries the full recomputed result — e.g. a
    * continuously-maintained aggregate table): same (appId, batchId) token
    * protocol as [[exactlyOnceAppend]], but the commit is an overwrite
    * (create on a fresh dir), so the table head always holds exactly the
    * latest delivered result and a re-delivered batch is a no-op. Old
    * snapshots stay time-travelable until vacuum, like any overwrite. */
  def exactlyOnceComplete(s: SparkSession, dir: String, df: DataFrame,
                          appId: String, batchId: Long,
                          statsCols: Seq[String] = Nil): Int = {
    while (true) {
      val headOpt = currentVersion(dir)
      if (lastTxn(dir, appId).exists(_ >= batchId)) return headOpt.get
      val (v, op, prevSchema) = headOpt match {
        case Some(h) =>
          (h + 1, "overwrite",
            Some(StructType.fromDDL(manifest(dir, h).schemaDdl)))
        case None => (0, "create", Option.empty[StructType])
      }
      try return commit(s, dir, df, statsCols, v, op, prev = Nil,
        txn = Some(appId -> batchId), prevSchema = prevSchema)
      catch { case _: CommitConflict => () } // other writer won; re-check
    }
    throw new IllegalStateException("unreachable")
  }

  /** Latest committed batchId of a sink appId (backward manifest scan —
    * bounded by log length locally; a deployment checkpoints this). */
  def lastTxn(dir: String, appId: String): Option[Long] = {
    val head = currentVersion(dir).getOrElse(return None)
    (head to 0 by -1).iterator
      .map(v => manifest(dir, v).txn)
      .collectFirst { case Some((a, b)) if a == appId => b }
  }

  /** foreachBatch adapter for the exactly-once sink. */
  def sinkInto(dir: String, appId: String, statsCols: Seq[String] = Nil)
      : (DataFrame, Long) => Unit = (df, batchId) => {
    exactlyOnceAppend(df.sparkSession, dir, df, appId, batchId, statsCols); ()
  }

  /** foreachBatch adapter that REPLICATES a change feed into a mirror
    * table — continuous replication including purges, the consumer half of
    * the CDC story:
    * {{{
    *   spark.readStream.format("graft-table")
    *     .option("path", srcDir).option("readChangeFeed", "true").load()
    *     .writeStream.foreachBatch(GraftTable.cdcMirrorInto(mirrorDir, "doc_id", "app"))
    * }}}
    * A micro-batch may span several source commits; they apply IN SOURCE
    * ORDER (an insert-then-delete of the same key nets to absent, never
    * the reverse), deletes/preimages as one [[deleteKeys]] and
    * inserts/postimages as one append per source commit. Exactly-once
    * under replay: the source version IS the idempotence token (monotone,
    * so `(appId, version)` rides the mirror's append commit; a replayed
    * version skips — its deleteKeys half is idempotent by itself). The
    * mirror lags the source only by the feed, never rescans it. */
  def cdcMirrorInto(dir: String, keyCol: String, appId: String,
                    statsCols: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (batch0, _) => {
      val s = batch0.sparkSession
      // foreachBatch frames are not cached: a catch-up batch spanning k
      // commits would otherwise re-read its change files 2k+1 times
      val batch = batch0.persist()
      try {
        // bounded collect: one row per SOURCE COMMIT in this micro-batch
        val versions = batch.select(col("_commit_version")).distinct()
          .collect().map(_.getInt(0)).sorted
        // tokens are monotone and this loop is the appId's only writer, so
        // ONE backward manifest scan serves the whole batch — per-version
        // re-scans would grow with the mirror's total history
        val applied = lastTxn(dir, appId).getOrElse(Long.MinValue)
        versions.foreach { v =>
          if (v > applied) {
            val b = batch.filter(col("_commit_version") === v)
            val dels = b.filter(col(ChangeTypeCol)
              .isin("delete", "update_preimage")).select(col(keyCol))
            val ins = b.filter(col(ChangeTypeCol)
              .isin("insert", "update_postimage"))
              .drop(ChangeTypeCol, "_commit_version")
            if (currentVersion(dir).nonEmpty)
              deleteKeys(s, dir, keyCol, dels, statsCols)
            exactlyOnceAppend(s, dir, ins, appId, batchId = v, statsCols)
          }
        }
      } finally { batch.unpersist(); () }
    }

  /** Rewrite the head snapshot into `targetFiles` files, published as an
    * op=compact commit: same rows, new layout, and — by the changelog
    * contract — contributes NOTHING to `readChanges`/the streaming source
    * (a compact is not an ingest). This is the small-file compaction a
    * high-frequency ingest needs; superseded files stay on disk for
    * in-flight snapshot/changelog readers until [[vacuum]]. */
  def compact(s: SparkSession, dir: String, targetFiles: Int = 1,
              statsCols: Seq[String] = Nil, clusterBy: Seq[String] = Nil,
              zorderBy: Seq[String] = Nil): Int = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "pick ONE layout: clusterBy (linear range) or zorderBy (interleaved)")
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val headManifest = manifest(dir, head) // read ONCE: snap + z-order mins
    val snap = readFiles(s, dir, headManifest)
    // clusterBy range-clusters the rewrite: each output file owns a
    // DISJOINT clusterBy range, so per-file manifest stats become tight
    // and post-compact point/range scans (scanWhere / the relation's
    // pushed filters) open one file instead of every file an arrival-
    // ordered layout smears the key across. sortWithinPartitions
    // additionally tightens parquet row-group stats for the engine's own
    // pushdown below the manifest level.
    //
    // zorderBy is the MULTI-dimension form (the Delta OPTIMIZE ZORDER
    // analog): lexicographic range clustering makes the FIRST column's
    // bounds tight and leaves every later column spanning its full range
    // in every file, so a predicate on the second dimension alone skips
    // nothing. Range-clustering on the Morton interleave of the (integral)
    // columns instead gives every file a LOCALIZED hyper-rectangle, so
    // per-file min/max stats stay tight in ALL the named dimensions — a
    // t26-shape box query and a single-dimension band query both prune.
    val laid =
      if (zorderBy.nonEmpty) {
        require(!snap.columns.contains("__z"),
          "zorderBy needs the reserved layout column name __z; rename the table's __z column")
        // normalize to non-negative: per-column mins come FREE from the
        // head manifest's per-file stats when the column carries them (the
        // documented usage — zorderBy ⊆ statsCols); only non-stats columns
        // pay a one-row aggregation scan. The code column is layout-only
        // and dropped before the write.
        val statMins: Map[String, Long] = zorderBy.flatMap { c =>
          val per = headManifest.files.flatMap(_.stats.get(c).map(_._1))
          if (per.nonEmpty && headManifest.files.forall(_.stats.contains(c)))
            Some(c -> per.min)
          else None
        }.toMap
        val scanned = zorderBy.filterNot(statMins.contains)
        val scannedMins: Map[String, Long] =
          if (scanned.isEmpty) Map.empty
          else {
            val aggs = scanned.map(c => min(col(c).cast("long")).as(c))
            val row = snap.agg(aggs.head, aggs.tail: _*).collect()(0)
            scanned.zipWithIndex
              .map { case (c, i) => c -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
              .toMap
          }
        snap.withColumn("__z", mortonCode(zorderBy, statMins ++ scannedMins))
          .repartitionByRange(targetFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
      }
      else if (clusterBy.isEmpty) snap.repartition(targetFiles)
      else snap.repartitionByRange(targetFiles, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    commit(s, dir, laid, statsCols, head + 1, "compact", prev = Nil,
      prevSchema = Some(StructType.fromDDL(headManifest.schemaDdl)))
  }

  /** Morton (z-curve) interleave of the named integral columns, normalized
    * by per-column min: bit i of each column lands at position i·k+j of the
    * code, so z-adjacent rows are close in EVERY dimension. Uses the low
    * ⌊63/k⌋ bits per column — values past that range share high-order
    * prefixes (layout degrades gracefully; correctness is unaffected, the
    * code is never read back). Pure column arithmetic — codegen'd, no UDF. */
  private def mortonCode(cols: Seq[String], mins: Map[String, Long])
      : org.apache.spark.sql.Column = {
    val k = cols.size
    val bits = 63 / k
    cols.zipWithIndex.map { case (c, j) =>
      val norm = (col(c).cast("long") - lit(mins(c)))
      (0 until bits).map { i =>
        shiftleft(shiftright(norm, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Roll the table HEAD back to snapshot `toVersion` as a NEW commit
    * (the Delta RESTORE shape): the target's file list re-publishes BY
    * REFERENCE under version head+1 — zero data movement, and the undone
    * versions stay time-travelable until vacuumed. op=restore commits are
    * invisible to the changelog: a restore is history surgery, not an
    * ingest — rows it resurfaces were already streamed when they first
    * arrived, so a tailing gate never double-sees them. Throws (before
    * publishing anything) if any target data file was already vacuumed —
    * a restore past the vacuum horizon is unrecoverable by construction.
    * On a lost optimistic race throws [[CommitConflict]]; retry. */
  def restore(s: SparkSession, dir: String, toVersion: Int): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    require(toVersion >= 0 && toVersion <= head,
      s"no snapshot v$toVersion to restore (head is v$head)")
    val target = manifest(dir, toVersion)
    val missing = target.files.filterNot(f =>
      Files.exists(Paths.get(resolvePath(dir, f.path))))
    require(missing.isEmpty,
      s"cannot restore v$toVersion: ${missing.size} of its data files were " +
        s"vacuumed (first: ${missing.headOption.map(_.path).getOrElse("-")})")
    publish(dir, Manifest(head + 1, "restore", target.schemaDdl, target.files, None))
    head + 1
  }

  /** Files younger than this survive [[vacuum]] even when unreferenced:
    * a commit lands its data files BEFORE publishing the manifest, so an
    * in-flight writer's files are "unreferenced" for that window — the
    * same reason Delta's VACUUM has a modification-time retention. */
  val DefaultVacuumRetainAgeMs: Long = 10L * 60 * 1000

  /** Delete unreferenced data files: conflict losers and crashed commits
    * (referenced by NO manifest), plus — when `retainVersions` is set —
    * files referenced only by manifests older than head−retainVersions
    * (the time-travel/changelog horizon; don't vacuum past a reader).
    * Only `*.parquet` files are candidates, and only files older than
    * `retainAgeMs`: a concurrent writer's not-yet-published data files
    * (and its `.tmp_` manifest) are unreferenced but must survive, or the
    * published snapshot would reference deleted parquet. Pass 0 only when
    * no writer can be in flight. Returns the deleted count. */
  def vacuum(dir: String, retainVersions: Int = Int.MaxValue,
             retainAgeMs: Long = DefaultVacuumRetainAgeMs): Int = {
    val head = currentVersion(dir).getOrElse(return 0)
    val keepFrom = math.max(0, head.toLong - retainVersions).toInt
    val live = (keepFrom to head).flatMap { v =>
      val m = manifest(dir, v)
      (m.files ++ m.cdcFiles).map(_.path) // a retained commit keeps its CDC
    }.toSet
    val cutoff = System.currentTimeMillis() - retainAgeMs
    def oldEnough(p: JPath): Boolean =
      Files.getLastModifiedTime(p).toMillis <= cutoff
    val root = Paths.get(dir)
    var n = 0
    // a publish that crashed between temp-write and link leaves .tmp_ files
    // in the log; they are never the published manifest — but a LIVE
    // publish is mid-link for a moment, so the age guard applies here too
    val ld = logDir(dir)
    if (Files.isDirectory(ld)) {
      val ls = Files.list(ld)
      try ls.iterator().asScala.foreach { p =>
        if (p.getFileName.toString.startsWith(".tmp_") && oldEnough(p)) {
          Files.delete(p); n += 1
        }
      } finally ls.close()
    }
    val dataRoot = root.resolve("data")
    if (!Files.isDirectory(dataRoot)) return n
    val it = Files.walk(dataRoot)
    try {
      it.iterator().asScala.foreach { p =>
        if (Files.isRegularFile(p) && p.toString.endsWith(".parquet")
            && !live(root.relativize(p).toString) && oldEnough(p)) {
          Files.delete(p); n += 1
        }
      }
      n
    } finally it.close()
  }

  /** TIME-based retention (the production `RETAIN n HOURS` policy, as in
    * Delta's VACUUM): keep every snapshot whose manifest was committed
    * inside the window (plus the head — always kept), reclaim files
    * referenced only by older history. Resolves the window to a version
    * horizon against the commit time each manifest RECORDS (falling back
    * to the manifest file's mtime only for legacy pre-`commitMs`
    * manifests — mtimes don't survive a timestamp-losing backup/restore),
    * then delegates to [[vacuum]] — one retention implementation. The
    * head is retained even when it is older than the window (a cold
    * table must stay readable); `retainAgeMs` keeps its separate
    * in-flight-writer role. */
  def vacuumRetainTime(dir: String, retainMs: Long,
                       retainAgeMs: Long = DefaultVacuumRetainAgeMs): Int = {
    val head = currentVersion(dir).getOrElse(return 0)
    val cutoff = System.currentTimeMillis() - retainMs
    // header-only read: scan the kv prefix, never parse the file list —
    // resolving the horizon on a long table must cost O(versions), not
    // O(files in history) (vacuum() parses the retained range anyway)
    def commitTime(v: Int): Long = {
      val recorded = new String(Files.readAllBytes(manifestPath(dir, v)),
          StandardCharsets.UTF_8).linesIterator
        .takeWhile(!_.startsWith("file\t"))
        .collectFirst { case l if l.startsWith("commitMs\t") =>
          // a corrupted value degrades to the mtime fallback below, the
          // same path a missing field takes — never an unguided NFE
          scala.util.Try(l.stripPrefix("commitMs\t").trim.toLong).getOrElse(0L) }
        .getOrElse(0L)
      if (recorded > 0) recorded
      else Files.getLastModifiedTime(manifestPath(dir, v)).toMillis
    }
    val keepFrom = (0 to head).find(commitTime(_) > cutoff).getOrElse(head)
    vacuum(dir, retainVersions = head - keepFrom, retainAgeMs = retainAgeMs)
  }

  /** Row-level DELETE, copy-on-write (the Delta/Iceberg CoW shape): rows
    * matching `predicate` disappear from the NEW snapshot; history is
    * untouched — time travel to any pre-delete version still reads the
    * deleted rows (their files stay until [[vacuum]] past the horizon).
    * Only files that actually CONTAIN matching rows are rewritten (one
    * column-pruned probe finds them; cost scales with the touched files,
    * not the table) — untouched files carry over by reference, with their
    * stats. The op=delete commit contributes nothing to the changelog,
    * like compact: its fresh files hold surviving OLD rows, not arrivals.
    *
    * SQL three-valued semantics: a row is deleted iff the predicate is
    * TRUE — rows where it evaluates NULL survive (`DELETE WHERE c > 5`
    * keeps c IS NULL rows, as in every SQL engine).
    *
    * This turns the d9 keep-one dedup survivors into a TABLE operation:
    * delete the non-canonical group members in place, and every reader —
    * batch, SQL relation, changelog key — sees the deduped corpus. */
  /** `input_file_name()` yields the scan file's URI form
    * (`file:/…`, percent-encoded) — DECODE it back to a raw filesystem
    * path before comparing with manifest entries. Relative manifest
    * paths are salted-hex-safe ASCII where the two forms agree, but a
    * clone's ABSOLUTE entries inherit the source directory's characters:
    * matching the encoded URI against a raw path containing a space
    * would silently find no touched files, turning a delete/upsert into
    * a no-op that reports success. */
  private def decodeScanPath(raw: String): String =
    try {
      val u = new java.net.URI(raw)
      if (u.getPath != null) u.getPath else raw
    } catch { case _: java.net.URISyntaxException => raw }

  /** Touched-file probe of the PREDICATE mutations (delete/updateWhere):
    * the data files containing a match, split from the carried rest. One
    * column-pruned scan; bounded collect — one row per matching FILE. */
  private def touchedSplit(s: SparkSession, dir: String, m: Manifest,
                           pred: org.apache.spark.sql.Column)
      : (Seq[TableFile], Seq[TableFile]) = {
    val touched = readFiles(s, dir, m).filter(pred)
      .select(input_file_name().as("_f")).distinct()
      .collect().map(r => decodeScanPath(r.getString(0))).toSet
    m.files.partition(f => touched.exists(_.endsWith(f.path)))
  }

  /** [[touchedSplit]] for the KEY-SET mutations (deleteKeys/upsert): the
    * probe is a distributed semi-join, never a driver-side id list.
    * `input_file_name()` must be captured IN the scan stage — after the
    * join's exchange it evaluates to "" and the probe would see no files. */
  private def touchedSplitKeys(s: SparkSession, dir: String, m: Manifest,
                               keyCol: String, keys: DataFrame)
      : (Seq[TableFile], Seq[TableFile]) = {
    val touched = readFiles(s, dir, m).withColumn("_f", input_file_name())
      .join(keys, Seq(keyCol), "semi")
      .select(col("_f")).distinct()
      .collect().map(_.getString(0)).filter(_.nonEmpty) // one row per FILE
      .map(decodeScanPath).toSet
    m.files.partition(f => touched.exists(_.endsWith(f.path)))
  }

  def delete(s: SparkSession, dir: String, predicate: org.apache.spark.sql.Column,
             statsCols: Seq[String] = Nil): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, head)
    val pred = coalesce(predicate, lit(false))
    val (rewrite, carry) = touchedSplit(s, dir, m, pred)
    if (rewrite.isEmpty) return head // nothing to delete — no empty commit
    val survivors = readFiles(s, dir, m.copy(files = rewrite)).filter(!pred)
    val cdc = if (!cdcEnabled(s)) None else Some(
      readFiles(s, dir, m.copy(files = rewrite)).filter(pred)
        .withColumn(ChangeTypeCol, lit("delete")))
    commit(s, dir, survivors, statsCols, head + 1, "delete", prev = carry,
      prevSchema = Some(StructType.fromDDL(m.schemaDdl)), cdc = cdc)
  }

  /** Copy-on-write UPDATE: rewrite ONLY the files containing a predicate
    * match, with each assigned column replaced where the predicate holds;
    * non-matching rows inside a touched file re-land verbatim, untouched
    * files carry by reference. Predicate and every assignment value
    * evaluate against the ORIGINAL row (one projection — an assignment can
    * reference a column another assignment changes, SQL UPDATE semantics),
    * and values cast to the column's existing type so history stays
    * readable under one schema. Changelog-invisible like [[delete]]; with
    * `spark.graft.cdc` on, the commit's sidecar carries pre+postimages.
    * Touched files are read once for the probe, once for the rewrite, and
    * (CDC on) twice for the images — a production multi-output writer
    * would fuse the rewrite and sidecar into one pass; the extra reads are
    * bounded by the TOUCHED files either way, never the table. */
  def updateWhere(s: SparkSession, dir: String,
                  predicate: org.apache.spark.sql.Column,
                  sets: Seq[(String, org.apache.spark.sql.Column)],
                  statsCols: Seq[String] = Nil): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, head)
    val schema = StructType.fromDDL(m.schemaDdl)
    sets.foreach { case (c, _) => require(schema.fieldNames.contains(c),
      s"UPDATE of unknown column '$c' (table has ${schema.fieldNames.mkString(", ")})") }
    val pred = coalesce(predicate, lit(false))
    val (rewrite, carry) = touchedSplit(s, dir, m, pred)
    if (rewrite.isEmpty) return head // nothing matches — no empty commit
    val proj = schema.fieldNames.toSeq.map { c =>
      sets.find(_._1 == c) match {
        case Some((_, v)) =>
          when(pred, v.cast(schema(c).dataType)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    val updated = readFiles(s, dir, m.copy(files = rewrite)).select(proj: _*)
    val cdc = if (!cdcEnabled(s)) None else {
      val hit = readFiles(s, dir, m.copy(files = rewrite)).filter(pred)
      // postimages apply the assignments unconditionally (rows already
      // filtered to the predicate), still against the ORIGINAL row
      val post = schema.fieldNames.toSeq.map { c =>
        sets.find(_._1 == c) match {
          case Some((_, v)) => v.cast(schema(c).dataType).as(c)
          case None => col(c)
        }
      }
      Some(hit.withColumn(ChangeTypeCol, lit("update_preimage"))
        .unionByName(hit.select(post: _*)
          .withColumn(ChangeTypeCol, lit("update_postimage"))))
    }
    commit(s, dir, updated, statsCols, head + 1, "update", prev = carry,
      prevSchema = Some(schema), cdc = cdc)
  }

  /** [[delete]] by KEY SET: remove every row whose `keyCol` appears in
    * `keys` — the shape the d9 keep-one dedup emits (a frame of
    * non-canonical member ids, potentially huge). The touched-file probe
    * is a semi-join and the rewrite an anti-join, both on the key column —
    * never a driver-side id list, so a billion-row drop set distributes
    * like any other join (AQE broadcasts it when it is small). */
  def deleteKeys(s: SparkSession, dir: String, keyCol: String, keys: DataFrame,
                 statsCols: Seq[String] = Nil): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, head)
    val (rewrite, carry) = touchedSplitKeys(s, dir, m, keyCol,
      keys.select(col(keyCol)).distinct())
    if (rewrite.isEmpty) return head
    val survivors = readFiles(s, dir, m.copy(files = rewrite))
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val cdc = if (!cdcEnabled(s)) None else Some(
      readFiles(s, dir, m.copy(files = rewrite))
        .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "semi")
        .withColumn(ChangeTypeCol, lit("delete")))
    commit(s, dir, survivors, statsCols, head + 1, "delete", prev = carry,
      prevSchema = Some(StructType.fromDDL(m.schemaDdl)), cdc = cdc)
  }

  /** MERGE / upsert by key, copy-on-write, ONE atomic commit: rows of
    * `batch` whose `keyCol` already exists REPLACE the old rows (the
    * touched files rewrite without the matched keys, exactly [[deleteKeys]]
    * mechanics); the whole batch then lands as ARRIVAL files. The commit
    * publishes once, so readers never see the delete-without-insert half
    * state a deleteKeys+append pair would expose between its two versions.
    *
    * Changelog semantics via the per-file `arrival` marker: the batch's
    * files count as arrivals (an upsert IS an ingest event — d16-style
    * gates see every upserted row once), the rewrite half never does.
    * Duplicate keys WITHIN the batch are kept as-is (both land), matching
    * append; dedupe the batch first if keys must stay unique. */
  def upsert(s: SparkSession, dir: String, keyCol: String, batch: DataFrame,
             statsCols: Seq[String] = Nil): Int = {
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, head)
    val keys = batch.select(col(keyCol)).distinct()
    val (rewrite, carry) = touchedSplitKeys(s, dir, m, keyCol, keys)
    val version = head + 1
    val survivors =
      if (rewrite.isEmpty) Nil
      else writeFiles(s, dir,
        readFiles(s, dir, m.copy(files = rewrite))
          .join(keys, Seq(keyCol), "left_anti"),
        statsCols, version, arrival = false)
    val arrivals = writeFiles(s, dir, batch, statsCols, version, arrival = true)
    val schema = mergeSchema(StructType.fromDDL(m.schemaDdl), batch.schema)
    // CDC splits the commit exactly: replaced old rows (preimage), their
    // replacements from the batch (postimage), genuinely new keys (insert).
    // The sidecar is the commit's COMPLETE change set — readCdc then never
    // also synthesizes from this commit's arrival files.
    val cdcFs = if (!cdcEnabled(s)) Nil else {
      val old = readFiles(s, dir, m.copy(files = rewrite))
      val matched = old.join(keys, Seq(keyCol), "semi")
      val matchedKeys = matched.select(col(keyCol)).distinct()
      writeCdcFiles(s, dir,
        matched.withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(batch.join(matchedKeys, Seq(keyCol), "semi")
            .withColumn(ChangeTypeCol, lit("update_postimage")),
            allowMissingColumns = true)
          .unionByName(batch.join(matchedKeys, Seq(keyCol), "left_anti")
            .withColumn(ChangeTypeCol, lit("insert")),
            allowMissingColumns = true),
        version)
    }
    publish(dir, Manifest(version, "upsert", schema.toDDL,
      carry ++ survivors ++ arrivals, cdcFiles = cdcFs))
    version
  }

  /** Merge for additive evolution: existing columns keep their position
    * and type (a type change throws), genuinely new columns append.
    * Nullability is IGNORED in the compatibility test (`sameType`): the
    * manifest stores schemas as DDL, which round-trips every field and
    * array element as nullable — a batch whose encoder derived
    * `array<float> containsNull=false` must still append to the table its
    * own create commit declared. */
  private def sameTypeIgnoreNull(a: org.apache.spark.sql.types.DataType,
                                 b: org.apache.spark.sql.types.DataType): Boolean =
    (a, b) match {
      case (x: org.apache.spark.sql.types.ArrayType,
            y: org.apache.spark.sql.types.ArrayType) =>
        sameTypeIgnoreNull(x.elementType, y.elementType)
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameTypeIgnoreNull(f.dataType, g.dataType) }
      case _ => a == b
    }

  private def mergeSchema(prev: StructType, next: StructType): StructType = {
    next.fields.foreach { f =>
      prev.fields.find(_.name == f.name).foreach { pf =>
        require(sameTypeIgnoreNull(pf.dataType, f.dataType),
          s"column '${f.name}' type change ${pf.dataType.simpleString} -> " +
            s"${f.dataType.simpleString}: history would be unreadable")
      }
    }
    val fresh = next.fields.filterNot(f => prev.fieldNames.contains(f.name))
    requireNoReserved(fresh.map(_.name)) // new columns only — old schemas rewrite freely
    StructType(prev.fields ++ fresh)
  }

  /** Write one batch's data files under a fresh salted subdirectory of
    * version `version` and return their manifest entries (per-file row
    * counts + stats). Does NOT publish — callers compose one or more
    * writes into a single atomic manifest publish. */
  private def writeFiles(s: SparkSession, dir: String, df: DataFrame,
                         statsCols: Seq[String], version: Int,
                         arrival: Boolean, prefix: String = "c"): Seq[TableFile] = {
    val salt = java.util.UUID.randomUUID().toString.take(8)
    val sub = f"data/$prefix$version%05d_$salt"
    df.write.parquet(s"$dir/$sub")
    // stats columns must be integral (exact long bounds) or string (binary
    // order bounds): anything else — a DOUBLE through cast("long") — would
    // silently truncate its bounds and pruning would then DROP live files,
    // an unrecoverable wrong-result, so it throws at commit time instead
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
    val (longCols, strCols) = {
      val typed = statsCols.map(c => c -> df.schema(c).dataType)
      typed.foreach { case (c, t) => require(
        Seq(ByteType, ShortType, IntegerType, LongType, StringType).contains(t),
        s"stats column '$c' has non-integral, non-string type ${t.simpleString}: " +
          "min/max bounds would be lossy and file skipping would drop live files") }
      (typed.filter(_._2 != StringType).map(_._1), typed.filter(_._2 == StringType).map(_._1))
    }
    // one column-pruned scan of the just-written batch yields the per-file
    // manifest stats; rows are bounded by the batch's FILE count. The
    // explicit schema keeps an EMPTY batch (a zero-row micro-batch through
    // the sink writes no part files) from failing schema inference — it
    // commits as a files-less manifest instead of crashing the stream.
    val back = s.read.schema(df.schema).parquet(s"$dir/$sub")
    val aggs = count(lit(1)).as("_n") +:
      (longCols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"_mn_$c"), max(col(c).cast("long")).as(s"_mx_$c"))) ++
       strCols.flatMap(c => Seq(
        min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c"))))
    val perFile = back.groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per data FILE of this commit
    perFile.map { r =>
      val full = r.getString(0)
      val rel = full.substring(full.indexOf(sub))
      val stats = longCols.flatMap { c =>
        val mn = r.getAs[Any](s"_mn_$c"); val mx = r.getAs[Any](s"_mx_$c")
        if (mn == null || mx == null) None
        else Some(c -> (mn.asInstanceOf[Long], mx.asInstanceOf[Long]))
      }.toMap
      // bounds past 64 chars are dropped (file conservatively kept): a
      // truncated MAX prefix is a lower string, i.e. an INVALID upper bound
      val strStats = strCols.flatMap { c =>
        val mn = r.getAs[String](s"_mn_$c"); val mx = r.getAs[String](s"_mx_$c")
        if (mn == null || mx == null || mn.length > 64 || mx.length > 64) None
        else Some(c -> (mn, mx))
      }.toMap
      val onDisk = try Files.size(Paths.get(dir, rel)) catch { case _: Exception => 0L }
      TableFile(rel, r.getAs[Long]("_n"), stats, strStats, arrival, bytes = onDisk)
    }.sortBy(_.path).toSeq
  }

  /** Change-data capture is OFF by default (`spark.graft.cdc=true` turns
    * it on): a row-level mutation then pays one extra write of exactly the
    * CHANGED rows — the minimum any CDC can record — and nothing else in
    * the write path changes. The default stays zero-write-amplification
    * for pipelines that never read a change feed. */
  private[graft] def cdcEnabled(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.cdc").exists(_.toBoolean)

  /** The change-feed's type column (Delta CDF's names): `insert`,
    * `delete`, `update_preimage`, `update_postimage`. */
  val ChangeTypeCol = "_change_type"

  /** Write a commit's change-data sidecar under `data/cdc…`: plain
    * parquet of (row, `_change_type`), no stats (the feed is consumed
    * whole per commit, never pruned) — [[writeFiles]] with the cdc
    * prefix, so there is ONE salted-write/read-back/manifest-entry
    * recipe to maintain. Returns Nil for an empty frame. */
  private def writeCdcFiles(s: SparkSession, dir: String, cdc: DataFrame,
                            version: Int): Seq[TableFile] =
    writeFiles(s, dir, cdc, Nil, version, arrival = true, prefix = "cdc")

  private def commit(s: SparkSession, dir: String, df: DataFrame,
                     statsCols: Seq[String], version: Int, op: String,
                     prev: Seq[TableFile],
                     txn: Option[(String, Long)] = None,
                     prevSchema: Option[StructType] = None,
                     cdc: Option[DataFrame] = None): Int = {
    // compact/delete/update fresh files REWRITE old rows — never arrivals
    val arrival = op != "compact" && op != "delete" && op != "update"
    // a commit with no prior schema INTRODUCES one — reserved names check
    // here; evolutions check inside mergeSchema (new columns only)
    if (prevSchema.isEmpty) requireNoReserved(df.schema.fieldNames)
    val fresh = writeFiles(s, dir, df, statsCols, version, arrival)
    val schema = prevSchema.map(mergeSchema(_, df.schema)).getOrElse(df.schema)
    val cdcFs = cdc.map(writeCdcFiles(s, dir, _, version)).getOrElse(Nil)
    publish(dir, Manifest(version, op, schema.toDDL, prev ++ fresh, txn,
      cdcFiles = cdcFs))
    version
  }

  /** Atomic publish: full write to a temp name, then hard-link into the
    * version slot — link creation fails atomically if the slot is taken
    * (object-store analog: conditional PUT). */
  private def publish(dir: String, m: Manifest): Unit = {
    Files.createDirectories(logDir(dir))
    val body = new StringBuilder()
      .append("graft-manifest\t1\n")
      .append(s"version\t${m.version}\n")
      .append(s"op\t${m.op}\n")
      .append(s"schema\t${m.schemaDdl}\n")
      // stamp the commit time INSIDE the manifest (mtimes don't survive
      // backup/restore; see Manifest.commitMs)
      .append(s"commitMs\t${if (m.commitMs > 0) m.commitMs
        else System.currentTimeMillis()}\n")
    m.txn.foreach { case (a, b) => body.append(s"txn\t$a:$b\n") }
    m.files.foreach { f =>
      val stats = if (f.stats.isEmpty) "-"
        else f.stats.toSeq.sortBy(_._1)
          .map { case (c, (mn, mx)) => s"$c=$mn..$mx" }.mkString(";")
      val strStats = if (f.strStats.isEmpty) "-"
        else f.strStats.toSeq.sortBy(_._1)
          .map { case (c, (mn, mx)) => s"$c=${hex(mn)}..${hex(mx)}" }.mkString(";")
      val kind = if (f.arrival) "add" else "rewrite"
      body.append(s"file\t$kind\t${f.path}\t${f.records}\t$stats\t$strStats\t${f.bytes}\n")
    }
    m.cdcFiles.foreach { f =>
      body.append(s"file\tcdc\t${f.path}\t${f.records}\t-\t-\t${f.bytes}\n")
    }
    val tmp = logDir(dir).resolve(
      s".tmp_${java.util.UUID.randomUUID().toString.take(12)}")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8))
    try Files.createLink(manifestPath(dir, m.version), tmp)
    catch { case _: FileAlreadyExistsException =>
      throw new CommitConflict(m.version)
    } finally Files.deleteIfExists(tmp)
    // best-effort head hint (see currentVersion): losing it, tearing it, or
    // racing another writer's hint is all safe — it is only a lower bound
    try {
      val ht = logDir(dir).resolve(
        s".tmp_h_${java.util.UUID.randomUUID().toString.take(12)}")
      Files.write(ht, m.version.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(ht, logDir(dir).resolve("_head"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case _: Exception => () }
  }

  /** Commit history as a DataFrame (the DESCRIBE HISTORY analog): one row
    * per snapshot — version, op, file/row totals, fresh-file count of the
    * commit itself, and the sink txn token if any. Driver-side work is one
    * manifest read per version (the log is metadata, not data). */
  def history(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val head = currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    // ONE forward walk — each manifest is read once, O(V); the logical-add
    // rule matches addedFiles (layout rewrites contribute nothing)
    var prevPaths = Set.empty[String]
    (0 to head).map { v =>
      val m = manifest(dir, v)
      val freshN =
        if (m.op == "compact" || m.op == "delete" || m.op == "update" ||
            m.op == "restore") 0
        else m.files.count(f => f.arrival && !prevPaths(f.path))
      prevPaths = m.files.map(_.path).toSet
      (v, m.op, m.files.size, m.files.map(_.records).sum, freshN,
        m.txn.map { case (a, b) => s"$a:$b" }.orNull)
    }.toDF("version", "op", "n_files", "n_records", "n_added_files", "txn")
  }

  /** Snapshot read: exactly `version`'s files (default: latest). */
  def read(s: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(dir))
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    readFiles(s, dir, manifest(dir, v))
  }

  /** Files LOGICALLY added between two snapshots: walk each commit in
    * (fromV, toV] and take its own fresh files — a compact commit rewrites
    * existing rows into new files and contributes nothing. (Until vacuum,
    * superseded paths remain readable, so a changelog spanning a compact
    * still reads the ORIGINAL ingest files — same rows either way.) */
  def addedFiles(dir: String, fromV: Int, toV: Int): Seq[TableFile] = {
    val out = Seq.newBuilder[TableFile]
    var prevPaths = manifest(dir, fromV).files.map(_.path).toSet
    ((fromV + 1) to toV).foreach { v =>
      val m = manifest(dir, v)
      // compact and delete REWRITE existing rows into new files — neither
      // contributes arrivals (the changelog carries appends; a full CDC
      // would add retraction records, out of scope for append-mode ingest).
      // restore re-LISTS old files by reference — history surgery, not an
      // ingest: rows it resurfaces were already streamed on first arrival.
      // Within an upsert commit the per-file `arrival` marker separates the
      // batch's new rows (arrivals) from the rewrite half (not arrivals);
      // the op-level skip stays for pre-marker manifests.
      if (m.op != "compact" && m.op != "delete" && m.op != "update" &&
          m.op != "restore")
        out ++= m.files.filter(f => f.arrival && !prevPaths(f.path))
      prevPaths = m.files.map(_.path).toSet
    }
    out.result()
  }

  /** Changelog read: only the rows that arrived in (fromV, toV] — the
    * incremental batch the d16/v10-style operators probe with. Cost is the
    * NEW files only; the corpus snapshot is never rescanned. */
  def readChanges(s: SparkSession, dir: String, fromV: Int, toV: Int): DataFrame =
    readFiles(s, dir, manifest(dir, toV).copy(files = addedFiles(dir, fromV, toV)))

  /** Full change feed over (fromV, toV] — the Delta CDF analog: every
    * row-level change with `_change_type` ∈ {insert, delete,
    * update_preimage, update_postimage} and `_commit_version`.
    * `fromV = -1` replays from inception (the create commit's rows
    * surface as inserts at version 0). Where
    * [[readChanges]] carries only arrivals (append-mode), this also
    * carries removals — the feed a downstream INDEX (d14's dedup mask,
    * v10's IVF postings) needs to stay consistent under deletes, and what
    * a compliance pipeline replays to propagate a PII purge.
    *
    * Per commit, cheapest-available source:
    *  - a recorded `cdc` sidecar (written when `spark.graft.cdc=true` at
    *    mutation time) is the commit's COMPLETE change set — read as-is;
    *  - create/append/upsert without a sidecar: arrival files ARE the
    *    inserts (an upsert without CDC under-reports — its replaced rows
    *    were not recorded; enable CDC where that matters);
    *  - overwrite/restore: synthesized as the file-level diff against the
    *    previous snapshot (replaced files stay readable until [[vacuum]]);
    *  - compact: no row-level change, contributes nothing;
    *  - delete/update WITHOUT a sidecar THROWS: the removed rows were
    *    never recorded and silence here would hand the consumer a feed
    *    that is wrong in the one way it cannot detect.
    *
    * The batch plan unions one branch per commit in range — linear plan
    * size in the commit count, fine for the typical bounded replay; a
    * feed over a very long history (10⁴+ commits) should either chunk
    * the range or use the STREAMING form
    * (`readStream.option("readChangeFeed", "true")`), which walks
    * commits incrementally and never builds the whole union. */
  def readCdc(s: SparkSession, dir: String, fromV: Int, toV: Int): DataFrame = {
    val outSchema = StructType.fromDDL(manifest(dir, toV).schemaDdl)
      .add(ChangeTypeCol, "string").add("_commit_version", "int")
    val parts = ((fromV + 1) to toV).flatMap { v =>
      val m = manifest(dir, v)
      // v = 0 (fromV = -1 replays from inception): no predecessor — the
      // create commit's files are all inserts against an empty "previous"
      val prevM = if (v == 0) m.copy(files = Nil) else manifest(dir, v - 1)
      val prevPaths = prevM.files.map(_.path).toSet
      def sliced(of: Manifest, files: Seq[TableFile], tpe: String): Option[DataFrame] =
        if (files.isEmpty) None
        else Some(readFiles(s, dir, of.copy(files = files))
          .withColumn(ChangeTypeCol, lit(tpe)))
      val changes: Seq[DataFrame] =
        if (m.cdcFiles.nonEmpty) {
          val cdcSchema = StructType.fromDDL(m.schemaDdl).add(ChangeTypeCol, "string")
          Seq(s.read.schema(cdcSchema)
            .parquet(m.cdcFiles.map(f => resolvePath(dir, f.path)): _*))
        } else m.op match {
          case "compact" => Nil
          case "delete" | "update" => throw new IllegalStateException(
            s"commit v$v of $dir is op=${m.op} written without CDC " +
              "(spark.graft.cdc was not true at write time): its removed " +
              "rows were never recorded and cannot be reconstructed — " +
              "enable spark.graft.cdc before mutating, or re-sync the " +
              "consumer from a full snapshot")
          case "overwrite" | "restore" =>
            val curPaths = m.files.map(_.path).toSet
            sliced(prevM, prevM.files.filterNot(f => curPaths(f.path)), "delete").toSeq ++
              sliced(m, m.files.filterNot(f => prevPaths(f.path)), "insert")
          case _ => // create/append/exactly-once append/upsert-no-sidecar
            sliced(m, m.files.filter(f => f.arrival && !prevPaths(f.path)),
              "insert").toSeq
        }
      changes.map(_.withColumn("_commit_version", lit(v)))
    }
    if (parts.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], outSchema)
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Manifest-level file skipping: read only files whose [min,max] stats
    * range for `colName` overlaps [lo,hi], then apply the row predicate.
    * Files without stats for the column are conservatively kept. */
  def scanWhere(s: SparkSession, dir: String, version: Option[Int],
                colName: String, lo: Long, hi: Long): DataFrame =
    scanWhereAll(s, dir, version, Seq((colName, lo, hi)))

  /** Conjunctive [[scanWhere]]: read only files whose stats ranges overlap
    * EVERY `[lo,hi]` band — the box-predicate form (a spatial range query
    * over a tile-clustered trajectory table prunes on tx AND ty). Files
    * missing stats for a column are conservatively kept for that conjunct. */
  def scanWhereAll(s: SparkSession, dir: String, version: Option[Int],
                   preds: Seq[(String, Long, Long)]): DataFrame = {
    val v = version.orElse(currentVersion(dir))
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, v)
    val kept = m.files.filter(f => preds.forall { case (c, lo, hi) =>
      f.stats.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi } })
    preds.foldLeft(readFiles(s, dir, m.copy(files = kept))) {
      case (df, (c, lo, hi)) => df.filter(col(c).between(lo, hi))
    }
  }

  /** [[scanWhere]] for STRING equality (the d16-shape predicates: `source`,
    * `lang`): read only files whose binary-order [min,max] string range
    * contains `value` — a changelog probe over a source-clustered text
    * table then opens just that source's files. */
  def scanWhereEq(s: SparkSession, dir: String, version: Option[Int],
                  colName: String, value: String): DataFrame = {
    val v = version.orElse(currentVersion(dir))
      .getOrElse(throw new IllegalStateException(s"no table at $dir"))
    val m = manifest(dir, v)
    val kept = m.files.filter(_.strStats.get(colName)
      .forall { case (mn, mx) => strCmp(value, mn) >= 0 && strCmp(value, mx) <= 0 })
    readFiles(s, dir, m.copy(files = kept)).filter(col(colName) === value)
  }

  private def readFiles(s: SparkSession, dir: String, m: Manifest): DataFrame = {
    val schema = StructType.fromDDL(m.schemaDdl)
    if (m.files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else
      s.read.schema(schema).parquet(m.files.map(f => resolvePath(dir, f.path)): _*)
  }

  /** Manifest file paths are table-relative (`data/…`) — except in a
    * [[cloneShallow shallow clone]], whose v0 references the SOURCE
    * table's files by absolute path. Every read site resolves through
    * here so both shapes work. */
  private[sources] def resolvePath(dir: String, p: String): String =
    if (p.startsWith("/")) p else s"$dir/$p"

  /** Zero-copy SHALLOW CLONE (the Delta `CLONE` shape): `dstDir` becomes
    * an independent graft table whose v0 manifest references the source
    * snapshot's data files by ABSOLUTE path — no data is copied, so
    * cloning a 100 TB table is one manifest write. From then on the two
    * tables share nothing but those initial bytes: mutations on the clone
    * rewrite only touched files into the clone's own `data/` (untouched
    * files carry over by reference), appends land locally, and
    * [[compact]] fully MATERIALIZES the clone (its head then references
    * only local files). Stats ride along, so file skipping works on the
    * clone from the first scan; the cloned files count as the clone's
    * arrivals — a changelog stream feeding from the clone's inception
    * sees them once as the initial backfill, exactly like a create.
    *
    * `version` pins the source snapshot (time-travel clone); default is
    * the source head. The standard shallow-clone caveat applies (as in
    * Delta): [[vacuum]] on the SOURCE does not know about clone
    * references — vacuuming source history past the cloned snapshot
    * breaks the clone unless it was materialized first. The clone's own
    * vacuum can never delete source files (they live outside its root). */
  def cloneShallow(s: SparkSession, srcDir: String, dstDir: String,
                   version: Option[Int] = None): Int = {
    require(currentVersion(dstDir).isEmpty,
      s"cannot clone into $dstDir: a graft table already exists there")
    val head = currentVersion(srcDir).getOrElse(
      throw new IllegalStateException(s"no graft table at $srcDir"))
    val v = version.getOrElse(head)
    require(v >= 0 && v <= head,
      s"no snapshot v$v of $srcDir to clone (head is v$head)")
    val m = manifest(srcDir, v)
    val srcRoot = Paths.get(srcDir).toAbsolutePath.normalize.toString
    val files = m.files
      .map(f => f.copy(path = resolvePath(srcRoot, f.path), arrival = true))
    // fail BEFORE publishing if the snapshot was vacuumed under us —
    // restore's rule: a clone referencing deleted parquet would be a
    // permanently broken table (the exists-check above blocks re-cloning)
    val missing = files.filterNot(f => Files.exists(Paths.get(f.path)))
    require(missing.isEmpty,
      s"cannot clone v$v of $srcDir: ${missing.size} of its data files were " +
        s"vacuumed (first: ${missing.headOption.map(_.path).getOrElse("-")})")
    publish(dstDir, Manifest(0, "clone", m.schemaDdl, files))
    0
  }
}
