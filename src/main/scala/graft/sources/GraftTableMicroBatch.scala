package graft.sources

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-V2 micro-batch stream over a [[GraftTable]] commit log — the
  * PUBLIC-API form of the changelog source (replaces the former V1
  * `Source` that needed a package-injected shim to reach
  * `internalCreateDataFrame`; DSv2 hands partitions + readers to the
  * engine and never constructs a DataFrame itself).
  *
  * Offsets ARE snapshot versions (`json` = the int): a micro-batch is the
  * file set `addedFiles(lastCommitted, head)` — append arrivals only,
  * compaction/delete rewrites contribute nothing — and replaying an offset
  * range after recovery reads byte-identical files (snapshots are
  * immutable), so exactly-once falls out of the manifest log.
  *
  * One [[InputPartition]] per manifest data file; each partition reader
  * decodes its parquet file against the schema PINNED at query start, so a
  * replayed pre-evolution batch resolves later-added columns as nulls and
  * a mid-stream evolution stays invisible until restart (Delta behavior).
  * A production deployment would split partitions by row group and ship
  * the Hadoop conf; the changelog batches this serves are ingest deltas,
  * not full-corpus scans.
  */
class GraftTableV2(dir: String, pinned: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-table `$dir`"
  override def schema(): StructType = pinned
  /** MICRO_BATCH_READ only — a deliberate split, not a migration gap:
    * batch reads fall back to the V1 [[GraftTableRelation]]
    * ([[org.apache.spark.sql.sources.PrunedFilteredScan]]), which does
    * manifest-stats file skipping and then DELEGATES to Spark's own
    * parquet source — vectorized columnar decode, whole-stage codegen,
    * row-group pushdown. Advertising BATCH_READ here would route batch
    * scans through [[GraftParquetPartitionReader]]'s row-at-a-time Group
    * decoder instead: correct for ingest-delta micro-batches (small by
    * construction), a regression for corpus-sized batch scans. The only
    * public-API way to get vectorized batch V2 reads is to reimplement
    * Spark's ParquetScan (internal), so V1-for-batch is the
    * faster-and-public choice. */
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // fail FAST on a missing table: inferSchema tolerates absence (the
    // DataFrameWriter probes it before creating), so the read path must
    // re-check — a typo'd path would otherwise stream zero columns forever
    require(GraftTable.currentVersion(dir).nonEmpty,
      s"no graft table at $dir")
    val startingVersion = options.getInt("startingVersion", 0)
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map(_.toInt)
    val cdcMode = options.getBoolean("readChangeFeed", false)
    // `filterEq` = "col=value": the micro-batch engine applies no pushdown
    // to streaming scans, so the equality-predicate seam is explicit (the
    // readColumns precedent). Manifest stats drop whole non-matching
    // arrival files before they are planned; the partition readers apply
    // the exact row filter — a gate tailing one source's arrivals of a
    // clustered 100 TB table plans only that source's files.
    val filterEq = Option(options.get("filterEq")).map { s =>
      val i = s.indexOf('=')
      require(i > 0, s"filterEq must be 'col=value', got '$s'")
      (s.substring(0, i).trim, s.substring(i + 1))
    }
    filterEq.foreach { case (c, _) =>
      require(pinned.fieldNames.contains(c),
        s"filterEq column '$c' is not in the read schema " +
          s"${pinned.fieldNames.mkString(",")} (add it to readColumns)")
      // the feed's metadata columns are STAMPED after the row filter runs
      // (synthesized files don't carry them) — a filterEq on them would
      // silently drop every synthesized row; filter after load() instead
      require(!(cdcMode && (c == GraftTable.ChangeTypeCol || c == "_commit_version")),
        s"filterEq cannot target the change-feed metadata column '$c' " +
          "(stamped after the row filter) — apply .filter after load()")
    }
    new ScanBuilder {
      override def build(): Scan =
        new GraftTableScan(dir, pinned, startingVersion, maxFiles, filterEq,
          cdcMode)
    }
  }
}

class GraftTableScan(dir: String, required: StructType, startingVersion: Int,
                     maxFilesPerTrigger: Option[Int],
                     filterEq: Option[(String, String)] = None,
                     cdcMode: Boolean = false)
  extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"graft-table $dir from v$startingVersion"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftTableMicroBatchStream(dir, required, startingVersion,
      maxFilesPerTrigger, filterEq, cdcMode)
}

/** Stream offset in one of three shapes (json kept back-compatible with
  * the original plain-int form, so old checkpoints deserialize):
  *
  *  - `v` (plain int, `backfillTo = idx = -1`): versions ≤ v fully
  *    emitted; v = startingVersion−1 means "nothing yet".
  *  - `{"backfill":B,"idx":i}`: the initial snapshot read was PINNED at
  *    version B and its first i files are emitted (the
  *    maxFilesPerTrigger-bounded backfill in flight).
  *  - `{"v":v,"idx":i}`: versions ≤ v fully emitted PLUS the first i
  *    arrival files of version v+1 (a bounded batch split a commit).
  */
case class GraftStreamOffset(v: Int, backfillTo: Int = -1, idx: Int = -1,
                             cdc: Boolean = false) extends Offset {
  // idx-carrying (split) offsets record the MODE that produced them: a
  // split index addresses a position in that mode's unit-file list, so
  // resuming a checkpoint under the other mode would silently skip or
  // re-deliver files — the stream refuses instead. Whole-commit offsets
  // (plain int) are mode-independent and omit the marker.
  private def flag = if (cdc) ""","cdc":true""" else ""
  override def json: String =
    if (backfillTo >= 0) s"""{"backfill":$backfillTo,"idx":$idx$flag}"""
    else if (idx >= 0) s"""{"v":$v,"idx":$idx$flag}"""
    else v.toString
}

object GraftStreamOffset {
  private val B = """\{"backfill":(-?\d+),"idx":(\d+)(,"cdc":true)?\}""".r
  private val V = """\{"v":(-?\d+),"idx":(\d+)(,"cdc":true)?\}""".r
  def parse(json: String): GraftStreamOffset = json.trim match {
    case B(b, i, c) => GraftStreamOffset(-1, b.toInt, i.toInt, cdc = c != null)
    case V(v, i, c) => GraftStreamOffset(v.toInt, -1, i.toInt, cdc = c != null)
    case s => GraftStreamOffset(s.toInt)
  }
}

object GraftTableMicroBatchStream {
  /** (files planned, files in range pre-filter) of the latest
    * planInputPartitions — the test hook proving filterEq's manifest-stats
    * skipping (the [[GraftTableRelation.lastScan]] precedent). */
  private[graft] val lastPlanned =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))
}

class GraftTableMicroBatchStream(dir: String, pinned: StructType,
                                 startingVersion: Int,
                                 maxFilesPerTrigger: Option[Int] = None,
                                 filterEq: Option[(String, String)] = None,
                                 cdcMode: Boolean = false)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  /** Trigger.AvailableNow cap, pinned at query start: without native
    * support the engine falls back to ONE unbounded batch (Trigger.Once
    * semantics), defeating maxFilesPerTrigger exactly where it matters —
    * the giant backfill. */
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = GraftTable.currentVersion(dir).filter(_ >= startingVersion)

  private def off(o: Offset): GraftStreamOffset = {
    val g = o match {
      case g0: GraftStreamOffset => g0
      case other => GraftStreamOffset.parse(other.json)
    }
    // a SPLIT offset indexes one mode's unit-file list — resuming it under
    // the other mode would silently skip or re-deliver files
    require(g.idx < 0 || g.cdc == cdcMode,
      s"checkpointed split offset ${g.json} was written with readChangeFeed=" +
        s"${g.cdc} but this stream runs readChangeFeed=$cdcMode — finish the " +
        "stream in its original mode (or restart from a fresh checkpoint)")
    g
  }

  /** Arrival files of commit v+1 (deterministic order: manifests list a
    * commit's files sorted by path, addedFiles preserves it). */
  private def arrivals(v: Int): Seq[GraftTable.TableFile] =
    GraftTable.addedFiles(dir, v, v + 1)

  /** CDC mode: the unit files of commit v+1 with their change-type stamp
    * (None = a sidecar file carrying its own `_change_type` column) —
    * mirrors [[GraftTable.readCdc]]'s per-commit source selection, in a
    * deterministic order so offset arithmetic can split inside a commit.
    * A delete/update commit written without CDC fails the stream with the
    * same refusal as the batch feed. */
  private def changeFiles(v: Int):
      Seq[(GraftTable.TableFile, Option[String])] = {
    val m = GraftTable.manifest(dir, v + 1)
    if (m.cdcFiles.nonEmpty) m.cdcFiles.map(f => (f, None))
    else m.op match {
      case "compact" => Nil
      case "delete" | "update" => throw new IllegalStateException(
        s"commit v${v + 1} of $dir is op=${m.op} written without CDC " +
          "(spark.graft.cdc was not true at write time): the change feed " +
          "cannot serve its removed rows — enable spark.graft.cdc before " +
          "mutating, or restart the consumer from a full snapshot")
      case "overwrite" | "restore" =>
        val prevM = GraftTable.manifest(dir, v)
        val cur = m.files.map(_.path).toSet
        val prev = prevM.files.map(_.path).toSet
        prevM.files.filterNot(f => cur(f.path)).map(f => (f, Some("delete"))) ++
          m.files.filterNot(f => prev(f.path)).map(f => (f, Some("insert")))
      case _ => arrivals(v).map(f => (f, Some("insert")))
    }
  }

  /** One commit's unit-file list under the active mode — the single list
    * both the admission-control budget walk and partition planning slice,
    * so a split offset always addresses the same file. */
  private def units(v: Int): Seq[(GraftTable.TableFile, Option[String])] =
    if (cdcMode) changeFiles(v) else arrivals(v).map(f => (f, None))

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = GraftStreamOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset = GraftStreamOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def reportLatestOffset(): Offset =
    GraftTable.currentVersion(dir).filter(_ >= startingVersion)
      .map(GraftStreamOffset(_)).getOrElse(initialOffset())

  /** Unbounded form — the engine uses the admission-controlled overload. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = off(start)
    val liveHead = GraftTable.currentVersion(dir).filter(_ >= startingVersion)
      .getOrElse(return start)
    // under Trigger.AvailableNow, never advance past the snapshot pinned
    // at query start — commits racing the drain wait for the next run
    val head = availableNowCap.fold(liveHead)(math.min(_, liveHead))
    val budget0 = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _ => Int.MaxValue
    }
    if (s.backfillTo >= 0) {
      // bounded initial-snapshot backfill in flight (pinned at B)
      val total = GraftTable.manifest(dir, s.backfillTo).files.size
      if (s.idx + budget0 >= total) GraftStreamOffset(s.backfillTo)
      else GraftStreamOffset(-1, s.backfillTo, s.idx + budget0, cdc = cdcMode)
    } else if (s.v < 0 && s.idx < 0) {
      // nothing emitted, startingVersion == 0: pin the backfill at head
      val total = GraftTable.manifest(dir, head).files.size
      if (budget0 >= total) GraftStreamOffset(head)
      else GraftStreamOffset(-1, head, budget0, cdc = cdcMode)
    } else {
      // tail: walk whole commits (and empty ones for free) under budget,
      // splitting inside a commit when its unit-file list exceeds it
      var v = s.v
      var i = math.max(s.idx, 0)
      var budget = budget0
      while (v < head) {
        val arr = units(v)
        val remaining = arr.size - i
        if (remaining <= budget) { budget -= remaining; v += 1; i = 0 }
        else return GraftStreamOffset(v, -1, i + budget, cdc = cdcMode)
      }
      GraftStreamOffset(head)
    }
  }

  /** The file set of (start, end] under the offset semantics above. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = off(start)
    val e = off(end)
    // an empty range (recovery re-plan, no-progress tick) must not touch
    // any manifest: (v, 0) references commit v+1, which may not exist yet
    if (s == e) return Array.empty
    // (file, change-type stamp, commit version); the stamp is None for a
    // CDC sidecar (its _change_type rides in the file) and in non-CDC mode
    val snapStamp = if (cdcMode) Some("insert") else None
    val files: Seq[(GraftTable.TableFile, Option[String], Int)] =
      if (e.backfillTo >= 0) {
        // still inside the pinned backfill
        val all = GraftTable.manifest(dir, e.backfillTo).files
        val from = if (s.backfillTo >= 0) s.idx else 0
        all.slice(from, e.idx).map((_, snapStamp, e.backfillTo))
      } else if (s.backfillTo >= 0) {
        // backfill completes at e.v == the pinned snapshot
        GraftTable.manifest(dir, s.backfillTo).files.drop(s.idx)
          .map((_, snapStamp, s.backfillTo))
      } else if (s.v < 0 && s.idx < 0) {
        // unbounded first batch: the full snapshot at e.v
        if (e.v < 0) Seq.empty
        else GraftTable.manifest(dir, e.v).files.map((_, snapStamp, e.v))
      } else {
        // tail range, possibly split inside the first and/or last commit.
        // Normalize both ends to (complete-through version, partial count
        // into the NEXT commit's unit list): plain v ≡ (v, 0).
        val sPart = math.max(s.idx, 0)
        val ePart = math.max(e.idx, 0)
        def of(v: Int) = units(v).map { case (f, t) => (f, t, v + 1) }
        if (e.v == s.v && ePart <= sPart) Seq.empty // before units() I/O
        else if (e.v == s.v) of(s.v).slice(sPart, ePart)
        else
          of(s.v).drop(sPart) ++                             // rest of commit s.v+1
            ((s.v + 1) until e.v).flatMap(of) ++             // commits s.v+2 .. e.v
            (if (ePart > 0) of(e.v).take(ePart) else Seq.empty)
      }
    // filterEq file skipping: a file whose manifest stats range PROVES the
    // equality can't match is never planned (conservative: no stats for
    // the column ⇒ keep — CDC sidecars carry no stats, so they always
    // plan). The budget/offset arithmetic above stays on the PRE-filter
    // changelog, so offsets remain stable if the filter changes across
    // restarts.
    val kept = filterEq match {
      case None => files
      case Some((c, v)) => files.filter { case (f, _, _) =>
        val longOk = scala.util.Try(v.toLong).toOption.forall(n =>
          f.stats.get(c).forall { case (mn, mx) => n >= mn && n <= mx })
        val strOk = f.strStats.get(c).forall { case (mn, mx) =>
          GraftTable.strCmp(v, mn) >= 0 && GraftTable.strCmp(v, mx) <= 0 }
        longOk && strOk
      }
    }
    GraftTableMicroBatchStream.lastPlanned.set((kept.size, files.size))
    kept.map { case (f, stamp, cv) =>
      GraftFilePartition(GraftTable.resolvePath(dir, f.path), pinned.toDDL,
        filterEq.map(fe => s"${fe._1}=${fe._2}"),
        changeType = stamp,
        commitVersion = if (cdcMode) cv else -1): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory

  override def toString: String = s"GraftTableMicroBatchStream[$dir, from v$startingVersion]"
}

/** One manifest data file; the pinned schema rides as DDL (StructType is
  * serializable too, but DDL keeps the task payload small and versionable).
  * `changeType`/`commitVersion` are the change-feed constants stamped onto
  * every row of a SYNTHESIZED change file (a sidecar file carries its own
  * `_change_type`; -1 = not a change-feed read). */
case class GraftFilePartition(path: String, schemaDdl: String,
                              filterEq: Option[String] = None,
                              changeType: Option[String] = None,
                              commitVersion: Int = -1) extends InputPartition

class GraftParquetReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftFilePartition]
    new GraftParquetPartitionReader(gp.path, StructType.fromDDL(gp.schemaDdl),
      gp.filterEq.map { s =>
        val i = s.indexOf('='); (s.substring(0, i), s.substring(i + 1))
      }, gp.changeType, gp.commitVersion)
  }
}

/** Executor-side parquet→[[InternalRow]] decoder on the PUBLIC parquet-java
  * Group API (`GroupReadSupport`). Columns absent from the file (written
  * before an additive evolution, or after — a replay under an older pinned
  * schema) read as null; primitives, strings, binary, arrays (Spark's
  * 3-level list encoding) and nested structs are covered — the types a
  * manifest schema can carry (DECIMAL/MAP never appear in graft tables).
  */
class GraftParquetPartitionReader(path: String, schema: StructType,
                                  filterEq: Option[(String, String)] = None,
                                  changeType: Option[String] = None,
                                  commitVersion: Int = -1)
  extends PartitionReader[InternalRow] {

  // change-feed constant columns, resolved once against the read schema:
  // a synthesized file stamps both; a sidecar file stamps only the
  // version (its _change_type is decoded from the file itself)
  private val stampType: Option[(Int, UTF8String)] = changeType.flatMap { t =>
    val i = schema.fieldNames.indexOf(GraftTable.ChangeTypeCol)
    if (i < 0) None else Some((i, UTF8String.fromString(t)))
  }
  private val stampVersion: Option[Int] =
    if (commitVersion < 0) None
    else Some(schema.fieldNames.indexOf("_commit_version")).filter(_ >= 0)

  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.util.HadoopInputFile

  private val conf = new Configuration()
  private val hPath = new org.apache.hadoop.fs.Path(path)

  // project the FILE's own schema down to the pruned read columns (taking
  // the file's types verbatim sidesteps any re-construction mismatch);
  // parquet then skips the unrequested column chunks entirely — the
  // pruning half of "filters and column selection reach the scan"
  locally {
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    val fileSchema = try fr.getFileMetaData.getSchema finally fr.close()
    val kept = schema.fieldNames.filter(fileSchema.containsField)
    if (kept.nonEmpty) {
      val projected = new org.apache.parquet.schema.MessageType(
        fileSchema.getName,
        kept.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projected.toString)
    }
  }

  private val reader: ParquetReader[Group] = ParquetReader
    .builder(new GroupReadSupport(), hPath)
    .withConf(conf)
    .build()
  private var current: Group = _

  // filterEq row predicate, resolved once: (field index in the read
  // schema, expected decoded value) — string or integral equality only
  private val eqCheck: Option[(Int, Any)] = filterEq.map { case (c, v) =>
    val i = schema.fieldIndex(c)
    val target: Any = schema(i).dataType match {
      case StringType => UTF8String.fromString(v)
      case LongType => v.toLong
      case IntegerType => v.toInt
      case ShortType => v.toShort
      case ByteType => v.toByte
      case other => throw new IllegalArgumentException(
        s"filterEq supports string/integral columns, '$c' is ${other.simpleString}")
    }
    (i, target)
  }

  private def rowMatches(g: Group): Boolean = eqCheck.forall { case (i, want) =>
    val f = schema(i)
    g.getType.containsField(f.name) && {
      val idx = g.getType.getFieldIndex(f.name)
      g.getFieldRepetitionCount(idx) > 0 && convertValue(g, idx, f.dataType) == want
    }
  }

  override def next(): Boolean = {
    current = reader.read()
    while (current != null && !rowMatches(current)) current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = convertStruct(current, schema)
    stampType.foreach { case (i, t) => row.update(i, t) }
    stampVersion.foreach(i => row.update(i, commitVersion))
    row
  }

  override def close(): Unit = reader.close()

  private def convertStruct(g: Group, st: StructType): GenericInternalRow = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      val f = st(i)
      vals(i) =
        if (!g.getType.containsField(f.name)) null
        else {
          val idx = g.getType.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(idx) == 0) null
          else convertValue(g, idx, f.dataType)
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def convertValue(g: Group, idx: Int, dt: DataType): Any = dt match {
    case LongType => g.getLong(idx, 0)
    case IntegerType => g.getInteger(idx, 0)
    case ShortType => g.getInteger(idx, 0).toShort
    case ByteType => g.getInteger(idx, 0).toByte
    case DoubleType => g.getDouble(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case BooleanType => g.getBoolean(idx, 0)
    case StringType => UTF8String.fromString(g.getString(idx, 0))
    case BinaryType => g.getBinary(idx, 0).getBytes
    case ArrayType(et, _) =>
      // Spark's 3-level list: optional group <name> (LIST) {
      //   repeated group list { <element> element } }
      val lst = g.getGroup(idx, 0)
      val n = lst.getFieldRepetitionCount(0)
      val arr = new Array[Any](n)
      var j = 0
      while (j < n) {
        val el = lst.getGroup(0, j)
        arr(j) =
          if (el.getFieldRepetitionCount(0) == 0) null
          else convertValue(el, 0, et)
        j += 1
      }
      new GenericArrayData(arr)
    case st: StructType => convertStruct(g.getGroup(idx, 0), st)
    case other =>
      throw new UnsupportedOperationException(
        s"graft-table stream: unsupported column type ${other.simpleString}")
  }
}
