package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Schema lookup shared by the streaming (DSv2, [[GraftTableV2]]) and
  * batch ([[GraftTableRelation]]) halves of `format("graft-table")`.
  *
  * The streaming source itself lives in [[GraftTableMicroBatchStream]]:
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("path", tableDir)
  *     .option("startingVersion", 1)   // default 0 = backfill v0 first
  *     .load()
  * }}}
  */
object GraftTableSource {
  private[sources] def tableSchema(dir: String): StructType = {
    val head = GraftTable.currentVersion(dir)
      .getOrElse(throw new IllegalStateException(s"no graft table at $dir"))
    StructType.fromDDL(GraftTable.manifest(dir, head).schemaDdl)
  }
}

/** Batch relation over a [[GraftTable]] snapshot: gives
  * `spark.read.format("graft-table").option("path", dir)` (with
  * `versionAsOf` time travel) and SQL surface
  * `CREATE TABLE/VIEW ... USING `graft-table` OPTIONS (path '...')` — a
  * reference user's `spark.sql` queries run unchanged over the versioned
  * layout. [[PrunedFilteredScan]] integrates the manifest's per-file
  * min/max stats with Catalyst: pushed comparison filters on stats
  * columns drop whole files before Spark opens them (the `scanWhere`
  * skipping, now automatic), columns prune into the parquet scan, and
  * every filter is re-applied above (`unhandledFilters` keeps them all —
  * file skipping is a bound, not an evaluation). */
class GraftTableRelation(ctx: SQLContext, val dir: String, val version: Option[Int])
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** Without `versionAsOf` the head resolves PER SCAN, not at relation
    * creation: a long-lived `CREATE TEMPORARY VIEW ... USING graft-table`
    * then sees later appends on every query (the Delta/Iceberg behavior).
    * The SCHEMA stays pinned at creation (Spark requires a stable relation
    * schema): columns added by a later additive evolution surface after
    * the view is re-created, but their files' rows are visible before
    * that — parquet-by-schema reads. */
  private def currentManifest(): GraftTable.Manifest = GraftTable.manifest(dir,
    version.orElse(GraftTable.currentVersion(dir))
      .getOrElse(throw new IllegalStateException(s"no graft table at $dir")))

  override def sqlContext: SQLContext = ctx
  override val schema: StructType = StructType.fromDDL(currentManifest().schemaDdl)
  // file skipping only bounds the scan; Spark must re-evaluate everything
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  /** Manifest-driven size estimate: sum of the snapshot's on-disk file
    * bytes × the source compression factor — the HadoopFsRelation
    * convention — so a SMALL graft table auto-broadcasts in joins instead
    * of inheriting BaseRelation's "assume huge" default (which forces a
    * shuffle join against even a kilobyte dimension table). A manifest
    * predating the bytes field (any file with 0 = unknown) falls back to
    * the safe default; a files-less snapshot is an empty table. Resolved
    * per CALL like the file list, so the estimate tracks the live head. */
  override def sizeInBytes: Long = {
    val files = currentManifest().files
    if (files.isEmpty) 1L
    else if (files.exists(_.bytes <= 0L))
      ctx.sparkSession.conf.get("spark.sql.defaultSizeInBytes",
        Long.MaxValue.toString).toLong
    else {
      val factor = ctx.sparkSession.conf
        .get("spark.sql.sources.fileCompressionFactor", "1.0").toDouble
      (files.map(_.bytes).sum * factor).toLong
    }
  }

  /** Conservative per-file test: false only when the filter PROVES the
    * stats range [mn, mx] cannot contain a match. Integral values compare
    * against the long stats; string values against the string stats under
    * the SAME binary (UTF-8 byte) order Spark's min/max computed them in
    * — comparing with Java's UTF-16 order instead could wrongly prune a
    * live file on supplementary characters. */
  private def mayMatch(f: GraftTable.TableFile, flt: Filter): Boolean = {
    import GraftTable.strCmp
    // cmp(v) = Some(sign of v vs bound) when a usable (value, stat) pair
    // exists for the column, None (⇒ keep the file) otherwise
    def vsMin(c: String, v: Any): Option[Int] = v match {
      case n: Number => f.stats.get(c).map(r => java.lang.Long.compare(n.longValue, r._1))
      case s: String => f.strStats.get(c).map(r => strCmp(s, r._1))
      case _ => None
    }
    def vsMax(c: String, v: Any): Option[Int] = v match {
      case n: Number => f.stats.get(c).map(r => java.lang.Long.compare(n.longValue, r._2))
      case s: String => f.strStats.get(c).map(r => strCmp(s, r._2))
      case _ => None
    }
    def inRange(c: String, v: Any): Boolean =
      vsMin(c, v).forall(_ >= 0) && vsMax(c, v).forall(_ <= 0)
    flt match {
      case EqualTo(c, v) => inRange(c, v)
      case GreaterThan(c, v) => vsMax(c, v).forall(_ < 0)
      case GreaterThanOrEqual(c, v) => vsMax(c, v).forall(_ <= 0)
      case LessThan(c, v) => vsMin(c, v).forall(_ > 0)
      case LessThanOrEqual(c, v) => vsMin(c, v).forall(_ >= 0)
      case In(c, vs) => vs.exists(inRange(c, _)) // empty IN matches nothing
      case And(l, r) => mayMatch(f, l) && mayMatch(f, r)
      case Or(l, r) => mayMatch(f, l) || mayMatch(f, r)
      case _ => true // IsNull/StartsWith/...: no file-level bound, keep
    }
  }

  /** SQL `INSERT INTO` (append) / `INSERT OVERWRITE` (truncate-and-load,
    * one atomic commit, old files stay time-travelable) on a graft-table
    * view — the V1 [[InsertableRelation]] hook. Stats columns re-derive
    * from the head manifest so inserted files stay prunable; a
    * `versionAsOf`-pinned view refuses (snapshots are immutable). */
  override def insert(data: org.apache.spark.sql.DataFrame, overwrite: Boolean): Unit = {
    require(version.isEmpty,
      s"cannot insert into a versionAsOf-pinned graft-table view of $dir: " +
        "snapshots are immutable — insert through an unpinned view of the head")
    val stats = GraftTable.statsColsOf(dir)
    if (overwrite) GraftTable.overwrite(ctx.sparkSession, dir, data, stats)
    else GraftTable.append(ctx.sparkSession, dir, data, stats)
    ()
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val m = currentManifest()
    val kept = m.files.filter(f => filters.forall(mayMatch(f, _)))
    GraftTableRelation.lastScan.set((kept.size, m.files.size))
    val spark = ctx.sparkSession
    val df =
      if (kept.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.schema(schema)
        .parquet(kept.map(f => GraftTable.resolvePath(dir, f.path)): _*)
    df.select(requiredColumns.toSeq.map(org.apache.spark.sql.functions.col): _*).rdd
  }
}

object GraftTableRelation {
  /** (files read, files in snapshot) of the most recent buildScan — the
    * observable the skipping tests assert on (BaseRelation has no
    * inputFiles surface). */
  private[graft] val lastScan =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))
}

/** `format("graft-table")` registration (META-INF/services).
  *
  * Split personality by design: STREAMING resolves through the DSv2
  * [[org.apache.spark.sql.connector.catalog.TableProvider]] surface
  * ([[GraftTableV2]] advertises MICRO_BATCH_READ only), while BATCH reads
  * fall back to the V1 [[GraftTableRelation]] — which carries the
  * manifest-stats file skipping and `versionAsOf` time travel. */
class GraftTableSourceProvider extends RelationProvider
  with CreatableRelationProvider
  with DataSourceRegister
  with StreamSinkProvider
  with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft-table"

  /** `df.writeStream.format("graft-table")` — the native streaming write
    * (see [[GraftTableSink]]). Resolution: [[GraftTableV2]] does not
    * advertise STREAMING_WRITE, so the engine falls back to this V1 hook
    * — the deliberate V1-for-writes split, mirroring batch reads.
    * Exactly-once identity: explicit `appId` option, else a fingerprint
    * of `checkpointLocation` (stable across restarts of the same logical
    * stream, distinct between streams — the identity the token protocol
    * needs). A query with neither refuses rather than defaulting to a
    * shared id that would make two different streams swallow each
    * other's batches. */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table streaming write requires option 'path'"))
    require(partitionColumns.isEmpty,
      "graft-table does not support partitionBy; use compact(clusterBy) for layout")
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Update(),
      "graft-table streaming write supports Append and Complete modes; " +
        "Update re-emits changed rows without old identities — use " +
        "foreachBatch(GraftTable.upsert) for keyed maintenance")
    val appId = parameters.get("appId")
      .orElse(parameters.get("checkpointLocation").map { cp =>
        "ckpt-" + java.security.MessageDigest.getInstance("MD5")
          .digest(cp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString.take(16)
      })
      .getOrElse(throw new IllegalArgumentException(
        "graft-table streaming write needs option 'appId' or a " +
          "'checkpointLocation' to derive a stable exactly-once identity"))
    val stats = parameters.get("statsColumns").toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
    new GraftTableSink(ctx, dir, appId, stats, outputMode)
  }

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    new GraftTableRelation(ctx, parameters("path"),
      parameters.get("versionAsOf").map(_.toInt))

  /** `df.write.format("graft-table").option("path", dir).mode(m).save()`
    * — the idiomatic DataFrameWriter surface over the versioned commits,
    * and the create-as-select form of this source (persistent-catalog
    * `CREATE TABLE … AS SELECT` routes through the V2 session catalog,
    * which demands full V2 BATCH_WRITE — the deliberate V1-for-batch
    * split at [[GraftTableV2.capabilities]]; the SQL surface is the
    * TEMPORARY VIEW USING form, which covers reads and all DML).
    * `statsColumns` (comma-separated) declares skipping bounds on a fresh
    * create; an existing table keeps its own (manifest-derived) and the
    * option must not disagree. SaveMode maps onto commit ops: Append →
    * one append commit, Overwrite → one truncate-and-load commit (old
    * snapshots stay time-travelable), ErrorIfExists/Ignore per contract. */
  override def createRelation(ctx: SQLContext,
                              mode: org.apache.spark.sql.SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table write requires option 'path'"))
    val optCols = parameters.get("statsColumns").toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
    GraftTable.currentVersion(dir) match {
      case None =>
        GraftTable.create(ctx.sparkSession, dir, data, optCols)
      case Some(_) =>
        // a boundless head (statsColsOf == Nil: created empty, or every
        // bound so far was null/over-cap) has no declaration to disagree
        // with — adopt the writer's so the skipping schema can still be
        // (re-)established rather than erased forever
        val existing = GraftTable.statsColsOf(dir)
        val stats = if (existing.isEmpty) optCols else existing
        require(optCols.isEmpty || existing.isEmpty || optCols.sorted == existing,
          s"statsColumns ${optCols.mkString(",")} disagree with the table's " +
            s"manifest-declared ${existing.mkString(",")} — the skipping schema " +
            "is fixed at create time")
        mode match {
          case SaveMode.Append => GraftTable.append(ctx.sparkSession, dir, data, stats)
          case SaveMode.Overwrite => GraftTable.overwrite(ctx.sparkSession, dir, data, stats)
          case SaveMode.ErrorIfExists =>
            throw new IllegalStateException(s"graft table already exists at $dir")
          case SaveMode.Ignore => ()
        }
    }
    new GraftTableRelation(ctx, dir, None)
  }

  /** The micro-batch engine builds streaming scans WITHOUT pushdown
    * (column pruning only runs on batch V2 relations), so projection has
    * an explicit seam instead: `.option("readColumns", "doc_id,source")`
    * narrows the stream's schema — the partition readers then project the
    * parquet footer to those fields and never read or decode the rest
    * (the text column of a wide documents table stays untouched). */
  private def narrow(full: StructType,
                     readColumns: Option[String]): StructType =
    readColumns.map { cs =>
      val names = cs.split(',').map(_.trim).filter(_.nonEmpty)
      StructType(names.map(n => full.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"readColumns: '$n' is not a column of ${full.fieldNames.mkString(",")}"))))
    }.getOrElse(full)

  /** A not-yet-created table infers an EMPTY schema instead of throwing:
    * `DataFrameWriter.save()` probes the V2 table (for the BATCH_WRITE
    * capability check) BEFORE falling back to [[createRelation]], and the
    * first write must be able to create the table. Reads of a missing
    * table still fail with the clear V1-relation error — batch reads
    * never consult this path's schema (V2 is micro-batch-only). */
  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val dir = options.get("path")
    if (GraftTable.currentVersion(dir).isEmpty) new StructType()
    else {
      val base = narrow(GraftTableSource.tableSchema(dir),
        Option(options.get("readColumns")))
      // the streaming change feed carries its two metadata columns; the
      // initial-snapshot backfill surfaces as _change_type='insert'
      if (options.getBoolean("readChangeFeed", false))
        base.add(GraftTable.ChangeTypeCol, "string").add("_commit_version", "int")
      else base
    }
  }

  override def getTable(schema: StructType,
                        partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
                        properties: java.util.Map[String, String]): org.apache.spark.sql.connector.catalog.Table =
    new GraftTableV2(properties.get("path"), schema)
}
