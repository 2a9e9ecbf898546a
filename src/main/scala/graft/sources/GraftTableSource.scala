package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming source over a [[GraftTable]] commit log — the
  * changelog-stream half of the versioned-table story (SCALE.md: "streaming
  * twins read the table's changelog"): the SAME table serves the batch
  * backfill (`GraftTable.read`) and the incremental stream, so ingest gates
  * like d16's run identically in both modes.
  *
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("path", tableDir)
  *     .option("startingVersion", 1)   // default 0 = backfill v0 first
  *     .load()
  * }}}
  *
  * Offsets ARE snapshot versions (`LongOffset(v)` = "snapshots ≤ v
  * emitted"), so exactly-once recovery falls out of the manifest log: a
  * micro-batch is `readChanges(lastCommitted, head)` — the files appended
  * between two manifests, never a rescan of the corpus — and replaying an
  * offset range after a crash reads byte-identical files (snapshots are
  * immutable). The first batch with `startingVersion` v₀ > 0 starts at
  * v₀'s changelog; with the default 0 it is the full v0 snapshot
  * (backfill-then-tail, the Delta-source shape).
  *
  * The stream's schema is pinned at query start (the head manifest's);
  * an ADDITIVE schema evolution committed mid-stream requires a stream
  * restart to surface the new columns — the Delta-source behavior — and
  * the restart resumes loss-free from the checkpointed snapshot offset.
  */
class GraftTableSource(spark: SparkSession, dir: String, startingVersion: Int)
  extends Source {

  override val schema: StructType =
    GraftTableSource.tableSchema(dir)

  private def ver(o: V1Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => other.json.trim.toInt
  }

  /** Latest committed snapshot, if it has reached `startingVersion`. */
  override def getOffset: Option[V1Offset] =
    GraftTable.currentVersion(dir).filter(_ >= startingVersion)
      .map(v => LongOffset(v.toLong))

  /** (start, end] as manifest changelog; `start = None` means "nothing
    * emitted yet": the full `end` snapshot when startingVersion is 0, else
    * the changelog from just before startingVersion. */
  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = ver(end)
    val fromExcl = start.map(ver).getOrElse(startingVersion - 1)
    val raw =
      if (fromExcl < 0) GraftTable.read(spark, dir, Some(to))
      else GraftTable.readChanges(spark, dir, fromExcl, to)
    // project to the schema pinned at query start: columns added by a
    // mid-stream additive evolution stay invisible until a restart (the
    // Delta-source behavior), instead of breaking the running plan.
    // The reverse direction — a RESTART whose pinned (post-evolution)
    // schema is wider than a replayed pre-evolution batch's manifest —
    // resolves the missing columns as typed nulls, so checkpoint recovery
    // across an evolution stays loss-free instead of failing resolution
    val batch = raw.select(schema.fields.map { f =>
      if (raw.columns.contains(f.name)) raw.col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    org.apache.spark.sql.graft.Bridge
      .streamingDataFrame(spark, batch.queryExecution.toRdd, batch.schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$dir, from v$startingVersion]"
}

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
class GraftTableRelation(ctx: SQLContext, dir: String, version: Option[Int])
  extends BaseRelation with PrunedFilteredScan {

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
        .parquet(kept.map(f => s"$dir/${f.path}"): _*)
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

/** `format("graft-table")` registration (META-INF/services). */
class GraftTableSourceProvider extends StreamSourceProvider with RelationProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-table"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    new GraftTableRelation(ctx, parameters("path"),
      parameters.get("versionAsOf").map(_.toInt))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      GraftTableSource.tableSchema(parameters("path"))))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new GraftTableSource(ctx.sparkSession, parameters("path"),
      parameters.get("startingVersion").map(_.toInt).getOrElse(0))
}
