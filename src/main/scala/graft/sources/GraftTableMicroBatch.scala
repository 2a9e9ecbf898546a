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
  /** MICRO_BATCH_READ only: batch reads intentionally fall back to the V1
    * [[GraftTableRelation]], which carries the manifest-stats file
    * skipping ([[org.apache.spark.sql.sources.PrunedFilteredScan]]). */
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val startingVersion = options.getInt("startingVersion", 0)
    new ScanBuilder {
      override def build(): Scan = new GraftTableScan(dir, pinned, startingVersion)
    }
  }
}

class GraftTableScan(dir: String, required: StructType, startingVersion: Int)
  extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"graft-table $dir from v$startingVersion"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftTableMicroBatchStream(dir, required, startingVersion)
}

/** Snapshot-version offset: "snapshots ≤ v emitted". */
case class GraftVersionOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

class GraftTableMicroBatchStream(dir: String, pinned: StructType,
                                 startingVersion: Int) extends MicroBatchStream {

  private def off(o: Offset): Int = o match {
    case GraftVersionOffset(v) => v
    case other => other.json.trim.toInt
  }

  /** Head snapshot if it has reached startingVersion; else "nothing yet"
    * (= initial), which the engine reads as no-new-data. */
  override def latestOffset(): Offset =
    GraftTable.currentVersion(dir).filter(_ >= startingVersion)
      .map(GraftVersionOffset(_)).getOrElse(initialOffset())

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** (start, end] as the manifest changelog; start < startingVersion means
    * "nothing emitted": the full `end` snapshot when startingVersion is 0
    * (backfill-then-tail), else the changelog from just before it. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val fromExcl = off(start)
    val to = off(end)
    if (to <= fromExcl) return Array.empty
    val files =
      if (fromExcl < 0) GraftTable.manifest(dir, to).files
      else GraftTable.addedFiles(dir, fromExcl, to)
    files.map(f =>
      GraftFilePartition(s"$dir/${f.path}", pinned.toDDL): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory

  override def toString: String = s"GraftTableMicroBatchStream[$dir, from v$startingVersion]"
}

/** One manifest data file; the pinned schema rides as DDL (StructType is
  * serializable too, but DDL keeps the task payload small and versionable). */
case class GraftFilePartition(path: String, schemaDdl: String) extends InputPartition

class GraftParquetReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftFilePartition]
    new GraftParquetPartitionReader(gp.path, StructType.fromDDL(gp.schemaDdl))
  }
}

/** Executor-side parquet→[[InternalRow]] decoder on the PUBLIC parquet-java
  * Group API (`GroupReadSupport`). Columns absent from the file (written
  * before an additive evolution, or after — a replay under an older pinned
  * schema) read as null; primitives, strings, binary, arrays (Spark's
  * 3-level list encoding) and nested structs are covered — the types a
  * manifest schema can carry (DECIMAL/MAP never appear in graft tables).
  */
class GraftParquetPartitionReader(path: String, schema: StructType)
  extends PartitionReader[InternalRow] {

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

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = convertStruct(current, schema)

  override def close(): Unit = reader.close()

  private def convertStruct(g: Group, st: StructType): InternalRow = {
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
