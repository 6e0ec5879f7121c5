package graft.streaming

import java.nio.file.Paths

import scala.jdk.CollectionConverters._

import graft.table.{AddFile, CommitInfo, GraftLog, RemoveFile}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming SOURCE over a GraftTable — `readStream
  * .format("graft").load(path)` (and `readStream.table("graft.ns.t")`),
  * mirroring Delta's streamable-table property (the reference's tables are
  * Delta and therefore streamable; ours now are too). Built ONLY on the
  * public DSv2 `MicroBatchStream` API + parquet-hadoop:
  *
  *  - OFFSETS ARE COMMIT VERSIONS: offset v = "everything up to and
  *    including commit v consumed". Exactly-once follows from the commit
  *    log's immutability — a (start, end] range always resolves to the
  *    same files, so checkpoint replay re-plans identical batches.
  *  - The FIRST batch (offset -1 → v) serves the live snapshot at v (the
  *    initial load); every later batch serves exactly the files ADDED by
  *    commits in (start, end].
  *  - DML that REWRITES files (MERGE/DELETE/UPDATE) aborts the stream by
  *    default — appends-only is the contract, as in Delta; option
  *    `ignoreChanges` streams the added files anyway (re-emitting
  *    rewritten rows, Delta's documented semantic). OPTIMIZE/CLONE/
  *    RESTORE-style maintenance commits that add no new rows are skipped
  *    wholesale (our equivalent of Delta's dataChange=false).
  *  - `startingVersion` option starts the tail at a commit instead of the
  *    initial snapshot (the "only new data" shape).
  *
  * Scale: planInputPartitions is a DRIVER-side log fold (metadata only);
  * each file becomes one InputPartition read by executors through
  * parquet-hadoop — no driver data movement, parallelism = files per
  * batch. Rows are decoded straight to InternalRow (no Row round trip).
  */
class GraftMicroBatchStream(tablePath: String, schema: StructType,
    partitionCols: Seq[String], options: Map[String, String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val log = new GraftLog(tablePath)
  private val ignoreChanges = options.get("ignorechanges").exists(_.toBoolean)

  /** `startingVersion`: replay the commit TAIL from this version (0 means
    * "from the very first commit" — the full append history, NOT a folded
    * snapshot: a rewrite anywhere in the covered range triggers the same
    * append-only abort as a live rewrite, per the Delta contract). Absent:
    * the first batch is the folded live snapshot. */
  private val startingVersion: Option[Long] = options.get("startingversion").map(_.toLong)

  /** Trigger.AvailableNow: pin the end version at query start so the run
    * drains exactly the commits that existed then, and stops. */
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(log.latestVersion)

  /** Admission control: `maxFilesPerTrigger` caps each micro-batch's file
    * count (at commit granularity — offsets are whole versions, and a
    * batch always advances at least one version so the stream makes
    * progress). This is what keeps a catch-up read of a long commit
    * backlog from planning one giant batch. */
  override def getDefaultReadLimit: ReadLimit =
    options.get("maxfilespertrigger").map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = availableNowTarget.getOrElse(log.latestVersion)
    val s = start.asInstanceOf[GraftStreamOffset].version
    val end = limit match {
      case mf: ReadMaxFiles =>
        if (s < 0 && startingVersion.isEmpty) {
          // initial snapshot batch: size from the FOLDED live-file count
          // (per-commit add sums overcount files later removed); advance
          // at least to version 0 so the stream makes progress
          var v = 0L
          while (v < cap && liveFileCount(v + 1) <= mf.maxFiles) v += 1
          v
        } else {
          // tail mode: cap the sum of per-commit added files; commits are
          // immutable, so counts are cached across triggers instead of
          // re-reading the whole backlog every time (ADVICE r5)
          var v = s
          var total = 0L
          var stop = false
          while (!stop && v < cap) {
            val n = filesAddedIn(v + 1)
            if (total > 0 && total + n > mf.maxFiles) stop = true
            else { total += n; v += 1 }
          }
          v
        }
      case _ => cap
    }
    GraftStreamOffset(end)
  }

  private val addCountCache = scala.collection.mutable.Map[Long, Long]()
  private def filesAddedIn(v: Long): Long = synchronized {
    addCountCache.getOrElseUpdate(v, {
      val actions = log.readVersion(v)
      val op = actions.collectFirst { case c: CommitInfo => c.operation }
      if (op.exists(nonDataOps.contains)) 0L
      else actions.count(_.isInstanceOf[AddFile]).toLong
    })
  }

  /** Exact live-file count after commit v, folded incrementally (adds −
    * removes per commit; every rewrite pairs its removes with adds, so the
    * running difference equals the snapshot's live-file count) — O(1)
    * amortized per trigger vs re-folding the snapshot. */
  private val liveCountCache = scala.collection.mutable.Map[Long, Long](-1L -> 0L)
  private def liveFileCount(v: Long): Long = synchronized {
    if (!liveCountCache.contains(v)) {
      var base = v - 1
      while (!liveCountCache.contains(base)) base -= 1
      (base + 1 to v).foreach { i =>
        val actions = log.readVersion(i)
        liveCountCache(i) = liveCountCache(i - 1) +
          actions.count(_.isInstanceOf[AddFile]) -
          actions.count(_.isInstanceOf[RemoveFile])
      }
    }
    liveCountCache(v)
  }

  override def reportLatestOffset(): Offset = GraftStreamOffset(log.latestVersion)

  /** Maintenance operations that reorganize files without changing table
    * CONTENT — skipped entirely by the tail reader. */
  private val nonDataOps = Set("OPTIMIZE", "VACUUM", "SET TBLPROPERTIES",
    "UNSET TBLPROPERTIES", "ADD CONSTRAINT", "DROP CONSTRAINT")

  override def initialOffset(): Offset =
    GraftStreamOffset(startingVersion.map(_ - 1).getOrElse(-1L))

  override def latestOffset(): Offset = GraftStreamOffset(log.latestVersion)

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset("""-?\d+""".r.findFirstIn(json).get.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].version
    val e = end.asInstanceOf[GraftStreamOffset].version
    val files: Seq[AddFile] =
      // initial load without startingVersion: the folded live snapshot.
      // With startingVersion (including 0) the TAIL replays from that
      // commit — rewrite detection applies to the whole covered range.
      if (s < 0 && startingVersion.isEmpty) log.snapshotAt(e).files
      else ((s + 1) to e).flatMap { v =>
        val actions = log.readVersion(v)
        val op = actions.collectFirst { case c: CommitInfo => c.operation }
        if (op.exists(nonDataOps.contains)) Nil
        else {
          val removes = actions.collect { case r: RemoveFile => r }
          if (removes.nonEmpty && !ignoreChanges)
            throw new IllegalStateException(
              s"commit $v of $tablePath rewrites files (${op.getOrElse("?")}); " +
                "streaming reads are append-only — set option(\"ignoreChanges\", " +
                "\"true\") to stream added files anyway (rewritten rows re-emit)")
          actions.collect { case a: AddFile => a }
        }
      }
    files.map(f => GraftFilePartition(
      Paths.get(tablePath, f.path).toString, f.partitionValues,
      f.numRecords,
      f.dvPath.map(p => Paths.get(tablePath, p).toString),
      f.path.substring(f.path.lastIndexOf('/') + 1)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory(schema, partitionCols)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = last fully-consumed commit version (-1: nothing consumed). */
case class GraftStreamOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

case class GraftFilePartition(absPath: String,
    partitionValues: Map[String, String], numRecords: Long,
    dvAbsPath: Option[String] = None, fname: String = "") extends InputPartition

/** Decodes one parquet file to InternalRows with parquet-hadoop's Group
  * API (public parquet-mr surface; no Spark-internal reader). Partition
  * columns come from the AddFile's partition values (they are not stored
  * in the file). Supports the flat column types graft tables write;
  * nested types are rejected at stream construction. */
class GraftParquetReaderFactory(schema: StructType, partitionCols: Seq[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new GraftParquetReader(p, schema, partitionCols)
  }
}

class GraftParquetReader(part: GraftFilePartition, schema: StructType,
    partitionCols: Seq[String]) extends PartitionReader[InternalRow] {

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new HPath(part.absPath), new Configuration()))
  private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema

  // project the parquet read to the non-partition fields the scan needs
  // that the file actually has (schema evolution: files predating an added
  // column read it as null, parquet missing-column semantics); `_file` is
  // a per-file constant (the row's group identity), never in the data
  private val dataFields = schema.fields
    .filterNot(f => partitionCols.contains(f.name) || f.name == "_file")
    .filter(f => fileSchema.containsField(f.name))
  private val requested: MessageType = new MessageType(fileSchema.getName,
    dataFields.map(f => fileSchema.getType(fileSchema.getFieldIndex(f.name))): _*)
  // empty projection (count over partition cols only): emit bare rows by count
  private val emptyProjection = dataFields.isEmpty
  private var emptyRemaining = part.numRecords
  if (!emptyProjection) reader.setRequestedSchema(requested)

  // constant partition-column values for every row of this file
  private val partValues: Map[String, Any] = schema.fields
    .filter(f => partitionCols.contains(f.name))
    .map(f => f.name -> castPartitionValue(part.partitionValues(f.name), f.dataType))
    .toMap

  private var rowGroup = Option(reader.readNextRowGroup())
  private var recordReader = rowGroup.map(rg =>
    new ColumnIOFactory().getColumnIO(requested)
      .getRecordReader(rg, new GroupRecordConverter(requested)))
  private var remainingInGroup = rowGroup.map(_.getRowCount).getOrElse(0L)
  private var current: InternalRow = _

  /** Deletion-vector tombstones of THIS file (merge-on-read): loaded once
    * per partition, applied as a row-index skip while decoding. Null when
    * the file has no DV. */
  private val deleted: java.util.BitSet =
    part.dvAbsPath.map(p => graft.table.FileOps
      .dvPositions(Paths.get(p), part.fname)).orNull
  private var rowIdx = -1L

  override def next(): Boolean = {
    if (emptyProjection) {
      while (emptyRemaining > 0) {
        emptyRemaining -= 1
        rowIdx += 1
        if (deleted == null || !deleted.get(rowIdx.toInt)) {
          current = toInternalRow(null)
          return true
        }
      }
      return false
    }
    while (true) {
      while (remainingInGroup == 0) {
        rowGroup = Option(reader.readNextRowGroup())
        if (rowGroup.isEmpty) return false
        recordReader = rowGroup.map(rg =>
          new ColumnIOFactory().getColumnIO(requested)
            .getRecordReader(rg, new GroupRecordConverter(requested)))
        remainingInGroup = rowGroup.get.getRowCount
      }
      val g = recordReader.get.read()
      remainingInGroup -= 1
      rowIdx += 1
      if (deleted == null || !deleted.get(rowIdx.toInt)) {
        current = toInternalRow(g)
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()

  private def toInternalRow(g: Group): InternalRow = {
    val values = schema.fields.map { f =>
      if (f.name == "_file") UTF8String.fromString(part.absPath)
      else if (partitionCols.contains(f.name)) partValues(f.name)
      else if (!requested.containsField(f.name)) null // evolved-in column
      else {
        val idx = requested.getFieldIndex(f.name)
        if (g.getFieldRepetitionCount(idx) == 0) null
        else convert(g, idx, requested.getType(idx), f.dataType)
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  private def convert(g: Group, idx: Int, pt: Type, dt: DataType): Any = dt match {
    case IntegerType => g.getInteger(idx, 0)
    case LongType => g.getLong(idx, 0)
    case ShortType => g.getInteger(idx, 0).toShort
    case ByteType => g.getInteger(idx, 0).toByte
    case DoubleType => g.getDouble(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case BooleanType => g.getBoolean(idx, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
    case BinaryType => g.getBinary(idx, 0).getBytes
    case DateType => g.getInteger(idx, 0) // epoch days, stored as-is
    case TimestampType =>
      pt.asPrimitiveType().getPrimitiveTypeName.name() match {
        case "INT96" => int96ToMicros(g.getInt96(idx, 0).getBytes)
        case _ => // INT64 with a timestamp annotation: normalize to micros
          val raw = g.getLong(idx, 0)
          pt.getLogicalTypeAnnotation match {
            case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              ts.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
                case LogicalTypeAnnotation.TimeUnit.NANOS  => raw / 1000L
                case _ => raw
              }
            case _ => raw
          }
      }
    case other => throw new UnsupportedOperationException(
      s"graft streaming source does not support column type $other")
  }

  /** INT96: 8 bytes little-endian nanos-of-day + 4 bytes Julian day. */
  private def int96ToMicros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }

  private def castPartitionValue(v: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(v)
    case IntegerType => v.toInt
    case LongType => v.toLong
    case DoubleType => v.toDouble
    case BooleanType => v.toBoolean
    case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
    case other => throw new UnsupportedOperationException(
      s"unsupported partition column type for streaming: $other")
  }
}

object GraftTableStream {
  /** Flat-schema validation at stream construction — fail fast, not on an
    * executor mid-batch. */
  def validateSchema(schema: StructType): Unit = schema.fields.foreach { f =>
    f.dataType match {
      case _: ArrayType | _: MapType | _: StructType | _: DecimalType =>
        throw new UnsupportedOperationException(
          s"graft streaming source supports flat primitive schemas; " +
            s"column ${f.name} has type ${f.dataType}")
      case _ => ()
    }
  }
}
