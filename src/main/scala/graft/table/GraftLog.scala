package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot = the table state at one version: last metaData wins, live files
  * = adds minus removes, replayed over commits 0..version (Delta protocol
  * semantics — SURVEY.md §2-B.1). */
final case class Snapshot(version: Long, metaData: MetaData, files: Seq[AddFile]) {
  lazy val schema: StructType = DataType.fromJson(metaData.schemaString).asInstanceOf[StructType]
}

/** The `_delta_log/` of a GraftTable: numbered JSON commit files.
  *
  * Commit N is `_delta_log/%020d.json`. Atomicity/mutual exclusion comes from
  * CREATE_NEW file creation: exactly one writer can create version N (POSIX
  * O_EXCL — sufficient on local/HDFS-like stores; an object store would need
  * a LogStore with a putIfAbsent primitive, as public Delta does).
  */
final class GraftLog(val tablePath: String) {
  val logDir: Path = Paths.get(tablePath, "_delta_log")

  def exists: Boolean = Files.isDirectory(logDir) && listVersions.nonEmpty

  def versionFile(v: Long): Path = logDir.resolve(f"$v%020d.json")

  def listVersions: Seq[Long] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted

  def latestVersion: Long = {
    val vs = listVersions
    require(vs.nonEmpty, s"$tablePath is not a GraftTable: empty ${logDir}")
    vs.last
  }

  def readVersion(v: Long): Seq[Action] = {
    val f = versionFile(v)
    require(Files.exists(f), s"version $v does not exist for table $tablePath")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(Actions.fromJson)
  }

  /** Atomically create commit `v`. Throws if `v` already exists (lost race —
    * caller re-resolves the latest version and retries or aborts). */
  def commit(v: Long, actions: Seq[Action]): Unit = {
    Files.createDirectories(logDir)
    val body = actions.map(Actions.toJson).mkString("", "\n", "\n")
    try
      Files.write(versionFile(v), body.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit: version $v already exists in $tablePath")
    }
  }

  /** Replay commits 0..v into a Snapshot. Linear in log length — fine for
    * the log sizes here; the Delta-protocol answer at scale is checkpoint
    * files every N commits, which this layout leaves room for. */
  def snapshotAt(v: Long): Snapshot = {
    var meta: Option[MetaData] = None
    val live = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    (0L to v).foreach { i =>
      readVersion(i).foreach {
        case m: MetaData   => meta = Some(m)
        case a: AddFile    => live(a.path) = a
        case r: RemoveFile => live.remove(r.path)
        case _: CommitInfo => ()
      }
    }
    Snapshot(v, meta.getOrElse(throw new IllegalStateException(
      s"no metaData in log of $tablePath")), live.values.toSeq)
  }

  /** All commitInfo records, one per version, ascending. */
  def commitInfos: Seq[CommitInfo] =
    listVersions.flatMap(v => readVersion(v).collectFirst { case c: CommitInfo => c })

  /** Strictly-increasing commit timestamp (guards timestampAsOf resolution
    * against clock granularity between rapid commits). */
  def nextTimestamp(): Long = {
    val prev = commitInfos.lastOption.map(_.timestamp).getOrElse(Long.MinValue)
    math.max(System.currentTimeMillis(), prev + 1)
  }
}
