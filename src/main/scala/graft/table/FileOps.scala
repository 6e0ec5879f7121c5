package graft.table

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.DataFrame

/** Data-file plumbing: stage a DataFrame write, move the part files into the
  * table directory under fresh UUID names, and harvest per-file footer stats
  * (row count + column min/max) into AddFile actions for data skipping.
  *
  * Local-filesystem moves are used here; at cluster scale the same protocol
  * runs over any store with rename — the log, not the file system, provides
  * atomicity (files are invisible until their commit lands).
  */
// Serializable: the distributed footer harvest in writeDataFiles ships a
// closure over this module's methods to executors (deserializes back to
// the singleton — no state crosses the wire)
object FileOps extends Serializable {

  /** Table property capping how many leading schema columns carry min/max/
    * null-count stats in the log — Delta's `dataSkippingNumIndexedCols`,
    * same default (32). Without a cap, a 1,000-column feature table puts
    * ~3,000 stat entries into EVERY AddFile: at 1M files that is the log
    * bloat the 32-char string truncation exists to prevent, arriving by
    * column count instead of value width. Negative = index every column. */
  val NumIndexedColsProp = "dataSkipping.numIndexedCols"
  val NumIndexedColsDefault = 32

  /** Stat keys the cap keeps for `meta`, or None = keep everything.
    * First-N schema columns plus the columns pruning lives by regardless
    * of position — partition and clustering columns — in both logical and
    * physical (column-mapping) spellings; `__shred_*` keys (variant shred
    * stats, materialized expressly for skipping) are always kept by
    * [[capAddStats]] itself. */
  private def statKeepSet(meta: MetaData): Option[Set[String]] = {
    val n = meta.properties.get(NumIndexedColsProp)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(NumIndexedColsDefault)
    if (n < 0) return None
    val schema =
      try org.apache.spark.sql.types.DataType.fromJson(meta.schemaString)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      catch { case _: Exception => return None } // unparseable → no capping
    val firstN = schema.fields.take(n)
    val cluster = meta.properties.get("clustering.columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    // identity columns always keep their max stat: bumpedProps REQUIREs it
    // to advance the allocation frontier — capping it would brick appends
    val identity = IdentityColumns.names(schema).toSeq
    val always = (meta.partitionColumns ++ cluster ++ identity).flatMap(c =>
      Seq(c) ++ schema.fields.find(_.name == c).map(ColumnMapping.physicalName))
    Some((firstN.map(_.name) ++ firstN.map(ColumnMapping.physicalName) ++
      always).toSet)
  }

  /** Apply the stats-column cap to freshly-harvested AddFiles. Driver-side
    * and O(files × stat entries) — the harvest itself still reads every
    * footer column (one pass, no extra IO); only what the LOG records is
    * capped. Dropping a stat can only disable skipping on that column
    * (conservative), never mis-prune. */
  def capAddStats(meta: MetaData, adds: Seq[AddFile]): Seq[AddFile] =
    statKeepSet(meta) match {
      case None => adds
      case Some(keep) =>
        def f[V](m: Map[String, V]): Map[String, V] =
          m.filter { case (k, _) => keep(k) || k.startsWith("__shred_") }
        adds.map(a => a.copy(minValues = f(a.minValues),
          maxValues = f(a.maxValues), nullCounts = f(a.nullCounts)))
    }

  /** Per-session reference-counted flip of the parquet output-timestamp
    * conf. Concurrent writers on ONE SparkSession share the SQLConf, so a
    * naive set/write/restore races: another thread's write could be
    * planned after the restore and land INT96 (no footer stats → no time
    * skipping), or observe a mid-flip value and write footer stats
    * DataSkipping would compare under the wrong unit. The guard keeps the
    * conf at TIMESTAMP_MICROS for as long as ANY write is in flight and
    * restores the session default only when the last writer exits — no
    * writer ever observes a mid-flip value, and writes stay fully
    * concurrent (the lock covers only the enter/exit bookkeeping, never
    * the write job itself). WeakHashMap so dropped sessions don't pin. */
  private val TsKey = "spark.sql.parquet.outputTimestampType"
  private final class TsGuard { var depth = 0; var prev: String = null }
  private val tsGuards =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, TsGuard]()

  private def enterMicros(sess: org.apache.spark.sql.SparkSession): Unit =
    tsGuards.synchronized {
      var g = tsGuards.get(sess)
      if (g == null) { g = new TsGuard; tsGuards.put(sess, g) }
      if (g.depth == 0) {
        g.prev = sess.conf.get(TsKey)
        sess.conf.set(TsKey, "TIMESTAMP_MICROS")
      }
      g.depth += 1
    }

  private def exitMicros(sess: org.apache.spark.sql.SparkSession): Unit =
    tsGuards.synchronized {
      val g = tsGuards.get(sess)
      g.depth -= 1
      if (g.depth == 0) sess.conf.set(TsKey, g.prev)
    }

  /** Write `df` as parquet files inside `tablePath` (Hive-style partition
    * dirs when `partitionCols` is non-empty), returning AddFiles with footer
    * stats + partition values. Zero-row part files are dropped. */
  def writeDataFiles(df: DataFrame, tablePath: String,
                     partitionCols: Seq[String] = Nil,
                     writeOptions: Map[String, String] = Map.empty): Seq[AddFile] = {
    val staging = Paths.get(tablePath, s".staging-${UUID.randomUUID()}")
    val writer0 = df.write.options(writeOptions)
    val writer = if (partitionCols.nonEmpty) writer0.partitionBy(partitionCols: _*)
                 else writer0
    // Timestamps land as INT64 micros, not Spark's INT96 default: INT96 is
    // deprecated and carries NO footer min/max, so a time-range predicate
    // over INT96 files could never data-skip — the one stat a
    // time-partitioned 100 TB table lives by. DataSkipping already compares
    // timestamp stats as micros; this makes every write produce them.
    // (Session conf, scoped via a ref-counted guard: the parquet source has
    // no per-write option, and ParquetFileFormat.prepareWrite overwrites any
    // option from SQLConf, so the session conf is the only lever.)
    val sess = df.sparkSession
    enterMicros(sess)
    try writer.parquet(staging.toString)
    finally exitMicros(sess)
    val parts = Files.walk(staging).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    // move first (cheap metadata renames), then harvest footer stats — an
    // executor job beyond a small-commit threshold: stats are one file
    // open + footer parse PER FILE, and a large initial load writing
    // thousands of files must not serialize those round-trips on the
    // driver (the same shape CONVERT's harvest uses)
    val moved: Seq[(String, Map[String, String])] = parts.map { part =>
      val relDir = staging.relativize(part.getParent) // "" or "lang=en/..."
      val partVals = relDir.toString.split('/').filter(_.contains("=")).map { seg =>
        val Array(k, v) = seg.split("=", 2)
        // partition dir names carry Spark's Hive-style percent-escaping
        k -> org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(v)
      }.toMap
      val relTarget =
        (if (relDir.toString.isEmpty) "" else s"$relDir/") +
          s"part-${UUID.randomUUID()}.parquet"
      val target = Paths.get(tablePath, relTarget)
      Files.createDirectories(target.getParent)
      Files.move(part, target)
      (relTarget, partVals)
    }
    val statsByRel: Map[String, (Long, Long, Long, Map[String, String],
        Map[String, String], Map[String, Long])] =
      harvestStats(df.sparkSession, tablePath, moved.map(_._1))
        .map { case (rel, rows, size, mtime, mins, maxs, nulls) =>
          rel -> ((rows, size, mtime, mins, maxs, nulls))
        }.toMap
    val adds = moved.flatMap { case (relTarget, partVals) =>
      val (rows, size, mtime, mins, maxs, nulls) = statsByRel(relTarget)
      if (rows == 0L) { Files.delete(Paths.get(tablePath, relTarget)); None }
      else Some(AddFile(relTarget, size,
        mtime, rows, mins, maxs, partVals,
        nullCounts = nulls))
    }
    // best-effort cleanup of the staging dir (_SUCCESS, .crc, ...)
    Files.walk(staging).iterator().asScala.toSeq.reverse.foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Exception => () })
    adds
  }

  /** Footer stats for a relative file list under `root` — THE shared
    * distributed-harvest shape (writeDataFiles for large commits,
    * GraftTable.convert for large imports): per-file footer open+parse
    * round-trips must not serialize on the driver at 1M-file scale, so
    * beyond a small threshold the harvest runs as one executor job. The
    * root ships as an ABSOLUTE path (executors may have a different
    * working directory), and one Hadoop Configuration serves each
    * partition (a fresh one per file would re-parse the default XML
    * resources — a large fraction of per-file cost at the motivating
    * scale). Small lists keep the no-job driver loop.
    *
    * DEPLOYMENT REQUIREMENT — shared filesystem: the executor closure
    * touches the data plane through `java.nio.Files` (and the
    * Hadoop-wrapped local path), so every executor must see `root` at the
    * same path the driver does — a POSIX/NFS/FUSE-mounted shared
    * filesystem, the same assumption Spark's own `file:` scheme reads
    * make. This is a DATA-plane constraint only and is deliberately
    * narrower than the log's [[LogStore]] seam: commit ATOMICITY rides the
    * LogStore; the harvest is plain bulk reads, where Delta likewise goes
    * straight to the filesystem API. An object-store deployment mounts
    * (s3-fuse/NFS gateways) or swaps this one function for its native
    * client — the signature (rel → narrow stat tuple) is the seam.
    * `GraftTable.vacuum`'s distributed listing/delete shares the same
    * requirement. */
  def harvestStats(spark: org.apache.spark.sql.SparkSession, root: String,
      rels: Seq[String]): Seq[(String, Long, Long, Long, Map[String, String],
      Map[String, String], Map[String, Long])] = {
    val absRoot = Paths.get(root).toAbsolutePath.toString
    def one(conf: Configuration)(rel: String): (String, Long, Long, Long,
        Map[String, String], Map[String, String], Map[String, Long]) = {
      val p = Paths.get(absRoot, rel)
      val (rows, mins, maxs, nulls) = footerStats(p, conf)
      // real mtime rides along (one extra stat in the same executor pass):
      // CONVERT records each imported file's actual modification time, the
      // audit metadata reference Delta keeps — never a synthetic commit-time
      (rel, rows, Files.size(p), Files.getLastModifiedTime(p).toMillis,
        mins, maxs, nulls)
    }
    if (rels.size <= 256) { val conf = new Configuration(); rels.map(one(conf)) }
    else {
      import spark.implicits._
      spark.createDataset(rels).mapPartitions { it =>
        val conf = new Configuration()
        it.map(one(conf))
      }.collect().toSeq.sortBy(_._1)
    }
  }

  /** Row count + min/max per top-level primitive column from the parquet
    * footer. Only stat types with a total order both here and in predicate
    * literals are kept: int32/int64/float/double and UTF-8 binary. */
  def footerStats(file: Path): (Long, Map[String, String], Map[String, String], Map[String, Long]) =
    footerStats(file, new Configuration())

  def footerStats(file: Path, conf: Configuration): (Long, Map[String, String], Map[String, String], Map[String, Long]) = {
    val in = HadoopInputFile.fromPath(new HPath(file.toString), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val mins = scala.collection.mutable.Map[String, String]()
      val maxs = scala.collection.mutable.Map[String, String]()
      val undecided = scala.collection.mutable.Set[String]()
      val stringCols = scala.collection.mutable.Set[String]()
      // null counts track independently of min/max: an all-null column has
      // no min/max but a perfectly valid (and useful) null count; a single
      // row group without the stat poisons the column to "unknown"
      val nulls = scala.collection.mutable.Map[String, Long]()
      val nullsUnknown = scala.collection.mutable.Set[String]()
      for (block <- blocks; col <- block.getColumns.asScala) {
        if (col.getPath.size == 1) {
          val name = col.getPath.iterator().next()
          val st = col.getStatistics
          if (st != null && !st.isEmpty && st.isNumNullsSet && !nullsUnknown(name))
            nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
          else { nullsUnknown += name; nulls.remove(name) }
        }
      }
      for (block <- blocks; col <- block.getColumns.asScala) {
        if (col.getPath.size == 1) {
          val name = col.getPath.iterator().next()
          val st = col.getStatistics
          val pt = col.getPrimitiveType
          if (st == null || st.isEmpty || !st.hasNonNullValue || undecided(name)) {
            undecided += name; mins.remove(name); maxs.remove(name)
          } else {
            val isString = pt.getLogicalTypeAnnotation != null &&
              pt.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
            // INT32/INT64 stats are raw storage values — sound to compare
            // only when the logical annotation says the storage value IS
            // the Catalyst value (plain signed int, epoch-day date), or
            // after normalizing timestamps to the micros DataSkipping
            // compares against (hashProbe below does the same for blooms).
            // A convert()-imported foreign file can carry MILLIS/NANOS;
            // recording those raw would let skipping unsoundly prune
            // matching files and MetadataOnlyCount serve 1000×-off MIN/MAX.
            // Anything else (decimal, time, unsigned) → no stats.
            import LogicalTypeAnnotation._
            val ann = pt.getLogicalTypeAnnotation
            def plainInt: Boolean = ann match {
              case null => true
              case i: IntLogicalTypeAnnotation => i.isSigned
              case _: DateLogicalTypeAnnotation => true
              case _ => false
            }
            def toMicros(raw: Long, u: TimeUnit): Option[Long] = u match {
              case TimeUnit.MICROS => Some(raw)
              case TimeUnit.MILLIS => Some(Math.multiplyExact(raw, 1000L))
              // NANOS: the only way Spark materializes a NANOS column is as
              // LongType holding RAW NANOS (legacy nanosAsLong conf) — there
              // is no readable representation for which a micros
              // normalization is correct, so record no stats at all
              case _ => None
            }
            val mm: Option[(String, String)] = pt.getPrimitiveTypeName match {
              case INT32 if plainInt =>
                Some((st.genericGetMin.toString, st.genericGetMax.toString))
              case INT64 => ann match {
                case ts: TimestampLogicalTypeAnnotation =>
                  try for {
                    lo <- toMicros(st.genericGetMin.asInstanceOf[java.lang.Long], ts.getUnit)
                    hi <- toMicros(st.genericGetMax.asInstanceOf[java.lang.Long], ts.getUnit)
                  } yield (lo.toString, hi.toString)
                  catch { case _: ArithmeticException => None } // micros overflow
                case _ if plainInt =>
                  Some((st.genericGetMin.toString, st.genericGetMax.toString))
                case _ => None
              }
              case FLOAT | DOUBLE =>
                Some((st.genericGetMin.toString, st.genericGetMax.toString))
              case BINARY if isString =>
                Some((st.minAsString, st.maxAsString))
              case _ => None
            }
            mm match {
              case Some((lo, hi)) =>
                if (isString) stringCols += name
                mins(name) = mins.get(name).map(m => minOf(m, lo, isString || pt.getPrimitiveTypeName == BINARY)).getOrElse(lo)
                maxs(name) = maxs.get(name).map(m => maxOf(m, hi, isString || pt.getPrimitiveTypeName == BINARY)).getOrElse(hi)
              case None =>
                undecided += name
            }
          }
        }
      }
      // Long-string stats TRUNCATE before entering the log (Delta's
      // dataSkippingStringPrefixLength shape): a document-text column must
      // not put kilobytes of min/max into EVERY AddFile — at millions of
      // files that bloats the log/checkpoint by orders of magnitude and
      // every snapshot fold pays it. A 32-char prefix keeps the bounds
      // sound: prefix(min) <= min, and max's prefix with its last
      // non-￿ char incremented-and-cut is > max (pruning only ever
      // widens). If no char can be incremented (astronomically unlikely),
      // the column's stats drop entirely — DataSkipping treats absent
      // bounds as "keep".
      for (name <- stringCols) {
        mins.get(name).filter(_.length > StatsTruncateLen)
          .foreach(m => mins(name) = m.substring(0, StatsTruncateLen))
        maxs.get(name).filter(_.length > StatsTruncateLen).foreach { m =>
          truncateUpper(m) match {
            // pad to the truncation length: a widened bound must stay
            // DETECTABLE as widened (metadataMinMax refuses length >= 32)
            // even when the increment position cut it short; appending
            // padding keeps it an upper bound (equal-prefix-longer sorts
            // higher), so pruning soundness is unchanged
            case Some(u) => maxs(name) = u.padTo(StatsTruncateLen, ' ')
            case None    => mins.remove(name); maxs.remove(name)
          }
        }
      }
      (rows, mins.toMap, maxs.toMap, nulls.toMap)
    } finally reader.close()
  }

  /** Max length of a string min/max stat persisted into the log. */
  val StatsTruncateLen = 32

  /** Sound UPPER bound for any string with prefix `s.take(len)`: the
    * prefix with its rightmost incrementable char bumped, rest cut. */
  private[table] def truncateUpper(s: String, len: Int = StatsTruncateLen): Option[String] = {
    val p = s.substring(0, len)
    val i = p.lastIndexWhere(_ != Char.MaxValue)
    if (i < 0) None else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  private def minOf(a: String, b: String, str: Boolean): String =
    if (str) { if (a <= b) a else b }
    else { if (BigDecimal(a) <= BigDecimal(b)) a else b }

  private def maxOf(a: String, b: String, str: Boolean): String =
    if (str) { if (a >= b) a else b }
    else { if (BigDecimal(a) >= BigDecimal(b)) a else b }

  /** Absolute DV reference for an InputPartition: native sidecars resolve
    * against the table root; foreign Delta descriptors ride whole (the
    * root rides inside, see DeltaDeletionVectors.packAbs). */
  def dvAbs(tableRoot: String, dvPath: String): String =
    if (DeltaDeletionVectors.isForeign(dvPath))
      DeltaDeletionVectors.packAbs(tableRoot, dvPath)
    else java.nio.file.Paths.get(tableRoot, dvPath).toString

  /** Tombstone BitSet of one dvAbs reference — dispatches between graft's
    * parquet sidecar format and the foreign Delta roaring format.
    * `requireQualified` is the planner's verdict that this file shares
    * (sidecar, basename) with another planned file: a bare-basename
    * entry is then genuinely unattributable and must refuse like the
    * batch path does, never silently tombstone both twins. */
  def dvBitsFor(dvAbsRef: String, fname: String,
      requireQualified: Boolean = false): java.util.BitSet =
    if (DeltaDeletionVectors.isForeignAbs(dvAbsRef))
      DeltaDeletionVectors.bitsAbs(dvAbsRef)
    else dvPositions(java.nio.file.Paths.get(dvAbsRef), fname, requireQualified)

  /** Load one data file's deletion-vector tombstones from a `_dv/` sidecar
    * (columns fname/pos, written sorted) as a BitSet over row indexes —
    * executor-side, parquet-mr only (the custom row-level/streaming
    * readers can't ride the batch scan's anti-join). A file's positions
    * are bounded by its row count (~1M for 128 MB), so the bitmap is
    * ≤ ~128 KB. */
  def dvPositions(sidecar: Path, fname: String,
      requireQualified: Boolean = false): java.util.BitSet = {
    val bits = new java.util.BitSet()
    val in = HadoopInputFile.fromPath(new HPath(sidecar.toString), new Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      // round-16 sidecars carry the `rel` FORMAT MARKER column: every
      // entry stores the full table-relative path, so a bare basename is
      // a genuine root-level file — matched exactly (plus the
      // clone-escape form, where the reader's fname leads with "../"),
      // and the legacy-ambiguity refusal never applies. The marker is
      // explicit format metadata, not inferred from '/' presence: a
      // root-level file's round-16 entry IS a bare basename, and the
      // old inference would spuriously refuse (or misattribute) it
      // against a same-named nested twin.
      val markedRel = schema.containsField("rel")
      // LEGACY sidecars: PATH-SUFFIX matching, one direction only —
      // round-15 entries store the table-relative path, pre-round-15 the
      // bare basename, and a shallow CLONE's reader passes an escaped
      // spelling ("../src/p=b1/part-0.parquet"); the STORED spelling is
      // never more qualified than the reader's `fname`, so only `stored`
      // may be a '/'-bounded suffix of `fname`.
      def matches(stored: String): Boolean =
        if (markedRel)
          stored == fname ||
            (fname.endsWith("/" + stored) && fname.startsWith(".."))
        else stored == fname || fname.endsWith("/" + stored)
      var rg = Option(reader.readNextRowGroup())
      while (rg.isDefined) {
        val rr = new org.apache.parquet.io.ColumnIOFactory().getColumnIO(schema)
          .getRecordReader(rg.get,
            new org.apache.parquet.example.data.simple.convert.GroupRecordConverter(schema))
        (0L until rg.get.getRowCount).foreach { _ =>
          val g = rr.read()
          val stored = g.getBinary("fname", 0).toStringUsingUTF8
          if (matches(stored)) {
            if (!markedRel && requireQualified && !stored.contains('/'))
              throw new GraftProtocolException(
                s"a legacy deletion-vector sidecar entry ('$stored' in " +
                  s"$sidecar) names more than one live file — the entry " +
                  "cannot be attributed; rewrite the files (OPTIMIZE after " +
                  "a copy-on-write DELETE) to clear the ambiguous state")
            bits.set(g.getLong("pos", 0).toInt)
          }
        }
        rg = Option(reader.readNextRowGroup())
      }
      bits
    } finally reader.close()
  }

  /** Point-lookup check against the file's native parquet bloom filters
    * (written via `parquet.bloom.filter.enabled#col` on the table's bloom
    * columns). `probes` maps column → candidate equality values (Catalyst
    * internal literals); returns false only when SOME probe column has a
    * bloom in every row group and NO candidate value can be present —
    * i.e. the file provably contains no matching row. Conservative on any
    * gap: missing bloom, unknown physical type, or value-conversion
    * mismatch keeps the file.
    *
    * This runs on the DRIVER over footer metadata only (a few KB per
    * file), and only for files that survive min/max skipping — the same
    * cost class as Delta's stats read, and what makes a needle-in-100-TB
    * point lookup read one file instead of every file whose [min,max]
    * straddles the key. */
  def bloomMayMatch(file: Path, probes: Map[String, Seq[Any]]): Boolean = {
    if (probes.isEmpty) return true
    val in = HadoopInputFile.fromPath(new HPath(file.toString), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      // the file may match iff SOME row group may satisfy ALL probe columns
      blocks.exists { block =>
        probes.forall { case (name, values) =>
          block.getColumns.asScala.find(c =>
            c.getPath.size == 1 && c.getPath.iterator().next() == name) match {
            case None => true
            case Some(chunk) =>
              val bf = try reader.getBloomFilterDataReader(block).readBloomFilter(chunk)
                       catch { case _: Exception => null }
              if (bf == null) true // no bloom written → cannot skip
              else {
                val isString = chunk.getPrimitiveType.getLogicalTypeAnnotation != null &&
                  chunk.getPrimitiveType.getLogicalTypeAnnotation
                    .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
                values.exists { v =>
                  hashProbe(bf, chunk.getPrimitiveType, isString, v)
                    .forall(bf.findHash)
                }
              }
          }
        }
      }
    } finally reader.close()
  }

  /** Type-faithful bloom hash of a Catalyst literal: the overload must match
    * the PHYSICAL type parquet hashed at write time, AND the stored VALUE must
    * equal the Catalyst value. The second condition is where logical type
    * annotations matter: an INT64 column annotated TIMESTAMP(MILLIS) stores
    * millis while the Catalyst literal is micros — hashing micros would make
    * every probe miss and wrongly prune files that DO contain the key. So for
    * INT32/INT64 we hash only when the annotation is absent, a plain int, or a
    * date (Catalyst date literals are the same epoch-day ints parquet stores),
    * convert timestamps to the stored unit, and return None (may-match) for
    * anything else (decimal, time, unsigned reinterpretations). */
  private def hashProbe(bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
                        primType: org.apache.parquet.schema.PrimitiveType,
                        isString: Boolean, v: Any): Option[Long] = {
    import LogicalTypeAnnotation._
    val pt = primType.getPrimitiveTypeName
    val ann = primType.getLogicalTypeAnnotation
    def plainInt: Boolean = ann match {
      case null => true
      case i: IntLogicalTypeAnnotation => i.isSigned // unsigned reinterprets bits
      case _: DateLogicalTypeAnnotation => true      // epoch-day int == Catalyst
      case _ => false
    }
    try pt match {
      case INT32 => v match {
        case n: java.lang.Number if plainInt => Some(bf.hash(n.intValue()))
        case _ => None
      }
      case INT64 => (v, ann) match {
        case (n: java.lang.Number, ts: TimestampLogicalTypeAnnotation) =>
          // Catalyst timestamp literals are micros since epoch; convert to
          // the unit parquet actually stored before hashing.
          val micros = n.longValue()
          ts.getUnit match {
            case TimeUnit.MICROS => Some(bf.hash(micros))
            case TimeUnit.MILLIS => Some(bf.hash(Math.floorDiv(micros, 1000L)))
            case TimeUnit.NANOS  => Some(bf.hash(Math.multiplyExact(micros, 1000L)))
            case _ => None
          }
        case (n: java.lang.Number, _) if plainInt => Some(bf.hash(n.longValue()))
        case _ => None
      }
      case DOUBLE => v match {
        case n: java.lang.Number => Some(bf.hash(n.doubleValue()))
        case _ => None
      }
      case FLOAT => v match {
        case n: java.lang.Number => Some(bf.hash(n.floatValue()))
        case _ => None
      }
      case BINARY if isString =>
        Some(bf.hash(org.apache.parquet.io.api.Binary.fromString(v.toString)))
      case _ => None
    } catch { case _: Exception => None }
  }
}
