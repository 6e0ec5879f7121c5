package graft.table

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types._

/** File-level min/max pruning — the table-layer twin of Delta data skipping
  * (SURVEY.md §4.2). Given a scan predicate, drop files whose stats prove no
  * row can match, BEFORE Spark ever plans the scan.
  *
  * The predicate is resolved against the table schema first (Spark 4 Columns
  * are lazy ColumnNodes until analysis), so we match fully-typed Catalyst
  * nodes; any foldable side (e.g. `cast('2024-01-01' as timestamp)`) is
  * evaluated to a literal.
  *
  * Conservative by construction: a file is only skipped when a top-level
  * conjunct is provably false over the file's [min, max]; any unrecognized
  * shape, missing stat, or unordered type keeps the file. Correctness never
  * depends on skipping — it only removes provably-dead I/O
  * (property-checked against full scans in DataSkippingSpec).
  *
  * At 100 TB this is the difference between planning 100k file splits and
  * reading the handful whose range covers a selective predicate.
  */
object DataSkipping {

  private type Ord = Either[BigDecimal, String]

  /** Resolve a user predicate against `schema`, returning the typed
    * Catalyst condition (analysis only — nothing executes). */
  def resolve(spark: SparkSession, schema: StructType, pred: Column): Expression = {
    val dummy = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    dummy.filter(pred).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition
    }.getOrElse(throw new IllegalStateException(s"could not resolve predicate $pred"))
  }

  /** true ⇒ the file may contain matching rows (must be read). */
  def mayMatch(resolvedPred: Expression, file: AddFile): Boolean =
    splitConjuncts(resolvedPred).forall(c => conjunctMayMatch(c, file))

  def prune(resolvedPred: Expression, files: Seq[AddFile]): Seq[AddFile] =
    files.filter(mayMatch(resolvedPred, _))

  /** Byte-ORDER soundness gate for stat bounds: footer min/max are
    * byte-ordered, so every interval test against them is meaningless
    * under a collation that orders differently ('GERMANY' = 'germany'
    * under UTF8_LCASE but a byte-range apart) — acting on the bounds
    * would prune files whose rows MATCH. Non-string types always pass. */
  private def binaryOrdered(e: Expression): Boolean = e.dataType match {
    // the singleton IS the UTF8_BINARY collation (equals compares
    // collationId); every other collation is conservatively unordered —
    // the finer supportsBinaryOrdering distinction is private[sql]
    case st: StringType => st == StringType
    case _ => true
  }

  /** Byte-EQUALITY soundness gate for bloom probes: a bloom holds hashes
    * of the stored bytes, so probing a collation-equal-but-byte-different
    * value would miss and wrongly skip the file. */
  private def binaryEquality(e: Expression): Boolean = e.dataType match {
    case st: StringType => st == StringType
    case _ => true
  }

  /** Equality probes for bloom-filter skipping: column → candidate values
    * from top-level `col = v` / `col IN (...)` conjuncts, as raw Catalyst
    * literal values. Only these shapes can consult a bloom (range predicates
    * cannot); anything else simply contributes no probe. */
  def equalityProbes(resolved: Expression): Map[String, Seq[Any]] = {
    def rawLit(e: Expression): Option[Any] =
      if (!e.foldable) None
      else try Option(e.eval(null)) catch { case _: Exception => None }
    val pairs = splitConjuncts(resolved).flatMap {
      case EqualTo(a: AttributeReference, l) if binaryEquality(a) =>
        rawLit(l).map(v => a.name -> Seq(v))
      case EqualTo(l, a: AttributeReference) if binaryEquality(a) =>
        rawLit(l).map(v => a.name -> Seq(v))
      case In(a: AttributeReference, vs) if vs.nonEmpty && binaryEquality(a) =>
        val evs = vs.map(rawLit)
        if (evs.forall(_.isDefined)) Some(a.name -> evs.flatten) else None
      case _ => None
    }
    // several conjuncts on one column union their candidates — the bloom
    // check stays conservative (exists-semantics can only under-skip)
    pairs.groupBy(_._1).map { case (n, g) => n -> g.flatMap(_._2).distinct }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Stat key of a declared variant shred target (`variant.shred.paths`):
    * the name of the typed sibling column the write path materializes, so
    * its footer min/max/null-count land in AddFile stats under this key. */
  def shredStatName(col: String, path: String, dt: DataType): String =
    s"__shred_${col}_${path.replaceAll("[^A-Za-z0-9]", "_")}_${dt.typeName}"

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    // try_variant_get over a declared shred path reads the shredded
    // column's stats. ONLY try semantics (failOnError = false): the stats
    // were computed with try_variant_get, and skipping a file that a
    // STRICT variant_get would have thrown a cast error on would silence
    // the error — so strict gets never prune. Type is part of the key:
    // a '$.k' read as long and as string are different stats.
    case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet
        if !vg.failOnError =>
      (vg.child, vg.path) match {
        case (a: AttributeReference, Literal(p, StringType)) if p != null =>
          Some(shredStatName(a.name, p.toString, vg.dataType))
        case _ => None
      }
    case _ => None
  }

  /** Foldable side of a comparison as an ordered value:
    * numeric/timestamp (BigDecimal) or string. */
  private def litValue(e: Expression): Option[Ord] = {
    if (!e.foldable) return None
    val v = try e.eval(null) catch { case _: Exception => return None }
    if (v == null) return None
    e.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
           _: DoubleType | _: FloatType | _: DecimalType =>
        Some(Left(BigDecimal(v.toString)))
      case _: TimestampType => Some(Left(BigDecimal(v.toString))) // micros
      // NTZ evaluates to LOCAL micros — the exact unit the footer harvest
      // records for isAdjustedToUTC=false parquet columns
      case TimestampNTZType => Some(Left(BigDecimal(v.toString)))
      case _: DateType      => Some(Left(BigDecimal(v.toString))) // epoch days
      // collated strings refuse: the byte-ordered stat bounds do not
      // order these values (see binaryOrdered)
      case st: StringType if st == StringType => Some(Right(v.toString))
      case _                => None
    }
  }

  /** ISO-8601 timestamp stat → comparable micros: zoned forms normalize
    * to UTC micros (TimestampType's comparison unit), zoneless forms to
    * local micros (NTZ's). Delta serializes timestamp stats as ISO
    * strings — both in REAL delta logs (read interop: without this,
    * time-range predicates never prune a foreign table) and, since round
    * 16, in graft's own compat emissions. */
  private def isoMicros(s: String): BigDecimal = {
    val t = s.replace(' ', 'T')
    val micros =
      try {
        val odt = java.time.OffsetDateTime.parse(t)
        odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L
      } catch { case _: java.time.format.DateTimeParseException =>
        val ldt = java.time.LocalDateTime.parse(t)
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      }
    BigDecimal(micros)
  }

  private def conjunctMayMatch(c: Expression, f: AddFile): Boolean = {
    def bounds(name: String, asString: Boolean): Option[(Ord, Ord)] =
      for {
        lo <- f.minValues.get(name)
        hi <- f.maxValues.get(name)
        b <- if (asString) Some((Right(lo): Ord, Right(hi): Ord))
             else scala.util.Try((Left(BigDecimal(lo)): Ord, Left(BigDecimal(hi)): Ord)).toOption
               .orElse(scala.util.Try(
                 (Left(isoMicros(lo)): Ord, Left(isoMicros(hi)): Ord)).toOption)
      } yield b

    def cmp(a: Ord, b: Ord): Option[Int] = (a, b) match {
      case (Left(x), Left(y))   => Some(x.compare(y))
      case (Right(x), Right(y)) => Some(x.compare(y))
      case _                    => None
    }

    // op receives (cmp(min, v), cmp(max, v)) and answers "may match?"
    def check(name: String, v: Ord, op: (Int, Int) => Boolean): Boolean =
      bounds(name, v.isRight) match {
        case Some((lo, hi)) =>
          (cmp(lo, v), cmp(hi, v)) match {
            case (Some(cl), Some(ch)) => op(cl, ch)
            case _                    => true
          }
        case None => true // no stats → cannot skip
      }

    // BOTH sides must be binary-ordered: the analyzer may leave the
    // literal in the default collation while the column is collated (or
    // vice versa), and either side escaping the gate would re-admit the
    // unsound byte-interval test
    def attrLit(a: Expression, l: Expression): Option[(String, Ord)] =
      if (!binaryOrdered(a)) None
      else for { n <- attrName(a); v <- litValue(l) } yield (n, v)

    // null-count tier (independent of min/max): a file whose footer proves
    // zero nulls can't serve IS NULL; all-null can't serve IS NOT NULL —
    // and an all-null column can't match ANY comparison either, so the
    // value checks compose it in. Absent count → unknown → keep.
    def nullCount(name: String): Option[Long] = f.nullCounts.get(name)
    def allNull(name: String): Boolean = nullCount(name).contains(f.numRecords)
    def checkNN(name: String, v: Ord, op: (Int, Int) => Boolean): Boolean =
      !allNull(name) && check(name, v, op)

    c match {
      case IsNull(a) => attrName(a).forall(n => !nullCount(n).contains(0L))
      case IsNotNull(a) => attrName(a).forall(n => !allNull(n))
      // col LIKE 'p%': matching strings form the interval [p, pNext) where
      // pNext = p with its last char incremented — skip when the file's
      // string range provably misses it (the log-prefix / path-prefix
      // query shape). Last char at Char.MaxValue → no upper bound, only
      // the lower check applies.
      case StartsWith(a, Literal(pfx, StringType)) if pfx != null &&
          binaryOrdered(a) =>
        attrName(a).forall { n =>
          if (allNull(n)) false
          else {
            val p = pfx.toString
            val upper: Option[String] =
              if (p.isEmpty || p.last == Char.MaxValue) None
              else Some(p.init + (p.last + 1).toChar)
            val geLower = check(n, Right(p), (_, ch) => ch >= 0)   // max >= p
            val ltUpper = upper.forall(u =>
              check(n, Right(u), (cl, _) => cl < 0))               // min < pNext
            geLower && ltUpper
          }
        }
      case EqualTo(a, l) => (attrLit(a, l) orElse attrLit(l, a)).forall {
        case (n, v) => checkNN(n, v, (cl, ch) => cl <= 0 && ch >= 0) }
      case GreaterThan(a, l) if attrLit(a, l).isDefined =>          // col > v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (_, ch) => ch > 0) }
      case GreaterThan(l, a) if attrLit(a, l).isDefined =>          // v > col ⇔ col < v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (cl, _) => cl < 0) }
      case GreaterThanOrEqual(a, l) if attrLit(a, l).isDefined =>   // col >= v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (_, ch) => ch >= 0) }
      case GreaterThanOrEqual(l, a) if attrLit(a, l).isDefined =>   // v >= col ⇔ col <= v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (cl, _) => cl <= 0) }
      case LessThan(a, l) if attrLit(a, l).isDefined =>             // col < v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (cl, _) => cl < 0) }
      case LessThan(l, a) if attrLit(a, l).isDefined =>             // v < col ⇔ col > v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (_, ch) => ch > 0) }
      case LessThanOrEqual(a, l) if attrLit(a, l).isDefined =>      // col <= v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (cl, _) => cl <= 0) }
      case LessThanOrEqual(l, a) if attrLit(a, l).isDefined =>      // v <= col ⇔ col >= v
        attrLit(a, l).forall { case (n, v) => checkNN(n, v, (_, ch) => ch >= 0) }
      case In(a, vs) if attrName(a).isDefined && binaryOrdered(a) &&
          vs.nonEmpty && vs.forall(litValue(_).isDefined) =>
        vs.exists(v => checkNN(attrName(a).get, litValue(v).get, (cl, ch) => cl <= 0 && ch >= 0))
      case _ => true // unknown shape → cannot skip
    }
  }
}
