package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash bucketing (Iceberg's `bucket(N, col)` transform): every data file
  * belongs to exactly one of N hash buckets of a declared column, recorded
  * as a hidden Hive-style `__bucket=<id>` directory — NOT a schema column.
  *
  * The payoff is the storage-partitioned join on HIGH-CARDINALITY keys:
  * Hive partitioning co-locates joins only when the join key is a
  * low-cardinality dimension you can afford one directory per value for;
  * bucketing hashes an arbitrary key (document id, user id) into a fixed
  * number of groups, and two tables bucketed (same column type, same N)
  * join with ZERO ShuffleExchange — the key-grouped scan reports
  * `KeyGroupedPartitioning(bucket(N, col))` and [[graft.sources.GraftCatalog]]
  * (a `FunctionCatalog`) serves the bucket function so Spark can prove both
  * sides hash identically. At 100 TB this converts the dominant fact-fact
  * shuffle into a metadata-only zip of bucket groups.
  *
  * The bucket id is `pmod(hash(col), N)` — Spark's own `hash()` (Murmur3,
  * seed 42) — so the WRITE side is one codegen'd projection and the
  * reported V2 function ([[graft.sources.GraftBucketFunction]]) evaluates
  * the exact same catalyst expression. Every write path funnels through
  * [[withBucket]], so DML rewrites (DELETE/MERGE/OPTIMIZE) preserve bucket
  * purity by construction: the id is a pure function of the row.
  *
  * Declared at CREATE (`bucketing.column` + `bucketing.count` table
  * properties; `PARTITIONED BY (bucket(N, col))` through the catalog) —
  * re-bucketing existing files requires a full rewrite, so flipping the
  * properties via SET TBLPROPERTIES refuses; `optimize(rebucketTo =
  * (col, n))` is the one legal escape (the rewrite made explicit).
  * Since round 14 bucketing COMPOSES with Hive partition columns (the
  * hidden dir nests inside the partition dirs; the SPJ key is
  * (partitions..., bucket)) and with column mapping (the stored column
  * name is the stable PHYSICAL name; `spec` resolves it to the current
  * logical name, so RENAME of the bucket column keeps the layout live).
  */
object Bucketing {
  val ColumnProp = "bucketing.column"
  val CountProp = "bucketing.count"
  /** Hidden partition-dir name; never a schema column. */
  val BucketCol = "__bucket"

  /** Supported bucket-column types: the ones [[graft.sources.GraftBucketFunction]]
    * hashes (and the partition-value decoder round-trips). Date/timestamp
    * keys (round 15) hash their internal representation — epoch days /
    * micros — through the same Murmur3, so the write projection, the V2
    * bucket function and the point-lookup prober all agree by
    * construction; time usually belongs in the PARTITION column, but an
    * event-id-less time-keyed fact-fact join has no other co-location. */
  def typeSupported(dt: DataType): Boolean = dt match {
    // the StringType SINGLETON deliberately: a COLLATED string instance
    // must not match — bucket ids hash bytes, so two collation-equal but
    // byte-distinct keys would land in different buckets and a co-located
    // join on them would silently miss matches
    case IntegerType | LongType | StringType | ShortType | ByteType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The declared bucket spec, with the column resolved to its CURRENT
    * logical name. Under column mapping the stored name stays pinned to
    * the declaration-time spelling while RENAME moves the logical name;
    * the stored name matches the field's stable PHYSICAL name (create
    * stores logical==physical for pre-mapping tables, and mapping
    * enablement never changes physical names), so resolution is
    * physical-first with a logical fallback. Unmapped tables skip the
    * schema parse entirely. */
  def spec(meta: MetaData): Option[(String, Int)] = (for {
    c <- meta.properties.get(ColumnProp)
    n <- meta.properties.get(CountProp).flatMap(v =>
      scala.util.Try(v.trim.toInt).toOption)
    if n > 0
  } yield (c, n)).map { case (c, n) =>
    if (!meta.properties.get("columnMapping.mode").exists(m =>
        m.equalsIgnoreCase("name") || m.equalsIgnoreCase("id")))
      (c, n)
    else {
      val schema = DataType.fromJson(meta.schemaString).asInstanceOf[StructType]
      val logical = schema.fields.find(f => ColumnMapping.physicalName(f) == c)
        .orElse(schema.fields.find(_.name == c))
        .map(_.name).getOrElse(c)
      (logical, n)
    }
  }

  /** The bucket id of a row — Spark's `hash()` is Murmur3 seed 42; the V2
    * bucket function MUST stay the same computation. */
  def idExpr(column: String, n: Int): Column = pmod(hash(col(column)), lit(n))

  /** Bucket id of one predicate literal (catalyst-INTERNAL value, as
    * DataSkipping.equalityProbes evals them) — the read-side twin of
    * [[idExpr]], powering point-lookup file pruning: `WHERE col = v` on a
    * bucketed table scans only bucket(v)'s files. None when the value
    * cannot be hashed under `dt` (conservative: no pruning). */
  def bucketOfValue(v: Any, dt: DataType, n: Int): Option[Int] =
    scala.util.Try {
      val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(v, dt)))
        .eval(null).asInstanceOf[Int]
      ((h % n) + n) % n
    }.toOption

  /** Bucketed write shape: (frame with the hidden bucket column, dir
    * columns). Identity when the table is unbucketed. */
  def withBucket(df: DataFrame, meta: MetaData,
      partitionCols: Seq[String]): (DataFrame, Seq[String]) =
    spec(meta) match {
      case Some((c, n)) => (df.withColumn(BucketCol, idExpr(c, n)),
        partitionCols :+ BucketCol)
      case None => (df, partitionCols)
    }

  /** Declaration-time validation (create / CTAS). */
  def validate(schema: StructType, partitionBy: Seq[String],
      props: Map[String, String]): Unit = {
    val meta = MetaData("", schema.json, 0L, partitionBy, Map.empty, props)
    spec(meta).foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"bucketing column '$c' must exist in ${schema.fieldNames.toSeq}")
      require(typeSupported(schema(c).dataType),
        s"bucketing column '$c': type ${schema(c).dataType.catalogString} is " +
          "not bucketable (int/long/short/byte/string/date/timestamp)")
      // Hive partition columns COMPOSE with bucketing since round 14 (the
      // standard lakehouse layout: partition by day, bucket by key) — the
      // hidden __bucket dir nests inside the partition dirs; the bucket
      // column itself must not also be a partition column (its dir would
      // carry the value once per file already)
      require(!partitionBy.contains(c),
        s"bucketing column '$c' is already a partition column")
    }
    if (props.contains(ColumnProp) != props.contains(CountProp))
      throw new IllegalArgumentException(
        s"$ColumnProp and $CountProp must be declared together")
    // a declared-but-unusable count must refuse HERE: spec() filtering it
    // to None would commit a mis-declared, effectively unbucketed table
    // that the create-time-only rule then makes permanently uncorrectable
    props.get(CountProp).foreach { raw =>
      require(scala.util.Try(raw.trim.toInt).toOption.exists(_ > 0),
        s"$CountProp must be a positive integer, got '$raw'")
    }
  }
}
