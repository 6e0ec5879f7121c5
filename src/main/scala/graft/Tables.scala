package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema + extension tables
  * (TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan (verify via `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`). At 100 TB the same code holds: file listing and
  * split planning are Spark's; we never materialize a table on the driver.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.ts has changed physical type across testdata generations —
    * parquet TIMESTAMP(NANOS) (readable only as raw int64 under the legacy
    * `nanosAsLong` conf) in some drops, `timestamp[us]` (TIMESTAMP_NTZ) in
    * others. Adapt to whatever the footer actually carries instead of
    * hard-coding one decode: resolve the raw schema (falling back to the
    * nanos conf only when Spark refuses the footer), then normalize `ts`
    * to session-zoned TimestampType — the session runs UTC, so the wall
    * clock matches what DuckDB reads natively. A once-per-path sanity
    * probe asserts min(ts) lands in a plausible year so a future re-type
    * fails loudly instead of silently shifting every timestamp 1000×. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = decodeEventTs(eventsRaw(s, dir))
    assertSaneEventTs(s, dir, df)
    df
  }

  /** Raw events relation with the footer-resolved schema. Tries the normal
    * read first; only if Spark refuses the footer (TIMESTAMP(NANOS) →
    * PARQUET_TYPE_ILLEGAL) does it flip the legacy nanos conf and reread
    * `ts` as int64 nanoseconds. */
  private[graft] def eventsRaw(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    try {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      s.read.parquet(path)
    } catch {
      // ONLY the nanos-footer refusal triggers the legacy reread — a missing
      // file, corrupt footer, or permission error must surface as itself,
      // not resurface confusingly under the legacy conf. The conf has to
      // STAY set for the returned frame (schema conversion re-runs per file
      // at execution), which is why it is flipped, not scoped-and-restored.
      case e: Exception if Option(e.getMessage).exists(m =>
          m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("TIMESTAMP(NANOS")) =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
    }
  }

  /** Normalize the observed `ts` type to TimestampType (µs, session zone):
    * int64 → treat as nanos (the legacy-conf read path); TIMESTAMP_NTZ →
    * reinterpret the wall clock in the session zone (UTC here, so identical
    * digits to the naive µs values DuckDB sees); TimestampType → as-is. */
  private[graft] def decodeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType           => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType   => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType   => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other — extend graft.Tables.decodeEventTs")
    }
  }

  /** One decoded-range probe per events path per JVM: min(ts) must land in
    * a plausible year. Catches silent unit errors (a re-typed fixture read
    * through the wrong decode lands in 1970 or 47000-something) at first
    * touch instead of as hash-red oracle diffs. */
  private val tsCheckedDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def assertSaneEventTs(s: SparkSession, dir: String, df: DataFrame): Unit = {
    if (tsCheckedDirs.add(dir)) {
      val minTs = df.selectExpr("min(ts)").head().getTimestamp(0)
      if (minTs != null) {
        val yr = minTs.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
        if (yr < 1990 || yr > 2100) {
          tsCheckedDirs.remove(dir)
          throw new IllegalStateException(
            s"events.ts sanity check failed for $dir: min(ts)=$minTs (year $yr) — " +
            "the testdata's physical ts type likely changed; fix graft.Tables.decodeEventTs")
        }
      }
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
