package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible scaling evidence for the dedup scale paths (README
  * "Scaling evidence"): replicates documents/embeddings m× with DISTINCT
  * content — replica k's tokens are suffixed `_k` (disjoint shingle
  * universes) and its vectors are rotated by k dimensions (≈ independent
  * directions) — so output size grows linearly in m and measured wall-clock
  * growth reflects join work, not a quadratically exploding result.
  * A replication that copies content verbatim would make ANY implementation
  * look quadratic: m copies of each doc are m(m-1)/2 genuine near-dup pairs.
  *
  * Usage: tools/run.sh graft.ScalingProbe [sfDir] [multipliers...]
  * Prints one line per (query, m) with rows + seconds.
  */
object ScalingProbe {

  /** Snapshot-fold scale probe: a SYNTHETIC log with `n` live files (no
    * data files needed — the fold never opens them), timing the paths a
    * 100k-file table exercises on every read: JSON tail replay, parquet
    * checkpoint write, checkpoint-seeded snapshot, zero-listing
    * latestVersion. Usage: tools/run.sh graft.ScalingProbe log [nFiles].
    * Runs on a bare JVM — no SparkSession — exactly like GraftLog. */
  private def runLogProbe(n: Int): Unit = {
    import graft.table._
    val dir = java.nio.file.Files.createTempDirectory("graft-logprobe-").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val now = System.currentTimeMillis()
    def addFile(i: Int): AddFile = AddFile(
      f"part-$i%07d-xxxxxxxx.parquet", 128L * 1024 * 1024, now, 1000000L,
      Map("id" -> (i * 1000L).toString, "v" -> "aaaa"),
      Map("id" -> ((i + 1) * 1000L).toString, "v" -> "zzzz"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""LOGPROBE {"step":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val log = new GraftLog(dir)
    val meta = MetaData(java.util.UUID.randomUUID().toString, schema.json, now, Nil,
      Map.empty, Map.empty)
    timed("commit0_json_write") {
      log.commit(0L, Seq(meta,
        CommitInfo(0L, log.nextTimestamp(), "CONVERT", Map.empty)) ++
        (0 until n).map(addFile))
    }
    (1 to 9).foreach { v =>
      log.commit(v, Seq(CommitInfo(v, log.nextTimestamp(), "WRITE", Map.empty)) ++
        (0 until 10).map(i => addFile(n + v * 10 + i)))
    }
    val s9 = timed("json_replay_snapshot") { new GraftLog(dir).snapshotAt(9L) }
    require(s9.files.size == n + 90, s"fold lost files: ${s9.files.size}")
    // commit 10 crosses the checkpoint interval: writes the parquet
    // checkpoint (file count >= parquetCheckpointThreshold)
    timed("commit10_with_checkpoint_write") {
      log.commit(10L, Seq(CommitInfo(10L, log.nextTimestamp(), "WRITE", Map.empty)) ++
        (0 until 10).map(i => addFile(n + 100 + i)))
    }
    val s10 = timed("checkpoint_seeded_snapshot") { new GraftLog(dir).snapshotAt(10L) }
    require(s10.files.size == n + 100, s"checkpoint lost files: ${s10.files.size}")
    timed("checkpoint_seeded_snapshot_2nd") { new GraftLog(dir).snapshotAt(10L) }
    timed("latest_version_probe") { new GraftLog(dir).latestVersion }
    // MULTIPART twin: same table, checkpoint.partSize forces parts —
    // concurrent encode/decode vs the single-file figures above
    log.commit(11L, Seq(
      s10.metaData.copy(properties = s10.metaData.properties +
        ("checkpoint.partSize" -> (n / 4 + 1).toString)),
      CommitInfo(11L, log.nextTimestamp(), "SET TBLPROPERTIES", Map.empty)))
    (12 to 19).foreach { v =>
      log.commit(v, Seq(CommitInfo(v, log.nextTimestamp(), "WRITE", Map.empty)))
    }
    timed("commit20_with_multipart_checkpoint_write") {
      log.commit(20L, Seq(CommitInfo(20L, log.nextTimestamp(), "WRITE", Map.empty)))
    }
    val s20 = timed("multipart_seeded_snapshot") { new GraftLog(dir).snapshotAt(20L) }
    require(s20.files.size == n + 100, s"multipart checkpoint lost files: ${s20.files.size}")
    // dynamic-file-pruning driver cost at the design point: 100k build-side
    // keys against every file's [min, max] — the sorted binary-search path
    // (O(files · log keys); the naive per-file ∃-key loop would be
    // O(files · keys), ~400× the comparisons here)
    val keys: Seq[Any] = (0 until 100000).map(i => Long.box(i * 37L))
    val kept = timed("dfp_prune_100k_keys") {
      GraftTable.sortedKeyPruneOf(s20, "id", keys).map(_.size).getOrElse(-1)
    }
    require(kept >= 0, "sortedKeyPruneOf must support the numeric id column")
    // cleanup: the synthetic log is multi-MB, not worth keeping
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** DML fixed-cost probe: the golden scenario (create → MERGE → DELETE →
    * reads) step-timed with a Spark job counter — separates driver-side log
    * work from per-job scheduling overhead. The q70-q75 bench numbers ARE
    * these steps; when the family creeps round-over-round this says which
    * step and whether it grew jobs or per-job time.
    * Usage: tools/run.sh graft.ScalingProbe dml [reps]. */
  private def runDmlProbe(reps: Int): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("firstname", StringType, nullable = false),
      StructField("lastname", StringType, nullable = false)))
    def timed[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      println(f"""DMLPROBE {"step":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"jobs":${jobs.get() - j0}}""")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val dir = Scratch.dir("graft-dmlprobe-").toString
      val seed = spark.createDataFrame(java.util.List.of(
        Row(1, "James", "Bond"), Row(2, "Alice", "Rogers"), Row(3, "Joe", "Bloggs")), schema)
      val t = timed("create")(graft.table.GraftTable.create(spark, dir, seed))
      val updates = spark.createDataFrame(java.util.List.of(
        Row(2, "Alice", "Smith"), Row(4, "New", "Person")), schema)
      timed("merge") {
        t.merge(updates, "t.id = s.id")
          .whenMatchedUpdate(Map("firstname" -> "s.firstname", "lastname" -> "s.lastname"))
          .whenNotMatchedInsert(Map("id" -> "s.id", "firstname" -> "s.firstname",
                                    "lastname" -> "s.lastname"))
          .execute()
      }
      timed("delete")(t.delete(col("id").isin(1, 3)))
      timed("read_head")(t.toDF.count())
      timed("read_v1")(t.versionAsOf(1).count())
      timed("history")(t.history().count())
      timed("changes")(t.changes(0, 2).count())
      timed("restore")(t.restore(1))
    }
    spark.stop()
  }

  /** Contention probe (round-10 brief): N writers × M commits racing on
    * ONE table, in two modes —
    *   - `blind`: disjoint appends; every lost race REBASES (no logical
    *     conflict), so all N×M commits must land. The printed
    *     `readsPerCommit` is the storage-level commit-file reads per
    *     landed commit (GraftLog.uncachedVersionReads summed over every
    *     writer's own log instance): the rebase loop reads only the
    *     WINNER commits between its base and the new head — O(winners),
    *     never a full log re-read — so the figure stays a small constant
    *     as M grows instead of growing with history length.
    *   - `identity`: the same race on an identity-column table, where a
    *     winner's frontier bump is a MetaData action and every loser gets
    *     a typed MetadataChangedException; the probe retries at the API
    *     level (as a real writer would) and then PROVES the frontier
    *     serialized: all N×M×rows ids distinct.
    * Usage: tools/run.sh graft.ScalingProbe contention [writers] [commits]
    */
  private def runContentionProbe(writers: Int, commitsEach: Int): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("w", IntegerType, nullable = false)))

    def race(label: String, dir: String, identityMode: Boolean): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val start = new java.util.concurrent.CountDownLatch(1)
      val reads = new java.util.concurrent.atomic.AtomicLong()
      val retries = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val futures = (0 until writers).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            // each writer is its own "driver": own GraftTable, own log
            val t = graft.table.GraftTable.forPath(spark, dir)
            start.await()
            (1 to commitsEach).foreach { i =>
              val df = spark.createDataFrame(java.util.List.of(
                Row(w * 1000000L + i, w)), schema)
              var landed = false
              while (!landed) {
                try { t.append(df); landed = true }
                catch {
                  case _: graft.table.GraftConcurrentWriteException =>
                    retries.incrementAndGet() // identity mode: typed conflict, re-read + retry
                }
              }
            }
            reads.addAndGet(t.log.uncachedVersionReads.toLong)
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      val t = graft.table.GraftTable.forPath(spark, dir)
      val landed = t.latestVersion
      val nRows = t.toDF.count()
      val distinctIds = if (!identityMode) -1L
        else t.toDF.select("rid").distinct().count()
      println(f"""CONTENTION {"mode":"$label","writers":$writers,"commitsEach":$commitsEach,"versions":$landed,"rows":$nRows,"distinctIds":$distinctIds,"apiRetries":${retries.get()},"readsPerCommit":${reads.get().toDouble / math.max(1, landed)}%.1f,"sec":$sec%.2f}""")
      require(nRows == writers.toLong * commitsEach,
        s"$label: expected ${writers * commitsEach} rows, got $nRows")
      if (identityMode) require(distinctIds == nRows,
        s"$label: identity ids collided under contention ($distinctIds of $nRows)")
    }

    val blindDir = Scratch.dir("graft-contend-blind-").toString
    graft.table.GraftTable.create(spark, blindDir,
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema))
    race("blind", blindDir, identityMode = false)

    val idDir = Scratch.dir("graft-contend-id-").toString
    graft.table.GraftTable.create(spark, idDir,
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema),
      identity = Map("rid" -> (1L, 1L)))
    race("identity", idDir, identityMode = true)
    spark.stop()
  }

  /** Vacuum-listing probe (round-11 brief): a synthetic table with `n`
    * PHYSICAL files (empty parquet names — vacuum only lists and stats)
    * spread over 64 directories, half referenced by the log and half
    * orphaned with old mtimes. Times vacuumDryRun, whose listing is a
    * distributed per-directory job anti-joined against the referenced set
    * — the driver never walks the n-file tree itself.
    * Usage: tools/run.sh graft.ScalingProbe vacuum [nFiles]. */
  private def runVacuumProbe(n: Int): Unit = {
    import graft.table._
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Scratch.dir("graft-vacprobe-").toString
    val root = java.nio.file.Paths.get(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val now = System.currentTimeMillis()
    val old = java.nio.file.attribute.FileTime.fromMillis(now - 30L * 24 * 3600 * 1000)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""VACPROBE {"step":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    timed("create_physical_files") {
      (0 until 64).foreach(b => java.nio.file.Files.createDirectories(root.resolve(s"b$b")))
      (0 until n).foreach { i =>
        val q = root.resolve(f"b${i % 64}%d/part-$i%07d.parquet")
        java.nio.file.Files.createFile(q)
        java.nio.file.Files.setLastModifiedTime(q, old)
      }
    }
    val log = new GraftLog(dir)
    val meta = MetaData(java.util.UUID.randomUUID().toString, schema.json, now,
      Nil, Map.empty, Map("vacuum.retentionDurationCheck" -> "false"))
    timed("commit_referenced_half") {
      log.commit(0L, Seq(meta,
        CommitInfo(0L, log.nextTimestamp(), "CONVERT", Map.empty)) ++
        (0 until n by 2).map(i => AddFile(
          f"b${i % 64}%d/part-$i%07d.parquet", 1024L, now, 10L,
          Map.empty, Map.empty)))
    }
    val t = GraftTable.forPath(spark, dir)
    val orphans = timed("vacuum_dryrun_distributed_listing") {
      t.vacuumDryRun(retainVersions = 0, retentionMs = 0L)
    }
    require(orphans.size == n / 2,
      s"expected ${n / 2} orphans, got ${orphans.size}")
    val deleted = timed("vacuum_delete") {
      t.vacuum(retainVersions = 0, retentionMs = 0L)
    }
    require(deleted == n / 2, s"expected ${n / 2} deleted, got $deleted")
    spark.stop()
  }

  /** Incremental-clustering probe (round-11 brief): times the first full
    * clustering pass vs the maintenance pass after a small append on a
    * `clustering.columns` table — the evidence that maintenance costs
    * O(new data), not O(table). Usage:
    * tools/run.sh graft.ScalingProbe cluster [baseRows] [appendRows]. */
  private def runClusterProbe(baseRows: Int, appendRows: Int): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""CLUSTERPROBE {"step":"$label","base":$baseRows,"append":$appendRows,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val t = graft.table.GraftTable.create(spark,
      Scratch.dir("graft-clusterprobe-").toString,
      (0 until baseRows).map(i => (i.toLong, i % 1000, i / 1000))
        .toDF("id", "x", "y").repartition(8))
    t.setProperty("clustering.columns", "x,y")
    timed("first_full_cluster")(t.optimize(targetFileBytes = 1 << 20))
    val nAfterFirst = t.snapshot.files.size
    t.append((baseRows until baseRows + appendRows)
      .map(i => (i.toLong, i % 1000, i / 1000)).toDF("id", "x", "y").coalesce(1))
    timed("incremental_maintenance")(t.optimize(targetFileBytes = 1 << 20))
    val m = t.history().orderBy(org.apache.spark.sql.functions.col("version").desc)
      .select("operationMetrics").head().getMap[String, String](0)
    println(s"""CLUSTERPROBE {"step":"metrics","skipped":${m.getOrElse("numClusteredFilesSkipped", "?")},"filesAfterFirst":$nAfterFirst}""")
    require(m.get("numClusteredFilesSkipped").exists(_.toInt == nAfterFirst),
      "the maintenance pass must skip every first-pass file")
    spark.stop()
  }

  /** Adoption-at-scale probe (round-15 brief): a synthetic FOREIGN delta
    * log with `n` live files — a delta checkpoint parquet at v1 carrying
    * every add (plus the v0/v1 JSON commits, so a full replay IS possible
    * and seeding is a measured choice, not a forced one) and a 10-commit
    * JSON tail. REQUIREs (a) the adopting commit is metadata-only and
    * O(1)-sized — independent of n, the zero-copy property — and (b) the
    * first post-adoption snapshot fold SEEDS from the foreign checkpoint:
    * storage-level commit reads equal the tail length exactly (a full
    * JSON replay would also read the n-add v1 commit).
    * Usage: tools/run.sh graft.ScalingProbe adopt [nFiles]. */
  private def runAdoptProbe(n: Int): Unit = {
    import graft.table._
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Scratch.dir("graft-adoptprobe-").toString
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""ADOPTPROBE {"step":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val protoLine = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["vacuumProtocolCheck"]}}"""
    val metaLine = s"""{"metaData":{"id":"adopt-probe-1","format":{"provider":"parquet","options":{}},"schemaString":${mapper.writeValueAsString(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1619112344000}}"""
    def addLine(i: Int): String = {
      val p = f"part-$i%07d-a-c000.snappy.parquet"
      s"""{"add":{"path":"$p","partitionValues":{},"size":134217728,"modificationTime":1619112345000,"dataChange":true,"stats":"{\\"numRecords\\":1000000,\\"minValues\\":{\\"id\\":${i * 1000L}},\\"maxValues\\":{\\"id\\":${(i + 1) * 1000L}},\\"nullCount\\":{\\"id\\":0}}"}}"""
    }
    def info(ts: Long) =
      s"""{"commitInfo":{"timestamp":$ts,"operation":"WRITE","operationMetrics":{}}}"""
    timed("author_foreign_log") {
      java.nio.file.Files.write(logDir.resolve(f"${0L}%020d.json"),
        Seq(info(1619112345000L), protoLine, metaLine)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(logDir.resolve(f"${1L}%020d.json"),
        (info(1619112346000L) +: (0 until n).map(addLine))
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      // the delta checkpoint at v1: protocol + metaData + every add
      val stage = Scratch.dir("graft-adoptprobe-cp-")
      spark.read.json((Seq(protoLine, metaLine) ++ (0 until n).map(addLine)).toDS)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        logDir.resolve(f"${1L}%020d.checkpoint.parquet"))
      java.nio.file.Files.write(logDir.resolve("_last_checkpoint"),
        s"""{"version":1,"size":${n + 2}}""".getBytes("UTF-8"))
      // 10-commit foreign tail past the checkpoint
      (2 to 11).foreach { v =>
        java.nio.file.Files.write(logDir.resolve(f"$v%020d.json"),
          (info(1619112346000L + v) +: Seq(addLine(n + v)))
            .mkString("", "\n", "\n").getBytes("UTF-8"))
      }
    }
    val preLog = new GraftLog(dir)
    val pre = timed("foreign_fold_checkpoint_seeded") { preLog.snapshotAt(11L) }
    require(pre.files.size == n + 10, s"foreign fold lost files: ${pre.files.size}")
    require(preLog.uncachedVersionReads <= 11,
      s"foreign fold must seed from the checkpoint, read " +
        s"${preLog.uncachedVersionReads} commits (tail is 10)")
    timed("adopt") { GraftTable.adoptDelta(spark, dir) }
    val adoptFile = logDir.resolve(f"${12L}%020d.json")
    val adoptBytes = java.nio.file.Files.size(adoptFile)
    val adoptLines = java.nio.file.Files.readAllLines(adoptFile)
    require(adoptLines.stream().noneMatch(_.contains("\"add\"")) &&
        adoptBytes < 8192,
      s"adopting commit must be metadata-only and O(1)-sized, got $adoptBytes bytes")
    println(s"""ADOPTPROBE {"step":"adopt_commit_bytes","n":$n,"bytes":$adoptBytes}""")
    // FIRST post-adoption fold: a fresh log instance must seed from the
    // FOREIGN checkpoint and replay only the (2..12) tail — exactly 11
    // commit reads; a full JSON replay would read 13 including the n-add v1
    val postLog = new GraftLog(dir)
    val post = timed("post_adoption_fold") { postLog.snapshotAt(12L) }
    require(post.files.size == n + 10, s"post-adoption fold lost files: ${post.files.size}")
    require(postLog.uncachedVersionReads <= 11,
      s"post-adoption fold must reuse the foreign checkpoint, read " +
        s"${postLog.uncachedVersionReads} commits (tail is 11)")
    // and graft DML proceeds on the adopted table
    val t = GraftTable.forPath(spark, dir)
    timed("post_adoption_history") { t.history().count() }
    spark.stop()
  }

  /** ID-mode + rowTracking adoption probe (round-16): the delta-spark 3.x
    * default shape at scale — a synthetic id-mode FOREIGN log with `n`
    * live files, rowTracking enabled, and the row-id high-water-mark
    * domain living ONLY in the checkpoint (delta's metadata-cleanup
    * shape; the JSON tail never mentions it), so adoption exercises the
    * WORST-case domain fold: the tail scan misses and the fallback reads
    * the n-row checkpoint. REQUIREs the adopting commit stays
    * metadata-only and O(1)-sized, the hwm folds from the checkpoint
    * domain (not the live-derived floor), and the id-mode mapping
    * translates (columnMapping.mode=id + field-id read resolution).
    * Usage: tools/run.sh graft.ScalingProbe adopt-id [nFiles]. */
  private def runAdoptIdProbe(n: Int): Unit = {
    import graft.table._
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Scratch.dir("graft-adoptidprobe-").toString
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""ADOPTIDPROBE {"step":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 1L)
          .putString("delta.columnMapping.physicalName", "col-1").build()))).json
    val protoLine = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping","rowTracking","domainMetadata","invariants"]}}"""
    val metaLine = s"""{"metaData":{"id":"adopt-id-probe-1","format":{"provider":"parquet","options":{}},"schemaString":${mapper.writeValueAsString(schemaJson)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"1","delta.enableRowTracking":"true"},"createdTime":1619112344000}}"""
    // each file claims 1000 allocated row ids; the domain's hwm leads the
    // live-derived floor by a margin the REQUIRE below pins
    val hwm = n * 1000L + 999999L
    val domainLine =
      s"""{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\\"rowIdHighWaterMark\\":$hwm}","removed":false}}"""
    def addLine(i: Int): String = {
      val p = f"part-$i%07d-a-c000.snappy.parquet"
      s"""{"add":{"path":"$p","partitionValues":{},"size":134217728,"modificationTime":1619112345000,"dataChange":true,"baseRowId":${i * 1000L},"defaultRowCommitVersion":1,"stats":"{\\"numRecords\\":1000,\\"minValues\\":{\\"id\\":${i * 1000L}},\\"maxValues\\":{\\"id\\":${(i + 1) * 1000L}},\\"nullCount\\":{\\"id\\":0}}"}}"""
    }
    def info(ts: Long) =
      s"""{"commitInfo":{"timestamp":$ts,"operation":"WRITE","operationMetrics":{}}}"""
    timed("author_foreign_log") {
      java.nio.file.Files.write(logDir.resolve(f"${0L}%020d.json"),
        Seq(info(1619112345000L), protoLine, metaLine)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(logDir.resolve(f"${1L}%020d.json"),
        (info(1619112346000L) +: (0 until n).map(addLine))
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      // the checkpoint carries every add + the DOMAIN (tail never does)
      val stage = Scratch.dir("graft-adoptidprobe-cp-")
      spark.read.json(
        (Seq(protoLine, metaLine, domainLine) ++ (0 until n).map(addLine)).toDS)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        logDir.resolve(f"${1L}%020d.checkpoint.parquet"))
      java.nio.file.Files.write(logDir.resolve("_last_checkpoint"),
        s"""{"version":1,"size":${n + 3}}""".getBytes("UTF-8"))
      // a 10-commit domain-less foreign tail past the checkpoint
      (2 to 11).foreach { v =>
        java.nio.file.Files.write(logDir.resolve(f"$v%020d.json"),
          (info(1619112346000L + v) +: Seq(addLine(n + v)))
            .mkString("", "\n", "\n").getBytes("UTF-8"))
      }
    }
    val t = timed("adopt_idmode") { GraftTable.adoptDelta(spark, dir) }
    val adoptFile = logDir.resolve(f"${12L}%020d.json")
    val adoptBytes = java.nio.file.Files.size(adoptFile)
    require(java.nio.file.Files.readAllLines(adoptFile).stream()
        .noneMatch(_.contains("\"add\"")) && adoptBytes < 8192,
      s"adopting commit must be metadata-only and O(1)-sized, got $adoptBytes bytes")
    println(s"""ADOPTIDPROBE {"step":"adopt_commit_bytes","n":$n,"bytes":$adoptBytes}""")
    val props = t.snapshot.metaData.properties
    require(props.get("columnMapping.mode").contains("id"),
      "id-mode mapping must translate")
    require(props.get(GraftTable.RowIdHwmKey).map(_.toLong).contains(hwm),
      s"the hwm must fold from the CHECKPOINT domain ($hwm), got " +
        s"${props.get(GraftTable.RowIdHwmKey)} — the live floor alone " +
        "would re-issue removed files' ids")
    spark.stop()
  }

  /** Shallow-clone scan-planning probe (round-15 brief): a partitioned
    * table with `n` DISTINCT partition values, shallow-cloned, then the
    * clone's FIRST scan is planned and executed. REQUIREs the plan holds
    * exactly ONE parquet leaf regardless of n — the round-14 shape
    * planned one union leg per partition combo, making driver-side
    * planning O(partitions) on the feature's headline use case (branch a
    * 100-TB partitioned table, scan before any OPTIMIZE localizes files).
    * Usage: tools/run.sh graft.ScalingProbe clone [nPartitions]. */
  private def runCloneProbe(n: Int): Unit = {
    import graft.table._
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""CLONEPROBE {"step":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val src = Scratch.dir("graft-cloneprobe-src-").toString
    timed("build_partitioned_source") {
      // one physical parquet file copied under n partition dirs, then
      // CONVERT references them in place (footer harvest is one executor
      // job) — n real files without an n-way shuffle write
      val stage = Scratch.dir("graft-cloneprobe-stage-")
      Seq((1L, "x")).toDF("id", "payload").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      (0 until n).foreach { i =>
        val d = java.nio.file.Paths.get(src, f"p=v$i%04d")
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.copy(java.nio.file.Paths.get(part),
          d.resolve("part-00000-c000.parquet"))
      }
      GraftTable.convert(spark, src)
    }
    val t = GraftTable.forPath(spark, src)
    val c = timed("shallow_clone") {
      t.cloneTo(Scratch.dir("graft-cloneprobe-dst-").toString + "/t")
    }
    val scan = c.toDF
    val plan = timed("plan_first_scan") {
      scan.queryExecution.executedPlan.toString
    }
    val leaves = "FileScan parquet".r.findAllIn(plan).size
    require(leaves == 1,
      s"escaped-file scan must plan ONE parquet leaf at $n combos, got $leaves")
    println(s"""CLONEPROBE {"step":"plan_leaves","n":$n,"leaves":$leaves}""")
    val rows = timed("execute_first_scan") { scan.count() }
    require(rows == n.toLong, s"clone scan lost rows: $rows of $n")
    val probeVal = f"v${math.min(7, n - 1)}%04d"
    val pruned = timed("partition_pruned_scan") {
      c.scan($"p" === probeVal).count()
    }
    require(pruned == 1L, s"partition value must prune to one row, got $pruned")
    spark.stop()
  }

  /** Round-17 DDL-at-scale probe: on a SYNTHETIC n-file table (no data
    * files — none of these ops may open one), REQUIRE that ADD COLUMN
    * ... DEFAULT, ALTER COLUMN TYPE (widen) and the CLUSTER BY
    * declaration each land as ONE SMALL metadata-only commit (< 64 KB —
    * a commit that re-listed the files would be ~15 MB at n=100k), and
    * that stats pruning over the 100k AddFiles stays O(files) with the
    * collation guard costing nothing measurable (a collated predicate
    * prunes NOTHING — correctness — at the same order wall-clock as the
    * binary predicate that prunes). */
  private def runDdlProbe(n: Int): Unit = {
    import graft.table._
    import org.apache.spark.sql.types._
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Scratch.dir("graft-ddlprobe-").toString
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""DDLPROBE {"step":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("cnt", IntegerType),
      StructField("name", StringType("UTF8_LCASE"))))
    val now = System.currentTimeMillis()
    def addFile(i: Int): AddFile = AddFile(
      f"part-$i%07d-xxxxxxxx.parquet", 128L * 1024 * 1024, now, 1000000L,
      Map("id" -> (i * 1000L).toString, "cnt" -> "0", "name" -> "AAAA"),
      Map("id" -> ((i + 1) * 1000L).toString, "cnt" -> "99", "name" -> "MZZZ"))
    val log = new GraftLog(dir)
    timed("author_100k_file_log") {
      log.commit(0L, Seq(
        MetaData(java.util.UUID.randomUUID().toString, schema.json, now, Nil,
          Map.empty, Map.empty),
        CommitInfo(0L, log.nextTimestamp(), "CONVERT", Map.empty)) ++
        (0 until n).map(addFile))
    }
    val t = GraftTable.forPath(spark, dir)
    require(t.snapshot.files.size == n, "fold lost files")
    def commitBytes(v: Long): Long = java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json"))
    timed("add_column_default") {
      t.addColumn("tier", StringType, Some("'legacy'"))
    }
    require(t.latestVersion == 1 && commitBytes(1) < 64 * 1024,
      s"ADD COLUMN DEFAULT must be metadata-only (${commitBytes(1)} B)")
    timed("widen_cnt_int_to_long") { t.alterColumnType("cnt", LongType) }
    require(t.latestVersion == 2 && commitBytes(2) < 64 * 1024,
      s"type widening must be metadata-only (${commitBytes(2)} B)")
    timed("declare_cluster_by") { t.setProperty("clustering.columns", "id") }
    require(commitBytes(3) < 64 * 1024, "CLUSTER BY declaration must be tiny")
    require(t.snapshot.files.size == n, "no DDL may touch the file set")
    // stats pruning at n files: binary predicate prunes, collated cannot
    val snap = t.snapshot
    val pruned = timed("prune_binary_id") {
      DataSkipping.prune(DataSkipping.resolve(spark, snap.schema,
        org.apache.spark.sql.functions.col("id") < 500000L), snap.files).size
    }
    require(pruned < n / 100, s"binary pruning must bite, kept $pruned")
    val keptCollated = timed("prune_collated_name") {
      DataSkipping.prune(DataSkipping.resolve(spark, snap.schema,
        org.apache.spark.sql.functions.col("name") === "zz"), snap.files).size
    }
    require(keptCollated == n,
      s"a collated predicate must never prune (kept $keptCollated of $n)")
    println(s"DDLPROBE done n=$n commits=[${commitBytes(1)},${commitBytes(2)},${commitBytes(3)}]B")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("clone")) {
      runCloneProbe(args.drop(1).headOption.map(_.toInt).getOrElse(1000))
      return
    }
    if (args.headOption.contains("adopt")) {
      runAdoptProbe(args.drop(1).headOption.map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("adopt-id")) {
      runAdoptIdProbe(args.drop(1).headOption.map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("log")) {
      runLogProbe(args.drop(1).headOption.map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("vacuum")) {
      runVacuumProbe(args.drop(1).headOption.map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("cluster")) {
      runClusterProbe(
        args.drop(1).headOption.map(_.toInt).getOrElse(2000000),
        args.drop(2).headOption.map(_.toInt).getOrElse(50000))
      return
    }
    if (args.headOption.contains("contention")) {
      runContentionProbe(
        args.drop(1).headOption.map(_.toInt).getOrElse(8),
        args.drop(2).headOption.map(_.toInt).getOrElse(10))
      return
    }
    if (args.headOption.contains("dml")) {
      runDmlProbe(args.drop(1).headOption.map(_.toInt).getOrElse(3))
      return
    }
    if (args.headOption.contains("ddl")) {
      runDdlProbe(args.drop(1).headOption.map(_.toInt).getOrElse(100000))
      return
    }
    val chainMode = args.headOption.contains("dedup-chain")
    val bucketMode = args.headOption.contains("bucket-join")
    val posArgs = if (chainMode || bucketMode) args.drop(1) else args
    val sfDir = posArgs.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (posArgs.length > 1) posArgs.drop(1).map(_.toInt).toSeq
                else Seq(1, 2, 4, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def replicated(m: Int): String = {
      val dir = s"/tmp/graft-scale-${m}x"
      if (!new java.io.File(s"$dir/part.parquet").exists()) {
        // relational tables for the join probes: keys shifted per replica so
        // joins stay 1:1 (work grows linearly, never replica-cross-product);
        // part names suffixed so the distinct-name vocabulary also grows m×
        val shift = (c: String, k: Int) => lit(k.toLong * 10_000_000L) + col(c)
        val parts = (0 until m).map { k =>
          Tables.part(spark, sfDir)
            .withColumn("p_partkey", shift("p_partkey", k))
            // 3-char replica suffix: replicas land at edit distance 3 from
            // each other (outside q59's <=2), so matches stay within-replica
            // and the OUTPUT grows linearly in m, not quadratically
            .withColumn("p_name", concat(col("p_name"), lit(s"_$k$k$k")))
        }
        parts.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/part.parquet")
        val orders = (0 until m).map { k =>
          Tables.orders(spark, sfDir).withColumn("o_orderkey", shift("o_orderkey", k))
        }
        orders.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        val lis = (0 until m).map { k =>
          Tables.lineitem(spark, sfDir).withColumn("l_orderkey", shift("l_orderkey", k))
        }
        lis.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        // dims copied verbatim: fact grows m×, dimension stays fixed —
        // the realistic shape for the runtime-filter probe (q102)
        for (t <- Seq("customer", "nation", "region"))
          spark.read.parquet(s"$sfDir/$t.parquet")
            .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        // events: user population grows m× over the SAME time span (the
        // realistic growth axis — more users, not a longer history), so
        // window partitions stay per-user-sized and cohort/funnel/
        // attribution work must grow linearly in users. Read RAW so the
        // replica keeps the testdata's physical column shape, whatever ts
        // type this generation carries (Tables.events adapts on read).
        val evs = (0 until m).map { k =>
          graft.Tables.eventsRaw(spark, sfDir)
            .withColumn("event_id", $"event_id" + lit(k.toLong * 10_000_000L))
            .withColumn("user_id", $"user_id" + lit(k.toLong * 10_000_000L))
        }
        evs.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = Tables.documents(spark, sfDir)
        val vecs = Tables.embeddings(spark, sfDir)
        val docCopies = (0 until m).map { k =>
          docs.withColumn("doc_id", $"doc_id" + lit(k.toLong * 10_000_000L))
            .withColumn("text",
              concat_ws(" ", expr(s"transform(split(text, ' '), t -> concat(t, '_$k'))")))
        }
        docCopies.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val vecCopies = (0 until m).map { k =>
          val rot = k % 64
          vecs.withColumn("vec_id", $"vec_id" + lit(k.toLong * 10_000_000L))
            .withColumn("embedding",
              expr(s"concat(slice(embedding, ${rot + 1}, ${64 - rot}), slice(embedding, 1, $rot))"))
        }
        vecCopies.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      dir
    }

    // warmup
    Tables.documents(spark, sfDir).groupBy($"lang").count().collect()

    if (bucketMode) {
      // Bucketed SPJ at scale: two tables bucketed bucket(16, doc_id) from
      // the m×-replicated corpus, joined through the catalog. The probe
      // REQUIREs the plan stays EXCHANGE-FREE at every replication — the
      // 100-TB property under test is that co-location is metadata (bucket
      // groups zip), so scaling the data scales only the per-task reads,
      // never reintroduces the shuffle.
      graft.sources.GraftCatalog.register(spark, "/tmp/graft-bkt-probe-wh", name = "bktp")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // paths and table names carry the CORPUS fingerprint: a fixed name
      // keyed only by m would silently serve a previous run's data after
      // an sfDir change, and a crash between create and CREATE TABLE would
      // strand the rerun — the fingerprint makes every (corpus, m) fresh
      val tag = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL)
      for (m <- mults) {
        val dir = replicated(m)
        val pa = s"/tmp/graft-bkt-probe-$tag-$m-a"
        val pb = s"/tmp/graft-bkt-probe-$tag-$m-b"
        val docs = Tables.documents(spark, dir)
        if (!graft.table.GraftTable.isGraftTable(pa))
          graft.table.GraftTable.create(spark, pa,
            docs.select($"doc_id", $"lang", $"n_chars"),
            bucketBy = Some(("doc_id", 16)))
        if (!graft.table.GraftTable.isGraftTable(pb))
          graft.table.GraftTable.create(spark, pb,
            docs.select($"doc_id",
              size(split($"text", " ")).cast("long").as("n_tokens")),
            bucketBy = Some(("doc_id", 16)))
        spark.sql(s"CREATE TABLE IF NOT EXISTS bktp.default.a${tag}_$m USING graft LOCATION '$pa'")
        spark.sql(s"CREATE TABLE IF NOT EXISTS bktp.default.b${tag}_$m USING graft LOCATION '$pb'")
        val t0 = System.nanoTime()
        val df = spark.sql(
          s"""SELECT x.doc_id, x.lang, x.n_chars, y.n_tokens
             |FROM bktp.default.a${tag}_$m x JOIN bktp.default.b${tag}_$m y
             |ON x.doc_id = y.doc_id""".stripMargin)
        val rows = df.collect().length.toLong
        val sec = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        require(!plan.contains("Exchange"),
          s"bucketed join must stay exchange-free at ${m}x:\n${plan.take(1200)}")
        require(plan.contains("SortMergeJoin"), "co-located sort-merge expected")
        println(f"""BUCKET {"m":$m,"rows":$rows,"sec":$sec%.2f,"exchangeFree":true}""")

        // the COMPOSED layout (round 14): Hive-partition by lang AND
        // bucket by doc_id — the standard lakehouse fact shape. The SPJ
        // key is (lang, bucket); the same exchange-free property must
        // hold at every replication.
        val pc = s"/tmp/graft-bkt-probe-$tag-$m-c"
        val pd = s"/tmp/graft-bkt-probe-$tag-$m-d"
        if (!graft.table.GraftTable.isGraftTable(pc))
          graft.table.GraftTable.create(spark, pc,
            docs.select($"doc_id", $"lang", $"n_chars"),
            partitionBy = Seq("lang"), bucketBy = Some(("doc_id", 16)))
        if (!graft.table.GraftTable.isGraftTable(pd))
          graft.table.GraftTable.create(spark, pd,
            docs.select($"doc_id", $"lang",
              size(split($"text", " ")).cast("long").as("n_tokens")),
            partitionBy = Seq("lang"), bucketBy = Some(("doc_id", 16)))
        spark.sql(s"CREATE TABLE IF NOT EXISTS bktp.default.c${tag}_$m USING graft LOCATION '$pc'")
        spark.sql(s"CREATE TABLE IF NOT EXISTS bktp.default.d${tag}_$m USING graft LOCATION '$pd'")
        val t1 = System.nanoTime()
        val df2 = spark.sql(
          s"""SELECT x.doc_id, x.lang, x.n_chars, y.n_tokens
             |FROM bktp.default.c${tag}_$m x JOIN bktp.default.d${tag}_$m y
             |ON x.doc_id = y.doc_id AND x.lang = y.lang""".stripMargin)
        val rows2 = df2.collect().length.toLong
        val sec2 = (System.nanoTime() - t1) / 1e9
        val plan2 = df2.queryExecution.executedPlan.toString
        require(!plan2.contains("Exchange"),
          s"partitioned+bucketed join must stay exchange-free at ${m}x:\n${plan2.take(1200)}")
        println(f"""PARTBUCKET {"m":$m,"rows":$rows2,"sec":$sec2%.2f,"exchangeFree":true}""")
      }
      spark.stop()
      return
    }

    if (chainMode) {
      // The production dedup CHAIN, staged: q42 builds (and persists) the
      // MinHash-LSH pair graph, q57 runs the transitive closure over it,
      // q111 selects canonicals from the clusters. Per-stage wall-clock
      // gives the cost CURVE; ConnectedComponents.lastRounds gives the
      // closure-round curve. Replicas are content-disjoint, so component
      // DIAMETERS cannot grow with m — the probe REQUIREs the round count
      // stays flat (log-diameter convergence, the 100-TB property: data
      // volume scales the per-round shuffles, never the round COUNT).
      var baseRounds = -1
      for (m <- mults) {
        val dir = replicated(m)
        def stage(label: String)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          val sec = (System.nanoTime() - t0) / 1e9
          val rounds =
            if (label == "q57_closure")
              graft.operators.ConnectedComponents.lastRounds.get(): Int
            else -1
          println(f"""CHAIN {"stage":"$label","m":$m,"rows":$rows,"sec":$sec%.2f,"rounds":$rounds}""")
          if (label == "q57_closure") {
            require(rounds >= 1 && rounds <= 8,
              s"closure must converge in log-diameter rounds, took $rounds")
            if (baseRounds < 0) baseRounds = rounds
            require(rounds <= baseRounds + 1,
              s"round count must stay flat across replication: $rounds at ${m}x " +
                s"vs $baseRounds at ${mults.head}x — diameter is leaking with volume")
          }
        }
        stage("q42_pair_graph") {
          SparkEntry.queries("q42_minhash_lsh")(spark, dir).count() }
        stage("q57_closure") {
          SparkEntry.queries("q57_dedup_clusters")(spark, dir).count() }
        stage("q111_canonical") {
          SparkEntry.queries("q111_canonical_select")(spark, dir).count() }
      }
      spark.stop()
      return
    }

    // q91 is excluded: replication suffixes every token, so the literal
    // BM25 query terms vanish from the replicated vocabulary (0-row probe)
    for (q <- Seq("q43_ngram_jaccard", "q45_embedding_neardup", "q46_simhash_pairs",
                  "q57_dedup_clusters", "q47_range_join", "q59_fuzzy_name_join",
                  "q92_pagerank", "q93_heavy_hitters", "q102_bitset_prune_join",
                  "q104_decontaminate", "q105_repetition_quality",
                  "q108_pii_scrub", "q109_sequence_packing",
                  "q112_cohort_retention", "q113_funnel_stages", "q114_last_touch",
                  "q115_anomaly_zscore", "q116_kmeans", "q118_nested_export",
                  "q119_vocab_oov", "q121_cooccurrence", "q127_incremental_dedup",
                  "q128_novelty_score",
                  // round 5: per-dir fixtures (CTAS load / 3-commit source
                  // table) build on first touch, so these probes time
                  // build+read together — both sides scale with the data
                  "q133_catalog_sql_agg", "q135_stream_table_source");
         m <- mults) {
      val dir = replicated(m)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""SCALE {"query":"$q","m":$m,"rows":$rows,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
