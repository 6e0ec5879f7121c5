package graft.table

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based property test (SURVEY.md §5.2.3): a GraftTable driven by a
  * random sequence of append/merge/delete/OPTIMIZE/RESTORE ops must always
  * equal a plain in-memory Map model, at HEAD and at every historical
  * version — OPTIMIZE must be a pure layout change, and RESTORE must snap
  * state back while history keeps moving forward, with replay correct
  * through both.
  */
class ModelCheckSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("firstname", StringType, nullable = false),
    StructField("lastname", StringType, nullable = false)))

  private def df(rows: Seq[(Int, String, String)]): DataFrame =
    spark.createDataFrame(rows.map { case (i, f, l) => Row(i, f, l) }.asJava, schema)

  private def state(d: DataFrame): Map[Int, (String, String)] =
    d.collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap

  test("random op sequences: table == model at head and at every version") {
    runModelCheck(GraftTable.create(spark, tmpDir("model-"), df(Seq((0, "seed", "row")))))
  }

  test("random op sequences on a bloom-configured table: DML + point lookups stay exact") {
    // same random walk, but every data write also builds bloom filters and
    // each step additionally point-looks-up a random id through the
    // bloom-pruned scan path — pruning under DML churn must never cost a row
    runModelCheck(
      GraftTable.create(spark, tmpDir("model-bloom-"), df(Seq((0, "seed", "row"))),
        bloomFilterOn = Seq("id", "firstname"), bloomNdv = 1000L),
      probeLookups = true)
  }

  private def runModelCheck(t: GraftTable, probeLookups: Boolean = false): Unit = {
    val rnd = new scala.util.Random(2024)
    var model = Map(0 -> ("seed", "row"))
    val versions = scala.collection.mutable.ArrayBuffer(model)
    var nextId = 1

    (1 to 20).foreach { step =>
      rnd.nextInt(5) match {
        case 0 => // append fresh ids
          val rows = (0 to rnd.nextInt(3)).map { _ =>
            val r = (nextId, s"f$nextId", s"l$nextId"); nextId += 1; r
          }
          t.append(df(rows))
          model = model ++ rows.map(r => r._1 -> (r._2, r._3))

        case 1 => // merge: update some existing + insert some new, randomly
          // through one of three clause shapes (plain upsert / upsert with
          // conditional tombstone deletes / source-sync with by-source
          // delete) — the full DeltaMergeBuilder clause set under churn
          val existing = model.keys.toSeq.sorted.take(rnd.nextInt(3))
            .map(id => (id, s"u$step-$id", s"v$step-$id"))
          val fresh = (0 until rnd.nextInt(2)).map { _ =>
            val r = (nextId, s"f$nextId", s"l$nextId"); nextId += 1; r
          }
          val src = existing ++ fresh
          if (src.nonEmpty) {
            val upserted = src.map(r => r._1 -> (r._2, r._3))
            rnd.nextInt(3) match {
              case 0 => // plain upsert
                t.merge(df(src), "t.id = s.id")
                  .whenMatchedUpdate(Map("firstname" -> "s.firstname", "lastname" -> "s.lastname"))
                  .whenNotMatchedInsert(Map(
                    "id" -> "s.id", "firstname" -> "s.firstname", "lastname" -> "s.lastname"))
                  .execute()
                model = model ++ upserted
              case 1 => // tombstone upsert: even matched ids delete, odd update
                t.merge(df(src), "t.id = s.id")
                  .whenMatchedDelete("s.id % 2 = 0")
                  .whenMatchedUpdate(Map("firstname" -> "s.firstname", "lastname" -> "s.lastname"))
                  .whenNotMatchedInsert(Map(
                    "id" -> "s.id", "firstname" -> "s.firstname", "lastname" -> "s.lastname"))
                  .execute()
                val (dead, live) = existing.partition(_._1 % 2 == 0)
                model = model -- dead.map(_._1)
                model = model ++ (live ++ fresh).map(r => r._1 -> (r._2, r._3))
              case 2 => // source-sync: upsert + by-source delete above a cutoff
                val cutoff = math.max(0, nextId - 1 - rnd.nextInt(5))
                t.merge(df(src), "t.id = s.id")
                  .whenMatchedUpdate(Map("firstname" -> "s.firstname", "lastname" -> "s.lastname"))
                  .whenNotMatchedInsert(Map(
                    "id" -> "s.id", "firstname" -> "s.firstname", "lastname" -> "s.lastname"))
                  .whenNotMatchedBySourceDelete(s"t.id >= $cutoff")
                  .execute()
                val srcIds = src.map(_._1).toSet
                model = model.filter { case (id, _) => srcIds.contains(id) || id < cutoff }
                model = model ++ upserted
            }
          } else {
            val r = (nextId, s"f$nextId", s"l$nextId"); nextId += 1
            t.append(df(Seq(r)))
            model += r._1 -> (r._2, r._3)
          }

        case 2 => // delete a random id range
          val lo = rnd.nextInt(math.max(1, nextId))
          val hi = lo + rnd.nextInt(4)
          t.delete(col("id").between(lo, hi))
          model = model.filter { case (id, _) => id < lo || id > hi }

        case 3 => // OPTIMIZE: must be a pure layout change — state unchanged
          t.optimize(targetFileBytes = 1L * 1024 * 1024)

        case 4 => // RESTORE to a random earlier version: state snaps back,
          // history still moves forward by exactly one commit
          val target = rnd.nextInt(versions.size)
          t.restore(target)
          model = versions(target)
      }
      // OPTIMIZE legitimately skips the commit when ≤1 un-vectored file is
      // in scope — versions maps table version → model, so only record one
      // entry when a commit actually landed (state is unchanged either way)
      if (t.latestVersion == versions.size) versions += model
      else assert(t.latestVersion === versions.size - 1,
        s"step $step: latestVersion ${t.latestVersion} vs ${versions.size - 1} expected")
      assert(state(t.toDF) === model, s"HEAD mismatch after step $step")
      if (probeLookups) {
        val probe = rnd.nextInt(math.max(1, nextId))
        val got = t.scan(col("id") === probe).collect()
          .map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
        assert(got === model.filter(_._1 == probe),
          s"bloom-pruned point lookup of id=$probe diverged after step $step")
      }
    }

    // every historical version must still replay to its recorded model
    versions.zipWithIndex.foreach { case (m, v) =>
      assert(state(t.versionAsOf(v)) === m, s"version $v mismatch")
    }
    // and history has one entry per commit
    assert(t.history().count() === versions.size)
  }

  test("schema evolution mid-history: every version replays with its own schema") {
    val t = GraftTable.create(spark, tmpDir("model-evo-"),
      df(Seq((0, "s", "r"), (1, "a", "b"))))
    val evoSchema = schema.add(StructField("age", IntegerType, nullable = true))
    def df4(rows: Seq[(Int, String, String, Any)]): DataFrame =
      spark.createDataFrame(rows.map { case (i, f, l, a) => Row(i, f, l, a) }.asJava, evoSchema)
    // v1: evolving merge (update 1, insert 2, both with age)
    t.merge(df4(Seq((1, "a1", "b1", 11), (2, "c", "d", 22))), "t.id = s.id")
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("firstname" -> "s.firstname",
        "lastname" -> "s.lastname", "age" -> "s.age"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "firstname" -> "s.firstname",
        "lastname" -> "s.lastname", "age" -> "s.age"))
      .execute()
    // v2, v3: ordinary DML on the evolved table
    t.delete(col("id") === 0)
    t.append(df4(Seq((3, "e", "f", null))))
    def st4(v: Long): Set[(Int, String, String, Option[Int])] =
      t.versionAsOf(v).collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
    assert(t.versionAsOf(0).columns.length === 3, "pre-evolution schema intact")
    assert(state(t.versionAsOf(0)) === Map(0 -> ("s", "r"), 1 -> ("a", "b")))
    assert(st4(1) === Set((0, "s", "r", None), (1, "a1", "b1", Some(11)),
      (2, "c", "d", Some(22))))
    assert(st4(2) === Set((1, "a1", "b1", Some(11)), (2, "c", "d", Some(22))))
    assert(st4(3) === Set((1, "a1", "b1", Some(11)), (2, "c", "d", Some(22)),
      (3, "e", "f", None)))
  }

  test("stale non-append writer gets ConcurrentModificationException; winner's state intact") {
    val t = GraftTable.create(spark, tmpDir("conc-dml-"),
      df(Seq((0, "s", "s"), (1, "a", "a"), (2, "b", "b"))))
    val v0 = t.latestVersion
    // writer A lands its DELETE
    t.delete(col("id") === 1)
    // writer B planned against the now-stale snapshot v0 and tries to commit
    // the same version number — the atomic log rejects it outright (non-append
    // DML is NOT retried: its rewrite was computed against stale files)
    intercept[java.util.ConcurrentModificationException] {
      t.log.commit(v0 + 1, Seq(
        CommitInfo(v0 + 1, t.log.nextTimestamp(), "DELETE", Map())))
    }
    // state is exactly writer A's outcome; B left no trace in the log
    assert(state(t.toDF) === Map(0 -> ("s", "s"), 2 -> ("b", "b")))
    assert(t.latestVersion === v0 + 1)
  }

  test("racing DELETE writers: loser (if any) conflicts cleanly, never half-applies") {
    val ids = 0 to 9
    val t = GraftTable.create(spark, tmpDir("conc-race-"),
      df(ids.map(i => (i, s"f$i", s"l$i"))))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def deleter(lo: Int, hi: Int) = new Thread(() => {
      barrier.await()
      try t.delete(col("id").between(lo, hi))
      catch { case e: Throwable => errs.add(e) }
    })
    val a = deleter(0, 1); val b = deleter(8, 9)
    a.start(); b.start(); a.join(); b.join()
    errs.asScala.foreach(e =>
      assert(e.isInstanceOf[java.util.ConcurrentModificationException],
        s"unexpected failure kind: $e"))
    val remaining = state(t.toDF).keySet
    val expected = errs.size match {
      case 0 => Set(ids.toSet -- Set(0, 1, 8, 9))             // serialized: both landed
      case 1 => Set(ids.toSet -- Set(0, 1), ids.toSet -- Set(8, 9)) // one conflicted
      case _ => Set(ids.toSet)                                 // both conflicted (can't: one must win)
    }
    assert(expected.contains(remaining), s"state $remaining not a clean outcome")
    assert(errs.size <= 1, "at least one racing DELETE must commit")
  }

  test("concurrent appenders with auto compaction racing: no row lost, files bounded") {
    val t = GraftTable.create(spark, tmpDir("conc-ac-"), df(Seq((0, "s", "s"))))
    t.setProperty("autoCompact.maxFiles", "3")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        try (1 to 5).foreach(i => t.append(df(Seq((w * 100 + i, s"f$w$i", s"l$w$i")))))
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"appends must never fail on compaction races: $errs")
    assert(t.toDF.count() === 11, "every append must survive racing auto compactions")
    assert(state(t.toDF).keySet ===
      (Set(0) ++ (1 to 5).flatMap(i => Seq(i, 100 + i)).toSet))
    // compaction keeps the file count from growing one-per-append
    assert(t.snapshot.files.size < 10,
      s"auto compact should bound files, got ${t.snapshot.files.size}")
  }

  test("incremental clustering OPTIMIZE composes with concurrent appends") {
    // an incremental maintenance pass reads only the files it rewrites
    // (never the whole table), so appends racing it must BOTH land —
    // Delta's dataChange=false leniency — and the appended rows stay
    // unclustered until the NEXT pass picks them up by their missing tag
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("conc-clust-"),
      (0 until 4096).map(i => (i, s"f$i", s"l$i")).toDF("id", "firstname", "lastname")
        .repartition(4))
    t.setProperty("clustering.columns", "id")
    t.optimize(targetFileBytes = 64 * 1024) // first full pass, all tagged
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try (0 until 5).foreach(k => t.append(
        (0 until 50).map(i => (10000 + k * 100 + i, "a", "b"))
          .toDF("id", "firstname", "lastname").coalesce(1)))
      catch { case e: Throwable => errs.add(e) }
    })
    val optimizer = new Thread(() => {
      try (0 until 3).foreach(_ => t.optimize(targetFileBytes = 64 * 1024))
      catch { case e: Throwable => errs.add(e) }
    })
    appender.start(); optimizer.start()
    appender.join(); optimizer.join()
    assert(errs.isEmpty, s"appends and incremental OPTIMIZE must compose: $errs")
    assert(t.toDF.count() === 4096 + 250, "no appended row may be lost")
    // one final pass leaves the table fully conforming
    t.optimize(targetFileBytes = 64 * 1024)
    assert(t.snapshot.files.forall(_.tags.contains("clustered")))
    assert(t.scan(col("id") === 10000).count() === 1)
  }

  test("two concurrent appenders both land via optimistic retry") {
    val t = GraftTable.create(spark, tmpDir("conc-"), df(Seq((0, "s", "s"))))
    val threads = (1 to 4).map { i =>
      new Thread(() => t.append(df(Seq((i, s"t$i", s"t$i")))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(t.latestVersion === 4, "all four appends must commit distinct versions")
    assert(state(t.toDF).keySet === Set(0, 1, 2, 3, 4))
    // strictly increasing commit timestamps survived the race
    val ts = t.log.commitInfos.map(_.timestamp)
    assert(ts === ts.sorted && ts.distinct.size === ts.size)
  }
}
