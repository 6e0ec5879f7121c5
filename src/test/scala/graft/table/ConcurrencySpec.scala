package graft.table

import graft.SparkTestBase

/** Cross-PROCESS commit atomicity: a second JVM (graft.RaceWriter via
  * tools/run.sh) races the in-process writer with interleaved appends.
  * CREATE_NEW on the commit file is the mutual-exclusion primitive
  * (POSIX O_EXCL — what the single-JVM 4-thread race in GraftLogSpec
  * already pins); this proves it holds between OS processes: exactly one
  * winner per version, and the optimistic retry means NO append is lost. */
class ConcurrencySpec extends SparkTestBase {

  test("two JVMs racing appends: one winner per version, no lost commits") {
    import spark.implicits._
    val dir = tmpDir("gt-race-")
    val perWriter = 6
    GraftTable.create(spark, dir,
      Seq(("seed", 0)).toDF("writer", "seq"))

    val proc = new ProcessBuilder(
      "/root/repo/tools/run.sh", "graft.RaceWriter", dir, "external", perWriter.toString)
      .redirectErrorStream(true).start()

    val t = GraftTable.forPath(spark, dir)
    (1 to perWriter).foreach { i =>
      t.append(Seq(("internal", i)).toDF("writer", "seq"))
    }
    val external = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"external writer failed:\n$external")

    // no lost commits: every (writer, seq) pair of both writers is present
    val rows = t.toDF.as[(String, Int)].collect().toSet
    val expected = Set("seed" -> 0) ++
      (1 to perWriter).flatMap(i => Seq("internal" -> i, "external" -> i))
    assert(rows == expected)

    // one winner per version: versions are contiguous with a single commit
    // file each (CREATE_NEW could not have allowed a duplicate), and the
    // commit count equals the append count
    val versions = t.log.listVersions
    assert(versions == (0L to (2L * perWriter)))
    assert(t.history().count() == 2L * perWriter + 1)
    // strictly-increasing commit timestamps survived the race
    val ts = t.log.commitInfos.map(_.timestamp)
    assert(ts == ts.sorted && ts.distinct.size == ts.size)
  }
}
