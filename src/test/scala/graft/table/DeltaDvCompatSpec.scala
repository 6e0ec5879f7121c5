package graft.table

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Read-interop with REAL Delta deletion vectors.
  *
  * Fixtures are HAND-AUTHORED byte-for-byte from the public formats (no
  * delta jar in this environment): the test-side SERIALIZER below is an
  * independent implementation of the RoaringBitmapArray portable format
  * (RoaringFormatSpec + Delta protocol "Deletion Vector Format") and the
  * DV file layout (version byte, `[size BE][data][crc32 BE]` blobs), so a
  * reader bug and a fixture bug would have to cancel exactly to pass.
  * The Z85 golden vector pins the alphabet against the ZeroMQ spec. */
class DeltaDvCompatSpec extends SparkTestBase {

  // ---- independent test-side serializers ------------------------------------

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"

  /** Z85-encode, padding the tail group with zero bytes (delta's
    * Base85Codec discipline; decoders truncate via sizeInBytes). */
  private def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, ((bytes.length / 4) + 1) * 4)
    val sb = new StringBuilder
    var i = 0
    while (i < padded.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (padded(i + j) & 0xFFL))
      val digits = new Array[Char](5)
      (4 to 0 by -1).foreach { j => digits(j) = Z85((v % 85).toInt); v /= 85 }
      sb.appendAll(digits)
      i += 4
    }
    sb.toString
  }

  /** Serialize ONE 32-bit roaring bitmap in the standard portable format.
    * Container choice per the spec: run when asked, else array <= 4096,
    * else 8 KiB bitmap. */
  private def serializeRoaring(valuesByKey: Seq[(Int, Seq[Int])],
      runKeys: Set[Int] = Set.empty): Array[Byte] = {
    val n = valuesByKey.size
    val hasRun = runKeys.nonEmpty
    val out = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    if (hasRun) {
      out.putInt(12347 | ((n - 1) << 16))
      val bits = new Array[Byte]((n + 7) / 8)
      valuesByKey.zipWithIndex.foreach { case ((k, _), i) =>
        if (runKeys.contains(k)) bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
      }
      out.put(bits)
    } else {
      out.putInt(12346)
      out.putInt(n)
    }
    valuesByKey.foreach { case (k, vs) =>
      out.putShort(k.toShort); out.putShort((vs.size - 1).toShort)
    }
    // offsets: always for 12346; for 12347 only when >= 4 containers.
    // Values are byte positions from THIS BITMAP's start (position 0 of
    // this serialization) — compute by pre-measuring each container.
    def containerBytes(k: Int, vs: Seq[Int]): Int =
      if (runKeys.contains(k)) {
        2 + 4 * runsOf(vs).size
      } else if (vs.size <= 4096) 2 * vs.size
      else 8192
    if (!hasRun || n >= 4) {
      var pos = out.position() + 4 * n // out starts at this bitmap's cookie
      valuesByKey.foreach { case (k, vs) =>
        out.putInt(pos); pos += containerBytes(k, vs)
      }
    }
    valuesByKey.foreach { case (k, vs) =>
      val sorted = vs.sorted
      if (runKeys.contains(k)) {
        val rs = runsOf(sorted)
        out.putShort(rs.size.toShort)
        rs.foreach { case (start, len) =>
          out.putShort(start.toShort); out.putShort((len - 1).toShort)
        }
      } else if (sorted.size <= 4096) {
        sorted.foreach(v => out.putShort(v.toShort))
      } else {
        val words = new Array[Long](1024)
        sorted.foreach(v => words(v / 64) |= (1L << (v % 64)))
        words.foreach(out.putLong)
      }
    }
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  private def runsOf(sorted: Seq[Int]): Seq[(Int, Int)] = {
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var start = -2; var prev = -2
    sorted.foreach { v =>
      if (v == prev + 1) prev = v
      else { if (start >= 0) runs += ((start, prev - start + 1)); start = v; prev = v }
    }
    if (start >= 0) runs += ((start, prev - start + 1))
    runs.toSeq
  }

  /** Delta RoaringBitmapArray portable bytes for the given 64-bit
    * indexes. Per the 64-bit portable spec (what the RoaringBitmap jar's
    * Roaring64NavigableMap.serializePortable emits): count of (key,
    * bitmap) PAIRS, then each pair as `[key: int32 LE][32-bit roaring]` —
    * keys are explicit and may be SPARSE, never implied by position. */
  private def dvData(rows: Seq[Long]): Array[Byte] = {
    val byBitmap = rows.groupBy(r => (r >>> 32).toInt).toSeq.sortBy(_._1)
    val out = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(1681511377) // magic
    out.putLong(byBitmap.size.toLong)
    byBitmap.foreach { case (idx, rs) =>
      out.putInt(idx)
      val vals = rs.map(r => (r & 0xFFFFFFFFL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
        .map { case (k, vs) => k -> vs.map(_ & 0xFFFF).sorted }
      out.put(serializeRoaring(byKey))
    }
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  /** Write a DV FILE (version byte + one sized/checksummed blob) and
    * return (offset, sizeInBytes). */
  private def dvFile(target: java.nio.file.Path, data: Array[Byte]): (Long, Long) = {
    val crc = new java.util.zip.CRC32(); crc.update(data)
    val bb = ByteBuffer.allocate(1 + 4 + data.length + 4) // big-endian default
    bb.put(1.toByte); bb.putInt(data.length); bb.put(data); bb.putInt(crc.getValue.toInt)
    Files.createDirectories(target.getParent)
    Files.write(target, bb.array())
    (1L, data.length.toLong)
  }

  // ---- delta log fixture plumbing (same shapes as DeltaCompatSpec) ----------

  private def dataFile(tablePath: String, relPath: String,
      df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val stage = tmpDir("dv-stage-")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val target = Paths.get(tablePath, relPath)
    Files.createDirectories(target.getParent)
    Files.move(Paths.get(part), target, StandardCopyOption.REPLACE_EXISTING)
    (Files.size(target), Files.getLastModifiedTime(target).toMillis)
  }

  private def commit(tablePath: String, v: Long, lines: Seq[String]): Unit = {
    val logDir = Paths.get(tablePath, "_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private val idSchema =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""

  private def metaLine: String =
    s"""{"metaData":{"id":"aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee","format":{"provider":"parquet","options":{}},"schemaString":"$idSchema","partitionColumns":[],"configuration":{},"createdTime":1619112344000}}"""

  private def stats(n: Long): String =
    s"""{\\"numRecords\\":$n,\\"minValues\\":{},\\"maxValues\\":{},\\"nullCount\\":{}}"""

  private def addLine(path: String, size: Long, mtime: Long, rows: Long,
      dv: Option[String]): String = {
    val dvPart = dv.map(d => s""","deletionVector":$d""").getOrElse("")
    s"""{"add":{"path":"$path","partitionValues":{},"size":$size,"modificationTime":$mtime,"dataChange":true,"stats":"${stats(rows)}"$dvPart}}"""
  }

  private def df(range: Range) = {
    import spark.implicits._
    range.map(_.toLong).toDF("id")
  }

  // ---------------------------------------------------------------------------

  test("Z85 golden vector (ZeroMQ spec): HelloWorld") {
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(z85Encode(bytes) === "HelloWorld")
    assert(DeltaDeletionVectors.z85Decode("HelloWorld", 8).sameElements(bytes))
  }

  test("roaring decode: array, bitmap, run containers, multi-bitmap 64-bit indexes") {
    // array container
    assert(DeltaDeletionVectors.decode(dvData(Seq(1L, 3L, 7L))).toSeq === Seq(1L, 3L, 7L))
    // bitmap container (> 4096 values in one 16-bit key space)
    val dense = (0 until 5000).map(_ * 2L)
    assert(DeltaDeletionVectors.decode(dvData(dense)).toSeq === dense)
    // values crossing container keys (high 16 bits differ)
    val multiKey = Seq(5L, 65536L + 2L, 3L * 65536L + 9L)
    assert(DeltaDeletionVectors.decode(dvData(multiKey)).toSeq === multiKey)
    // run container
    val runVals = (10 to 30).map(_.toLong) ++ Seq(100L)
    val byKey = Seq(0 -> runVals.map(_.toInt))
    val runBitmap = {
      val out = ByteBuffer.allocate(1 << 16).order(ByteOrder.LITTLE_ENDIAN)
      out.putInt(1681511377); out.putLong(1L)
      out.putInt(0) // (key, bitmap) pair: explicit key
      out.put(serializeRoaring(byKey, runKeys = Set(0)))
      java.util.Arrays.copyOf(out.array(), out.position())
    }
    assert(DeltaDeletionVectors.decode(runBitmap).toSeq === runVals)
    // 64-bit: second bitmap (row index >= 2^32) decodes with the high bits
    val wide = Seq(4L, (1L << 32) | 7L)
    assert(DeltaDeletionVectors.decode(dvData(wide)).toSeq === wide)
    // keys are explicit and may be SPARSE — decode must use the key,
    // never the pair's position
    val sparse = Seq((5L << 32) | 9L, (5L << 32) | 11L)
    assert(DeltaDeletionVectors.decode(dvData(sparse)).toSeq === sparse)
  }

  test("golden 64-bit portable bytes: {1,3,7} under key 0 (Roaring64NavigableMap.serializePortable layout)") {
    // hand-written from the RoaringFormatSpec: magic | count=1 (int64) |
    // key=0 (int32) | cookie 12346 | nContainers=1 | header (key 0,
    // card-1=2) | offset 16 (from THIS bitmap's start) | values 1,3,7
    val bb = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(1L)
    bb.putInt(0)
    bb.put(Array[Byte](0x3a, 0x30, 0, 0, 1, 0, 0, 0, 0, 0, 2, 0, 16, 0, 0, 0,
      1, 0, 3, 0, 7, 0))
    val data = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(DeltaDeletionVectors.decode(data).toSeq === Seq(1L, 3L, 7L))
    // the main-side encoder reproduces these exact bytes (spec-conformant
    // output, not merely self-consistent with its own decoder)
    val (enc, sz) = DeltaDeletionVectors.encodeInline(Seq(1L, 3L, 7L))
    assert(DeltaDeletionVectors.z85Decode(enc, sz).sameElements(data),
      "encodeInline must emit the golden byte layout")
  }

  test("u-type DV (Z85 uuid file): snapshot skips tombstoned rows end-to-end") {
    val dir = tmpDir("delta-dv-u-")
    val (sz, mt) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 10))
    val uuid = java.util.UUID.fromString("12345678-9abc-def0-1234-56789abcdef0")
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val enc = z85Encode(uuidBytes)
    assert(enc.length === 20)
    val data = dvData(Seq(1L, 3L))
    val (off, size) = dvFile(Paths.get(dir, s"deletion_vector_$uuid.bin"), data)
    commit(dir, 0, Seq(
      """{"commitInfo":{"timestamp":1619112345000,"operation":"DELETE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      addLine("part-00000-aaa-c000.snappy.parquet", sz, mt, 10L,
        Some(s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":$off,"sizeInBytes":$size,"cardinality":2}"""))))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.count() === 8L)
    assert(t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 2L, 4L, 5L, 6L, 7L, 8L, 9L))
    // metadata-only count: numRecords - cardinality, exact
    assert(t.metadataCount() === 8L)
    // format("graft") rides the same fold
    assert(spark.read.format("graft").load(dir).count() === 8L)
    // writes still refuse — DV decoding must not soften the read-only gate
    intercept[GraftProtocolException](t.delete(col("id") === 0L))
  }

  test("u-type DV with a random prefix resolves under the prefix dir") {
    val dir = tmpDir("delta-dv-prefix-")
    val (sz, mt) = dataFile(dir, "part-00000-bbb-c000.snappy.parquet", df(0 until 6))
    val uuid = java.util.UUID.fromString("00112233-4455-6677-8899-aabbccddeeff")
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val enc = "Xy" + z85Encode(uuidBytes) // 2-char random prefix, delta-style
    val data = dvData(Seq(0L, 5L))
    val (off, size) = dvFile(Paths.get(dir, "Xy", s"deletion_vector_$uuid.bin"), data)
    commit(dir, 0, Seq(
      """{"commitInfo":{"timestamp":1619112345000,"operation":"DELETE"}}""",
      metaLine,
      addLine("part-00000-bbb-c000.snappy.parquet", sz, mt, 6L,
        Some(s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":$off,"sizeInBytes":$size,"cardinality":2}"""))))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
  }

  test("p-type DV: absolute file: URI and plain path both resolve; remote schemes refuse") {
    // The Delta protocol's 'p' storageType carries an ABSOLUTE path, which
    // real logs spell as a URI (file:///…, s3://…). Paths.get("file:///x")
    // would treat the whole string as a relative path, so the reader must
    // parse it as a URI.
    val store = Paths.get(tmpDir("delta-dv-p-store-"), "abs_dv.bin")
    val data = dvData(Seq(1L, 4L))
    val (off, size) = dvFile(store, data)
    def table(prefix: String, pathSpelling: String): GraftTable = {
      val dir = tmpDir(prefix)
      val (sz, mt) = dataFile(dir, "part-00000-ddd-c000.snappy.parquet", df(0 until 6))
      commit(dir, 0, Seq(
        """{"commitInfo":{"timestamp":1619112345000,"operation":"DELETE"}}""",
        metaLine,
        addLine("part-00000-ddd-c000.snappy.parquet", sz, mt, 6L,
          Some(s"""{"storageType":"p","pathOrInlineDv":"$pathSpelling","offset":$off,"sizeInBytes":$size,"cardinality":2}"""))))
      GraftTable.forPath(spark, dir)
    }
    // file: URI spelling
    assert(table("delta-dv-p-uri-", store.toUri.toString)
      .toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 2L, 3L, 5L))
    // scheme-less absolute path spelling
    assert(table("delta-dv-p-plain-", store.toString)
      .toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 2L, 3L, 5L))
    // remote scheme: loud refusal, never a silent relative-path fallback
    val e = intercept[Exception](
      table("delta-dv-p-s3-", "s3://bucket/dv.bin").toDF.count())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("not reachable"), s"got: ${chain(e)}")
  }

  test("i-type (inline) DV decodes from the descriptor itself") {
    val dir = tmpDir("delta-dv-i-")
    val (sz, mt) = dataFile(dir, "part-00000-ccc-c000.snappy.parquet", df(0 until 5))
    val data = dvData(Seq(2L))
    commit(dir, 0, Seq(
      """{"commitInfo":{"timestamp":1619112345000,"operation":"DELETE"}}""",
      metaLine,
      addLine("part-00000-ccc-c000.snappy.parquet", sz, mt, 5L,
        Some(s"""{"storageType":"i","pathOrInlineDv":"${z85Encode(data)}","sizeInBytes":${data.length},"cardinality":1}"""))))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 3L, 4L))
  }

  test("corrupt DV fails LOUDLY: checksum mismatch, size mismatch, bad magic") {
    val dir = tmpDir("delta-dv-bad-")
    val (sz, mt) = dataFile(dir, "part-00000-ddd-c000.snappy.parquet", df(0 until 4))
    val uuid = java.util.UUID.randomUUID()
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val enc = z85Encode(uuidBytes)
    val data = dvData(Seq(1L))
    val target = Paths.get(dir, s"deletion_vector_$uuid.bin")
    val (off, size) = dvFile(target, data)
    // flip one data byte AFTER writing: crc now mismatches
    val bytes = Files.readAllBytes(target)
    bytes(6) = (bytes(6) ^ 0x01).toByte
    Files.write(target, bytes)
    commit(dir, 0, Seq(
      """{"commitInfo":{"timestamp":1619112345000,"operation":"DELETE"}}""",
      metaLine,
      addLine("part-00000-ddd-c000.snappy.parquet", sz, mt, 4L,
        Some(s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":$off,"sizeInBytes":$size,"cardinality":1}"""))))
    val t = GraftTable.forPath(spark, dir)
    val e = intercept[Exception](t.toDF.count())
    assert(e.getMessage != null || e.getCause != null) // loud, never a silent wrong count
    // size mismatch refuses too
    val e2 = intercept[Exception](
      DeltaDeletionVectors.blob(dir,
        DeltaDeletionVectors.Descriptor("u", enc, off, size + 5, 1L)))
    assert(e2.getMessage.contains("size"))
    // bad magic refuses
    val e3 = intercept[Exception](
      DeltaDeletionVectors.decode(Array.fill[Byte](16)(0x2A)))
    assert(e3.getMessage.contains("magic"))
  }

  test("mixed snapshot: DV-carrying file anti-joins, DV-free file scans raw") {
    val dir = tmpDir("delta-dv-mixed-")
    val (sz1, mt1) = dataFile(dir, "part-00000-eee-c000.snappy.parquet", df(0 until 5))
    val (sz2, mt2) = dataFile(dir, "part-00001-fff-c000.snappy.parquet", df(5 until 10))
    val data = dvData(Seq(0L, 4L)) // tombstones rows 0 and 4 OF FILE 1
    commit(dir, 0, Seq(
      """{"commitInfo":{"timestamp":1619112345000,"operation":"WRITE"}}""",
      metaLine,
      addLine("part-00000-eee-c000.snappy.parquet", sz1, mt1, 5L,
        Some(s"""{"storageType":"i","pathOrInlineDv":"${z85Encode(data)}","sizeInBytes":${data.length},"cardinality":2}""")),
      addLine("part-00001-fff-c000.snappy.parquet", sz2, mt2, 5L, None)))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L))
    // predicate pushdown still works across the DV split
    assert(t.scan(col("id") >= 5L).count() === 5L)
    assert(t.scan(col("id") < 5L).count() === 3L)
  }
}
