package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface): media payloads are
  * opaque `binary` columns with typed metadata alongside. All THREE
  * modalities now carry REAL decoders on the codec seam with zero external
  * dependencies — images via javax.imageio (q158), audio via a RIFF/WAVE
  * PCM16 parse (q163), video via a frame container whose sampled frames
  * really decode (q164) — while q60/q61 keep the byte-histogram stub as
  * the baseline shape. Everything Spark-side is real either way: schema
  * (binary + struct metadata), per-row feature extraction, fixed-shape
  * feature vectors, the mapPartitions batch-decode path a JNI/FFI codec
  * slots into (graft.operators.Media).
  *
  * The synthetic payload is the document text encoded as UTF-8 — giving a
  * real variable-length binary column whose derived stats (length, sha256)
  * are oracle-checkable in DuckDB.
  *
  * 100-TB notes: media pipelines are map-only until the final aggregate —
  * no shuffle touches the payload bytes; only the narrow derived features
  * move. That is the property to preserve at scale: never shuffle blobs.
  */
object Multimodal {

  /** documents with a binary `payload` column + typed metadata struct. */
  private[queries] def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        encode($"text", "UTF-8").as("payload"),
        struct($"lang".as("lang"), $"source".as("source"),
               $"n_chars".as("n_chars"), lit("text/plain").as("mime")).as("meta"))
  }

  val all: Seq[(String, Q)] = Seq(

    // ---- Binary payload stats (oracle-checked byte-level parity) -----------------
    "q60_binary_meta" -> Q(
      (s, dir) => {
        import s.implicits._
        mediaTable(s, dir)
          .select($"doc_id",
            octet_length($"payload").as("n_bytes"),
            sha2($"payload", 256).as("sha"),
            $"meta.lang".as("lang"),
            $"meta.mime".as("mime"))
          .orderBy($"doc_id")
      },
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha,
        |  lang, 'text/plain' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- Stubbed decode → fixed-shape features → aggregate ------------------------
    // "Decode" = 16-bin byte histogram over the payload (deterministic stub
    // for image decode); features aggregate per lang without moving payloads.
    "q61_media_features" -> Q(
      (s, dir) => {
        import s.implicits._
        // one map-side pass: payload → chars → high-nibble bin, then a tiny
        // (lang x 16) hash agg — no per-bin rescans of the blob
        mediaTable(s, dir)
          .select($"meta.lang".as("lang"),
                  explode(split(decode($"payload", "UTF-8"), "")).as("ch"))
          .filter(length($"ch") > 0)
          .select($"lang", shiftright(ascii($"ch"), 4).as("bin"))
          .groupBy($"lang", $"bin")
          .agg(count(lit(1)).as("n_bytes_in_bin"))
          .filter($"bin".isin(6, 7)) // ascii letters live in nibbles 6/7
          .orderBy($"lang", $"bin")
      },
      """WITH bytes AS (
        |  SELECT lang, unnest([ord(b) FOR b IN split(text, '')]) AS byte
        |  FROM documents)
        |SELECT lang, byte // 16 AS bin, COUNT(*) AS n_bytes_in_bin
        |FROM bytes WHERE byte // 16 IN (6, 7)
        |GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin),

    // ---- REAL image decode (javax.imageio on the codec seam) ---------------------
    // Not a stub: each row's payload is a genuine PNG (generated
    // executor-side, left half black / right half gray g=30·doc_id), and
    // graft.operators.Media.ImageIoCodec parses the actual pixels into a
    // 4×4 luminance grid inside the mapPartitions seam — one codec open
    // per partition, payloads never crossing a shuffle (MediaSpec measures
    // that). The output pins the decoded geometry as booleans (exact-black
    // left half, uniform right half at the encoded gray), which the oracle
    // states literally.
    "q158_image_decode" -> Q(
      (s, _) => {
        import s.implicits._
        import graft.operators.Media
        val rows = s.range(1, 9).map(i => Media.MediaRow(
          i, Media.syntheticPng(64, 64, (i * 30 % 256).toInt),
          if (i % 2 == 0) "en" else "de"))
        Media.decode(rows, Media.ImageIoCodec).map { f =>
          val gray = (f.doc_id * 30 % 256).toInt
          val left = f.features.zipWithIndex.filter(_._2 % 4 < 2).map(_._1)
          val right = f.features.zipWithIndex.filter(_._2 % 4 >= 2).map(_._1)
          (f.doc_id, gray,
            left.forall(_ == 0f),
            right.forall(v => math.abs(v - gray / 255f) < 1e-3))
        }.toDF("doc_id", "gray", "left_black", "right_uniform")
          .orderBy($"doc_id")
      },
      """SELECT CAST(i AS BIGINT) AS doc_id, i * 30 AS gray,
        |       TRUE AS left_black, TRUE AS right_uniform
        |FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8)) AS t(i)
        |ORDER BY doc_id""".stripMargin),

    // ---- REAL audio decode (RIFF/WAVE PCM16 parse on the codec seam) -------------
    // Each row's payload is a genuine WAV file (44-byte RIFF header +
    // PCM16 samples, assembled executor-side) carrying a square wave with
    // id-derived rate / length / amplitude / period; Media.WavCodec
    // parses the actual container and samples inside the mapPartitions
    // seam. A square wave makes every decoded feature CLOSED-FORM —
    // peak = amplitude, sign flips = (n-1) / halfPeriod — so the oracle
    // computes the same integers from the same id arithmetic.
    "q163_audio_decode" -> Q(
      (s, _) => {
        import s.implicits._
        import graft.operators.Media
        val rows = s.range(1, 17).map { i =>
          val rate = 8000 + (i % 4).toInt * 4000
          val n = 1600 + (i % 3).toInt * 800
          val amp = 1000 + (i % 7).toInt * 3000
          val hp = 2 + (i % 5).toInt
          Media.MediaRow(i, Media.syntheticWav(rate, n, amp, hp),
            if (i % 2 == 0) "en" else "de")
        }
        Media.decode(rows, Media.WavCodec).map { f =>
          val (rate, n) = (f.features(0).toInt, f.features(1).toInt)
          (f.doc_id, rate, n,
            f.features(2).toInt,            // peak amplitude
            f.features(3).toLong,           // sign flips
            n * 1000 / rate)                // duration ms, integer floor
        }.toDF("doc_id", "rate", "n_samples", "peak", "flips", "duration_ms")
          .orderBy($"doc_id")
      },
      """SELECT CAST(i AS BIGINT) AS doc_id,
        |  8000 + (i % 4) * 4000 AS rate,
        |  1600 + (i % 3) * 800 AS n_samples,
        |  1000 + (i % 7) * 3000 AS peak,
        |  CAST((1600 + (i % 3) * 800 - 1) // (2 + i % 5) AS BIGINT) AS flips,
        |  CAST((1600 + (i % 3) * 800) * 1000 // (8000 + (i % 4) * 4000) AS INTEGER) AS duration_ms
        |FROM (SELECT unnest(range(1, 17)) AS i)
        |ORDER BY doc_id""".stripMargin),

    // ---- REAL video decode (frame container + stride sampling) -------------------
    // Each payload is a GVID container of 6 genuine uniform-gray PNG
    // frames (gray_j = (20·id + 30·j) mod 256); Media.VideoCodec(stride=2)
    // parses the container, decodes ONLY frames 0/2/4 through
    // javax.imageio (skipped frames are never decompressed), and pools
    // per-frame mean luminance. Uniform frames make the features
    // closed-form: sampled luminance j == its gray value — stated
    // literally by the oracle.
    "q164_video_decode" -> Q(
      (s, _) => {
        import s.implicits._
        import graft.operators.Media
        val rows = s.range(1, 9).map { i =>
          val grays = (0 until 6).map(j => ((20 * i + 30 * j) % 256).toInt)
          Media.MediaRow(i, Media.syntheticVideo(32, 24, grays),
            if (i % 2 == 0) "en" else "de")
        }
        Media.decode(rows, Media.VideoCodec(stride = 2)).map { f =>
          (f.doc_id, f.features(0).toInt, f.features(1).toInt,
            math.round(f.features(2)), math.round(f.features(3)),
            math.round(f.features(4)))
        }.toDF("doc_id", "n_frames", "n_sampled", "lum0", "lum2", "lum4")
          .orderBy($"doc_id")
      },
      """SELECT CAST(i AS BIGINT) AS doc_id, 6 AS n_frames, 3 AS n_sampled,
        |  CAST((20 * i) % 256 AS INTEGER) AS lum0,
        |  CAST((20 * i + 60) % 256 AS INTEGER) AS lum2,
        |  CAST((20 * i + 120) % 256 AS INTEGER) AS lum4
        |FROM (SELECT unnest(range(1, 9)) AS i)
        |ORDER BY doc_id""".stripMargin),

    // ---- Image NEAR-DUP via perceptual hash (round 17) ---------------------------
    // The multimodal dedup leg: REAL PNG decode (ImageIoCodec) → 16-bit
    // average-hash (bit = grid cell above the grid mean) → quadrant-
    // aligned 4-bit bands → banded candidate self-join → exact hamming
    // rescore at radius 4. Never all-pairs; payload bytes never shuffle
    // (only (doc_id, ahash) leaves the map side). The fixture's quadrant
    // PNGs make every hash CLOSED-FORM (quadrant bit = gray above the
    // quadrant mean), so the expected pair set is hand-derived: image 2
    // is a brightness-jittered copy of 1 (hamming 0), images 3/5 differ
    // from 1 in ONE quadrant (hamming 4, found via 3 shared bands), 4-5
    // likewise; everything else is ≥ 8 bits apart and rescored away.
    "q205_image_neardup" -> Q(
      (s, _) => {
        import s.implicits._
        import graft.operators.Media
        val quads: Map[Long, (Int, Int, Int, Int)] = Map(
          1L -> ((200, 0, 0, 0)),   // q0 bright        → bits of q0
          2L -> ((180, 20, 0, 0)),  // jittered copy    → same bits
          3L -> ((200, 200, 0, 0)), // q1 also bright   → +q1 (4 bits)
          4L -> ((0, 0, 200, 0)),   // q2 bright        → bits of q2
          5L -> ((200, 0, 200, 0))) // q0+q2            → 1+{q2} / 4+{q0}
        val rows = s.range(1, 6).map { i =>
          val q = quads(i)
          Media.MediaRow(i, Media.quadPng(64, 64, q._1, q._2, q._3, q._4), "img")
        }
        val hashes = Media.decode(rows, Media.ImageIoCodec)
          .map(f => (f.doc_id, Media.averageHash(f.features)))
          .toDF("doc_id", "ahash")
        val bands = hashes.select($"doc_id", $"ahash",
            posexplode(udfFreeBands($"ahash")).as(Seq("band", "bits")))
        val pairs = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
            col("x.ahash").as("ha"), col("y.ahash").as("hb"))
          .distinct()
        pairs
          .withColumn("hamming", expr("bit_count(ha ^ hb)"))
          .filter($"hamming" <= 4)
          .select($"a", $"b", $"hamming".cast("long").as("hamming"))
          .orderBy($"a", $"b")
      },
      """SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |       CAST(h AS BIGINT) AS hamming
        |FROM (VALUES (1, 2, 0), (1, 3, 4), (1, 5, 4),
        |             (2, 3, 4), (2, 5, 4), (4, 5, 4)) AS t(a, b, h)
        |ORDER BY a, b""".stripMargin),
  )

  /** Quadrant-band extraction as pure codegen'd column math (no UDF):
    * band k of the 16-bit aHash gathers the 4 bits of quadrant k's grid
    * cells — mirrors graft.operators.Media.ahashBands bit for bit. */
  private def udfFreeBands(ahash: org.apache.spark.sql.Column) = {
    val cells = Seq(Seq(0, 1, 4, 5), Seq(2, 3, 6, 7),
                    Seq(8, 9, 12, 13), Seq(10, 11, 14, 15))
    array(cells.map(q =>
      q.zipWithIndex.map { case (cell, k) =>
        shiftleft(shiftright(ahash, cell).bitwiseAND(lit(1)), k)
      }.reduce(_ + _)): _*)
  }
}
