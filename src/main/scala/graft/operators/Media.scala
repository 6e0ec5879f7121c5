package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch media decoding over binary columns — the Scala twin of a Python
  * `mapInPandas` decode stage: rows flow through `mapPartitions` so an
  * expensive per-partition resource (a codec, an FFI handle, a model) is
  * initialized ONCE per partition, not once per row, and rows are processed
  * as a stream (never materializing a partition in memory).
  *
  * Two codecs ride the seam: [[Media.ImageIoCodec]] REALLY decodes
  * PNG/BMP/GIF/JPEG payloads via the JDK's javax.imageio (no external
  * libraries needed), and `decodeStub` is a deterministic byte-histogram
  * stand-in for media formats the JDK can't parse (audio/video).
  * Everything around the codec is the production plumbing — typed schema
  * in/out, per-partition init, streaming iterator, fixed feature shape.
  *
  * 100-TB notes: decode is map-only (no shuffle sees the payload); the
  * output row is narrow (id + 16 floats + meta), so downstream aggs shuffle
  * a fraction of the input bytes. Partition sizing comes from the scan
  * (spark.sql.files.maxPartitionBytes), which bounds decoder memory.
  */
/** The pluggable codec seam: a REAL decoder (libjpeg / ffmpeg / an FFI
  * model handle) drops in as one instance of this trait — `open()` runs
  * once per partition before the first row (native contexts are expensive),
  * `decode` once per row, `close()` when the partition stream is exhausted.
  * Instances must be Serializable (they ship to executors) and must not
  * retain the payload after returning — the map-side-only guarantee
  * (payload bytes never cross a shuffle) is asserted by a listener-counted
  * spec (MediaSpec), not left to convention. */
trait MediaCodec extends Serializable {
  def open(): Unit = ()
  def decode(payload: Array[Byte]): Array[Float]
  def close(): Unit = ()
}

object Media {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String)
  final case class MediaFeatures(doc_id: Long, lang: String,
                                 features: Array[Float], n_bytes: Int)

  /** The deterministic stand-in codec (no media libraries in this
    * container) as a [[MediaCodec]]. */
  object StubCodec extends MediaCodec {
    override def decode(payload: Array[Byte]): Array[Float] = decodeStub(payload)
  }

  /** A REAL image codec on the seam — `javax.imageio` ships with the JDK
    * (PNG / BMP / GIF / JPEG readers), zero external dependencies. decode()
    * parses the actual image bytes and pools the pixels to a 4×4 luminance
    * grid (16 floats — the seam's fixed feature shape, the
    * resize-to-fixed-dims step of an image pipeline). ImageIO's disk cache
    * is disabled once per partition in open(): decoding from byte arrays
    * must never touch executor-local disk. */
  object ImageIoCodec extends MediaCodec {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(payload: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image (PNG/BMP/GIF/JPEG)")
      val grid = 4
      val sums = new Array[Float](grid * grid)
      val counts = new Array[Int](grid * grid)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        val gy = y * grid / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (0.299f * ((rgb >> 16) & 0xFF) +
                     0.587f * ((rgb >> 8) & 0xFF) +
                     0.114f * (rgb & 0xFF)) / 255f
          val cell = gy * grid + x * grid / w
          sums(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < sums.length) {
        if (counts(c) > 0) sums(c) /= counts(c)
        c += 1
      }
      sums
    }
  }

  /** A REAL audio codec on the seam: RIFF/WAVE PCM16-mono parse with zero
    * dependencies (the header layout is a public fixed format; no JDK
    * media classes needed). decode() validates the container, streams the
    * samples once, and emits the fixed 16-float feature shape:
    * [0] sample rate, [1] sample count, [2] peak |amplitude| (int16
    * units), [3] sign-flip (zero-crossing) count, [4..15] per-segment mean
    * |amplitude| over 12 equal time slices (the fixed-window audio
    * featurizer shape). Non-WAV / non-PCM16-mono payloads fail loudly. */
  object WavCodec extends MediaCodec {
    override def decode(payload: Array[Byte]): Array[Float] = {
      val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
      }
      require(tag() == "RIFF", "payload is not a RIFF container")
      b.getInt // riff size
      require(tag() == "WAVE", "RIFF payload is not WAVE")
      // standard RIFF walk: real encoders interleave LIST/INFO/fact chunks
      // between fmt and data — skip what we don't parse, in order
      var sampleRate = 0; var dataSize = -1; var fmtSeen = false
      while (dataSize < 0) {
        require(b.remaining >= 8, "WAVE payload lacks a data chunk")
        val id = tag(); val size = b.getInt
        id match {
          case "fmt " =>
            val audioFormat = b.getShort
            val channels = b.getShort
            sampleRate = b.getInt
            b.getInt; b.getShort // byte rate, block align
            val bits = b.getShort
            require(audioFormat == 1 && channels == 1 && bits == 16,
              s"only PCM16 mono supported (format=$audioFormat ch=$channels bits=$bits)")
            b.position(b.position() + (size - 16))
            fmtSeen = true
          case "data" =>
            require(fmtSeen, "WAVE data chunk precedes fmt")
            dataSize = size
          case _ =>
            b.position(b.position() + size + (size & 1)) // chunks pad to even
        }
      }
      val n = dataSize / 2
      val out = new Array[Float](16)
      out(0) = sampleRate.toFloat
      out(1) = n.toFloat
      var peak = 0; var flips = 0; var prevSign = 0
      val segSum = new Array[Long](12); val segN = new Array[Int](12)
      var i = 0
      while (i < n) {
        val s = b.getShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        val sign = Integer.signum(s)
        if (sign != 0 && prevSign != 0 && sign != prevSign) flips += 1
        if (sign != 0) prevSign = sign
        val seg = (i.toLong * 12 / n).toInt
        segSum(seg) += a; segN(seg) += 1
        i += 1
      }
      out(2) = peak.toFloat
      out(3) = flips.toFloat
      var k = 0
      while (k < 12) {
        if (segN(k) > 0) out(4 + k) = segSum(k).toFloat / segN(k)
        k += 1
      }
      out
    }
  }

  /** A REAL video codec on the seam: a length-prefixed frame container
    * ("GVID" magic + frame count, then per frame a 4-byte length + genuine
    * PNG bytes) is parsed frame by frame, every `stride`-th frame REALLY
    * decodes through javax.imageio, and the features pool temporally:
    * [0] container frame count, [1] frames actually decoded,
    * [2..15] mean luminance (0-255) of the first 14 sampled frames.
    * The video shape that matters at 100 TB: the payload is touched once,
    * frames the stride skips are never even decompressed, and only the
    * narrow pooled features leave the map side. */
  final case class VideoCodec(stride: Int = 2) extends MediaCodec {
    require(stride > 0)
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(payload: Array[Byte]): Array[Float] = {
      val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.BIG_ENDIAN)
      val magic = new Array[Byte](4); b.get(magic)
      require(new String(magic, "US-ASCII") == "GVID",
        "payload is not a GVID frame container")
      val nFrames = b.getInt
      val out = new Array[Float](16)
      out(0) = nFrames.toFloat
      var j = 0; var sampled = 0
      while (j < nFrames) {
        val len = b.getInt
        if (j % stride == 0) {
          val frame = new Array[Byte](len); b.get(frame)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
          require(img != null, s"frame $j is not a decodable image")
          var sum = 0.0; var px = 0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) +
                     0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              px += 1; x += 1
            }
            y += 1
          }
          if (sampled < 14) out(2 + sampled) = (sum / px).toFloat
          sampled += 1
        } else b.position(b.position() + len) // skipped frames never decode
        j += 1
      }
      out(1) = sampled.toFloat
      out
    }
  }

  /** A deterministic in-memory GVID container of `grays.size` uniform-gray
    * PNG frames — real video-ish bytes whose sampled-frame luminances are
    * the gray values themselves (closed-form oracle). */
  def syntheticVideo(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
    val frames = grays.map { g =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val total = 8 + frames.map(_.length + 4).sum
    val b = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put("GVID".getBytes("US-ASCII")).putInt(frames.size)
    frames.foreach(f => b.putInt(f.length).put(f))
    b.array()
  }

  /** A deterministic in-memory PCM16-mono WAV carrying a square wave:
    * sample_i = ±ampQ, flipping sign every `halfPeriod` samples — real
    * audio bytes whose decoded features are CLOSED-FORM (peak = ampQ,
    * sign flips = (n-1) / halfPeriod), so an oracle can state them
    * literally. Runs fine executor-side (pure byte assembly). */
  def syntheticWav(sampleRate: Int, nSamples: Int, ampQ: Int, halfPeriod: Int): Array[Byte] = {
    require(ampQ > 0 && ampQ <= Short.MaxValue && halfPeriod > 0)
    val dataSize = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      val v = if ((i / halfPeriod) % 2 == 0) ampQ else -ampQ
      b.putShort(v.toShort)
      i += 1
    }
    b.array()
  }

  /** A deterministic in-memory PNG (left half black, right half at
    * `rightGray`) — real image bytes for exercising [[ImageIoCodec]]
    * without any fixture files. Runs fine executor-side (BufferedImage is
    * headless-safe). */
  def syntheticPng(w: Int, h: Int, rightGray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = if (x < w / 2) 0 else rightGray
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A deterministic in-memory PNG with four uniform 2×2 QUADRANTS (each
    * `w/2 × h/2` at its own gray level) — the fixture shape for perceptual
    * hashing: every 4×4-grid cell of a quadrant decodes to the same
    * luminance, so the aHash bits are a closed-form function of the four
    * gray values. */
  def quadPng(w: Int, h: Int, g0: Int, g1: Int, g2: Int, g3: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (if (y < h / 2) if (x < w / 2) g0 else g1
                 else if (x < w / 2) g2 else g3)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Average-hash (aHash), the classic perceptual image fingerprint: bit i
    * of the 16-bit hash is set iff grid cell i's luminance STRICTLY
    * exceeds the grid mean. Uniform-content changes (brightness scaling
    * aside) move few bits; near-duplicate frames land within a small
    * hamming radius — the image-side analogue of SimHash over text. */
  def averageHash(features: Array[Float]): Int = {
    var s = 0f
    var i = 0
    while (i < features.length) { s += features(i); i += 1 }
    val mean = s / features.length
    var h = 0
    i = 0
    while (i < features.length) {
      if (features(i) > mean) h |= 1 << i
      i += 1
    }
    h
  }

  /** QUADRANT-aligned 4-bit bands of a 16-bit aHash (grid cell gy*4+gx;
    * quadrant 0 = top-left cells {0,1,4,5}, 1 = top-right {2,3,6,7},
    * 2 = bottom-left {8,9,12,13}, 3 = bottom-right {10,11,14,15}).
    * Spatially-local image edits flip bits of ONE quadrant, leaving 3 of
    * 4 bands identical — the pigeonhole guarantee the banded candidate
    * join keys on (the SimHash band discipline: candidates via band
    * equality, exact hamming rescore, never all-pairs). */
  def ahashBands(hash: Int): Array[Int] = {
    val quads = Array(Array(0, 1, 4, 5), Array(2, 3, 6, 7),
                      Array(8, 9, 12, 13), Array(10, 11, 14, 15))
    quads.map(cells => cells.zipWithIndex.foldLeft(0) { case (acc, (cell, k)) =>
      acc | (((hash >> cell) & 1) << k)
    })
  }

  /** Documents as a typed media Dataset (payload = UTF-8 bytes; stands in
    * for image/audio blobs). */
  def mediaDataset(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"), $"lang")
      .as[MediaRow]
  }

  /** The stub "codec": 16-bin byte histogram, L1-normalized. Deterministic,
    * fixed output shape — exactly what a resize-to-fixed-dims image decode
    * or a fixed-window audio featurizer produces. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xF0) >> 4) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var b = 0
      while (b < 16) { bins(b) /= payload.length; b += 1 }
    }
    bins
  }

  /** Decode a partition stream with one codec open/close per partition
    * (default: the stub). The iterator stays lazy — a partition is never
    * materialized. `close()` is bound to TASK COMPLETION, not iterator
    * drain: a downstream limit/take that stops consuming early, or an
    * exception inside decode, would otherwise leak the native context a
    * real FFI codec holds (the drain-time close stays as a fast path so
    * well-behaved partitions release the context immediately). */
  def decode(rows: Dataset[MediaRow],
             codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      codec.open()
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; codec.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      new Iterator[MediaFeatures] {
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) closeOnce()
          h
        }
        override def next(): MediaFeatures = {
          val r = it.next()
          MediaFeatures(r.doc_id, r.lang, codec.decode(r.payload), r.payload.length)
        }
      }
    }
  }

  /** "Resize": pool a feature vector down to `outDims` by averaging
    * adjacent bins — the fixed-shape-to-fixed-shape resample step of an
    * image pipeline (pure column math, no shuffle). */
  def resizeFeatures(feats: Dataset[MediaFeatures], outDims: Int): DataFrame = {
    import feats.sparkSession.implicits._
    val stride = 16 / outDims
    require(outDims > 0 && 16 % outDims == 0, "outDims must divide 16")
    feats.toDF().withColumn("resized", expr(
      s"""transform(sequence(0, ${outDims - 1}), o ->
         |  cast(aggregate(slice(features, o * $stride + 1, $stride), 0f,
         |                 (acc, x) -> acc + x) / $stride as float))""".stripMargin))
      .select($"doc_id", $"lang", $"resized")
  }

  /** Frame sampling: cut a payload into fixed-size "frames" and keep every
    * `stride`-th — the video-frame-sample shape (map-only, exploding rows
    * without shuffling payloads). */
  def sampleFrames(rows: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.doc_id, idx, frame.length, decodeStub(frame)) }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "frame_features")
  }
}
