package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload as it would arrive from a lakehouse table: opaque bytes +
  * typed metadata. */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Output of the (stubbed) decode stage. */
case class MediaMeta(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    width: Int,
    height: Int,
    n_frames: Int)

/** Metadata from the REAL audio decode path (JDK javax.sound.sampled). */
case class AudioMeta(
    doc_id: Long,
    media_type: String,
    sample_rate: Double,
    channels: Int,
    bits_per_sample: Int,
    n_samples: Long,
    duration_ms: Double)

/** Sample-level integer stats from the REAL audio decode path. */
case class AudioStats(
    doc_id: Long,
    n_samples: Long,
    mean_abs: Long,
    peak_abs: Long,
    n_silent: Long,
    silence_ratio_e6: Long)

/** Pixel-level features from the REAL image decode path. */
case class ImageFeatures(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    mean_luma: Double)

/** Output of the (stubbed) resize stage: original + fitted dimensions. */
case class ResizedMeta(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    out_w: Int,
    out_h: Int)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded executor-side in partition-sized batches.
  *
  * The Spark-side plumbing — schema, typed Dataset encoders, partition-wise
  * batch iteration, downstream explode of per-frame rows — is real and
  * tested, and the IMAGE decode path is real too: [[decodeImage]] /
  * [[extractImageMeta]] / [[imageFeatures]] run the JDK-bundled
  * javax.imageio codecs (PNG/BMP/JPEG/GIF — no external libraries),
  * unit-tested down to exact per-pixel means on images encoded in-process.
  * The SYNTHETIC-corpus queries (q31/q32/q51) use the deterministic
  * `decodeStub` instead because the testdata's payloads are utf-8 text, not
  * encoded media. VIDEO is covered at the CONTAINER level — [[extractMp4Meta]]
  * walks real ISO-BMFF boxes (brand, timescale/duration, track handlers,
  * sample-entry codec ids) with pure-JDK byte parsing; FRAME decode
  * (avc1/hevc bitstreams) is a permanent carve-out, since no JDK video
  * codec exists — as is compressed-audio decode (mp3/aac).
  *
  * Scale notes: decode is the textbook mapPartitions case — per-partition
  * setup cost (codec init) amortizes across the batch, payload bytes never
  * shuffle (only the extracted metadata does), and
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per task.
  */
object Multimodal {

  /** STUB decoder — deterministic fake: dimensions derived from payload
    * length and first bytes. A real build replaces this body with an actual
    * codec (e.g. javax.imageio / ffmpeg bindings); signature stays. */
  private[operators] def decodeStub(rec: MediaRecord): MediaMeta = {
    val len = rec.payload.length.toLong
    val lead = if (rec.payload.nonEmpty) rec.payload(0) & 0xff else 0
    MediaMeta(
      doc_id = rec.doc_id,
      media_type = rec.media_type,
      byte_len = len,
      width = 64 + (len % 512).toInt,
      height = 64 + ((len * 31 + lead) % 512).toInt,
      n_frames = 1 + (rec.doc_id % 8).toInt)
  }

  /** REAL image decode — `javax.imageio` ships IN the JDK (PNG, BMP, JPEG,
    * GIF readers; zero external codec dependencies), so actual pixel decode
    * is available even in this container. Returns None for payloads no
    * registered reader accepts (corrupt/truncated/non-image bytes) —
    * [[extractImageMeta]] drops those rows, the standard crawl-pipeline
    * posture for undecodable media. The synthetic corpus queries (q31/q32/
    * q51) keep the deterministic stub because the testdata's payloads are
    * utf-8 text, not encoded images; this path is the one a real media
    * table takes, unit-tested against images encoded in-process. */
  /** The ONE decode boundary every real-image stage goes through: in-memory
    * stream (the cache flag is JVM-global ImageIO state; disk-backed stream
    * caching would add a temp-file per decode), and BOTH undecodable
    * outcomes map to None — `read` returns null when no registered reader
    * claims the bytes, and THROWS (IIOException et al.) when a reader
    * claims a recognized signature but the data is truncated/corrupt. A
    * crawl corpus contains plenty of the second kind; a throw here would
    * kill the task instead of dropping the row. */
  private[operators] def decodeBuffered(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: Exception => None }

  private[operators] def decodeImage(rec: MediaRecord): Option[MediaMeta] =
    decodeBuffered(rec.payload)
      .map(img => MediaMeta(rec.doc_id, rec.media_type, rec.payload.length.toLong,
        img.getWidth, img.getHeight, n_frames = 1))

  /** Decode stage over REAL images: batchwise decode through
    * [[decodeBuffered]]; undecodable payloads (unrecognized OR corrupt)
    * drop. */
  def extractImageMeta(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap(decodeImage))
  }

  /** Pixel-level feature extraction from real images: mean luminance
    * ((r+g+b)/3 averaged over every pixel) — the smallest feature that can
    * only come from actually decoded pixel data. Same mapPartitions
    * boundary; payloads never shuffle. */
  def imageFeatures(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    records.mapPartitions { batch =>
      batch.flatMap { rec =>
        decodeBuffered(rec.payload).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ImageFeatures(rec.doc_id, rec.media_type, w, h,
            sum.toDouble / (3.0 * w * h))
        }
      }
    }
  }

  /** REAL pixel resample — the pixel-level counterpart of [[resizeFit]]'s
    * dimension math: decode with the JDK codecs, aspect-fit into
    * `target`×`target` using the SAME integer floor arithmetic as
    * [[resizeFit]], redraw with bilinear interpolation (java.awt Graphics2D
    * — still zero external dependencies), and re-encode as PNG bytes.
    * Per-partition batch loop, payload-in/payload-out; rows drop when the
    * payload is undecodable OR when the fitted short side floors to zero
    * (aspect beyond `target`:1 — a zero-pixel side cannot encode; resizeFit
    * reports those same rows as 0-dimension metadata, keeping the two
    * stages' arithmetic identical). */
  def resizeImages(records: Dataset[MediaRecord], target: Int = 224)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    records.mapPartitions { batch =>
      batch.flatMap { rec =>
        decodeBuffered(rec.payload).flatMap { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val (ow, oh) =
            if (w <= 0 || h <= 0) (0, 0)
            else if (w >= h) (target, h * target / w)
            else (w * target / h, target)
          if (ow <= 0 || oh <= 0) None
          else try {
            // same try/Option boundary as decodeBuffered: a redraw/encode
            // failure (or ImageIO.write finding no png writer — it returns
            // false rather than throwing) drops the row instead of killing
            // the task
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            if (javax.imageio.ImageIO.write(out, "png", bos))
              Some(MediaRecord(rec.doc_id, rec.media_type, bos.toByteArray))
            else None
          } catch { case _: Exception => None }
        }
      }
    }
  }

  /** REAL audio metadata — javax.sound.sampled is JDK-bundled like imageio
    * (WAV/AIFF/AU parsers, zero external dependencies): sample rate,
    * channels, bit depth, sample-frame count, and duration straight from
    * the container header. Same drop-undecodable posture as the image path
    * (the parser throws UnsupportedAudioFileException on unclaimed bytes
    * and other IO errors on truncated ones — both map to a dropped row).
    * Compressed codecs (mp3/aac) are not in the JDK and stay out of scope
    * with video FRAME decode (the container level is covered by
    * [[extractMp4Meta]]'s box walk). */
  def extractAudioMeta(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[AudioMeta] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap { rec =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(rec.payload))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        in.close()
        Some(AudioMeta(rec.doc_id, rec.media_type,
          fmt.getSampleRate.toDouble, fmt.getChannels, fmt.getSampleSizeInBits,
          frames,
          if (fmt.getSampleRate > 0) frames * 1000.0 / fmt.getSampleRate else 0.0))
      } catch { case _: Exception => None }
    })
  }

  /** Sample-level audio signals over REAL decoded PCM — the audio-corpus
    * curation triage (clipped? silent? dead channel?) that runs before any
    * model ever hears a clip: mean and peak absolute amplitude plus the
    * fraction of samples under `silenceAbs`. ALL outputs are integers
    * (floor division, micro-unit ratio), so the stats replay exactly in
    * any engine. Decodes the javax.sound containers (WAV/AIFF/AU),
    * honoring the container's declared endianness; non-16-bit or
    * multi-channel payloads drop with the undecodable ones (the corpus
    * triage posture — this operator's contract is mono PCM16, the
    * dominant speech-corpus format). Same mapPartitions boundary as every
    * decode stage: payload bytes never shuffle. */
  def audioStats(records: Dataset[MediaRecord], silenceAbs: Int = 1000)(
      implicit spark: SparkSession): Dataset[AudioStats] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap { rec =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(rec.payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
          in.close(); None
        } else {
          val bytes = in.readAllBytes()
          in.close()
          val n = bytes.length / 2
          if (n == 0) None
          else {
            var i = 0
            var sumAbs = 0L
            var peak = 0L
            var silent = 0L
            while (i < n) {
              val s =
                if (fmt.isBigEndian) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
                else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
              val a = math.abs(s.toLong)
              sumAbs += a
              if (a > peak) peak = a
              if (a < silenceAbs) silent += 1
              i += 1
            }
            Some(AudioStats(rec.doc_id, n.toLong, sumAbs / n, peak, silent,
              silent * 1000000L / n))
          }
        }
      } catch { case _: Exception => None }
    })
  }

  /** Deterministic 8 kHz mono PCM16 WAV test clip: sample i is
    * ((seed·31 + i·7919) mod 65536) − 32768 — an integer formula any SQL
    * engine replays with a range join, written through the REAL
    * javax.sound encoder so [[audioStats]] exercises a genuine
    * container-parse + byte-decode round trip. */
  def testPcmWav(seed: Long, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 31 + i.toLong * 7919) % 65536) - 32768).toInt
      pcm(2 * i) = (v & 0xff).toByte        // little-endian per the format below
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** documents → MediaRecord dataset: treats the utf-8 bytes of `text` as
    * the opaque payload (the testdata ships no true binary column; the
    * schema/encoder path is identical for real media bytes). */
  def asMediaRecords(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Decode/feature-extract stage: partition-wise batches through the stub
    * decoder. Executor-side, codec init once per partition, metadata-only
    * output. */
  def extractMeta(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    records.mapPartitions { batch =>
      // real impl: initialize the codec ONCE here, then decode the batch
      batch.map(decodeStub)
    }
  }

  /** Frame sampling: one output row per sampled frame index (every `stride`-th
    * frame). Runs on the decoded metadata — the explode happens AFTER the
    * payload is dropped, so the shuffle carries rows of a few ints. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int = 2): DataFrame =
    meta.toDF().select(
      col("doc_id"), col("media_type"), col("width"), col("height"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stage: aspect-preserving fit of each decoded image into a
    * `target` × `target` box — the longest side becomes `target`, the other
    * scales by the same ratio with INTEGER floor division (h*target/w), so
    * the arithmetic is bit-identical across engines and the stage is
    * oracle-checkable. Runs as mapPartitions like decode: the real build
    * resamples pixels here with a per-partition codec; the dimension math
    * and the partition-batch boundary are exactly what would ship. A zero
    * dimension (empty payload) passes through as 0×0 rather than dividing
    * by zero. */
  def resizeFit(meta: Dataset[MediaMeta], target: Int = 224)(implicit spark: SparkSession): Dataset[ResizedMeta] = {
    import spark.implicits._
    meta.mapPartitions { batch =>
      // real impl: allocate the resample buffers ONCE here, then loop
      batch.map { m =>
        val (ow, oh) =
          if (m.width <= 0 || m.height <= 0) (0, 0)
          else if (m.width >= m.height) (target, m.height * target / m.width)
          else (m.width * target / m.height, target)
        ResizedMeta(m.doc_id, m.media_type, m.width, m.height, ow, oh)
      }
    }
  }

  // ---- perceptual image hashing (near-dup dedup over REAL pixels) ---------

  /** 64-bit difference hash (dHash) of one decoded image — the classic
    * perceptual image fingerprint: area-average the pixels onto a 9-wide ×
    * 8-tall grayscale grid, then set bit (row*8 + col) when grid(col,row) >
    * grid(col+1,row) (the horizontal luminance gradient). ALL arithmetic is
    * integer — cell boundaries are floor(col*w/9), cell values are
    * floor(Σ(r+g+b) / (3·count)) — so the hash is bit-reproducible on any
    * JVM and, critically, INVARIANT under exact k× pixel replication when
    * 9 | w and 8 | h (each upscaled cell is the k²-replicated original cell,
    * and kS/k²n and S/n have equal floors): a re-encoded OR
    * integer-upscaled copy of the same picture hashes identically, which is
    * what makes this a perceptual dedup key rather than a byte checksum.
    * Returns None for undecodable payloads or images smaller than the grid
    * (w < 9 or h < 8 leaves empty cells — no meaningful gradient exists). */
  private[operators] def dHash64One(img: java.awt.image.BufferedImage): Option[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < 9 || h < 8) None
    else {
      val grid = Array.ofDim[Long](8, 9)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 9) {
          val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
          val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          grid(cy)(cx) = sum / (3L * (x1 - x0) * (y1 - y0))
          cx += 1
        }
        cy += 1
      }
      var bits = 0L
      var row = 0
      while (row < 8) {
        var c = 0
        while (c < 8) {
          if (grid(row)(c) > grid(row)(c + 1)) bits |= 1L << (row * 8 + c)
          c += 1
        }
        row += 1
      }
      Some(bits)
    }
  }

  /** Per-image dHash over a media table: decode (JDK codecs) → 9×8 integer
    * area-average → 64-bit gradient hash. Same mapPartitions boundary as
    * every decode stage — payload bytes never shuffle, only (doc_id, dhash)
    * does. Undecodable / sub-grid images drop (the crawl posture). */
  def dHash64(records: Dataset[MediaRecord])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    records.mapPartitions(_.flatMap { rec =>
      decodeBuffered(rec.payload).flatMap(dHash64One).map(h => (rec.doc_id, h))
    }).toDF("doc_id", "dhash")
  }

  /** Perceptual near-dup image pairs: [[dHash64]] signatures through the
    * shared banded Hamming pair-finder ([[Dedup.hammingPairs64]] — four
    * 16-bit band keys, equi-join, exact bit_count verify; complete for
    * Hamming ≤ 3). At 100 TB the heavy decode is embarrassingly parallel
    * and the join runs over 8-byte signatures only. */
  def dHashDupPairs(records: Dataset[MediaRecord], maxHamming: Int = 0)(
      implicit spark: SparkSession): DataFrame =
    Dedup.hammingPairs64(dHash64(records), "dhash", maxHamming)

  /** Perceptual KEEP-BEST image dedup — [[dHash64]] groups resolved to one
    * keeper each, where the keeper maximizes decoded pixel count (ties →
    * smallest doc_id): among re-encoded / re-scaled copies of one picture,
    * curation wants the highest-resolution original, not an arbitrary
    * survivor (the [[Dedup.exactBest]] rationale on the perceptual key).
    * One decode pass yields (dhash, pixels) together; the keeper is an
    * argmax AGGREGATE (struct max), so hot duplicate groups collapse
    * map-side — no per-hash window. Output: (keep_id, n_members, pixels)
    * — one row per distinct picture, singletons included. */
  def dHashKeepBest(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sig = records.mapPartitions(_.flatMap { rec =>
      decodeBuffered(rec.payload).flatMap(img =>
        dHash64One(img).map(h =>
          (rec.doc_id, h, img.getWidth.toLong * img.getHeight)))
    }).toDF("doc_id", "dhash", "pixels")
    sig.groupBy("dhash")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("pixels").as("__p"), (-col("doc_id")).as("__nid"))).as("__best"))
      .select((-col("__best.__nid")).as("keep_id"), col("n_members"),
        col("__best.__p").as("pixels"))
  }

  /** Deterministic PNG test pattern: 36×32 pseudo-random grayscale pixels
    * from a splitmix-style integer generator seeded by `param`, optionally
    * pixel-replicated `scale`×. Two calls with equal `param` render the
    * SAME picture at (possibly) different resolutions and byte payloads —
    * the ground truth the perceptual-hash oracle needs without shipping
    * binary fixtures. 36 and 32 are multiples of 9 and 8, so [[dHash64One]]
    * is exactly scale-invariant on these patterns (see its scaladoc). */
  def testPatternPng(param: Long, scale: Int = 1): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(testPatternImage(param, scale), "png", bos)
    bos.toByteArray
  }

  /** The rendered pattern behind [[testPatternPng]], before any encode —
    * also the frame source of [[testMjpegAvi]], which JPEG-encodes it. */
  private[operators] def testPatternImage(param: Long,
      scale: Int = 1): java.awt.image.BufferedImage = {
    val (bw, bh) = (36, 32)
    val img = new java.awt.image.BufferedImage(
      bw * scale, bh * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var state = param * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    var y = 0
    while (y < bh) {
      var x = 0
      while (x < bw) {
        state = state * 6364136223846793005L + 1442695040888963407L
        val luma = ((state >>> 33) & 0xff).toInt
        val rgb = (luma << 16) | (luma << 8) | luma
        var dy = 0
        while (dy < scale) {
          var dx = 0
          while (dx < scale) {
            img.setRGB(x * scale + dx, y * scale + dy, rgb)
            dx += 1
          }
          dy += 1
        }
        x += 1
      }
      y += 1
    }
    img
  }

  // ---- MP4 / ISO-BMFF container metadata (ISO/IEC 14496-12) --------------
  //
  // CONTAINER-level video triage — the piece of the video stub that IS
  // pure-JDK-feasible: an MP4 file is a tree of length-prefixed boxes
  // ([size:4 BE][type:4cc][payload]; size 1 → 64-bit largesize follows,
  // size 0 → to EOF), so brand, timescale/duration, track handlers and
  // sample-entry codec ids all come from a byte walk with no codec in
  // sight. FRAME decode (avc1/hevc bitstreams) stays explicitly out of
  // scope — that carve-out is permanent (no JDK codec exists), and this
  // walker is the boundary where it starts.

  private def be32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw new IllegalArgumentException("be32 OOB")
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private def be64(b: Array[Byte], o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String = {
    if (o < 0 || o + 4 > b.length) throw new IllegalArgumentException("4cc OOB")
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Child boxes of b[start, end): (type, payloadStart, payloadEnd).
    * Malformed sizes (running past the parent, shorter than the header)
    * throw — the caller maps any throw to a QUARANTINED (dropped) row. */
  private def childBoxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    while (o < end) {
      if (o + 8 > end) throw new IllegalArgumentException("truncated box header")
      val sz32 = be32(b, o)
      val typ = fourcc(b, o + 4)
      val (payloadStart, boxEnd) =
        if (sz32 == 1L) { // largesize
          val sz = be64(b, o + 8)
          if (sz < 16 || o + sz > end) throw new IllegalArgumentException("bad largesize")
          (o + 16, o + sz.toInt)
        } else if (sz32 == 0L) (o + 8, end) // box runs to end of parent
        else {
          if (sz32 < 8 || o + sz32 > end) throw new IllegalArgumentException("bad size")
          (o + 8, o + sz32.toInt)
        }
      out += ((typ, payloadStart, boxEnd))
      o = boxEnd
    }
    out.result()
  }

  private def firstBox(boxes: Seq[(String, Int, Int)], typ: String): Option[(Int, Int)] =
    boxes.collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** Parse one ISO-BMFF payload to container metadata, or None when the
    * container is malformed / missing its required boxes (ftyp, moov,
    * mvhd, a positive timescale) — the quarantine contract. */
  private[graft] def parseMp4(b: Array[Byte]): Option[VideoMeta0] =
    try {
      val top = childBoxes(b, 0, b.length)
      for {
        (fs, _) <- firstBox(top, "ftyp")
        (ms, me) <- firstBox(top, "moov")
        moov = childBoxes(b, ms, me)
        (hs, _) <- firstBox(moov, "mvhd")
        version = b(hs) & 0xff
        (timescale, duration) =
          if (version == 1) (be32(b, hs + 20), be64(b, hs + 24))
          else (be32(b, hs + 12), be32(b, hs + 16))
        if timescale > 0
      } yield {
        val brand = fourcc(b, fs)
        val tracks = moov.collect { case ("trak", s, e) =>
          val mdia = firstBox(childBoxes(b, s, e), "mdia")
            .getOrElse(throw new IllegalArgumentException("trak without mdia"))
          val mdiaKids = childBoxes(b, mdia._1, mdia._2)
          val (hls, _) = firstBox(mdiaKids, "hdlr")
            .getOrElse(throw new IllegalArgumentException("mdia without hdlr"))
          val handler = fourcc(b, hls + 8)
          val codec = for {
            (mis, mie) <- firstBox(mdiaKids, "minf")
            (sts, ste) <- firstBox(childBoxes(b, mis, mie), "stbl")
            (sds, sde) <- firstBox(childBoxes(b, sts, ste), "stsd")
            entry <- childBoxes(b, sds + 8, sde).headOption // past ver/flags + count
          } yield entry._1
          (handler, codec)
        }
        VideoMeta0(brand, timescale, duration * 1000L / timescale,
          tracks.length,
          tracks.count(_._1 == "vide"), tracks.count(_._1 == "soun"),
          tracks.flatMap(_._2).sorted.mkString(","))
      }
    } catch { case _: Exception => None }

  /** Container-metadata extraction over MP4 payloads: the image/audio
    * mapPartitions boundary (payload bytes never shuffle, only the
    * 7-column metadata leaves the scan); malformed payloads drop. */
  def extractMp4Meta(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[VideoMeta] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap { rec =>
      parseMp4(rec.payload).map(m => VideoMeta(rec.doc_id, m.major_brand,
        m.timescale, m.duration_ms, m.n_tracks, m.n_video, m.n_audio, m.codecs))
    })
  }

  /** Deterministic minimal-but-REAL ISO-BMFF synthesizer for fixtures
    * (the [[testPcmWav]] convention): ftyp(isom) + moov(mvhd + one video
    * trak (avc1) [+ one audio trak (mp4a)]) + a tiny mdat. `v1` emits the
    * 64-bit mvhd variant so both version paths are exercised. */
  def testMp4(timescale: Int, durationUnits: Long, withAudio: Boolean,
      v1: Boolean): Array[Byte] = {
    // the v0 mvhd duration field is 32-bit (ISO 14496-12 §8.2.2); a real
    // muxer promotes to v1 beyond it — refuse to silently truncate
    // (caught by the round-trip property test)
    require(v1 || durationUnits <= 0xFFFFFFFFL,
      s"v0 mvhd cannot hold duration $durationUnits; pass v1 = true")
    require(durationUnits >= 0, s"negative duration $durationUnits")
    def int32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def int64(v: Long): Array[Byte] = int32(v >>> 32) ++ int32(v & 0xffffffffL)
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      int32(payload.length + 8L) ++ cc(typ) ++ payload
    val ftyp = box("ftyp", cc("isom") ++ int32(0) ++ cc("isom"))
    val mvhd = box("mvhd",
      if (v1) Array[Byte](1, 0, 0, 0) ++ int64(0) ++ int64(0) ++
        int32(timescale) ++ int64(durationUnits) ++ new Array[Byte](80)
      else Array[Byte](0, 0, 0, 0) ++ int32(0) ++ int32(0) ++
        int32(timescale) ++ int32(durationUnits) ++ new Array[Byte](80))
    def trak(handler: String, codec: String): Array[Byte] = {
      val hdlr = box("hdlr",
        new Array[Byte](8) ++ cc(handler) ++ new Array[Byte](13))
      val stsd = box("stsd",
        new Array[Byte](4) ++ int32(1) ++ box(codec, new Array[Byte](8)))
      box("trak", box("mdia",
        hdlr ++ box("minf", box("stbl", stsd))))
    }
    val traks = trak("vide", "avc1") ++
      (if (withAudio) trak("soun", "mp4a") else Array.empty[Byte])
    ftyp ++ box("moov", mvhd ++ traks) ++ box("mdat", new Array[Byte](16))
  }

  // ---- MJPEG-in-AVI: the one video FRAME path the JDK can decode ----------
  //
  // AVI is a RIFF container (little-endian [id:4cc][size:4][payload],
  // chunks padded to even offsets; 'LIST' chunks nest, their payload
  // leading with a 4cc list type). When the video stream is MJPEG, every
  // '..dc' chunk in the 'movi' list IS a complete JPEG image — and JPEG
  // decode ships in the JDK (javax.imageio), so frame-level work needs no
  // external codec. This closes the frame-decode gap for exactly this
  // format; avc1/hevc bitstream decode (MP4-land) remains the permanent
  // carve-out, with [[extractMp4Meta]] as its container-level boundary.

  private def le32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw new IllegalArgumentException("le32 OOB")
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** RIFF chunks of b[start, end): (fourcc, payloadStart, payloadEnd).
    * Truncated declared lengths throw (caller quarantines). */
  private def riffChunks(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    while (o < end) {
      if (o + 8 > end) throw new IllegalArgumentException("riff chunk header OOB")
      val id = fourcc(b, o)
      val size = le32(b, o + 4)
      val ps = o + 8
      val pe = ps + size.toInt
      if (size > Int.MaxValue - 16 || pe > end)
        throw new IllegalArgumentException("riff chunk overruns container")
      out += ((id, ps, pe))
      o = pe + (size.toInt & 1) // chunks are even-aligned
    }
    out.result()
  }

  /** Parse one AVI payload to (container metadata, MJPEG frame payloads),
    * or None when malformed (not RIFF/'AVI ', no hdrl/avih, bad chunk
    * lengths) — the [[parseMp4]] quarantine contract. Frames are the
    * '..db'/'..dc' chunks of the 'movi' list in order; 'rec ' sub-lists
    * (interleave grouping) are walked through. */
  private[graft] def parseAvi(b: Array[Byte]): Option[(AviMeta0, Seq[Array[Byte]])] =
    try {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        return None
      val top = riffChunks(b, 12, math.min(b.length, 8 + le32(b, 4).toInt))
      def lists(cs: Seq[(String, Int, Int)], typ: String): Seq[(Int, Int)] =
        cs.collect { case ("LIST", s, e) if e - s >= 4 && fourcc(b, s) == typ =>
          (s + 4, e)
        }
      for {
        (hs, he) <- lists(top, "hdrl").headOption
        hdrl = riffChunks(b, hs, he)
        (as, ae) <- hdrl.collectFirst { case ("avih", s, e) => (s, e) }
        if ae - as >= 40
      } yield {
        val handler = lists(hdrl, "strl").headOption.flatMap { case (ss, se) =>
          riffChunks(b, ss, se).collectFirst {
            case ("strh", s, e) if e - s >= 8 => fourcc(b, s + 4)
          }
        }.getOrElse("")
        val frames = lists(top, "movi").flatMap { case (ms, me) =>
          riffChunks(b, ms, me).flatMap {
            case (id, s, e) if id.length == 4 &&
                (id.endsWith("db") || id.endsWith("dc")) =>
              Seq(java.util.Arrays.copyOfRange(b, s, e))
            case ("LIST", s, e) if e - s >= 4 && fourcc(b, s) == "rec " =>
              riffChunks(b, s + 4, e).collect {
                case (id2, s2, e2) if id2.endsWith("db") || id2.endsWith("dc") =>
                  java.util.Arrays.copyOfRange(b, s2, e2)
              }
            case _ => Seq.empty
          }
        }
        (AviMeta0(le32(b, as + 32), le32(b, as + 36), le32(b, as + 16),
          le32(b, as), le32(b, as + 24).toInt, handler), frames)
      }
    } catch { case _: Exception => None }

  /** Container-metadata extraction over AVI payloads — the
    * [[extractMp4Meta]] boundary for RIFF: payload bytes never shuffle,
    * malformed containers drop. `n_frames` is the count of actual movi
    * frame chunks (ground truth), `n_frames_header` the avih claim —
    * disagreement is itself a triage signal on a real crawl. */
  def extractAviMeta(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[AviMeta] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap { rec =>
      parseAvi(rec.payload).map { case (m, frames) =>
        AviMeta(rec.doc_id, m.width, m.height, m.n_frames_header,
          frames.length.toLong, m.us_per_frame, m.n_streams, m.handler)
      }
    })
  }

  /** Per-KEYFRAME perceptual hash over MJPEG-AVI payloads: every
    * `stride`-th movi frame (starting at 0 — the sampling rule
    * [[sampleFrames]] documents) is JPEG-decoded with the JDK codec and
    * [[dHash64One]]-hashed. One mapPartitions does container walk +
    * decode + hash; only (doc_id, frame_idx, dhash) rows leave the scan —
    * at 100 TB the decode is embarrassingly parallel and nothing
    * payload-sized ever shuffles. Undecodable frames and malformed
    * containers drop (crawl posture). */
  def videoKeyframeDHash(records: Dataset[MediaRecord], stride: Int = 2)(
      implicit spark: SparkSession): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    import spark.implicits._
    records.mapPartitions(_.flatMap { rec =>
      parseAvi(rec.payload).toSeq.flatMap { case (_, frames) =>
        frames.iterator.zipWithIndex
          .filter(_._2 % stride == 0)
          .flatMap { case (fb, idx) =>
            decodeBuffered(fb).flatMap(dHash64One)
              .map(h => (rec.doc_id, idx, h))
          }
      }
    }).toDF("doc_id", "frame_idx", "dhash")
  }

  /** Keyframe perceptual VIDEO dedup — [[dHashDupPairs]] lifted to AVI:
    * a video's fingerprint is its ordered keyframe dHash sequence, and
    * two videos pair when the sequences are identical (re-muxed /
    * metadata-edited copies of the same footage match even though their
    * container bytes differ). The fingerprint is an exact groupBy
    * aggregate (no window, no all-pairs: the equi-join runs on the
    * fingerprint key), so hot duplicate clusters collapse map-side and
    * the join survives a 100× corpus. Output: (doc1, doc2, n_keyframes)
    * with doc1 < doc2, n_keyframes the shared sequence length. */
  def videoDupPairs(records: Dataset[MediaRecord], stride: Int = 2)(
      implicit spark: SparkSession): DataFrame = {
    val sigs = videoKeyframeDHash(records, stride)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("frame_idx"), col("dhash"))))
        .as("__seq"))
      .select(col("doc_id"),
        md5(to_json(col("__seq"))).as("fingerprint"),
        size(col("__seq")).as("n_keyframes"))
    sigs.as("a").join(sigs.as("b"),
        col("a.fingerprint") === col("b.fingerprint") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.n_keyframes").as("n_keyframes"))
  }

  /** Deterministic minimal-but-REAL MJPEG-AVI synthesizer (the [[testMp4]]
    * convention): RIFF('AVI ') → LIST hdrl(avih + LIST strl(strh 'vids'/
    * 'MJPG' + strf BITMAPINFOHEADER)) + a doc-specific JUNK chunk (so
    * byte-level dedup finds nothing even between frame-identical videos)
    * + LIST movi with one '00dc' JPEG per `frameParams` entry — each
    * frame [[testPatternImage]](param) JPEG-encoded by the JDK. Equal
    * param sequences therefore mean equal decoded footage, the ground
    * truth the keyframe-dedup oracle states from construction. */
  def testMjpegAvi(frameParams: Seq[Long], junk: Long,
      usPerFrame: Int = 100000): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ payload)
    val (w, h) = (36, 32)
    val jpegs = frameParams.map { p =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(testPatternImage(p), "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih", le32(usPerFrame.toLong) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(jpegs.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
    val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++
      le32(1000000L / usPerFrame) ++ le32(0) ++ le32(jpegs.length.toLong) ++
      le32(0) ++ le32(0xffffffffL) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf", le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le16(1) ++ le16(24) ++ cc("MJPG") ++ le32(w.toLong * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val junkChunk = chunk("JUNK", le32(junk & 0xffffffffL) ++ le32(junk >>> 32))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j))
      .foldLeft(Array.empty[Byte])(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ junkChunk ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }
}

/** Parsed MP4 container metadata (no doc identity — [[Multimodal.parseMp4]]'s
  * pure output). */
case class VideoMeta0(
    major_brand: String,
    timescale: Long,
    duration_ms: Long,
    n_tracks: Int,
    n_video: Int,
    n_audio: Int,
    codecs: String)

/** Container metadata from the REAL MP4 box walk. */
case class VideoMeta(
    doc_id: Long,
    major_brand: String,
    timescale: Long,
    duration_ms: Long,
    n_tracks: Int,
    n_video: Int,
    n_audio: Int,
    codecs: String)

/** Parsed AVI container metadata (no doc identity —
  * [[Multimodal.parseAvi]]'s pure output). */
case class AviMeta0(
    width: Long,
    height: Long,
    n_frames_header: Long,
    us_per_frame: Long,
    n_streams: Int,
    handler: String)

/** Container metadata from the REAL RIFF/AVI walk; `n_frames` counts the
  * actual movi frame chunks, `n_frames_header` the avih claim. */
case class AviMeta(
    doc_id: Long,
    width: Long,
    height: Long,
    n_frames_header: Long,
    n_frames: Long,
    us_per_frame: Long,
    n_streams: Int,
    handler: String)
