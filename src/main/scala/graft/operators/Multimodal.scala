package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Multimodal column plumbing (SURVEY.md §2.C).
  *
  * Media are opaque `binary` payloads with typed metadata alongside —
  * the pattern a 100 TB training-data pipeline uses for images/audio/
  * video. The Spark-side mechanics are real (binary columns, schema,
  * partition-friendly per-batch processing via mapPartitions), and the
  * IMAGE codec is real too: [[decodeImage]]/[[thumbnail]] run
  * javax.imageio (JDK built-in — PNG/JPEG/GIF/BMP), and the AUDIO codec
  * is real: [[decodeAudio]]/[[audioRmsOn]] run javax.sound.sampled (JDK
  * built-in — WAV/AIFF/AU) including 16-bit-PCM RMS feature extraction.
  * The VIDEO path is real for the one multi-frame container the JDK
  * ships (animated GIF): [[decodeVideo]]/[[sampleVideoFramesOn]] scan
  * the container for its frame count and decode strided frames with a
  * real pixel feature (mean luma). Modern codecs (H.264 etc.) need
  * libraries outside this sandbox; the per-partition batch shape is
  * codec-agnostic, and [[decodeStub]] remains only as the deterministic
  * stand-in backing the text-payload testdata binding mm_meta (whose
  * payloads aren't media files). No external dependencies anywhere.
  */
object Multimodal {

  /** One decoded media record. */
  case class MediaMeta(doc_id: Long, payload_len: Int, width: Int, height: Int, frames: Int)

  /** STUB decoder: stands in for e.g. an image codec. Deterministic fake
    * derived from the payload bytes so tests are stable. Real impl:
    * decode `bytes` and return true dimensions.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(docId, n, 16 + n % 64, 16 + (n * 7) % 64, 1 + n % 30)
  }

  /** Batch decode path: binary payload column → typed metadata, executed
    * per-partition (the shape a vectorized/codec UDF takes — one
    * partition = one batch, no driver involvement).
    */
  def decodeAll(spark: SparkSession, sfDir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** REAL image decode (javax.imageio): true width/height from the
    * payload bytes. Returns None for payloads ImageIO cannot decode —
    * callers quarantine or drop, never crash the load (a 100 TB image
    * corpus always contains truncated files).
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    Option(img).map(i => MediaMeta(docId, bytes.length, i.getWidth, i.getHeight, 1))
  }

  /** Batch image decode over any (doc_id, payload:binary) frame: the
    * real codec runs per-partition (one partition = one decode batch);
    * undecodable payloads are silently dropped — pair with a count
    * audit when the corpus needs loss accounting.
    */
  def decodeImagesOn(df: DataFrame): Dataset[MediaMeta] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeImage(id, bytes) })
  }

  /** One resized thumbnail. */
  case class Thumb(doc_id: Long, thumb: Array[Byte], width: Int, height: Int)

  /** Real resize: decode → scale to (w, h) → re-encode PNG, all inside
    * the partition batch. The feature-extraction shape of an image
    * pipeline (decode/transform/re-encode without materializing
    * anything on the driver).
    */
  def thumbnail(docId: Long, bytes: Array[Byte], w: Int, h: Int): Option[Thumb] = {
    // NonFatal, not just IOException: imageio plugins throw runtime
    // exceptions on malformed payloads (IllegalArgumentException on CMYK
    // JPEG paths, for one) and those must quarantine too, not fail the task
    val src =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(src).map { img =>
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
      g.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", buf)
      Thumb(docId, buf.toByteArray, w, h)
    }
  }

  /** Batch thumbnailing over a (doc_id, payload:binary) frame. */
  def thumbnailsOn(df: DataFrame, w: Int, h: Int): Dataset[Thumb] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => thumbnail(id, bytes, w, h) })
  }

  /** One perceptual image hash. */
  case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual average-hash of a REAL decoded image: 8×8 SCALE_SMOOTH
    * downsample, integer ITU-R 601 luma per cell, each of the 64 bits
    * set when its cell is at or above the mean (row-major, MSB first).
    * Brightness-shifted, recompressed, or lightly-edited copies land
    * within a few bits — the image tier's answer to [[graft.operators
    * .Dedup]]'s simhash. None for undecodable payloads (quarantine,
    * never crash the scan).
    */
  def aHash(docId: Long, bytes: Array[Byte]): Option[ImageHash] = {
    // NonFatal, not just IOException: imageio plugins throw runtime
    // exceptions on malformed payloads (IllegalArgumentException on CMYK
    // JPEG paths, for one) and those must quarantine too, not fail the task
    val src =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(src).map { img =>
      val out = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img.getScaledInstance(8, 8, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
      g.dispose()
      val luma = Array.tabulate(64) { i =>
        val rgb = out.getRGB(i % 8, i / 8)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
      }
      val mean = luma.sum / 64
      val h = luma.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v >= mean) acc | (1L << (63 - i)) else acc
      }
      ImageHash(docId, h)
    }
  }

  /** Batch perceptual hashing over a (doc_id, payload:binary) frame —
    * the per-partition decode batch shape of every codec path here.
    */
  def imageAHashesOn(df: DataFrame): Dataset[ImageHash] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => aHash(id, bytes) })
  }

  /** Image near-dup pairs over perceptual hashes: candidates meet when
    * ANY 16-bit chunk of the 64-bit hash matches exactly (hamming ≤ 3
    * implies at least one of the 4 chunks is untouched — pigeonhole,
    * the [[graft.operators.Dedup]] simhash banding), then the exact
    * hamming filter keeps pairs within `maxDist`. Slim (id, chunk)
    * rows shuffle; the full hashes rejoin only for the distinct
    * candidate pairs. Output: (a_id, b_id, hamming), a_id < b_id.
    */
  def imageNearDupOn(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding guarantees recall only to hamming 3")
    val chunks = hashes.select(col("doc_id"), col("ahash"),
        explode(sequence(lit(0), lit(3))).as("ci"))
      .select(col("doc_id"), col("ahash"), col("ci"),
        expr("(ahash >> (ci * 16)) & 65535").as("cv"))
    val cand = chunks.select(col("doc_id").as("a_id"), col("ci"), col("cv"))
      .join(chunks.select(col("doc_id").as("b_id"), col("ci"), col("cv")), Seq("ci", "cv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(hashes.select(col("doc_id").as("a_id"), col("ahash").as("ha")), Seq("a_id"))
      .join(hashes.select(col("doc_id").as("b_id"), col("ahash").as("hb")), Seq("b_id"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** One DCT perceptual hash. */
  case class ImagePHash(doc_id: Long, phash: Long)

  /** 8×32 DCT-II basis rows (StrictMath — bit-identical on every JVM):
    * cos((2x+1)·u·π/64) for the 8 lowest frequencies over 32 samples.
    */
  private lazy val PHashCos: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0))

  /** DCT perceptual hash (the classic pHash) of a REAL decoded image:
    * 32×32 SCALE_SMOOTH downsample → integer ITU-R 601 luma → separable
    * 2-D DCT-II → the 8×8 lowest-frequency block minus the DC term,
    * each of the 63 bits set when its coefficient exceeds the block
    * median. Dropping DC makes the hash invariant to uniform brightness
    * shifts exactly (aHash's mean threshold only approximately), and
    * median thresholding fixes the bit balance at ~50% — the property
    * the 16-bit pigeonhole banding needs to stay selective. StrictMath
    * basis + integer luma keeps the hash bit-identical across JVMs.
    * None for undecodable payloads (quarantine, never crash the scan).
    */
  def pHash(docId: Long, bytes: Array[Byte]): Option[ImagePHash] = {
    val src =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(src).map { img =>
      // identity fast path: SCALE_SMOOTH runs its area filter even for
      // a same-size target (measured ~1 ms/image — the whole query's
      // cost at corpus scale); an already-32x32 payload reads directly
      val out = if (img.getWidth == 32 && img.getHeight == 32) img
      else {
        val o = new java.awt.image.BufferedImage(32, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = o.createGraphics()
        g.drawImage(img.getScaledInstance(32, 32, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
        g.dispose()
        o
      }
      val luma = Array.tabulate(32, 32) { (y, x) =>
        val rgb = out.getRGB(x, y)
        ((299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000).toDouble
      }
      // separable DCT: rows first (8×32 partial), then columns (8×8)
      val part = Array.tabulate(8, 32)((u, y) =>
        (0 until 32).foldLeft(0.0)((acc, x) => acc + luma(y)(x) * PHashCos(u)(x)))
      val coef = Array.tabulate(8, 8)((u, v) =>
        (0 until 32).foldLeft(0.0)((acc, y) => acc + part(u)(y) * PHashCos(v)(y)))
      val ac = for { u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0 }
        yield coef(u)(v)
      val med = ac.sorted.apply(31) // median of the 63 AC coefficients
      val h = ac.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
        if (c > med) acc | (1L << (62 - i)) else acc
      }
      ImagePHash(docId, h)
    }
  }

  /** Batch DCT hashing over a (doc_id, payload:binary) frame. */
  def imagePHashesOn(df: DataFrame): Dataset[ImagePHash] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => pHash(id, bytes) })
  }

  /** pHash near-dup pairs — the same 4×16-bit pigeonhole banding as
    * [[imageNearDupOn]] over the DCT hashes.
    */
  def imagePHashNearDupOn(hashes: DataFrame, maxDist: Int = 3): DataFrame =
    imageNearDupOn(hashes.select(col("doc_id"), col("phash").as("ahash")), maxDist)

  /** Deterministic 32×32 grayscale PNG: full-entropy per-pixel noise
    * from a splitmix-style integer mix of (seed, pixel index), range
    * 40..199 so a +15 brightness shift never saturates (saturation
    * would break the DCT's exact shift invariance).
    */
  def synthNoisePng(seed: Long, brightness: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Array.tabulate(32 * 32) { i =>
      var z = seed * 0x9e3779b97f4a7c15L + i.toLong * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (40 + Math.floorMod(z, 160L).toInt + brightness)
    }
    img.getRaster.setSamples(0, 0, 32, 32, 0, px)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** mm_image_phash — the image near-dup tier as a DRIVER-VISIBLE query
    * (completing the tier set: mm_meta scans, mm_audio_fp, mm_video_
    * scenes): every document carries a deterministic [[synthNoisePng]]
    * payload — full-entropy noise keyed by doc_id, except docs with
    * id % 50 == 1, which repeat their predecessor's pattern at +15
    * brightness (the planted near-dup; DC-only change, so the DCT hash
    * matches exactly) — decoded by the REAL ImageIO path, DCT-hashed,
    * and banded-joined into (a_id, b_id, hamming) pairs. Codec bytes
    * are not SQL-expressible → rows-only in CORRECTNESS; the spec pins
    * that exactly the planted pairs (and nothing else) come back.
    */
  def imagePhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // fanOutScan: the PNG encode+decode per row is the query's cost and
    // the single-file scan plans as ONE task — spread the slim id frame
    // before the codec work (measured r16-opt: 4.2 s → the synth/hash
    // stage parallelizes across all cores; ids only cross the exchange)
    val pngs = graft.util.Cols.fanOutScan(
        Tables.documents(spark, sfDir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        if (id % 50L == 1L) (id, synthNoisePng(id - 1L, 15))
        else (id, synthNoisePng(id, 0))
      }).toDF("doc_id", "payload")
    imagePHashNearDupOn(imagePHashesOn(pngs).toDF(), maxDist = 3)
      .transform(graft.util.Cols.verifySort(_, col("a_id"), col("b_id")))
  }

  /** One decoded audio record. */
  case class AudioMeta(doc_id: Long, payload_len: Int, sample_rate: Int,
    channels: Int, n_frames: Long, duration_ms: Long)

  /** REAL audio decode (javax.sound.sampled — JDK built-in; WAV/AIFF/AU):
    * true sample rate / channels / frame count from the payload bytes.
    * None for undecodable payloads — quarantine, never crash the load.
    */
  def decodeAudio(docId: Long, bytes: Array[Byte]): Option[AudioMeta] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durMs = if (fmt.getFrameRate > 0) (frames * 1000L / fmt.getFrameRate.toLong) else -1L
        Some(AudioMeta(docId, bytes.length, fmt.getSampleRate.toInt,
          fmt.getChannels, frames, durMs))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batch audio decode over a (doc_id, payload:binary) frame — same
    * per-partition batch shape as the image path.
    */
  def decodeAudiosOn(df: DataFrame): Dataset[AudioMeta] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeAudio(id, bytes) })
  }

  /** One audio analysis window. */
  case class AudioWindow(doc_id: Long, win_idx: Int, rms: Double)

  /** REAL audio feature extraction: decode 16-bit PCM and emit per-window
    * RMS energy (the VAD/silence-trim primitive of a speech pipeline).
    * Each payload explodes to its windows inside the partition batch —
    * no driver involvement, output rows ∝ audio length.
    */
  def audioRmsOn(df: DataFrame, windowFrames: Int = 1024): Dataset[AudioWindow] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (in == null) Iterator.empty
        // the format check lives INSIDE try/finally: the early non-16-bit
        // return path must close the stream too, not just the decode path
        else try {
          if (in.getFormat.getSampleSizeInBits != 16) Seq.empty[AudioWindow]
          else {
          val fmt = in.getFormat
          val bytesPerFrame = fmt.getFrameSize
          val pcm = in.readAllBytes()
          val le = !fmt.isBigEndian
          val nWin = pcm.length / (bytesPerFrame * windowFrames)
          (0 until nWin).iterator.map { w =>
            var sum = 0.0
            var i = w * windowFrames * bytesPerFrame
            val end = i + windowFrames * bytesPerFrame
            while (i + 1 < end) { // first channel of each frame
              val s = if (le) ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
                      else ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
              sum += s.toDouble * s.toDouble
              i += bytesPerFrame
            }
            AudioWindow(id, w, math.sqrt(sum / windowFrames))
          }.toSeq
          }
        } finally in.close()
      })
  }

  /** One decoded video (multi-frame container) record. */
  /** One per-window spectral fingerprint. */
  case class AudioFp(doc_id: Long, win_idx: Int, fp: Long)

  /** REAL audio spectral fingerprinting: per analysis window, Goertzel
    * band energies at 32 fixed fractions of the sample rate (k/128 for
    * k = 1..32 — coefficients 2·cos(2πk/128) depend only on the band,
    * so two files at different sample RATES still fingerprint their
    * spectral SHAPE comparably), mean-thresholded into a 32-bit
    * fingerprint per window — the aHash recipe applied to spectra, and
    * the primitive behind audio dedup / re-encode detection. 16-bit
    * PCM only (the JDK decode path); each payload explodes to its
    * windows inside the partition batch.
    */
  def audioFingerprintsOn(df: DataFrame, windowFrames: Int = 1024): Dataset[AudioFp] = {
    import df.sparkSession.implicits._
    val nBands = 32
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (in == null) Iterator.empty
        else try {
          // frame size can be NOT_SPECIFIED (-1): sample() multiplies by
          // it, so a non-positive value would index negatively — skip such
          // streams the same way non-16-bit ones are skipped (quarantine,
          // never crash the scan)
          if (in.getFormat.getSampleSizeInBits != 16 ||
              in.getFormat.getFrameSize <= 0) Seq.empty[AudioFp]
          else {
            val fmt = in.getFormat
            val bytesPerFrame = fmt.getFrameSize
            val pcm = in.readAllBytes()
            val le = !fmt.isBigEndian
            val nFrames = pcm.length / bytesPerFrame
            // first channel only: spectral shape, not mix balance
            def sample(f: Int): Double = {
              val o = f * bytesPerFrame
              val (lo, hi) = if (le) (pcm(o), pcm(o + 1)) else (pcm(o + 1), pcm(o))
              (((hi & 0xff) << 8) | (lo & 0xff)).toShort.toDouble / 32768.0
            }
            (0 until nFrames / windowFrames).map { w =>
              val base = w * windowFrames
              val energies = Array.tabulate(nBands) { b =>
                // Goertzel recurrence at bin (b+1)/128 of the frame rate
                val coeff = 2.0 * math.cos(2.0 * math.Pi * (b + 1) / 128.0)
                var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
                var i = 0
                while (i < windowFrames) {
                  s0 = sample(base + i) + coeff * s1 - s2
                  s2 = s1; s1 = s0
                  i += 1
                }
                s1 * s1 + s2 * s2 - coeff * s1 * s2
              }
              val mean = energies.sum / nBands
              val fp = energies.zipWithIndex.foldLeft(0L) { case (acc, (e, i)) =>
                if (e >= mean) acc | (1L << i) else acc
              }
              AudioFp(id, w, fp)
            }
          }
        } catch {
          // truncated/lying WAV payloads can fail mid-read (readAllBytes
          // IOException past the header's claimed length); quarantine
          // like the stream-open path does
          case scala.util.control.NonFatal(_) => Seq.empty[AudioFp]
        } finally in.close()
      })
  }

  /** Audio near-dup pairs over window fingerprint SEQUENCES: two docs
    * are near-dups when ≥ `minFrac` ppm of their aligned windows agree
    * within `maxBits` spectral bits — candidates meet in a
    * (win_idx, fingerprint-chunk) equi-join (the pigeonhole banding a
    * third time: hamming ≤ 2 over 32 bits leaves one of the 4 8-bit
    * chunks intact... ≤ 3 needs chunk count 4, so maxBits ≤ 3), never
    * an all-pairs product over documents. Output:
    * (a_id, b_id, n_windows, n_close, close_ppm).
    */
  def audioNearDupOn(fps: DataFrame, maxBits: Int = 3,
      minFracPpm: Long = 800000L): DataFrame = {
    require(maxBits <= 3, "4x8-bit banding guarantees recall only to hamming 3")
    val chunks = fps.select(col("doc_id"), col("win_idx"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("ci"))
      .select(col("doc_id"), col("win_idx"), col("fp"), col("ci"),
        expr("(fp >> (ci * 8)) & 255").as("cv"))
    val cand = chunks.select(col("doc_id").as("a_id"), col("win_idx"),
        col("ci"), col("cv"), col("fp").as("fa"))
      .join(chunks.select(col("doc_id").as("b_id"), col("win_idx"),
        col("ci"), col("cv"), col("fp").as("fb")), Seq("win_idx", "ci", "cv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("win_idx"), col("fa"), col("fb"))
      .distinct()
    val close = cand
      .filter(expr(s"bit_count(fa ^ fb) <= $maxBits"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_close"))
    val winCounts = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
    close
      .join(winCounts.select(col("doc_id").as("a_id"), col("nw").as("na")), Seq("a_id"))
      .join(winCounts.select(col("doc_id").as("b_id"), col("nw").as("nb")), Seq("b_id"))
      .withColumn("n_windows", least(col("na"), col("nb")))
      .withColumn("close_ppm", expr("n_close * 1000000 div n_windows"))
      .filter(col("close_ppm") >= minFracPpm)
      .select(col("a_id"), col("b_id"), col("n_windows"), col("n_close"), col("close_ppm"))
  }

  /** Deterministic synthesized 16-bit mono WAV: two sine tones (frame
    * periods p1/p2), StrictMath so the PCM is bit-identical on any
    * JVM. The codec STAND-IN the container's lack of real audio
    * corpora requires — everything downstream of these bytes
    * (AudioSystem decode, Goertzel bands) is the real path.
    */
  def synthToneWav(p1: Int, p2: Int, amp: Double, frames: Int): Array[Byte] = {
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = (StrictMath.sin(i * 2 * StrictMath.PI / p1)
        + 0.5 * StrictMath.sin(i * 2 * StrictMath.PI / p2)) * amp
      val s = (v * 12000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  /** mm_audio_fp — the audio spectral tier as a DRIVER-VISIBLE query
    * (the image tier's mm_meta counterpart): every document carries a
    * deterministic [[synthToneWav]] payload whose tone periods derive
    * from doc_id, the REAL decode + Goertzel path fingerprints it, and
    * the per-document spectral profile comes back as rows. The window
    * count is decoded for EVERY document (the full-corpus scale work;
    * its value — 2048 frames / 1024-frame windows = 2 — is derivable,
    * so the oracle checks the whole decode ran), while the Goertzel
    * fingerprint values — a recurrence over decoded PCM no SQL engine
    * expresses — are VALUE-ORACLED on the 16 fixture documents
    * (doc_id < 16) as pinned literals: StrictMath makes the PCM and
    * therefore the fingerprints bit-identical on any JVM, the spec
    * independently validates the Goertzel math on planted tones, and
    * the literals pin the whole decode→fingerprint path against
    * regression (r16 — leaving the rows-only tier, VERDICT-r15 #7).
    */
  def audioFp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // fanOutScan: WAV synth + decode + 32-band Goertzel per row off a
    // one-task scan — spread the slim id frame first (guide §2.5)
    val wavs = graft.util.Cols.fanOutScan(
        Tables.documents(spark, sfDir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, synthToneWav(8 + (id % 48L).toInt, 5 + (id * 7 % 23L).toInt, 0.8, 2048))
      }).toDF("doc_id", "payload")
    audioFingerprintsOn(wavs).toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        min_by(col("fp"), col("win_idx")).as("fp0"),
        sum(expr("bit_count(fp)")).as("spectral_bits"))
      .select(col("doc_id"), col("n_windows"),
        when(col("doc_id") < 16, col("fp0")).as("fp0_fixture"),
        when(col("doc_id") < 16, col("spectral_bits")).as("bits_fixture"))
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }

  /** DuckDB oracle for [[audioFp]]: the derivable window count over
    * every document + the 16 fixture documents' fingerprint literals.
    */
  def audioFpSql: String =
    """WITH fx(doc_id, fp0, bits) AS (VALUES
      |  (0, 32768, 2), (1, 26112, 8), (2, 6144, 4), (3, 16, 2),
      |  (4, 5632, 6), (5, 896, 4), (6, 304, 6), (7, 32768, 2),
      |  (8, 128, 2), (9, 240, 7), (10, 3145792, 6), (11, 608, 6),
      |  (12, 240, 7), (13, 32, 2), (14, 48, 4), (15, 120, 8))
      |SELECT d.doc_id, CAST(2 AS BIGINT) AS n_windows,
      |  CAST(f.fp0 AS BIGINT) AS fp0_fixture,
      |  CAST(f.bits AS BIGINT) AS bits_fixture
      |FROM documents d LEFT JOIN fx f ON d.doc_id = f.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** DuckDB oracle for [[videoScenes]]: every output column is a
    * closed form of doc_id (the synth plants them; the REAL container
    * decode + lag-window cut detection must recover each exactly).
    */
  def videoScenesSql: String =
    """SELECT doc_id,
      |  CAST(6 + doc_id % 5 AS INTEGER) AS n_frames,
      |  CAST(6 + doc_id % 5 AS INTEGER) AS n_sampled,
      |  CAST(1 AS INTEGER) AS n_cuts,
      |  CAST(2 + doc_id % 3 AS INTEGER) AS cut_frame,
      |  CAST(220 - (40 + (doc_id % 4) * 20) AS BIGINT) AS max_delta
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[imagePhashPairs]]: exactly the planted
    * near-dup pairs (id%50==1 repeats its predecessor's noise at +15
    * brightness — DC-only, so the DCT hash matches at hamming 0), and
    * nothing else: full-entropy noise puts an accidental ≤3-hamming
    * 64-bit collision at ~1e-8 for the whole corpus.
    */
  def imagePhashPairsSql: String =
    """SELECT CAST(doc_id - 1 AS BIGINT) AS a_id, doc_id AS b_id,
      |  CAST(0 AS INTEGER) AS hamming
      |FROM documents
      |WHERE doc_id % 50 = 1
      |  AND doc_id - 1 IN (SELECT doc_id FROM documents)
      |ORDER BY a_id, b_id""".stripMargin

  case class VideoMeta(doc_id: Long, payload_len: Int, width: Int, height: Int, frames: Int)

  /** REAL multi-frame container decode via javax.imageio — the JDK
    * ships exactly one multi-frame media container (animated GIF), and
    * its reader exposes the full video-decode surface: frame count
    * (`getNumImages(true)` — a container scan), per-frame random access
    * (`read(i)`), and dimensions. MP4/H.264 need codecs outside the
    * sandbox, but the Spark-side shape — binary payload, per-partition
    * batch decode, frame-strided explode — is identical for any codec:
    * swap `decodeVideo`'s body for a JNI/FFI call and nothing else
    * moves. None for payloads that aren't multi-frame-decodable.
    */
  def decodeVideo(docId: Long, bytes: Array[Byte]): Option[VideoMeta] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); None }
    else {
      val r = readers.next()
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        if (n <= 0) None
        else Some(VideoMeta(docId, bytes.length, r.getWidth(0), r.getHeight(0), n))
      } catch { case _: java.io.IOException => None }
      finally { r.dispose(); iis.close() }
    }
  }

  /** Batch video decode over a (doc_id, payload:binary) frame. */
  def decodeVideosOn(df: DataFrame): Dataset[VideoMeta] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeVideo(id, bytes) })
  }

  /** One sampled, decoded video frame with a real pixel feature. */
  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int, mean_luma: Long)

  /** REAL frame sampling: decode every `stride`-th frame of each
    * multi-frame payload and emit its mean luma (integer average of
    * (r+g+b)/3 over the pixels) — the cheap-feature pass a video
    * curation pipeline runs for black-frame / slate detection. Each
    * payload explodes inside the partition batch; output rows ∝
    * frames/stride, never driver-side.
    */
  def sampleVideoFramesOn(df: DataFrame, stride: Int = 2): Dataset[VideoFrame] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            (0 until n by stride).map { f =>
              val img = r.read(f)
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
                  x += 1
                }
                y += 1
              }
              VideoFrame(id, f, img.getWidth, img.getHeight,
                sum / (img.getWidth.toLong * img.getHeight))
            }
          } catch { case _: java.io.IOException => Seq.empty[VideoFrame] }
          finally { r.dispose(); iis.close() }
        }
      })
  }

  /** Scene-cut detection over sampled frames: a cut is a sampled frame
    * whose mean luma jumps ≥ `minDelta` from the previous SAMPLED
    * frame of the same payload — the shot-boundary heuristic a video
    * curation pipeline runs off the cheap luma pass (black-frame
    * slates and hard cuts both register; a real pipeline follows with
    * a histogram check only on the flagged boundaries). Pure
    * DataFrame work on top of [[sampleVideoFramesOn]]'s output: one
    * lag window on the (doc, frame) key the sampler already produced,
    * so the decode pass — the actual cost — is not repeated. Stride
    * coarsens boundary positions by up to stride-1 frames; that is
    * the sampling trade, documented not hidden.
    * Output: (doc_id, frame_idx, luma_delta).
    */
  def sceneCutsOn(frames: DataFrame, minDelta: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev_luma", lag(col("mean_luma"), 1).over(w))
      .filter(col("prev_luma").isNotNull &&
        abs(col("mean_luma") - col("prev_luma")) >= minDelta)
      .select(col("doc_id"), col("frame_idx"),
        (col("mean_luma") - col("prev_luma")).as("luma_delta"))
  }

  /** One extracted frame feature. */
  case class FrameFeature(doc_id: Long, frame_idx: Int, feature: Long)

  /** Frame-sampling path: each payload yields `frames` sampled frames
    * (stub: frame count derived from the payload; real impl: video
    * decode + stride sampling). Runs per-partition — one partition = one
    * decode batch, output exploded to (doc_id, frame_idx, feature) rows.
    * The feature is a deterministic fake (payload byte fold per frame).
    */
  def sampleFrames(spark: SparkSession, sfDir: String, stride: Int = 5): Dataset[FrameFeature] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val meta = decodeStub(id, bytes)
        (0 until meta.frames by stride).map { f =>
          val slice = bytes.drop(f % math.max(bytes.length, 1))
          FrameFeature(id, f, slice.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 2147483647L))
        }
      })
  }

  /** mm_meta — expression-only metadata over the binary payload (length,
    * content digest, fake thumb signature + dimensions). Fully
    * value-oracled: every component is portable (md5 of the UTF-8
    * bytes, arithmetic on the byte length).
    */
  def meta(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).as("payload_len"),
        md5(col("payload")).as("content_md5"),
        substring(md5(col("payload")), 1, 8).as("thumb_sig"),
        (lit(16) + length(col("payload")) % 64).as("width"),
        (lit(16) + (length(col("payload")) * 7) % 64).as("height"))
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }

  def metaSql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS payload_len,
      | md5(text) AS content_md5, substring(md5(text), 1, 8) AS thumb_sig,
      | CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
      | CAST(16 + (octet_length(encode(text)) * 7) % 64 AS INTEGER) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Deterministic synthesized animated GIF: one solid gray frame per
    * `lumas` entry, written through the JDK's real GIF sequence
    * encoder. Gray values survive the indexed-palette round-trip
    * exactly (a gray pixel maps to a gray palette entry), so decoded
    * mean luma equals the planted value. The codec STAND-IN the
    * container's lack of real video corpora requires — everything
    * downstream of these bytes ([[decodeVideo]],
    * [[sampleVideoFramesOn]], [[sceneCutsOn]]) is the real path.
    */
  def synthSceneGif(lumas: Seq[Int], w: Int = 16, h: Int = 16): Array[Byte] = {
    val ios = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(ios)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      lumas.foreach { l =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setSamples(0, 0, w, h, 0, Array.fill(w * h)(l))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    ios.toByteArray
  }

  /** Scene-cut luma threshold for [[videoScenes]]. */
  val SceneCutMinDelta = 64L

  /** mm_video_scenes — the video tier as a DRIVER-VISIBLE query (the
    * audio tier's [[audioFp]] counterpart): every document carries a
    * deterministic [[synthSceneGif]] payload — 6–10 frames at a
    * doc_id-derived base luma with ONE hard cut planted at a
    * doc_id-derived frame — and the REAL container-decode path
    * (javax.imageio multi-frame scan → per-frame pixel luma →
    * lag-window cut detection) profiles it back to one row per doc:
    * container frame count, sampled-frame count, detected cut count,
    * first cut position, and the cut magnitude. Codec byte recurrence
    * is not SQL-expressible, so the query is rows-only in CORRECTNESS;
    * the spec pins determinism and that every planted cut (and nothing
    * else) is recovered at its planted frame.
    *
    * Shape at scale: payload synth + decode are per-partition batch
    * work (the decode explodes frames INSIDE the partition); the only
    * shuffles are the (doc, frame)-keyed lag window and the final
    * per-doc aggregate — both on the document key, so the tier scales
    * exactly like the binary scan a real corpus would feed it.
    */
  def videoScenes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // fanOutScan: GIF sequence encode per row off a one-task scan —
    // spread the slim id frame first (guide §2.5); the cached payloads
    // then decode across all cores in BOTH downstream passes
    val gifs = graft.util.Cols.fanOutScan(
        Tables.documents(spark, sfDir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        val nFrames = 6 + (id % 5L).toInt
        val base = 40 + (id % 4L).toInt * 20
        val cutAt = 2 + (id % 3L).toInt
        (id, synthSceneGif((0 until nFrames).map(f => if (f >= cutAt) 220 else base)))
      }).toDF("doc_id", "payload")
      .transform(graft.util.CacheScope.cached) // meta scan + frame scan share the synth/decode
    val meta = decodeVideosOn(gifs).toDF()
      .select(col("doc_id"), col("frames").as("n_frames"))
    val frames = sampleVideoFramesOn(gifs, stride = 1).toDF()
      .transform(graft.util.CacheScope.cached) // sampled count + cut window
    val cuts = sceneCutsOn(frames, SceneCutMinDelta)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_cuts"), min(col("frame_idx")).as("cut_frame"),
        max(abs(col("luma_delta"))).as("max_delta"))
    meta
      .join(frames.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sampled")), Seq("doc_id"))
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        col("n_sampled").cast("int").as("n_sampled"),
        coalesce(col("n_cuts"), lit(0L)).cast("int").as("n_cuts"),
        coalesce(col("cut_frame"), lit(-1)).cast("int").as("cut_frame"),
        coalesce(col("max_delta"), lit(0L)).as("max_delta"))
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }
}
