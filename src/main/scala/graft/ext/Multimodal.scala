package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.9 X6 and the north-star brief): media as
  * opaque `binary` columns with typed metadata, processed by per-partition
  * typed transforms.
  *
  * Codec boundary (r7): image (PNG/GIF/JPEG) and PCM-WAV decoding are
  * REAL — the JDK's own `javax.imageio` and `javax.sound.sampled` codecs,
  * no external library — via [[decodeReal]], with the x40 declared query
  * oracle-checking decoded pixels/samples arithmetically. Only VIDEO
  * decoding remains behind the deterministic [[fakeDecode]] stub (the JDK
  * ships no video codec; that is the honest remainder of the boundary).
  * [[decode]] keeps the fake path for synthetic payloads and video rows.
  *
  * At scale: media rows are large (MBs) — transforms run `mapPartitions`
  * so decoder state is initialized once per partition (not per row), and
  * features are fixed-width vectors so downstream similarity/dedup
  * plans (Similarity/Dedup) apply unchanged to media embeddings.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
                             sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, meta: MediaMeta,
                              features: Array[Float])

  val featureDim = 64

  /** Deterministic fake "decode": derives metadata + a fixed-width
    * feature vector purely from the bytes. STUB for a real codec
    * (??? boundary — see object doc).
    */
  private[ext] def fakeDecode(row: MediaRow): DecodedRow = {
    val h = java.util.Arrays.hashCode(row.bytes)
    val meta = row.kind match {
      case "image" => MediaMeta("png", 64 + math.abs(h % 1920), 64 + math.abs(h % 1080), 0, 0L)
      case "audio" => MediaMeta("wav", 0, 0, 16000, math.abs(h % 600000L))
      case _       => MediaMeta("mp4", 640, 480, 44100, math.abs(h % 3600000L))
    }
    val rnd = new scala.util.Random(h.toLong ^ row.media_id)
    DecodedRow(row.media_id, row.kind, meta,
      Array.fill(featureDim)(rnd.nextFloat()))
  }

  /** Decode/feature-extract: one decoder init per partition, streaming
    * through rows (never materializes a partition in memory).
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, once per partition
      rows.map(fakeDecode)
    }
  }

  /** REAL pixel/sample decode (r7) for the formats the JDK itself ships
    * codecs for — `javax.imageio` (PNG/GIF/JPEG/BMP) and
    * `javax.sound.sampled` (PCM WAV): no external library, so this part
    * of the X6 codec boundary is no longer stubbed. Only video remains
    * behind [[fakeDecode]] (the JDK has no video codec — that stub is
    * the honest remainder).
    *
    * Features (deterministic, fixed [[featureDim]] width so downstream
    * similarity/dedup plans apply unchanged):
    *  - images: an 8×8 luminance SAMPLE grid — feature(gy*8+gx) =
    *    (r+g+b)/765 of the pixel at (floor(gx*w/8), floor(gy*h/8)),
    *    clamped in-bounds, so any image ≥ 1×1 yields a total,
    *    allocation-bounded vector (cell MEANS would leave empty cells on
    *    images narrower than the grid);
    *  - audio: 64 time-bin amplitude samples — |pcm16|/32768 at
    *    bin-start frames, first channel.
    * Undecodable/unsupported bytes quarantine to None (same contract as
    * [[probe]]: corrupt media must never crash the scan).
    *
    * Scale: mapPartitions with one-time per-partition init
    * (`ImageIO.setUseCache(false)` — keeps the JDK decoder off
    * executor-local disk cache files); only header + decoded raster of
    * ONE row is resident at a time.
    */
  private[ext] def realDecodeOne(row: MediaRow): Option[DecodedRow] = {
    val probed = graft.functions.MediaProbe.compute(row.bytes)
    if (probed == null) return None
    val fmt = probed.getUTF8String(0).toString
    try fmt match {
      case "png" | "gif" | "jpeg" =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.bytes))
        if (img == null) return None
        val (w, h) = (img.getWidth, img.getHeight)
        val feats = Array.tabulate(featureDim) { i =>
          val gx = i % 8; val gy = i / 8
          val px = math.min(w - 1, gx * w / 8)
          val py = math.min(h - 1, gy * h / 8)
          val rgb = img.getRGB(px, py)
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 765.0f
        }
        Some(DecodedRow(row.media_id, row.kind,
          MediaMeta(fmt, w, h, 0, 0L), feats))
      case "wav" =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.bytes))
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian) return None
        val pcm = ais.readAllBytes()
        val frameSize = f.getFrameSize
        val nFrames = if (frameSize > 0) pcm.length / frameSize else 0
        if (nFrames == 0) return None
        val feats = Array.tabulate(featureDim) { i =>
          // long arithmetic: i * nFrames wraps Int for WAVs past ~34M
          // frames (~13 min of 44.1 kHz mono), which would negative-index
          // pcm and silently quarantine a perfectly valid file
          val frame = math.min(nFrames - 1L, i.toLong * nFrames / featureDim).toInt
          val off = frame * frameSize // first channel's 16-bit LE sample
          val s = ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort
          math.abs(s.toInt) / 32768.0f
        }
        val durMs = nFrames * 1000L / f.getSampleRate.toLong
        Some(DecodedRow(row.media_id, row.kind,
          MediaMeta(fmt, 0, 0, f.getSampleRate.toInt, durMs), feats))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[realDecodeOne]] over a Dataset — undecodable rows are dropped
    * (quarantine); count the input/output delta for the audit metric.
    */
  def decodeReal(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      rows.flatMap(realDecodeOne)
    }
  }

  /** Frame-sample a "video": emit every nth chunk of the payload as a
    * frame row (stub chunking; a real impl samples decoded frames).
    */
  def frameSample(media: Dataset[MediaRow], everyNth: Int,
                  frameBytes: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      row.bytes.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (chunk, i) => (row.media_id, i, chunk) }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** REAL (non-stub) header probe: container format + pixel dimensions
    * + audio parameters parsed from the binary payload's magic bytes and
    * header fields (PNG IHDR / JPEG SOFn / GIF screen descriptor / WAV
    * fmt chunk) — see [[graft.functions.MediaProbe]]. Needs no codec, so
    * this part of the X6 decode boundary is NOT stubbed: format sniffing
    * and container metadata are production-real; only pixel/sample
    * DECODING remains behind [[fakeDecode]]. Null for
    * unrecognized/malformed headers (quarantine filter, not a crash).
    */
  def probe(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.MediaProbe.mediaProbe(bytes)

  /** Driver-side fixture encoders (JDK codecs) — used by the x40 oracle
    * query and specs to build small real media blobs with KNOWN content,
    * so decoded pixels/samples can be checked against arithmetic.
    */
  def encodeSolidImage(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Gradient fixture image: grayscale pixel v(x,y) = ((a·x + b·y) mod
    * 150) + c at every (x,y), written r=g=b=v through a LOSSLESS JDK
    * codec (png/gif/bmp — NOT jpeg), so decoded pixels replay the
    * closed-form formula exactly. The mod-150 + offset keeps v < 256 for
    * any c ≤ 105 — no wraparound from the brightness term, which is what
    * makes two images differing ONLY in `c` perceptual twins: every
    * horizontal pixel difference is identical, so their [[dHash56]]
    * collides by construction while their bytes (and sha2) differ.
    */
  def encodeGradientImage(fmt: String, w: Int, h: Int,
                          a: Int, b: Int, c: Int): Array[Byte] = {
    require(c >= 0 && c <= 105, s"brightness offset must be in [0,105]: $c")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((a * x + b * y) % 150 + 150) % 150 + c
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** X6c: 56-bit difference hash (dHash family) over the decoder's 8×8
    * luminance sample grid: bit (gy·7 + gx) is set iff
    * grid(gx+1, gy) > grid(gx, gy) — 7 horizontal comparisons per row ×
    * 8 rows. Brightness-INVARIANT (a constant luminance shift cancels in
    * every comparison) and exactly replayable from pixel arithmetic: the
    * grid values are (r+g+b)/765 at sampled points, and x/765 is
    * strictly monotone over the 766 possible integer sums, so the float
    * comparisons equal the integer pixel-sum comparisons an oracle
    * computes.
    */
  def dHash56(features: Array[Float]): Long = {
    var h = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 7) {
        if (features(gy * 8 + gx + 1) > features(gy * 8 + gx))
          h |= 1L << (gy * 7 + gx)
        gx += 1
      }
      gy += 1
    }
    h
  }

  /** X6c: perceptual image dedup — group REAL-decoded images by
    * [[dHash56]]: images whose sampled luminance STRUCTURE matches land
    * in one group even when their bytes differ (brightness shifts,
    * re-encodes), which exact sha2 dedup can never see. One row per
    * fingerprint: (dhash, n_images, min_id, ids_md5) where ids_md5 seals
    * the group membership.
    *
    * Scale: decode + hash are map-only (one JDK decoder init per
    * partition, one 64-float grid per row — the raster never shuffles);
    * the only exchange is the partial-agg'd groupBy on the 8-byte
    * fingerprint. Hamming-tolerant matching (d > 0) composes with the
    * X2b SimHash band machinery over the same fingerprint column.
    */
  def perceptualGroups(decoded: Dataset[DecodedRow]): DataFrame =
    fingerprintGroups(decoded, dHash56, "dhash")

  /** X6d: 63-bit difference hash over the decoder's 64 time-bin
    * amplitude samples — bit i is set iff bin(i+1) > bin(i). The bins
    * are |pcm|/32768, and |k·s| = k·|s| for any positive gain k, so the
    * fingerprint is VOLUME-invariant: a re-mastered (gain-scaled) clip
    * collides with its original while its bytes (and sha2) differ —
    * the audio sibling of [[dHash56]].
    */
  def dHash63(features: Array[Float]): Long = {
    var h = 0L
    var i = 0
    while (i < 63) {
      if (features(i + 1) > features(i)) h |= 1L << i
      i += 1
    }
    h
  }

  /** Group decoded media rows by a feature fingerprint — the shared
    * tail of [[perceptualGroups]] (images, [[dHash56]]) and
    * [[audioGroups]] (clips, [[dHash63]]): map-only hashing, one
    * partial-agg'd exchange of 8-byte fingerprints, sealed membership
    * md5 per group.
    */
  def fingerprintGroups(decoded: Dataset[DecodedRow],
                        hashFn: Array[Float] => Long,
                        hashCol: String): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded
      .map(r => (r.media_id, hashFn(r.features)))
      .toDF("media_id", hashCol)
      .groupBy(hashCol)
      .agg(count(lit(1)).as("n_" + (if (hashCol == "ahash") "clips" else "images")),
        min("media_id").as("min_id"),
        md5(concat_ws(" ",
          sort_array(collect_list(col("media_id"))).cast("array<string>")))
          .as("ids_md5"))
      .orderBy(hashCol)
  }

  /** X6d: volume-invariant audio dedup — group REAL-decoded clips by
    * [[dHash63]]. Same scale shape as [[perceptualGroups]]: decode +
    * hash map-only, fingerprint exchange only.
    */
  def audioGroups(decoded: Dataset[DecodedRow]): DataFrame =
    fingerprintGroups(decoded, dHash63, "ahash")

  /** Sawtooth fixture WAV: mono 16-bit LE PCM, sample(i) =
    * (((a·i) mod 200) − 100) · scale — a closed-form waveform (lossless
    * PCM, so decoded samples replay the formula exactly). Two clips with
    * the same `a` and different `scale` are volume twins: every
    * amplitude comparison is identical, so their [[dHash63]] collides
    * while their bytes differ. `scale` ≤ 327 keeps samples in int16.
    */
  def encodeRampWav(rate: Int, nFrames: Int, a: Int, scale: Int): Array[Byte] = {
    require(scale > 0 && scale <= 327, s"scale must be in [1,327]: $scale")
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = (((a * i) % 200) - 100) * scale
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Mono 16-bit LE PCM WAV with every sample = `value`. */
  def encodeConstWav(rate: Int, nFrames: Int, value: Short): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      pcm(2 * i) = (value & 0xff).toByte
      pcm(2 * i + 1) = ((value >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Build a deterministic synthetic media table (binary payloads derived
    * from the seeded generator) — stands in for a real media source.
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L,
                     numPartitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    import graft.gen.Fake
    spark.range(0L, n, 1L, numPartitions)
      .select(col("id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
        unbase64(Fake.payloadBase64(seed, col("id"), 512)).as("bytes"))
      .as[MediaRow]
  }

  /** Average-pool "resize" of a feature vector to `outDim` (outDim must
    * divide the input width). Real arithmetic — works unchanged when the
    * fake decoder is swapped for a real one.
    */
  def resize(decoded: Dataset[DecodedRow], outDim: Int): Dataset[DecodedRow] = {
    import decoded.sparkSession.implicits._
    require(featureDim % outDim == 0, s"$outDim must divide $featureDim")
    val window = featureDim / outDim
    decoded.map { r =>
      r.copy(features = r.features.grouped(window)
        .map(g => g.sum / g.length).toArray)
    }
  }

  /** Content-hash + metadata summary over a decoded media set — the
    * dedup/inventory query a media pipeline runs first.
    */
  def inventory(decoded: Dataset[DecodedRow]): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("meta.format")).as("n_formats"),
        round(avg(col("meta.durationMs")), 2).as("avg_duration_ms"))
  }
}
