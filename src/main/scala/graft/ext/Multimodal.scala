package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.9 X6 and the north-star brief): media as
  * opaque `binary` columns with typed metadata, processed by per-partition
  * typed transforms.
  *
  * Spark-side plumbing is real and tested — schema, partitioning, batch
  * shape, deterministic outputs. The actual codec work is STUBBED with a
  * deterministic fake (`fakeDecode`): no image/audio libraries exist in
  * this container. Swapping in a real decoder changes ONLY the body of
  * `decodeBlock` — the plan shape (mapPartitions over binary, fixed
  * feature width, metadata struct) is production-ready.
  *
  * At scale: media rows are large (MBs) — transforms run `mapPartitions`
  * so decoder state is initialized once per partition (not per row), and
  * `featurize` emits fixed-width vectors so downstream similarity/dedup
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
