package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column support: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode/feature-extract
  * plumbing (BASELINE.json north-star "multimodal columns").
  *
  * The decode step dispatches on the payload's own magic bytes
  * ([[MediaCodecs.sniff]]): RIFF/WAVE PCM audio, binary Netpbm (P5/P6)
  * stills, and the JDK-decodable compressed stills (PNG/JPEG/GIF/BMP
  * via `javax.imageio.ImageIO` — pure JDK, headless-safe) decode FOR
  * REAL ([[MediaCodecs]]). Only formats that genuinely require codecs
  * absent from the JDK — compressed audio (MP3/FLAC) and video
  * (MP4/AVI/MKV/WebM) — fall through to the deterministic
  * byte-statistics stub ([[Multimodal.fakeFeature]]) behind the same
  * Spark pipeline: the schema, the partition-preserving flatMap batch
  * shape, and the per-frame output layout are exactly what a
  * JNI/FFmpeg decoder slots into — add the codec branch and nothing
  * else changes. Blobs in the gated d11 are derived from
  * `documents.text` (UTF-8 bytes) since the test tables carry no real
  * media; at 100 TB the binary column arrives from parquet the same
  * way.
  *
  * Scale notes: frames explode rows ~byte_len/FrameBytes ×, so the decode
  * stage must run AFTER any filtering/dedup (cheapest-first), and
  * `spark.sql.files.maxPartitionBytes` bounds the blob bytes per task —
  * the flatMap is partition-local and spill-free.
  */
object Multimodal {

  /** One media blob: id + modality tag + opaque payload. */
  final case class MediaBlob(doc_id: Long, modality: String, data: Array[Byte])

  /** One decoded "frame": fixed-width feature vector per frame. */
  final case class Frame(doc_id: Long, frame_idx: Int, feature: Array[Float])

  val FrameBytes = 256
  val FeatureDim = 8

  /** STUB DECODER — deterministic fake standing in for the kernels
    * that need codec libraries the JDK lacks (compressed audio
    * MP3/FLAC and video MP4/AVI/…). Produces an 8-float feature from
    * byte statistics of one frame-sized chunk. Stills and PCM audio do
    * NOT hit this path — [[MediaCodecs]] decodes WAV/PCM, Netpbm, and
    * PNG/JPEG/GIF/BMP for real; add further codec branches at the
    * dispatch in [[decodeFrames]]. */
  def fakeFeature(chunk: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < chunk.length) {
      f(i % FeatureDim) += (chunk(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Frame-sample + decode, dispatched on the payload's magic bytes:
    * WAV/PCM → tumbling ~23 ms windows of short-time audio features;
    * stills (Netpbm/PNG/JPEG/GIF/BMP) → one frame of luminance
    * statistics; anything else (non-JDK codecs) → byte-statistics stub
    * over FrameBytes chunks. Partition-local (no shuffle), streaming
    * over the iterator — the batch shape a vectorized decoder needs.
    * Malformed payloads of a recognized container (truncated header,
    * non-PCM encoding) fall back to the stub rather than failing the
    * task: ingest jobs meet corrupt media as a matter of course, and a
    * poison blob must cost one bad row, not the stage. */
  def decodeFrames(blobs: Dataset[MediaBlob]): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { m =>
        val real: Option[Iterator[Array[Float]]] = MediaCodecs.sniff(m.data) match {
          case Some("audio") => MediaCodecs.decodeWav(m.data).map(MediaCodecs.wavFrames)
          case Some("image") =>
            MediaCodecs.decodeImage(m.data)
              .map(r => Iterator.single(MediaCodecs.imageFeature(r)))
          case _ => None
        }
        val frames = real.getOrElse(
          m.data.grouped(FrameBytes).map(fakeFeature))
        frames.zipWithIndex.map { case (f, idx) => Frame(m.doc_id, idx, f) }
      }
    }
  }

  /** Blob source from REAL files: Spark's `binaryFile` format over a
    * directory tree — the actual ingest path for media at scale (each
    * file is one row; `spark.sql.files.maxPartitionBytes` and the
    * format's own file listing parallelize the scan). doc_id parses from
    * the numeric file stem, modality from the extension; everything
    * downstream ([[decodeFrames]], the [[d11MultimodalMeta]] shape) is
    * source-agnostic, so swapping the derived-from-text stand-in
    * ([[blobs]]) for this source changes no pipeline code. */
  def blobsFromDir(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val stem = regexp_extract(col("path"), "([0-9]+)\\.[A-Za-z0-9]+$", 1)
    spark.read.format("binaryFile").load(dir)
      // naming contract is <numeric id>.<ext>; a missing stem OR a
      // Long-overflowing one (19+ digits) would otherwise die opaquely —
      // under ANSI mode (Spark 4 default) a plain cast THROWS on
      // overflow rather than yielding null, so try_cast both the guard
      // and the projection and drop the nulls here
      .filter(stem =!= "" && stem.try_cast("long").isNotNull)
      .select(
        stem.try_cast("long").as("doc_id"),
        when(ext.isin("jpg", "jpeg", "png", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac"), "audio")
          .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
          .otherwise("binary").as("modality"),
        col("content").as("data"))
      .as[MediaBlob]
  }

  /** documents → MediaBlob dataset (UTF-8 payload, modality fanned out
    * deterministically from doc_id — stand-in for a real media table). */
  def blobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("modality"),
        encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
  }

  // --------------------------------------------------------------- d11
  /** Binary-column metadata pass (driver-gated): payload byte length,
    * modality tag, header fingerprint (md5 of the first 64 BYTES of the
    * blob — real binary ops: encode → binary substring → md5), and the
    * frame count the decoder would emit. Narrow map stage; the oracle
    * exploits that the payloads are ASCII so byte ops == char ops. */
  def d11MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val blob = encode(col("text"), "UTF-8")
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(blob).as("byte_len"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("modality"),
        md5(substring(blob, 1, 64)).as("header_fp"),
        ceil(length(blob).cast("double") / FrameBytes).cast("long").as("n_frames"))
      .orderBy("doc_id")
  }

  val d11Oracle: String =
    s"""SELECT doc_id,
       length(text) AS byte_len,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
         AS modality,
       md5(substr(text, 1, 64)) AS header_fp,
       CAST(ceil(length(text) / $FrameBytes.0) AS BIGINT) AS n_frames
       FROM documents ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d11_multimodal_meta" -> (d11MultimodalMeta _)
  )

  val oracles: Map[String, String] = Map(
    "d11_multimodal_meta" -> d11Oracle
  )
}
