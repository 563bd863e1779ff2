package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, plus batch "decode / feature-extract" stages.
  *
  * The decode itself is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-features from
  * the raw bytes so the Spark-side contract — schema, Dataset encoders,
  * partition-local batch processing via `mapPartitions`, feature vector
  * shape — is real and testable. Swap `fakeDecode` for a real codec
  * binding (e.g. JNI or an ONNX runtime) without touching the plan shape.
  *
  * Scale posture: payloads never pass through a shuffle here; decode is
  * partition-local, and downstream joins carry only (id, features).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      head_hash: Long, features: Array[Double])

  /** Wrap a text corpus as a media table: payload = UTF-8 bytes, typed
    * metadata columns. Stands in for an image/audio table whose bytes
    * arrived from object storage.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Real-file ingestion into the same media-table schema: a directory of
    * media files read through Spark's `binaryFile` source (one row per
    * file: path, modificationTime, length, content). doc_id is the
    * xxhash64 of the file path (stable across re-reads, no driver-side
    * enumeration), media_type is derived from the extension, payload is
    * the raw bytes. Every downstream stage ([[extractFeatures]],
    * [[resize]], [[frameSample]]) runs unchanged on this frame — the
    * decode stub is the ONLY fake part; the ingest plumbing is the real
    * path a 100 TB object-store image corpus would take (binaryFile
    * splits by file, so partition-local decode parallelizes per file
    * with payloads never entering a shuffle).
    */
  def mediaTableFromFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    // extension → content-type class; unknown/missing extensions get the
    // opaque-bytes type instead of a fabricated image/* subtype, so a
    // downstream media_type dispatch never misroutes non-image payloads
    val mediaType =
      when(ext.isin("png", "jpg", "jpeg", "gif", "bmp", "webp", "tiff"),
        concat(lit("image/"), ext))
        .when(ext.isin("wav", "mp3", "flac", "ogg", "aac"), concat(lit("audio/"), ext))
        .when(ext.isin("mp4", "mkv", "webm", "avi", "mov"), concat(lit("video/"), ext))
        .when(ext === "txt", lit("text/plain"))
        .otherwise(lit("application/octet-stream"))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        mediaType.as("media_type"),
        col("content").as("payload"))
  }

  /** STUB decode: deterministic fake feature extraction derived from the
    * payload's md5 digest — `head_hash` is the first 60 bits of the
    * digest (the same portable-hash convention as
    * [[graft.ext.TextDedup.portableHash]]), and feature i is hex chars
    * [8i, 8i+8) scaled by 2^-32 into [0, 1). md5-derived (round-2) so
    * the whole stub is reproducible in any engine with md5 — which is
    * what lets x12 carry a DuckDB oracle; division by 2^32 is exact in
    * IEEE double, so the features are bit-identical cross-engine.
    * Replaces a real decode/resize/frame-sample kernel; batch shape
    * (Iterator per partition, one digest instance per batch) matches
    * what a vectorized codec binding needs.
    */
  def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      // one digest per payload, shared bit-math helpers from Md5Kernels —
      // a single implementation of the portable 60-bit/word32 convention
      // (no hex render/reparse; round-2 review finding)
      val d = graft.functions.Md5Kernels.digest(r.payload)
      val headHash = graft.functions.Md5Kernels.prefix60OfDigest(d)
      val features = Array.tabulate(4)(i =>
        graft.functions.Md5Kernels.word32OfDigest(d, i).toDouble / 4294967296.0)
      MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, headHash, features)
    }

  /** media table → features table, decode running partition-local. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(fakeDecode _).toDF()
  }

  /** STUB resize: a real implementation decodes, scales to (w, h) and
    * re-encodes; the stub deterministically truncates/pads the payload to
    * w*h bytes so downstream schema and sizing logic are exercised.
    */
  def fakeResize(w: Int, h: Int)(rows: Iterator[MediaRow]): Iterator[MediaRow] =
    rows.map { r =>
      val target = w * h
      val out = java.util.Arrays.copyOf(r.payload, target)
      MediaRow(r.doc_id, r.media_type, out)
    }

  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(fakeResize(w, h) _).toDF()
  }

  /** STUB frame sampling: a real implementation demuxes video and emits
    * every `stride`-th frame; the stub slices the payload into fixed-size
    * pseudo-frames and keeps every `stride`-th — one input row fanning
    * out to N frame rows (the generator/UDTF shape).
    */
  case class Frame(doc_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  def fakeFrameSample(frameSize: Int, stride: Int)(rows: Iterator[MediaRow]): Iterator[Frame] =
    rows.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(r.doc_id, i, bytes)
      }
    }

  /** Exact media dedup by payload content hash — the storage-dedup
    * accounting every large media corpus runs first (identical bytes
    * under different paths/ids are the dominant waste): one hash
    * aggregate on md5(payload) with map-side partials; payloads
    * themselves never shuffle (only the 16-byte hash and the byte
    * count do). Per distinct payload: copy count, the min-id keeper,
    * and the bytes deduplication reclaims. Near-dup (perceptual) media
    * dedup would swap the hash for a decoded-feature signature through
    * the same dataflow — the decode stub is [[fakeDecode]]'s seam.
    * Output: `payload_hash, n_bytes, n_copies, keep_id, bytes_saved`.
    */
  def dedupExact(media: DataFrame): DataFrame =
    media.select(col("doc_id"), md5(col("payload")).as("payload_hash"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("payload_hash"), col("n_bytes"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"),
        ((count(lit(1)) - lit(1L)) * col("n_bytes")).as("bytes_saved"))

  def frameSample(spark: SparkSession, media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(fakeFrameSample(frameSize, stride) _).toDF()
  }
}
