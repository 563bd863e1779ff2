package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, plus batch "decode / feature-extract" stages.
  *
  * Two decode paths through the same MediaRow seam:
  *   - `fakeDecode`: md5-derived deterministic pseudo-features — the
  *     oracle-checkable twin (x12) standing in for codec bindings this
  *     container lacks (audio/video).
  *   - [[realDecode]] (round-8): an actual codec — `javax.imageio`
  *     PNG/BMP/JPEG decode plus the 8x8 average-hash perceptual
  *     signature, driven end-to-end by x77's encode → perturb → decode
  *     → perceptual-dedup pipeline. Proves the seam carries real
  *     bytes-to-pixels work, not just plumbing.
  * Swapping in further codecs (JNI, ONNX) touches neither the schema
  * nor the plan shape.
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
  def mediaTableFromFiles(spark: SparkSession, dir: String, glob: String = "*",
      idPattern: String = ""): DataFrame = {
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
    // doc_id: by default the xxhash64 of the path (stable, no driver-side
    // enumeration). `idPattern` (round 9) is for CURATED dumps whose file
    // names encode the document id (the common object-store layout
    // `<id>.<ext>`): a regex with one capture group parsed to a long, so
    // downstream results are content-addressable instead of
    // path-hash-addressed — which is what lets x86 put this ingest shape
    // under a DuckDB oracle (a path hash depends on the temp directory).
    // when idPattern is set, a non-matching or non-numeric filename is
    // CORRUPTION in a curated dump (regexp_extract returns "" → null
    // after the cast) — fail the scan loudly rather than let a null
    // doc_id silently drop out of every downstream join (the
    // encodeImage posture)
    val id =
      if (idPattern.isEmpty) xxhash64(col("path"))
      else {
        // test the MATCH before the cast: under ANSI (Spark 4 default)
        // casting the no-match "" would throw a generic
        // CAST_INVALID_INPUT first, hiding which file and which pattern
        val m = regexp_extract(col("path"), idPattern, 1)
        when(m === "", raise_error(concat(
          lit(s"mediaTableFromFiles: path does not match idPattern '$idPattern': "),
          col("path")))).otherwise(m.cast("long"))
      }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        id.as("doc_id"),
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

  // ---- REAL codec path (round-8): javax.imageio through the same seam ----
  //
  // `fakeDecode` was the container's stand-in for a codec binding; the
  // JDK ships real PNG/BMP/JPEG codecs in javax.imageio, so the seam no
  // longer needs to be hypothetical: [[decodeImages]] runs a real
  // bit-exact decode partition-local over the same MediaRow contract,
  // and [[aHashOf]] derives the standard 8x8 average-hash perceptual
  // signature — the media analogue of SimHash — in pure integer
  // arithmetic (no float rounding in the signature). x77 drives a real
  // encode → perturb → decode → perceptual-dedup pipeline through it;
  // MultimodalCodecSpec pins analytic signatures on constructed images.

  case class DecodedImage(doc_id: Long, media_type: String, width: Int,
      height: Int, ahash: Long, mean_lum: Double)

  /** Offset under which a rendered document's perturbed twin is id'd in
    * [[pngPairsFromDocs]] — far above any testdata doc_id, so
    * `keep_id = min(ids in cluster)` recovers the original document.
    */
  val TwinIdOffset: Long = 1000000L

  /** Integer luminance in [0, 255]: (299 r + 587 g + 114 b) / 1000 —
    * the BT.601 weights in exact integer math so the perceptual hash is
    * reproducible bit-for-bit on any JVM (no float rounding).
    */
  private def lumOf(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** 8x8 average hash + mean luminance of a decoded image. Bit (by*8+bx)
    * is set iff block (bx, by)'s mean luminance exceeds the global mean;
    * the comparison is cross-multiplied (blockSum * nTotal > totalSum *
    * nBlock) so it is exact — no division. Exactness buys a provable
    * invariance: a uniform luminance shift of +d per pixel adds
    * d*nBlock to every blockSum and d*nTotal to totalSum, and the
    * cross-multiplied inequality cancels it algebraically — which is
    * what lets x77's oracle predict perceptual clusters without DuckDB
    * decoding anything. Block bounds use floor(i*dim/8) so any
    * dimension ≥ 8 gets a full 64-bit signature.
    */
  def aHashOf(img: java.awt.image.BufferedImage): (Long, Double) = {
    val (hash, total, n) = lumHashStats(img)
    (hash, total.toDouble / n)
  }

  /** The integer core of [[aHashOf]]: (hash, total luminance, pixel
    * count) — exposed so the video path (x87) can aggregate EXACT
    * integer luminance sums across frames (a mean-of-means double would
    * put a non-power-of-two division between the engines).
    */
  def lumHashStats(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    // ONE streaming pass over pixels (round-8 advisory): the old form
    // materialized a full O(w*h) Array[Long] luminance matrix before
    // the block pass — ~400 MB of heap per 50 MP image per task on top
    // of the BufferedImage itself in a corpus-scale decode stage. The
    // block index is derivable from the coordinate: with block bounds
    // x0(b) = floor(b*w/8), pixel x belongs to the largest b with
    // floor(b*w/8) <= x, which is exactly floor((8x+7)/w) — so each
    // pixel accumulates straight into its (by,bx) cell of two 64-slot
    // arrays and nothing else is retained. Same partition of the pixel
    // grid, bit-identical hashes (MultimodalCodecSpec pins equality to
    // the naive two-pass form).
    val blockSum = new Array[Long](64)
    val blockCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = math.min(7, ((8 * y + 7) / h).toInt)
      var x = 0
      while (x < w) {
        val l = lumOf(img.getRGB(x, y))
        val bx = math.min(7, ((8 * x + 7) / w).toInt)
        blockSum(by * 8 + bx) += l
        blockCnt(by * 8 + bx) += 1
        total += l
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (blockCnt(i) > 0 && blockSum(i) * n > total * blockCnt(i)) hash |= 1L << i
      i += 1
    }
    (hash, total, n)
  }

  /** REAL decode: `javax.imageio` partition-local over the MediaRow
    * seam — same batch shape as [[fakeDecode]], real bytes-to-pixels
    * work. Undecodable payloads (no registered reader) are dropped, the
    * standard posture for a corpus-scale decode stage (a count of
    * drops, if needed, is one agg on the id anti-join).
    */
  def realDecode(rows: Iterator[MediaRow]): Iterator[DecodedImage] =
    rows.flatMap { r =>
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        .map { img =>
          val (hash, mean) = aHashOf(img)
          DecodedImage(r.doc_id, r.media_type, img.getWidth, img.getHeight, hash, mean)
        }
    }

  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(realDecode _).toDF()
  }

  /** Deterministic w×h RGB render from a 64-bit seed: `java.util.Random`
    * pixels with each channel in [0, 251) so a `brighten` of up to +4
    * never clamps at 255 — the no-clamp bound is what makes the twin's
    * luminance shift exactly uniform and hence aHash-invariant (see
    * [[aHashOf]]).
    */
  def renderImage(seed: Long, w: Int, h: Int, brighten: Int): java.awt.image.BufferedImage = {
    require(brighten >= 0 && brighten <= 4, "brighten must stay in the no-clamp bound [0, 4]")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w) {
      val r = rnd.nextInt(251) + brighten
      val g = rnd.nextInt(251) + brighten
      val b = rnd.nextInt(251) + brighten
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** Real in-JVM encode (PNG lossless by default; "bmp" also ships in
    * the JDK — MultimodalCodecSpec round-trips both).
    */
  def encodeImage(img: java.awt.image.BufferedImage, format: String = "png"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // ImageIO.write returns false when no registered writer accepts the
    // format/image type — without this check an unsupported format
    // yields a 0-byte payload that then silently DROPS at decode time
    // (the silent-fallback class the round-7/8 advisories hunted down
    // elsewhere). Fail the encode stage loudly instead.
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format' / image type ${img.getType}")
    bos.toByteArray
  }

  case class TextRow(doc_id: Long, text: String)

  /** documents → a REAL PNG media table: per doc, one image rendered
    * from the md5-of-text seed plus a +4-brightened twin under
    * `doc_id + TwinIdOffset`. The twin's PNG bytes differ (exact md5
    * dedup sees two distinct payloads) while its aHash is provably
    * identical — the planted near-duplicate that only a DECODED
    * perceptual signature can pair back up, i.e. the case x74's exact
    * byte-hash dedup structurally cannot catch. Render + encode run
    * partition-local; payloads never shuffle.
    */
  def pngPairsFromDocs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[TextRow].mapPartitions { it =>
      it.flatMap { r =>
        val d = graft.functions.Md5Kernels.digest(r.text.getBytes("UTF-8"))
        val seed = graft.functions.Md5Kernels.prefix60OfDigest(d)
        Seq(
          MediaRow(r.doc_id, "image/png", encodeImage(renderImage(seed, 32, 32, 0))),
          MediaRow(r.doc_id + TwinIdOffset, "image/png",
            encodeImage(renderImage(seed, 32, 32, 4))))
      }
    }.toDF()
  }

  /** [[pngPairsFromDocs]] as REAL FILES (round 9, x86): the same
    * original + brightened-twin PNGs written to `dir` as `<id>.png` —
    * the curated object-store layout — so
    * [[mediaTableFromFiles]]`(…, idPattern)` ingests them through
    * Spark's `binaryFile` source and the whole
    * files → decode → perceptual-cluster path runs under the oracle
    * gate. Writes happen executor-side via foreachPartition (this is
    * fixture GENERATION, not the measured operator; on a cluster the
    * dir must be a shared filesystem, which an object-store layout is
    * by definition).
    */
  def writePngPairsDir(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col("doc_id"), col("text")).as[TextRow]
      .foreachPartition { (it: Iterator[TextRow]) =>
        it.foreach { r =>
          val d = graft.functions.Md5Kernels.digest(r.text.getBytes("UTF-8"))
          val seed = graft.functions.Md5Kernels.prefix60OfDigest(d)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.doc_id}.png"),
            encodeImage(renderImage(seed, 32, 32, 0)))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.doc_id + TwinIdOffset}.png"),
            encodeImage(renderImage(seed, 32, 32, 4)))
        }
      }
  }

  /** REAL resize: nearest-neighbor downsample in explicit integer pixel
    * math (out(x,y) = in(x·W/w, y·H/h)) rather than AWT's interpolating
    * scalers — deterministic on any JVM, and a uniform luminance shift
    * of the source survives sampling untouched, so resize composes with
    * [[aHashOf]]'s shift invariance (MultimodalCodecSpec asserts both).
    */
  def resizeImage(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
    out
  }

  /** The real-codec twin of [[fakeResize]]: decode (javax.imageio) →
    * nearest-neighbor resize → lossless PNG re-encode, partition-local
    * over the same MediaRow seam. Undecodable payloads drop, the
    * [[realDecode]] posture.
    */
  def realResize(w: Int, h: Int)(rows: Iterator[MediaRow]): Iterator[MediaRow] =
    rows.flatMap { r =>
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        .map(img => MediaRow(r.doc_id, "image/png", encodeImage(resizeImage(img, w, h))))
    }

  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(realResize(w, h) _).toDF()
  }

  // ---- REAL audio path (round-8): RIFF/WAVE + javax.sound ---------------

  case class AudioFeatures(doc_id: Long, media_type: String, sample_rate: Int,
      n_samples: Long, zero_crossings: Long, peak_abs: Long, sum_abs: Long)

  /** Real RIFF/WAVE encode: 44-byte canonical PCM header + 16-bit
    * signed little-endian mono samples — the actual on-disk format, so
    * [[decodeWav]]'s `javax.sound` parse is a genuine codec round-trip,
    * not a private convention.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL audio decode through the JDK codec: `javax.sound.sampled
    * .AudioSystem` parses the container (format, rate, width,
    * endianness — the codec's job), then PCM frames stream out and the
    * features are exact integer arithmetic over the samples:
    * `zero_crossings` (strict sign flips), `peak_abs`, `sum_abs` —
    * the standard cheap audio descriptors (energy/ZCR class), chosen
    * integer-exact so x81's oracle can predict them algebraically.
    * Partition-local over the MediaRow seam; undecodable payloads drop
    * ([[realDecode]]'s posture). Supports the 16-bit PCM the WAV path
    * emits; other widths drop rather than mis-decode.
    */
  def decodeAudio(rows: Iterator[MediaRow]): Iterator[AudioFeatures] =
    rows.flatMap { r =>
      val parsed = scala.util.Try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        val bytes = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        var n = 0L; var zc = 0L; var peak = 0L; var sum = 0L
        var prev = 0
        while (bb.remaining() >= 2) {
          val s = bb.getShort.toInt
          if (n > 0 && ((s < 0 && prev >= 0) || (s >= 0 && prev < 0))) zc += 1
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          sum += a
          prev = s
          n += 1
        }
        AudioFeatures(r.doc_id, r.media_type, fmt.getSampleRate.toInt, n, zc, peak, sum)
      }
      parsed.toOption
    }

  def decodeAudioTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeAudio _).toDF()
  }

  /** Deterministic square wave: sample i = +amp if (i / halfPeriod) is
    * even else −amp — every feature of it is closed-form (flips at
    * multiples of halfPeriod → zero_crossings = ⌊(n−1)/halfPeriod⌋;
    * |s| ≡ amp → peak = amp, sum_abs = n·amp), which is exactly what
    * lets x81's DuckDB oracle predict the DECODED features from ids
    * alone, no audio stack in the oracle.
    */
  def squareWave(halfPeriod: Int, amp: Int, n: Int): Array[Short] =
    Array.tabulate(n)(i => (if ((i / halfPeriod) % 2 == 0) amp else -amp).toShort)

  case class IdRow(doc_id: Long)

  /** ids → a REAL WAV media table: per id, a square-wave tone with
    * id-derived half-period (4 + id mod 13) and amplitude (1000 +
    * 10·id), 2000 samples at 8 kHz, encoded as honest RIFF/WAVE bytes.
    * Synth + encode run partition-local; payloads never shuffle.
    */
  def wavTableFromIds(spark: SparkSession, ids: DataFrame,
      sampleRate: Int = 8000, n: Int = 2000): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[IdRow].mapPartitions { it =>
      it.map { r =>
        val half = 4 + (r.doc_id % 13).toInt
        val amp = 1000 + 10 * r.doc_id.toInt
        MediaRow(r.doc_id, "audio/wav",
          encodeWav(sampleRate, squareWave(half, amp, n)))
      }
    }.toDF()
  }

  // ---- REAL animation path (round-8): multi-frame GIF ------------------

  /** Real multi-frame (animated) GIF encode via the JDK's GIF writer
    * sequence API — an honest moving-picture container, which is what
    * lets [[decodeGifFrames]]' frame extraction be REAL codec work
    * rather than the byte-slicing stub ([[fakeFrameSample]], kept as
    * the no-codec twin). Frames should be binary/indexed images
    * (TYPE_BYTE_BINARY): GIF is palette-based, so full-RGB input would
    * be quantized by the writer while a 2-color frame round-trips
    * pixel-exact (MultimodalCodecSpec pins it).
    */
  def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** REAL frame extraction: the JDK GIF reader parses the container and
    * returns each stored frame (`getNumImages(true)` forces a full
    * scan). Raw per-frame data, not composited playback state — exactly
    * what a frame-sampling pipeline wants.
    */
  def decodeGifFrames(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map(reader.read(_))
    } finally { reader.dispose(); iis.close() }
  }

  /** A W×H binary frame whose left `whiteCols` pixel columns are white —
    * closed-form luminance (mean = 255·whiteCols/W, exact: integer sum
    * over a power-of-two pixel count), the x81 square-wave move in 2D.
    */
  def barFrame(w: Int, h: Int, whiteCols: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until whiteCols) img.setRGB(x, y, 0xFFFFFF)
    img
  }

  case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, mean_lum: Double)

  /** ids → REAL animated-GIF media table: per id, nFrames(id) =
    * 4 + id mod 5 growing-bar frames (frame f's white width =
    * (f+1)·32 / (nFrames+1), integer division) — every sampled frame's
    * decoded mean luminance is closed-form in (id, f), so x85's oracle
    * predicts REAL frame-extraction output from ids alone.
    */
  def gifTableFromIds(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[IdRow].mapPartitions { it =>
      it.map { r =>
        val n = 4 + (r.doc_id % 5).toInt
        val frames = (0 until n).map(f => barFrame(32, 32, (f + 1) * 32 / (n + 1)))
        MediaRow(r.doc_id, "image/gif", encodeGif(frames))
      }
    }.toDF()
  }

  /** REAL frame sampling through the GIF codec: decode the container,
    * keep every `stride`-th frame, one feature row per kept frame —
    * the generator/UDTF shape of [[fakeFrameSample]], now with honest
    * bytes-to-pixels work. Partition-local; payloads never shuffle.
    */
  def sampleGifFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        scala.util.Try(decodeGifFrames(r.payload)).toOption.toSeq.flatten
          .zipWithIndex.collect { case (img, i) if i % stride == 0 =>
            val (_, mean) = aHashOf(img)
            FrameFeatures(r.doc_id, i, img.getWidth, img.getHeight, mean)
          }
      }
    }.toDF()
  }

  // ---- Round 9 (x87): video-style perceptual dedup ----------------------

  /** A w×h two-gray-level indexed frame (GIF-native: the palette IS the
    * color table, so the JDK writer stores it verbatim and the reader
    * round-trips pixel-exact — MultimodalCodecSpec pins it) with a
    * seed-deterministic random bit pattern. Gray levels make luminance
    * algebra exact: lum(v,v,v) = (299+587+114)·v/1000 = v, so shifting
    * BOTH palette entries by +d shifts every pixel's luminance by
    * exactly d — the palette-domain form of [[renderImage]]'s no-clamp
    * brighten, which is what keeps [[aHashOf]] invariant on the twin.
    */
  def grayFrame(seed: Long, w: Int, h: Int, dark: Int, light: Int): java.awt.image.BufferedImage = {
    require(dark >= 0 && light <= 255 && dark < light, s"bad gray palette ($dark, $light)")
    val cm = new java.awt.image.IndexColorModel(8, 2,
      Array(dark.toByte, light.toByte),
      Array(dark.toByte, light.toByte),
      Array(dark.toByte, light.toByte))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val rnd = new java.util.Random(seed)
    val d = (dark << 16) | (dark << 8) | dark
    val l = (light << 16) | (light << 8) | light
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (rnd.nextBoolean()) l else d)
    img
  }

  /** ids → REAL animated-GIF pairs: per id an n-frame animation
    * (n = 3 + id mod 3, frame f's random pattern seeded by (id, f)) on
    * the (40, 240) gray palette, plus a +4-brightened twin under
    * `id + TwinIdOffset` on (44, 244) — SAME patterns, shifted palette.
    * The twin's GIF bytes differ (exact dedup sees 2N payloads) while
    * every frame's aHash is provably identical, so only a DECODED
    * per-frame signature can pair them — x77's planted near-duplicate,
    * upgraded from one image to a moving picture. Encode is
    * partition-local; payloads never shuffle.
    */
  def gifPairsFromIds(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[IdRow].mapPartitions { it =>
      it.flatMap { r =>
        val n = 3 + (r.doc_id % 3).toInt
        def frames(brighten: Int) = (0 until n).map(f =>
          grayFrame(r.doc_id * 131 + f, 32, 32, 40 + brighten, 240 + brighten))
        Seq(
          MediaRow(r.doc_id, "image/gif", encodeGif(frames(0))),
          MediaRow(r.doc_id + TwinIdOffset, "image/gif", encodeGif(frames(4))))
      }
    }.toDF()
  }

  case class AnimationSignature(doc_id: Long, n_frames_sampled: Int,
      sig: Long, lum_units: Long)

  /** Per-animation perceptual signature through the REAL codec: decode
    * the container (JDK GIF reader), keep every `stride`-th frame, and
    * fold the ORDERED per-frame aHashes into one 64-bit signature
    * (sig = sig·1000003 + ahash — order-sensitive, so a re-cut
    * animation signs differently) plus the exact integer luminance sum
    * over the sampled frames. All codec + hash work is partition-local;
    * only the (doc_id, sig, counters) row ever shuffles — the frame
    * pixels never do, which is the property that holds at 100 TB of
    * video.
    */
  def animationSignatures(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        scala.util.Try(decodeGifFrames(r.payload)).toOption.map { frames =>
          var sig = 0L; var lum = 0L; var k = 0
          frames.zipWithIndex.foreach { case (img, i) =>
            if (i % stride == 0) {
              val (h, total, _) = lumHashStats(img)
              sig = sig * 1000003L + h
              lum += total
              k += 1
            }
          }
          AnimationSignature(r.doc_id, k, sig, lum)
        }
      }
    }.toDF()
  }

  /** [[perceptualClusters]] for animations: group by the frame-sequence
    * signature. `lum_gap_units` is the exact INTEGER luminance-sum gap
    * inside the cluster (for an x87 twin pair: +4 per pixel × 1024
    * pixels × sampled frames — closed-form, which is what the oracle
    * predicts without decoding anything). Residual assumption, as x77:
    * no accidental 64-bit signature collision between DIFFERENT
    * animations.
    */
  def videoPerceptualClusters(spark: SparkSession, media: DataFrame, stride: Int): DataFrame =
    animationSignatures(spark, media, stride)
      .groupBy(col("sig"), col("n_frames_sampled"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"),
        (max(col("lum_units")) - min(col("lum_units"))).as("lum_gap_units"))

  /** Perceptual clusters over decoded features: group by (ahash, width,
    * height) — the decoded-signature analogue of [[dedupExact]]'s
    * byte-hash grouping. `lum_gap` = max−min mean luminance inside the
    * cluster surfaces how far apart the members' raw pixels are (0 for
    * byte-identical, the planted +4 for x77's twins — exact in IEEE:
    * integer sums divided by the power-of-two pixel count).
    */
  def perceptualClusters(decoded: DataFrame): DataFrame =
    decoded.groupBy(col("ahash"), col("width"), col("height"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"),
        (max(col("mean_lum")) - min(col("mean_lum"))).as("lum_gap"))
}
