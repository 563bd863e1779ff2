package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Round-8: the REAL codec path through the media seam — javax.imageio
  * encode/decode round-trips, the analytic 8x8 average-hash contract,
  * and the planted-twin perceptual-dedup pipeline x77 registers.
  */
class MultimodalCodecSpec extends SparkSuite {
  import spark.implicits._

  private def halfImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    // left half black, right half white → analytic aHash: block mean
    // exceeds the global mean exactly for blocks bx >= 4, i.e. bits
    // 4..7 of every row byte → 0xF0F0F0F0F0F0F0F0
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    img
  }

  test("aHash matches the analytic signature on a constructed image") {
    val (hash, mean) = Multimodal.aHashOf(halfImage(32, 32))
    assert(hash == 0xF0F0F0F0F0F0F0F0L,
      f"aHash 0x$hash%016x != analytic 0xF0F0F0F0F0F0F0F0")
    assert(mean == 127.5, s"mean luminance $mean != 127.5")
  }

  test("real PNG and BMP codecs round-trip pixels and signatures exactly") {
    for (fmt <- Seq("png", "bmp")) {
      val src = Multimodal.renderImage(seed = 12345L, w = 32, h = 32, brighten = 0)
      val bytes = Multimodal.encodeImage(src, fmt)
      assert(bytes.length > 100, s"$fmt encode produced ${bytes.length} bytes")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(back.getWidth == 32 && back.getHeight == 32)
      // lossless: every pixel identical, hence identical signature
      for (y <- 0 until 32; x <- 0 until 32)
        assert((back.getRGB(x, y) & 0xFFFFFF) == (src.getRGB(x, y) & 0xFFFFFF),
          s"$fmt pixel ($x,$y) changed in round-trip")
      assert(Multimodal.aHashOf(back) == Multimodal.aHashOf(src))
    }
  }

  test("uniform luminance shift preserves aHash and moves the mean by exactly +4") {
    for (seed <- 1L to 5L) {
      val a = Multimodal.aHashOf(Multimodal.renderImage(seed, 32, 32, 0))
      val b = Multimodal.aHashOf(Multimodal.renderImage(seed, 32, 32, 4))
      assert(a._1 == b._1, s"seed $seed: aHash not invariant under +4 shift")
      assert(b._2 - a._2 == 4.0, s"seed $seed: mean gap ${b._2 - a._2} != 4.0")
    }
  }

  test("undecodable payloads drop from realDecode instead of failing the stage") {
    val rows = Iterator(
      Multimodal.MediaRow(1L, "image/png",
        Multimodal.encodeImage(halfImage(16, 16))),
      Multimodal.MediaRow(2L, "application/octet-stream",
        "not an image at all".getBytes("UTF-8")))
    val out = Multimodal.realDecode(rows).toSeq
    assert(out.map(_.doc_id) == Seq(1L))
    assert(out.head.width == 16 && out.head.height == 16)
  }

  test("real resize: exact nearest-neighbor sampling; composes with the shift invariance") {
    val src = Multimodal.renderImage(seed = 777L, w = 32, h = 32, brighten = 0)
    val small = Multimodal.resizeImage(src, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(small.getRGB(x, y) == src.getRGB(x * 4, y * 4),
        s"resized pixel ($x,$y) is not the analytic source sample")

    // the full decode→resize→re-encode stage through the Spark seam,
    // and resize preserves aHash equality of a brightness-twin pair
    // (sampling a uniformly-shifted image is a uniform shift of the
    // samples — the x77 invariance survives the thumbnail stage)
    val media = spark.createDataFrame(Seq(
      (1L, "image/png", Multimodal.encodeImage(src)),
      (2L, "image/png",
        Multimodal.encodeImage(Multimodal.renderImage(777L, 32, 32, 4)))))
      .toDF("doc_id", "media_type", "payload")
    val thumbs = Multimodal.decodeImages(spark,
      Multimodal.resizeImages(spark, media, 8, 8))
      .select($"doc_id", $"width", $"height", $"ahash", $"mean_lum")
      .as[(Long, Int, Int, Long, Double)].collect().sortBy(_._1)
    assert(thumbs.map(t => (t._2, t._3)).toSeq == Seq((8, 8), (8, 8)))
    assert(thumbs(0)._4 == thumbs(1)._4, "thumbnail aHash lost the shift invariance")
    assert(thumbs(1)._5 - thumbs(0)._5 == 4.0, "thumbnail mean gap must stay exactly 4")
  }

  test("real WAV codec: RIFF encode round-trips through javax.sound with analytic features") {
    // half-period 5, amp 1200, 100 samples: flips at 5,10,...,95 → 19;
    // |s| ≡ 1200 → peak 1200, sum 120000
    val wav = Multimodal.encodeWav(8000, Multimodal.squareWave(5, 1200, 100))
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "not a real RIFF/WAVE container")
    val out = Multimodal.decodeAudio(Iterator(
      Multimodal.MediaRow(5L, "audio/wav", wav),
      Multimodal.MediaRow(6L, "application/octet-stream",
        "definitely not audio".getBytes("UTF-8")))).toSeq
    assert(out.map(_.doc_id) == Seq(5L), "undecodable payloads must drop")
    val f = out.head
    assert((f.sample_rate, f.n_samples, f.zero_crossings, f.peak_abs, f.sum_abs) ==
      ((8000, 100L, 19L, 1200L, 120000L)))
  }

  test("real animated-GIF codec: frame sequence round-trips pixel-exact through javax.imageio") {
    val frames = Seq(Multimodal.barFrame(32, 32, 8), Multimodal.barFrame(32, 32, 16),
      Multimodal.barFrame(32, 32, 24))
    val gif = Multimodal.encodeGif(frames)
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"), "not a real GIF container")
    val back = Multimodal.decodeGifFrames(gif)
    assert(back.size == 3, s"expected 3 stored frames, decoded ${back.size}")
    for ((f, i) <- back.zipWithIndex; y <- 0 until 32; x <- 0 until 32)
      assert((f.getRGB(x, y) & 0xFFFFFF) == (frames(i).getRGB(x, y) & 0xFFFFFF),
        s"frame $i pixel ($x,$y) changed in round-trip")
    // closed-form decoded luminance: mean = 255*whiteCols/32
    assert(back.map(f => Multimodal.aHashOf(f)._2) ==
      Seq(255.0 * 8 / 32, 255.0 * 16 / 32, 255.0 * 24 / 32))
  }

  test("sampleGifFrames: real frame extraction keeps every stride-th frame with analytic features") {
    val ids = Seq(0L, 1L, 4L).toDF("doc_id") // nFrames = 4, 5, 8
    val media = Multimodal.gifTableFromIds(spark, ids)
    val got = Multimodal.sampleGifFrames(spark, media, stride = 2)
      .select($"doc_id", $"frame_idx", $"width", $"height", $"mean_lum")
      .as[(Long, Int, Int, Int, Double)].collect().toSet
    def expect(id: Long): Set[(Long, Int, Int, Int, Double)] = {
      val n = 4 + (id % 5).toInt
      (0 until n by 2).map { f =>
        val w = (f + 1) * 32 / (n + 1)
        (id, f, 32, 32, 255.0 * w * 32 / 1024)
      }.toSet
    }
    assert(got == expect(0L) ++ expect(1L) ++ expect(4L), s"got $got")
  }

  test("streaming one-pass aHash equals the naive two-pass form on awkward dimensions") {
    // round-9: aHashOf was rewritten from materialize-the-luminance-
    // matrix to a single streaming pass with the block index derived
    // per-pixel (bx = floor((8x+7)/w)). This pins the derivation: the
    // naive form below partitions via the ORIGINAL bound arithmetic
    // x0(b) = floor(b*w/8), so any off-by-one in the inverse mapping
    // shows up as a differing bit. Dimensions chosen to exercise
    // non-divisible-by-8, degenerate (<8), and prime sizes.
    def naive(img: java.awt.image.BufferedImage): (Long, Double) = {
      val w = img.getWidth; val h = img.getHeight
      def lum(x: Int, y: Int): Long = {
        val rgb = img.getRGB(x, y)
        (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)) / 1000L
      }
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) total += lum(x, y)
      val n = w.toLong * h
      var hash = 0L
      for (by <- 0 until 8; bx <- 0 until 8) {
        val (x0, x1) = (bx * w / 8, (bx + 1) * w / 8)
        val (y0, y1) = (by * h / 8, (by + 1) * h / 8)
        var s = 0L; var cnt = 0L
        for (yy <- y0 until y1; xx <- x0 until x1) { s += lum(xx, yy); cnt += 1 }
        if (cnt > 0 && s * n > total * cnt) hash |= 1L << (by * 8 + bx)
      }
      (hash, total.toDouble / n)
    }
    for ((w, h) <- Seq((32, 32), (33, 17), (8, 8), (9, 8), (5, 40), (3, 3), (64, 7), (13, 29))) {
      val img = Multimodal.renderImage(seed = 1000L * w + h, w = w, h = h, brighten = 0)
      assert(Multimodal.aHashOf(img) == naive(img), s"mismatch at ${w}x$h")
    }
  }

  test("gray-palette GIF round-trips pixel-exact; palette brighten preserves per-frame aHash") {
    // x87's oracle rests on two codec facts: (1) a TYPE_BYTE_INDEXED
    // frame's 2-entry gray palette survives GIF encode/decode verbatim
    // (the palette IS the color table), (2) shifting both palette
    // entries by +4 shifts every pixel's luminance by exactly 4
    // (lum(v,v,v) = v), so the cross-multiplied aHash is invariant and
    // the frame's integer luminance total moves by exactly 4·w·h.
    val orig = Multimodal.grayFrame(seed = 42L, 32, 32, dark = 40, light = 240)
    val twin = Multimodal.grayFrame(seed = 42L, 32, 32, dark = 44, light = 244)
    val decoded = Multimodal.decodeGifFrames(Multimodal.encodeGif(Seq(orig, twin)))
    assert(decoded.size == 2)
    for ((a, b) <- Seq((orig, decoded(0)), (twin, decoded(1))); y <- 0 until 32; x <- 0 until 32)
      assert((a.getRGB(x, y) & 0xFFFFFF) == (b.getRGB(x, y) & 0xFFFFFF),
        s"palette pixel ($x,$y) did not round-trip")
    val (h0, t0, n0) = Multimodal.lumHashStats(decoded(0))
    val (h1, t1, n1) = Multimodal.lumHashStats(decoded(1))
    assert(h0 == h1, "palette brighten must not change the aHash")
    assert(n0 == 1024L && t1 - t0 == 4L * 1024L, s"exact +4/pixel shift, got ${t1 - t0}")
  }

  test("x87 pipeline: animation signatures pair each id with its palette-brightened twin") {
    val ids = Seq(0L, 1L, 2L, 5L).toDF("doc_id")
    val media = Multimodal.gifPairsFromIds(spark, ids)
    assert(media.count() == 8)
    // exact byte dedup cannot pair them: all 8 payloads distinct
    assert(Multimodal.dedupExact(media).count() == 8)
    val clusters = Multimodal.videoPerceptualClusters(spark, media, stride = 2)
      .select($"keep_id", $"n_copies", $"n_frames_sampled", $"lum_gap_units")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1)
    // n = 3 + id%3 frames, stride 2 => ceil(n/2) sampled; lum gap
    // 4/pixel x 1024 pixels x sampled frames
    def expected(id: Long) = {
      val sampled = (3 + id % 3 + 1).toInt / 2
      (id, 2L, sampled, 4096L * sampled)
    }
    assert(clusters.toSeq == Seq(0L, 1L, 2L, 5L).map(expected))
  }

  test("animation signatures: brighten-invariant on random content, order-SENSITIVE on re-cuts") {
    // the two properties x87's oracle stands on, checked beyond the
    // fixed fixture: (1) for RANDOM patterns/frame counts, a uniform
    // palette brighten never changes the folded signature; (2) the fold
    // is order-sensitive — a re-cut (permuted frames) animation signs
    // differently, which is what makes the signature a sequence
    // identity rather than a bag of frames.
    val rnd = new scala.util.Random(2024)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(5)
      val seeds = Array.fill(n)(rnd.nextLong())
      def gif(brighten: Int, order: Seq[Int]) = Multimodal.encodeGif(
        order.map(f => Multimodal.grayFrame(seeds(f), 32, 32, 40 + brighten, 240 + brighten)))
      def sig(payload: Array[Byte]): (Long, Int) = {
        var s = 0L; var k = 0
        Multimodal.decodeGifFrames(payload).zipWithIndex.foreach { case (img, i) =>
          if (i % 2 == 0) { val (h, _, _) = Multimodal.lumHashStats(img); s = s * 1000003L + h; k += 1 }
        }
        (s, k)
      }
      val base = sig(gif(0, 0 until n))
      assert(sig(gif(4, 0 until n)) == base, s"trial $trial: brighten changed the signature")
      if (n >= 3) {
        // a genuine re-cut: swap the first two SAMPLED frames (0 and 2)
        val recut = (0 until n).toArray
        recut(0) = 2; recut(2) = 0
        assert(sig(gif(0, recut.toSeq))._1 != base._1,
          s"trial $trial: re-cut animation must sign differently")
      }
    }
  }

  test("x77 pipeline: perceptual clusters pair each doc with its perturbed twin") {
    val docs = Seq((0L, "the quick brown fox"), (1L, "jumps over"), (2L, "the lazy dog"))
      .toDF("doc_id", "text")
    val media = Multimodal.pngPairsFromDocs(spark, docs)
    assert(media.count() == 6, "one original + one twin per doc")
    // exact byte-hash dedup CANNOT pair them: all 6 payloads distinct
    assert(Multimodal.dedupExact(media).count() == 6)
    val clusters = Multimodal.perceptualClusters(
        Multimodal.decodeImages(spark, media))
      .select($"keep_id", $"n_copies", $"width", $"height", $"lum_gap")
      .as[(Long, Long, Int, Int, Double)].collect().sortBy(_._1)
    assert(clusters.toSeq == Seq(
      (0L, 2L, 32, 32, 4.0), (1L, 2L, 32, 32, 4.0), (2L, 2L, 32, 32, 4.0)))
  }
}
