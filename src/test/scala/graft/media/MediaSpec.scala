package graft.media

import graft.SparkSpec

/** The image path is a REAL encode→bytes→decode round-trip through
  * `javax.imageio` — these tests pin that the decoded raster matches the
  * generator formula for arbitrary seeds (not just the fixture corpus),
  * and that the dedup fixture's byte-identity contract holds.
  */
class MediaSpec extends SparkSpec {

  import Media.DeterministicPng

  test("PNG round-trip: decoded dims and pixels match the formula") {
    for (seed <- Seq(0, 1, 44, 96, 255, 256, 577, 9215)) {
      val bytes = DeterministicPng.encode(seed)
      // PNG magic — these are real image files, not a fake container
      assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w, h) = DeterministicPng.dims(seed)
      assert(img.getWidth == w && img.getHeight == h, s"dims for seed=$seed")
      // every pixel, not just the probes — the codec must be lossless
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFFFFFF) == DeterministicPng.rgb(seed, x, y),
          s"pixel ($x,$y) for seed=$seed")
    }
  }

  test("PNG bytes are a pure function of the seed (dedup contract)") {
    assert(DeterministicPng.encode(123).toSeq ==
      DeterministicPng.encode(123).toSeq)
    assert(DeterministicPng.encode(123).toSeq !=
      DeterministicPng.encode(124).toSeq)
  }

  test("extractFeatures decodes real PNGs, WAVs, and GIFs distributed") {
    import spark.implicits._
    val media = Seq(
      Media.MediaRow(0L, "image", "image/png", DeterministicPng.encode(50)),
      Media.MediaRow(1L, "audio", "audio/wav",
        Media.DeterministicWav.encode(77)),
      Media.MediaRow(2L, "video", "video/mp4",
        Media.DeterministicGif.encode(600))
    ).toDS()
    val f = Media.extractFeatures(media).collect().sortBy(_.media_id)
    val (w, h) = DeterministicPng.dims(50)
    assert(f(0).width == w && f(0).height == h && f(0).n_frames == 1)
    assert(f(0).px00 == DeterministicPng.rgb(50, 0, 0))
    assert(f(0).px_corner == DeterministicPng.rgb(50, w - 1, h - 1))
    assert(f(1).sample_rate == Media.DeterministicWav.rate(77))
    assert(f(1).n_frames == Media.DeterministicWav.frames(77))
    assert(f(1).px00 == Media.DeterministicWav.sample(77, 0))
    assert(f(1).px_corner ==
      Media.DeterministicWav.sample(77, Media.DeterministicWav.frames(77) - 1))
    val (vw, vh) = Media.DeterministicGif.dims(600)
    assert(f(2).width == vw && f(2).height == vh)
    assert(f(2).n_frames == Media.DeterministicGif.frames(600))
    val g = Media.DeterministicGif.gray(600, 0, 0, 0)
    assert(f(2).px00 == g * 0x010101)
  }

  test("GIF round-trip: frame count and every pixel of every frame survive") {
    for (seed <- Seq(0, 1, 23, 24, 255, 256, 577, 9215)) {
      val bytes = Media.DeterministicGif.encode(seed)
      // GIF magic — these are real containers, not a fake envelope
      assert(bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte)
      val (w, h, n, px0, pxc) = Media.DeterministicGif.decode(bytes)
      assert((w, h) == Media.DeterministicGif.dims(seed), s"dims seed=$seed")
      assert(n == Media.DeterministicGif.frames(seed), s"frames seed=$seed")
      assert(px0 == Media.DeterministicGif.gray(seed, 0, 0, 0) * 0x010101)
      assert(pxc ==
        Media.DeterministicGif.gray(seed, n - 1, w - 1, h - 1) * 0x010101)
      // lossless palette: EVERY pixel of EVERY frame, not just the probes
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis, false, true)
      for (f <- 0 until n) {
        val img = reader.read(f)
        for (y <- 0 until h; x <- 0 until w)
          assert((img.getRGB(x, y) & 0xFFFFFF) ==
            Media.DeterministicGif.gray(seed, f, x, y) * 0x010101,
            s"pixel ($x,$y) frame $f seed=$seed")
      }
      reader.dispose(); iis.close()
      // pure function of the seed (mm4 dedup contract)
      assert(bytes.toSeq == Media.DeterministicGif.encode(seed).toSeq)
    }
  }

  test("perceptualHash: decode-side bits match the formula; robust to a " +
      "pixel-level change that breaks byte identity") {
    import spark.implicits._
    val seed = 250
    val (w, h) = DeterministicPng.dims(seed)
    // formula-side hash
    val gray = for (j <- 0 until 8; k <- 0 until 8) yield {
      val x = (2 * k + 1) * w / 16
      val y = (2 * j + 1) * h / 16
      ((seed + x) % 256) + ((seed + y) % 256) + ((seed + x + y) % 256)
    }
    val tot = gray.sum
    var (lo, hi) = (0L, 0L)
    gray.zipWithIndex.foreach { case (g, i) =>
      if (g * 64 > tot) { if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32) }
    }
    val media = Seq(Media.MediaRow(0L, "image", "image/png",
      DeterministicPng.encode(seed))).toDS()
    val got = Media.perceptualHash(media).collect().head
    assert(got.phash_lo == lo && got.phash_hi == hi)

    // flip ONE off-grid pixel: bytes change, perceptual hash must not
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(DeterministicPng.encode(seed)))
    img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val tweaked = bos.toByteArray
    assert(!java.util.Arrays.equals(tweaked, DeterministicPng.encode(seed)))
    val got2 = Media.perceptualHash(
      Seq(Media.MediaRow(1L, "image", "image/png", tweaked)).toDS())
      .collect().head
    assert(got2.phash_lo == lo && got2.phash_hi == hi)
  }

  test("audioWindowFeatures: windows match the generator formula exactly") {
    import spark.implicits._
    val seed = 133 // frames(133) = 165 → 2 full windows + a 37-sample tail
    val n = Media.DeterministicWav.frames(seed)
    val media = Seq(Media.MediaRow(7L, "audio", "audio/wav",
      Media.DeterministicWav.encode(seed))).toDS()
    val got = Media.audioWindowFeatures(media, win = 64)
      .collect().sortBy(_.win_idx)
    assert(got.map(_.win_idx).toSeq == (0 until (n + 63) / 64).toSeq)
    assert(got.map(_.n_samples).sum == n)
    got.foreach { w =>
      val lo = w.win_idx * 64
      val hi = math.min(lo + 64, n)
      val samples = (lo until hi).map(Media.DeterministicWav.sample(seed, _))
      val ss = samples.map(s => s.toLong * s).sum
      assert(w.n_samples == hi - lo)
      assert(w.rms == math.sqrt(ss.toDouble / (hi - lo).toDouble))
      assert(w.zero_cross == samples.sliding(2).count(p =>
        p.size == 2 && (p(0) >= 0) != (p(1) >= 0)))
    }
  }

  test("audioSpectralBank: bank powers match a direct integer DFT of the " +
      "generator formula, and a pure tone lands in its own bin") {
    import spark.implicits._
    val seed = 133
    val n = Media.DeterministicWav.frames(seed)
    val media = Seq(Media.MediaRow(7L, "audio", "audio/wav",
      Media.DeterministicWav.encode(seed))).toDS()
    val got = Media.audioSpectralBank(media, win = 64, bins = 8)
      .collect().sortBy(_.win_idx)
    assert(got.map(_.win_idx).toSeq == (0 until (n + 63) / 64).toSeq)
    got.foreach { w =>
      val lo = w.win_idx * 64
      val hi = math.min(lo + 64, n)
      val powers = (1 to 8).map { k =>
        var xc = 0L; var xs = 0L
        for (i <- lo until hi) {
          val sv = Media.DeterministicWav.sample(seed, i).toLong
          val t = (k * (i - lo)) % Media.SpectralCycle
          xc += sv * Media.CosGrid(t); xs += sv * Media.SinGrid(t)
        }
        val c = xc / Media.SpectralGrid; val s = xs / Media.SpectralGrid
        c * c + s * s
      }
      assert(w.n_samples == hi - lo)
      assert(w.total_power == powers.sum)
      assert(w.dom_power == powers.max)
      assert(w.dom_bin == powers.indexOf(powers.max) + 1)
      assert(w.dom_power <= w.total_power)
    }
    // synthetic pure tone at 3 cycles/window must dominate bin 3: encode a
    // WAV whose PCM is 10000·cos_grid(3j)/2^20 over one full window
    val pcm = new Array[Byte](128)
    for (j <- 0 until 64) {
      val v = (10000L * Media.CosGrid((3 * j) % 64) /
        Media.SpectralGrid).toInt
      pcm(2 * j) = (v & 0xFF).toByte
      pcm(2 * j + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 64L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val tone = Seq(Media.MediaRow(9L, "audio", "audio/wav",
      bos.toByteArray)).toDS()
    val tw = Media.audioSpectralBank(tone, win = 64, bins = 8)
      .collect().head
    assert(tw.dom_bin == 3)
  }

  test("WAV round-trip: every PCM sample survives the container") {
    for (seed <- Seq(0, 1, 2, 3, 77, 479, 511)) {
      val bytes = Media.DeterministicWav.encode(seed)
      val (rate, n, s0, sN) = Media.DeterministicWav.decode(bytes)
      assert(rate == Media.DeterministicWav.rate(seed))
      assert(n == Media.DeterministicWav.frames(seed))
      assert(s0 == Media.DeterministicWav.sample(seed, 0))
      assert(sN == Media.DeterministicWav.sample(seed, n - 1))
      // pure function of the seed (mm4 dedup contract)
      assert(bytes.toSeq == Media.DeterministicWav.encode(seed).toSeq)
    }
  }
}
