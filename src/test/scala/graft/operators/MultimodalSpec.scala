package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.documentsAsMedia(spark, sf0001)

  test("batched feature extraction is partition-parallel and deterministic") {
    val repartitioned = media.repartition(7)
    val feats = Multimodal.extractFeatures(repartitioned.as(media.encoder), dim = 8)
    assert(feats.rdd.getNumPartitions == 7) // mapPartitions preserves layout
    val rows = feats.orderBy("id").collect()
    assert(rows.length == 500)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(f => f.width >= 256 && f.width <= 480))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 8).orderBy("id").collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("synthetic PNG and BMP payloads decode back to the pixel formula") {
    // id 2 → PNG container, id 3 → BMP container; both lossless, so the
    // decoded pixels must equal the formula bit-exactly
    for (id <- Seq(2L, 3L)) {
      val (bytes, fmt) = Multimodal.synthImageBytes(id)
      if (id % 2 == 0) {
        assert(fmt == "image/png")
        assert(bytes.take(8).map(b => f"${b & 0xFF}%02X").mkString == "89504E470D0A1A0A")
      } else {
        assert(fmt == "image/bmp")
        assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      }
      val img = Multimodal.decodeImage(bytes)
      assert(img.getWidth == Multimodal.synthWidth(id))
      assert(img.getHeight == Multimodal.synthHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) == Multimodal.synthR(id, x, y), s"R at ($x,$y) id=$id")
        assert(((rgb >> 8) & 0xFF) == Multimodal.synthG(id, x, y), s"G at ($x,$y) id=$id")
        assert((rgb & 0xFF) == Multimodal.synthB(id, x, y), s"B at ($x,$y) id=$id")
      }
    }
  }

  test("a corrupted payload fails loudly, not silently") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val e = intercept[IllegalArgumentException](Multimodal.decodeImage(garbage))
    assert(e.getMessage.contains("undecodable"))
    // truncated PNG (valid magic, broken body) must also fail loudly
    val (png, _) = Multimodal.synthImageBytes(2L)
    intercept[IllegalArgumentException](
      Multimodal.decodeImage(png.take(12)))
  }

  test("decode-backed feature extraction matches the formula sums end-to-end") {
    import spark.implicits._
    val imgs = Multimodal.syntheticImages(spark, sf0001)
    val got = Multimodal.extractImageFeatures(imgs.repartition(5))
      .filter(_.id <= 10L).collect().sortBy(_.id)
    assert(got.nonEmpty)
    got.foreach { f =>
      val w = Multimodal.synthWidth(f.id); val h = Multimodal.synthHeight(f.id)
      assert(f.width == w && f.height == h && f.channels == 3)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += Multimodal.synthR(f.id, x, y)
        sg += Multimodal.synthG(f.id, x, y)
        sb += Multimodal.synthB(f.id, x, y)
      }
      assert(f.sum_r == sr && f.sum_g == sg && f.sum_b == sb, s"sums for id=${f.id}")
    }
  }

  test("box-filter resize matches an independent floor-mean computation") {
    import spark.implicits._
    val one = Multimodal.syntheticImages(spark, sf0001).filter(_.id == 9L)
    val r = Multimodal.resizeImage(one, outW = 4, outH = 4).collect().head
    val id = 9L
    val w = Multimodal.synthWidth(id); val h = Multimodal.synthHeight(id)
    val bw = w / 4; val bh = h / 4
    def checksum(chan: (Long, Int, Int) => Int): Long =
      (for (oy <- 0 until 4; ox <- 0 until 4) yield {
        val s = (for (by <- 0 until bh; bx <- 0 until bw)
          yield chan(id, ox * bw + bx, oy * bh + by).toLong).sum
        (s / (bw * bh)) * (ox + oy * 4 + 1)
      }).sum
    assert(r.r_checksum == checksum(Multimodal.synthR))
    assert(r.g_checksum == checksum(Multimodal.synthG))
    assert(r.b_checksum == checksum(Multimodal.synthB))
    assert(r.magic_hex == "89504E470D0A1A0A") // re-encode is PNG
  }

  test("synthetic WAV decodes through the JDK codec back to the sample formula") {
    for (id <- Seq(0L, 5L)) {
      val (rate, ch, s) = Multimodal.decodeAudio(Multimodal.synthWavBytes(id))
      assert(rate == 8000 && ch == 1)
      assert(s.toSeq == Multimodal.synthAudioSamples(id).toSeq)
    }
    // garbage and a truncated RIFF header must fail loudly
    intercept[IllegalArgumentException](
      Multimodal.decodeAudio(Array.tabulate[Byte](32)(i => (i * 11).toByte)))
    intercept[IllegalArgumentException](
      Multimodal.decodeAudio(Multimodal.synthWavBytes(1L).take(20)))
  }

  test("audio features match an independent computation of the formula") {
    import spark.implicits._
    val feats = Multimodal.extractAudioFeatures(
      Multimodal.syntheticAudio(spark, sf0001).filter(_.id <= 5L))
      .collect().sortBy(_.id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val s = Multimodal.synthAudioSamples(f.id)
      assert(f.n_samples == s.length.toLong)
      assert(f.energy == s.map(v => v.toLong * v).sum)
      assert(f.zero_crossings ==
        s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong)
      assert(f.peak == s.map(v => math.abs(v.toLong)).max)
    }
  }

  test("fixed-point MFCC: trig tables track real cosines; frames respond to spectrum") {
    // Q14 recurrence tables stay within quantization+drift of the real
    // trig values across the whole period (measured max 70/16384 = 0.43%)
    val c = Multimodal.mfccCosTab; val s = Multimodal.mfccSinTab
    assert(c(0) == 16384L && s(0) == 0L)
    (0 until 64).foreach { j =>
      val a = 2 * math.Pi * j / 64
      assert(math.abs(c(j) - math.cos(a) * 16384) <= 71, s"cos j=$j got ${c(j)}")
      assert(math.abs(s(j) - math.sin(a) * 16384) <= 71, s"sin j=$j got ${s(j)}")
    }
    // a pure bin-2 tone concentrates energy in low mel filters; a bin-14
    // tone in high ones — the filterbank must separate them
    def tone(bin: Int): Array[Short] =
      Array.tabulate(64)(i => (20000 * math.sin(2 * math.Pi * bin * i / 64)).toShort)
    val low = Multimodal.audioMfcc(1L, tone(2)).head
    val high = Multimodal.audioMfcc(1L, tone(14)).head
    assert(low.l0 > low.l5, s"low tone: l0=${low.l0} l5=${low.l5}")
    assert(high.l5 > high.l0, s"high tone: l0=${high.l0} l5=${high.l5}")
    // deterministic and frame-exact over the synthetic corpus shape
    val frames = Multimodal.audioMfcc(7L, Multimodal.synthAudioSamples(7L))
    assert(frames.length == (256 + 7 * 64) / 64)
    assert(frames == Multimodal.audioMfcc(7L, Multimodal.synthAudioSamples(7L)))
    assert(frames.map(_.frame_idx) == (0 until frames.length).map(_.toLong))
    // c0 is the plain sum of the six quantized log energies
    frames.foreach { f =>
      assert(f.c0 == f.l0 + f.l1 + f.l2 + f.l3 + f.l4 + f.l5)
    }
  }

  test("perceptual hash: ids congruent mod 256 render identical images, hamming 0") {
    import spark.implicits._
    val ph = Multimodal.imagePhash(
      Multimodal.syntheticImages(spark, sf0001)
        .filter(r => r.id == 17L || r.id == 273L || r.id == 18L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 273 = 17 + 256: same dims, same pixel formula mod 256 -> same hash
    assert(ph(17L) == ph(273L))
    // a different id is overwhelmingly likely to differ (fixed corpus: pinned)
    assert(ph(17L) != ph(18L))
    // and the hash matches an independent scalar computation
    val img = Multimodal.decodeImage(Multimodal.synthImageBytes(17L)._1)
    assert(ph(17L) == Multimodal.grayPhash(img))
  }

  test("grid embedding: 64 integer cell means, exact-dup images coincide") {
    import spark.implicits._
    val em = Multimodal.imageGridEmbed(
      Multimodal.syntheticImages(spark, sf0001)
        .filter(r => r.id == 17L || r.id == 273L || r.id == 18L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(em(17L).length == 64 && em(17L).forall(c => c >= 0 && c <= 255))
    assert(em(17L) == em(273L)) // identical renders -> identical vectors
    assert(em(17L) != em(18L))
    // the thresholded embedding IS the phash (one shared grid computation)
    val img = Multimodal.decodeImage(Multimodal.synthImageBytes(17L)._1)
    assert(em(17L) == Multimodal.gridCells(img).toSeq)
    // top-k: every probe returns 5 hits; an exact duplicate ranks first
    // with distance 0 (probe 1's duplicate is 257 in the fixed corpus)
    val topk = graft.SparkEntry.queries("mm_embed_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(topk.count(_._1 == 1L) == 5)
    val first = topk.filter(t => t._1 == 1L && t._4 == 1L).head
    assert(first._2 == 257L && first._3 == 0L)
  }

  test("phash clusters partition the corpus and absorb every near-dup pair") {
    val clusters = graft.SparkEntry.queries("mm_phash_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.SparkEntry.queries("mm_phash_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.size == 500) // every image labeled exactly once
    // both endpoints of every near-dup pair share a cluster representative
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // a representative represents itself
    clusters.values.foreach(rep => assert(clusters(rep) == rep))
  }

  test("hand-built animated GIF decodes through the JDK LZW codec to the pixel formula") {
    for (id <- Seq(0L, 5L, 17L, 103L, 255L)) {
      val frames = Multimodal.decodeGifFrames(Multimodal.synthGifBytes(id))
      assert(frames.length == Multimodal.synthFrameCount(id), s"id=$id")
      val w = Multimodal.synthGifWidth(id); val h = Multimodal.synthGifHeight(id)
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w)
          assert((img.getRGB(x, y) & 0xFF) == Multimodal.synthGray(id, f, x, y),
            s"id=$id frame=$f pixel ($x,$y)")
      }
    }
  }

  test("a corrupted multi-frame payload fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeGifFrames(Array[Byte](1, 2, 3, 4))
    }
    val good = Multimodal.synthGifBytes(3L)
    intercept[IllegalArgumentException] {
      Multimodal.decodeGifFrames(good.take(30)) // dies inside the palette
    }
  }

  test("audio fingerprint matches an independent window-energy computation") {
    // independent replica: plain functional Scala, no shared loop code
    def ref(xs: Array[Short]): Long = {
      val n = xs.length
      val es = (0 until 64).map { j =>
        val w = xs.slice(j * n / 64, (j + 1) * n / 64)
        w.map(v => v.toLong * v).sum / w.length
      }
      val avg = es.sum / 64
      (0 until 64).filter(j => es(j) > avg).map(1L << _).fold(0L)(_ | _)
    }
    for (id <- Seq(0L, 17L, 255L, 256L, 511L)) {
      val samples = Multimodal.synthDedupAudioSamples(id)
      // the kernel consumes DECODED samples — prove the codec round-trip
      val (_, _, decoded) = Multimodal.decodeAudio(Multimodal.wavBytes(samples))
      assert(decoded.toSeq == samples.toSeq)
      assert(Multimodal.audioFingerprint(decoded) == ref(samples), s"id=$id")
    }
  }

  test("dedup audio corpus: ids congruent mod 256 are identical waveforms") {
    assert(Multimodal.synthDedupAudioSamples(17L).toSeq ==
      Multimodal.synthDedupAudioSamples(273L).toSeq)
    val fp17 = Multimodal.audioFingerprint(Multimodal.synthDedupAudioSamples(17L))
    val fp273 = Multimodal.audioFingerprint(Multimodal.synthDedupAudioSamples(273L))
    assert(fp17 == fp273)
    // different residues fingerprint apart (the corpus is not one cluster)
    val fp18 = Multimodal.audioFingerprint(Multimodal.synthDedupAudioSamples(18L))
    assert(java.lang.Long.bitCount(fp17 ^ fp18) > 3,
      s"residues 17/18 too close: ${java.lang.Long.bitCount(fp17 ^ fp18)}")
  }

  test("audio clusters partition the corpus and absorb every near-dup pair") {
    val clusters = graft.SparkEntry.queries("mm_audio_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.SparkEntry.queries("mm_audio_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.size == 500)
    assert(pairs.nonEmpty, "mod-256 collisions should produce duplicate audio")
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.values.foreach(rep => assert(clusters(rep) == rep))
  }

  test("frame sampling yields strided chunks with correct sizes") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
    val byDoc = frames.groupBy("id").agg(count(lit(1)).as("n"),
      min(col("frame_idx")).as("first"))
    val r = byDoc.orderBy("id").collect()
    assert(r.forall(_.getInt(2) == 0)) // every doc starts at frame 0
    assert(frames.filter(octet_length(col("frame_bytes")) > 32).count() == 0)
    // stride means only even frame indices
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }
}
