package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal column processing: opaque binary payloads + typed metadata.
  *
  * The Spark-side plumbing is real and scale-shaped: payloads travel as
  * `binary` columns, feature extraction runs partition-parallel via
  * `mapPartitions` with an explicit batch shape (the Scala analog of
  * `mapInPandas` — a media codec wants batches, not single rows, to amortize
  * decoder init), and nothing ever collects to the driver.
  *
  * Two kernel tiers coexist:
  *
  *   - **Real image kernels** (`extractImageFeatures`, `resizeImage`) decode
  *     PNG/BMP payloads with the JDK-bundled `javax.imageio` codecs — no
  *     external libs — and compute integer-exact channel statistics and an
  *     integer box-filter resize. An undecodable payload fails LOUDLY
  *     (`decodeImage`), never silently zero-fills.
  *   - **Stub kernels** (`decodeStub`/`featuresStub`) stand in for codecs the
  *     JDK does not ship (audio/video embedding models): deterministic
  *     pseudo-features from the payload bytes, honestly named `*_stub`.
  */
object Multimodal {

  // ImageIO's default scratch is a temp FILE per decode — catastrophic for a
  // hot executor path. In-memory cache only.
  ImageIO.setUseCache(false)

  final case class MediaRow(id: Long, payload: Array[Byte], format: String)
  final case class MediaFeatures(id: Long, width: Int, height: Int,
                                 n_bytes: Long, features: Array[Double])
  final case class Frame(id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB for a real image decode — deterministic pseudo-dimensions. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val h = TextFunctions.fnv64(payload, 0, payload.length)
    (256 + (Math.floorMod(h, 8L) * 32).toInt,
      256 + (Math.floorMod(h >>> 8, 8L) * 32).toInt)
  }

  /** STUB for a real embedding model — deterministic pseudo-features. */
  def featuresStub(payload: Array[Byte], dim: Int): Array[Double] = {
    val base = TextFunctions.fnv64(payload, 0, payload.length)
    Array.tabulate(dim)(i =>
      Math.floorMod(base * (i * 2 + 1), 1000L).toDouble / 1000.0)
  }

  /** Partition-parallel batched feature extraction over (id, payload, format)
    * rows. `batchSize` is the decoder batch shape. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder" init happens here (stub: nothing to init)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h) = decodeStub(r.payload)
          MediaFeatures(r.id, w, h, r.payload.length.toLong,
            featuresStub(r.payload, dim))
        }
      }
    }
  }

  final case class Resized(id: Long, out_w: Int, out_h: Int, n_bytes: Long,
                           resized: Array[Byte])

  /** STUB for a real image resize — deterministic byte-stride downsample to at
    * most out_w*out_h/64 bytes. Swap for a codec call; the batched
    * partition-parallel shape (same as extractFeatures) stands. */
  def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val target = math.max(1, outW * outH / 64)
    if (payload.length <= target) payload
    else {
      val stride = payload.length.toDouble / target
      Array.tabulate(target)(i => payload((i * stride).toInt))
    }
  }

  /** Partition-parallel batched resize over media rows. */
  def resize(media: Dataset[MediaRow], outW: Int = 64, outH: Int = 64,
             batchSize: Int = 64): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val out = resizeStub(r.payload, outW, outH)
        Resized(r.id, outW, outH, out.length.toLong, out)
      })
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th chunk of
    * `frameBytes` bytes becomes a frame row (explode stays distributed). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val nFrames = math.max(1, r.payload.length / frameBytes)
      (0 until nFrames by stride).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        Frame(r.id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  // ===== real image kernels (JDK ImageIO; PNG + BMP, lossless) =============

  final case class ImageFeatures(id: Long, width: Int, height: Int,
                                 channels: Int, sum_r: Long, sum_g: Long,
                                 sum_b: Long)
  final case class ResizedImage(id: Long, out_w: Int, out_h: Int,
                                r_checksum: Long, g_checksum: Long,
                                b_checksum: Long, magic_hex: String)

  /** Deterministic synthetic image geometry + pixels for doc `id`: width
    * 8..36, height 8..36 (both multiples of 4), channel value =
    * `(id*k + a*x + b*y) mod 256`. The formula is the oracle contract: since
    * PNG/BMP are lossless, decode(encode(pixels)) == pixels, so any engine
    * can verify the DECODED statistics from the formula without a codec. */
  def synthWidth(id: Long): Int = 8 + Math.floorMod(id, 8L).toInt * 4
  def synthHeight(id: Long): Int = 8 + Math.floorMod(id / 8, 8L).toInt * 4
  def synthR(id: Long, x: Int, y: Int): Int = Math.floorMod(id * 7 + 3L * x + 5L * y, 256L).toInt
  def synthG(id: Long, x: Int, y: Int): Int = Math.floorMod(id * 11 + 5L * x + 7L * y, 256L).toInt
  def synthB(id: Long, x: Int, y: Int): Int = Math.floorMod(id * 13 + 2L * x + 3L * y, 256L).toInt

  /** Encode the synthetic image for `id` as real PNG (even ids) or BMP (odd
    * ids) bytes — both JDK codecs, both lossless, so the decode side
    * exercises two container formats against one pixel contract. */
  def synthImageBytes(id: Long): (Array[Byte], String) = {
    val w = synthWidth(id); val h = synthHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // bulk raster write: per-pixel setRGB routes through the ColorModel on
    // every call and dominated the kernel's profile
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          (synthR(id, x, y) << 16) | (synthG(id, x, y) << 8) | synthB(id, x, y)
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val fmt = if (id % 2 == 0) "png" else "bmp"
    val bos = new ByteArrayOutputStream(256)
    if (!ImageIO.write(img, fmt, bos))
      throw new IllegalStateException(s"no JDK ImageIO writer for format $fmt")
    (bos.toByteArray, "image/" + fmt)
  }

  /** Decode an image payload with ImageIO, failing LOUDLY on garbage —
    * `ImageIO.read` returns null for undecodable bytes and a silent
    * null-propagation would corrupt downstream statistics. */
  def decodeImage(payload: Array[Byte]): BufferedImage = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(
            s"undecodable media payload (${payload.length} bytes): ${e.getMessage}", e)
      }
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable media payload: no ImageIO reader matched ${payload.length} bytes")
    img
  }

  /** One synthetic media row per document id — image built on the EXECUTOR
    * (payloads never transit the driver), id-derived so the corpus is
    * reproducible at any scale without shipping fixture bytes. */
  def syntheticImages(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      // the id column reads as ONE scan partition (a single small parquet
      // footer), which would serialize the CPU-dense encode here AND every
      // decode kernel downstream of the checkpointed corpus onto 1-2 cores
      // (guide §2.5: input skew — repartition right after the read; the
      // exchange moves 8-byte ids, the kernels it widens move pixels).
      // Content derives from the id alone, so placement cannot change any
      // result. Optimization round 20.
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val (bytes, fmt) = synthImageBytes(id)
        MediaRow(id, bytes, fmt)
      })
  }

  /** Real decode-backed feature extraction: width/height/band-count plus
    * per-channel pixel sums (integer-exact, so oracle-verifiable).
    * Partition-parallel, nothing collected to the driver; ImageIO needs no
    * per-batch state, so rows map directly (a codec that does — a GPU
    * decoder, a session-holding library — would batch with `grouped` here,
    * init once per chunk). */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img = decodeImage(r.payload)
      val w = img.getWidth; val h = img.getHeight
      // bulk raster read (per-pixel getRGB pays a ColorModel call each)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        val rgb = px(i)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        i += 1
      }
      ImageFeatures(r.id, w, h, img.getRaster.getNumBands, sr, sg, sb)
    })
  }

  /** Real integer box-filter resize: each output cell is the floor-mean of
    * its source block (block edges at `o*dim/outDim`, exact when dims are
    * multiples). The result is re-ENCODED to PNG (proving the write path;
    * `magic_hex` pins the container) and summarized as position-weighted
    * channel checksums so correctness is oracle-checkable without shipping
    * pixel arrays. */
  def resizeImage(media: Dataset[MediaRow], outW: Int = 4,
                  outH: Int = 4): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodeImage(r.payload)
        val w = img.getWidth; val h = img.getHeight
        // a real (arbitrary) payload may decode smaller than the output
        // grid, which would make some blocks empty — fail loudly like
        // decodeImage does, never divide by zero in an executor
        require(w >= outW && h >= outH,
          s"cannot box-filter a ${w}x$h image down to ${outW}x$outH (id=${r.id})")
        val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
        val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk raster read
        val opx = new Array[Int](outW * outH)
        var cr = 0L; var cg = 0L; var cb = 0L
        var oy = 0
        while (oy < outH) {
          val y0 = oy * h / outH; val y1 = (oy + 1) * h / outH
          var ox = 0
          while (ox < outW) {
            val x0 = ox * w / outW; val x1 = (ox + 1) * w / outW
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = px(y * w + x)
                sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
                x += 1
              }
              y += 1
            }
            val n = (y1 - y0).toLong * (x1 - x0)
            val pr = (sr / n).toInt; val pg = (sg / n).toInt; val pb = (sb / n).toInt
            opx(oy * outW + ox) = (pr << 16) | (pg << 8) | pb
            val wgt = ox + oy * outW + 1
            cr += pr.toLong * wgt; cg += pg.toLong * wgt; cb += pb.toLong * wgt
            ox += 1
          }
          oy += 1
        }
        out.setRGB(0, 0, outW, outH, opx, 0, outW)
        val bos = new ByteArrayOutputStream(256)
        if (!ImageIO.write(out, "png", bos))
          throw new IllegalStateException(
            s"no JDK ImageIO writer for format png (id=${r.id})")
        val png = bos.toByteArray
        val magic = png.take(8).map(b => f"${b & 0xFF}%02X").mkString
        ResizedImage(r.id, outW, outH, cr, cg, cb, magic)
      }
    }
  }

  // ===== perceptual image hash (aHash over the decoded pixels) =============

  /** 64-bit average-hash of a decoded image: integer luma per pixel
    * (`(r*299 + g*587 + b*114) / 1000`, floor), 8×8 floor-mean grid with
    * [[resizeImage]]'s block boundaries, bit j set iff cell j exceeds the
    * floor-mean of all 64 cells. Every step is integer arithmetic, so any
    * engine reproduces the hash from the pixel contract. */
  def grayPhash(img: BufferedImage): Long = {
    val cells = gridCells(img)
    val avg = cells.sum / 64
    var hash = 0L
    var j = 0
    while (j < 64) { if (cells(j) > avg) hash |= (1L << j); j += 1 }
    hash
  }

  /** The 8×8 grid of floor-mean luma values [[grayPhash]] thresholds —
    * exposed as a 64-dim INTEGER embedding: a real, model-free image
    * feature vector (each step exact, so any engine reproduces it from
    * the pixel contract), good enough for near-dup similarity search and
    * a stand-in shape for learned embeddings the JDK cannot run. */
  def gridCells(img: BufferedImage): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    require(w >= 8 && h >= 8, s"phash needs >=8x8 pixels, got ${w}x$h")
    val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk raster read
    val cells = new Array[Long](64)
    var oy = 0
    while (oy < 8) {
      val y0 = oy * h / 8; val y1 = (oy + 1) * h / 8
      var ox = 0
      while (ox < 8) {
        val x0 = ox * w / 8; val x1 = (ox + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = px(y * w + x)
            s += (((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
              (rgb & 0xFF) * 114L) / 1000L
            x += 1
          }
          y += 1
        }
        cells(oy * 8 + ox) = s / ((y1 - y0).toLong * (x1 - x0))
        ox += 1
      }
      oy += 1
    }
    cells
  }

  /** (id, phash) over a media table — the image analogue of the text
    * simhash column: feed it to the pigeonhole chunk join for distributed
    * near-duplicate image detection. */
  def imagePhash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => (r.id, grayPhash(decodeImage(r.payload)))))
      .toDF("doc_id", "phash")
  }

  /** (id, embedding) — the [[gridCells]] 64-dim integer vector per image,
    * decoded partition-parallel. The continuous face of [[imagePhash]]:
    * feed it to the ANN operators (brute-force top-k baseline, IVF/LSH at
    * scale) for image similarity search instead of exact-hamming dedup. */
  def imageGridEmbed(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r =>
        (r.id, gridCells(decodeImage(r.payload)).toSeq)))
      .toDF("doc_id", "embedding")
  }

  // ===== real audio kernels (JDK javax.sound.sampled; WAV/PCM) =============

  final case class AudioFeatures(id: Long, sample_rate: Int, channels: Int,
                                 n_samples: Long, energy: Long,
                                 zero_crossings: Long, peak: Long)

  /** Deterministic synthetic waveform for doc `id`: 16-bit mono PCM at 8 kHz,
    * `n = 256 + (id mod 8)*64` samples, `s(i) = ((id*31 + i*17) mod 65536)
    * - 32768`. Same oracle contract as the images: WAV is lossless PCM, so
    * decoded statistics equal the formula. */
  def synthAudioSamples(id: Long): Array[Short] = {
    val n = 256 + Math.floorMod(id, 8L).toInt * 64
    Array.tabulate(n)(i =>
      (Math.floorMod(id * 31 + i.toLong * 17, 65536L) - 32768L).toShort)
  }

  /** Canonical 44-byte RIFF/WAVE header + little-endian PCM16 payload (the
    * public WAV container layout; built by hand so the DECODE side is the
    * JDK codec being exercised, not a round-trip through itself). */
  def synthWavBytes(id: Long): Array[Byte] = wavBytes(synthAudioSamples(id))

  /** Wrap PCM16 mono samples at 8 kHz in the canonical RIFF/WAVE layout. */
  def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(8000).putInt(16000)       // sample rate, byte rate
      .putShort(2).putShort(16)         // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => { bb.putShort(s); () })
    bb.array()
  }

  /** Decode an audio payload with the JDK sampled-sound codec, failing
    * LOUDLY on garbage; returns (sampleRate, channels, PCM16 samples). */
  def decodeAudio(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"undecodable audio payload (${payload.length} bytes): ${e.getMessage}", e)
      }
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16,
      s"audio kernel expects PCM16, got ${fmt.getSampleSizeInBits}-bit")
    val raw = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw).order(
      if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Short](raw.length / 2)
    var i = 0
    while (i < out.length) { out(i) = bb.getShort(); i += 1 }
    (fmt.getSampleRate.toInt, fmt.getChannels, out)
  }

  /** One synthetic WAV row per document id (executor-built, like
    * [[syntheticImages]]). */
  def syntheticAudio(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      // deliberately NOT widened like syntheticImages: javax.sound's
      // provider registry serializes concurrent decodes — measured at 32
      // tasks the total executor time ballooned 0.4 s -> 23.6 s (lock
      // spin) and WALL got 2x worse (480 -> 910 ms); the narrow scan is
      // the faster shape for this codec (optimization round 20)
      .mapPartitions(_.map(id => MediaRow(id, synthWavBytes(id), "audio/wav")))
  }

  // ===== fixed-point MFCC (mel filterbank + DCT, integer arithmetic) =======

  /** One analysis frame's log-mel energies and DCT coefficients. */
  final case class MfccFrame(doc_id: Long, frame_idx: Long,
                             l0: Long, l1: Long, l2: Long,
                             l3: Long, l4: Long, l5: Long,
                             c0: Long, c1: Long, c2: Long)

  /** Fixed-point MFCC-style features, every step INTEGER arithmetic with
    * truncating division so a SQL engine reproduces the output bit-exactly
    * (round-12 verdict #5 — the discipline embedded-DSP MFCC
    * implementations use, applied for oracle-exactness):
    *
    *   1. non-overlapping 64-sample frames (synth waveform lengths are
    *      multiples of 64, so frames tile exactly);
    *   2. 16-bin DFT with Q14 trig tables generated by the integer
    *      rotation recurrence `c' = (c·16305 − s·1605)/16384`,
    *      `s' = (s·16305 + c·1605)/16384` from (16384, 0) — the two
    *      literals are floor(cos/sin(2π/64)·2^14); power
    *      `p_k = (re/2^14)² + (im/2^14)²`;
    *   3. six triangular mel-spaced filters over bins 1..16 (integer edge
    *      bins 1,2,3,5,7,10,13,16; Q10 triangle weights);
    *   4. quantized log energy `floor(3·log2(clamp(mel, 1, 2^41)))` — the
    *      [[graft.queries.PipelineOps.unigramScore]] integer-log trick;
    *   5. DCT-II over the six log energies via Q10 integer cosine literals
    *      (k = 0 is the plain sum).
    *
    * Runs per-row inside a partition map — embarrassingly parallel, no
    * shuffle; a 100 TB corpus pays one distributed pass. */
  private val MelEdges = Array(1, 2, 3, 5, 7, 10, 13, 16)

  /** The ONE Q10 triangle-weight derivation, read by both the hot kernel
    * loop and [[melWeightRows]] (which embeds the integers into the DuckDB
    * oracle as VALUES) — an inline copy in either place could silently
    * desynchronize Spark output from the oracle (review finding).
    * `melWeights(m)(b)` is filter m's weight at spectrum bin b (0 outside
    * the triangle). */
  private val melWeights: Array[Array[Long]] = Array.tabulate(6) { m =>
    val l = MelEdges(m); val cpk = MelEdges(m + 1); val r = MelEdges(m + 2)
    Array.tabulate(17) { b =>
      if (b < l || b > r) 0L
      else if (b <= cpk) (b - l).toLong * 1024 / (cpk - l)
      else (r - b).toLong * 1024 / (r - cpk)
    }
  }
  val DctT1 = Array(989L, 724L, 265L, -266L, -725L, -990L)
  val DctT2 = Array(886L, 0L, -887L, -887L, 0L, 886L)

  private[operators] lazy val (mfccCosTab, mfccSinTab) = {
    val c = new Array[Long](64); val s = new Array[Long](64)
    c(0) = 16384L; s(0) = 0L
    var j = 1
    while (j < 64) {
      c(j) = (c(j - 1) * 16305 - s(j - 1) * 1605) / 16384
      s(j) = (s(j - 1) * 16305 + c(j - 1) * 1605) / 16384
      j += 1
    }
    (c, s)
  }

  /** floor(3·log2(x)) of x clamped to [1, 2^41] — integer-exact (cube vs
    * power-of-two comparisons; fits HUGEINT on the oracle side). */
  private[operators] def q3log2Clamped(x: Long): Long = {
    val cl = math.min(math.max(x, 1L), 1L << 41)
    val b = 63 - java.lang.Long.numberOfLeadingZeros(cl)
    val c3 = BigInt(cl).pow(3)
    3L * b + (if (c3 >= (BigInt(1) << (3 * b + 1))) 1L else 0L) +
      (if (c3 >= (BigInt(1) << (3 * b + 2))) 1L else 0L)
  }

  def audioMfcc(id: Long, samples: Array[Short]): Seq[MfccFrame] = {
    val nFrames = samples.length / 64
    (0 until nFrames).map { f =>
      val p = new Array[Long](17)
      var k = 1
      while (k <= 16) {
        var re = 0L; var im = 0L
        var i = 0
        while (i < 64) {
          val x = samples(f * 64 + i).toLong
          val j = (k * i) % 64
          re += x * mfccCosTab(j)
          im += x * mfccSinTab(j)
          i += 1
        }
        val rq = re / 16384; val iq = im / 16384
        p(k) = rq * rq + iq * iq
        k += 1
      }
      val lm = new Array[Long](6)
      var m = 0
      while (m < 6) {
        val wRow = melWeights(m)
        var acc = 0L
        var b = 1
        while (b <= 16) {
          acc += p(b) * wRow(b)
          b += 1
        }
        lm(m) = q3log2Clamped(acc / 1024)
        m += 1
      }
      var c0 = 0L; var c1 = 0L; var c2 = 0L
      m = 0
      while (m < 6) {
        c0 += lm(m); c1 += lm(m) * DctT1(m); c2 += lm(m) * DctT2(m); m += 1
      }
      MfccFrame(id, f.toLong, lm(0), lm(1), lm(2), lm(3), lm(4), lm(5),
        c0, c1 / 1024, c2 / 1024)
    }
  }

  /** Per-frame MFCC rows over a decoded audio table — distributed via the
    * same partition-map shape as [[extractAudioFeatures]]. */
  def audioMfccFrames(media: Dataset[MediaRow]): Dataset[MfccFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap(r => audioMfcc(r.id, decodeAudio(r.payload)._3))
  }

  /** The mel triangle weight table as (m, b, w) rows — the SAME
    * [[melWeights]] integers the kernel multiplies by, exposed so the
    * DuckDB oracle embeds them as VALUES literals. */
  def melWeightRows: Seq[(Int, Int, Long)] =
    for (m <- 0 until 6; b <- MelEdges(m) to MelEdges(m + 2))
      yield (m, b, melWeights(m)(b))

  // ===== real multi-frame kernels (JDK ImageIO GIF; animated, lossless) ====

  final case class FrameStats(id: Long, frame_idx: Int, width: Int,
                              height: Int, gray_sum: Long)

  /** Deterministic synthetic animated-GIF geometry for doc `id`: 2–5
    * frames of `w×h` gray pixels, `gray(f,x,y) = (id·7 + f·19 + 3x + 5y)
    * mod 256`. GIF's indexed palette is lossless — decode(encode(px)) ==
    * px — so per-frame statistics are formula-verifiable, the same oracle
    * contract as the PNG/BMP/WAV kernels. */
  def synthFrameCount(id: Long): Int = 2 + Math.floorMod(id, 4L).toInt
  def synthGifWidth(id: Long): Int = 8 + Math.floorMod(id, 4L).toInt * 4
  def synthGifHeight(id: Long): Int = 8 + Math.floorMod(id / 4, 4L).toInt * 4
  def synthGray(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 7 + f * 19L + 3L * x + 5L * y, 256L).toInt

  /** Hand-built GIF89a: logical screen + 256-gray global palette + one
    * full-size image block per frame (graphic control ext, no
    * transparency). Image data uses the public "uncompressed GIF"
    * technique — every pixel emitted as its literal 9-bit LZW root code,
    * with a CLEAR every 100 codes so the code width never grows — which
    * is VALID LZW that the JDK's real decoder decompresses; like the
    * hand-built RIFF/WAV, the container is built by hand so the decode
    * side exercises the actual codec, not a round-trip through itself. */
  def synthGifBytes(id: Long): Array[Byte] = {
    val w = synthGifWidth(id); val h = synthGifHeight(id)
    val frames = synthFrameCount(id)
    val out = new ByteArrayOutputStream(1024)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7); out.write(0); out.write(0) // 256-entry GCT, bg 0
    var ci = 0
    while (ci < 256) { out.write(ci); out.write(ci); out.write(ci); ci += 1 }
    var f = 0
    while (f < frames) {
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0)                 // keep-disposal, no transparency
      u16(10)                      // delay (centiseconds)
      out.write(0); out.write(0)   // transparent index, block terminator
      out.write(0x2C)              // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0)                 // no local palette, not interlaced
      out.write(8)                 // LZW minimum code size
      val codes = lzwLiteralCodes(id, f, w, h)
      var p = 0
      while (p < codes.length) {
        val len = math.min(255, codes.length - p)
        out.write(len)
        out.write(codes, p, len)
        p += len
      }
      out.write(0)                 // data sub-block terminator
      f += 1
    }
    out.write(0x3B)                // trailer
    out.toByteArray
  }

  /** One frame's pixel stream as 9-bit literal LZW codes, LSB-first bit
    * packing (the GIF rule): CLEAR(256), literals with a CLEAR every 100
    * so the decoder's dictionary never reaches the 9→10-bit boundary,
    * EOI(257). */
  private def lzwLiteralCodes(id: Long, f: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(w * h * 2)
    var acc = 0; var accBits = 0
    def put(code: Int): Unit = {
      acc |= code << accBits
      accBits += 9
      while (accBits >= 8) { bos.write(acc & 0xFF); acc >>>= 8; accBits -= 8 }
    }
    put(256)
    var since = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        put(synthGray(id, f, x, y))
        since += 1
        if (since == 100) { put(256); since = 0 }
        x += 1
      }
      y += 1
    }
    put(257)
    if (accBits > 0) bos.write(acc & 0xFF)
    bos.toByteArray
  }

  /** Decode every frame of an animated payload with the JDK ImageIO
    * reader, failing LOUDLY on garbage (the [[decodeImage]] contract). */
  def decodeGifFrames(payload: Array[Byte]): Vector[BufferedImage] = {
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"undecodable media payload (${payload.length} bytes): ${e.getMessage}", e)
      }
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException(
          s"undecodable media payload: no ImageIO reader matched ${payload.length} bytes")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n =
          try reader.getNumImages(true)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"undecodable multi-frame payload: ${e.getMessage}", e)
          }
        if (n < 1)
          throw new IllegalArgumentException("multi-frame payload holds no frames")
        (0 until n).map { i =>
          try reader.read(i)
          catch {
            case e: java.io.IOException => throw new IllegalArgumentException(
              s"undecodable frame $i: ${e.getMessage}", e)
          }
        }.toVector
      } finally reader.dispose()
    } finally iis.close()
  }

  /** One synthetic animated GIF per document id (executor-built, like
    * [[syntheticImages]]). */
  def syntheticGifs(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see syntheticImages
      .mapPartitions(_.map(id => MediaRow(id, synthGifBytes(id), "image/gif")))
  }

  /** REAL frame sampling: decode the animated payload, keep every
    * `stride`-th frame, and reduce each kept frame to integer-exact pixel
    * stats (gray sum over the decoded raster). Partition-parallel; the
    * per-frame explode happens on executors, never the driver. */
  def sampleGifFrames(media: Dataset[MediaRow],
                      stride: Int = 2): Dataset[FrameStats] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val frames = decodeGifFrames(r.payload)
      (0 until frames.length by stride).map { fi =>
        val img = frames(fi)
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var s = 0L; var i = 0
        while (i < px.length) { s += (px(i) & 0xFF); i += 1 }
        FrameStats(r.id, fi, w, h, s)
      }
    })
  }

  // ===== audio fingerprint (banded-energy aHash over PCM windows) ==========

  /** 64-bit banded-energy fingerprint of a PCM16 signal — the aHash
    * discipline ([[grayPhash]]) applied to sound: 64 equal time windows
    * (boundaries `j·n/64`, the image kernels' block rule), per-window
    * floor-mean energy `Σs²/count`, bit j set iff window j's mean energy
    * exceeds the floor-mean of all 64 window means. Integer-exact
    * throughout, so any engine reproduces the hash from the sample
    * formula; robust to small sample perturbations the way aHash is to
    * pixel noise, which is what makes it a NEAR-dup key rather than a
    * checksum. */
  def audioFingerprint(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= 64, s"audio fingerprint needs >= 64 samples, got $n")
    val e = new Array[Long](64)
    var j = 0
    while (j < 64) {
      // long arithmetic: j*n overflows Int past ~34M samples (a ~72-minute
      // 8 kHz file), which would index negatively and kill the stream
      val i0 = (j.toLong * n / 64).toInt; val i1 = ((j + 1).toLong * n / 64).toInt
      var s = 0L
      var i = i0
      while (i < i1) { val v = samples(i).toLong; s += v * v; i += 1 }
      e(j) = s / (i1 - i0)
      j += 1
    }
    val avg = e.sum / 64
    var hash = 0L
    var k = 0
    while (k < 64) { if (e(k) > avg) hash |= (1L << k); k += 1 }
    hash
  }

  /** (doc_id, afp) over an audio media table — the audio analogue of
    * [[imagePhash]]: feed it to the pigeonhole chunk join for distributed
    * near-duplicate audio detection. */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r =>
        (r.id, audioFingerprint(decodeAudio(r.payload)._3))))
      .toDF("doc_id", "afp")
  }

  /** Dedup-able synthetic waveform: samples derive from `id mod 256`
    * (`s(i) = ((id%256)·257 + 7i² + 31i) mod 65536 − 32768`, n as
    * [[synthAudioSamples]]), so ids congruent mod 256 carry IDENTICAL
    * audio — the audio analogue of the image corpus's mod-256 render
    * collisions. The QUADRATIC phase term wraps at a rate that varies
    * along the signal, so per-window energies differ across residues
    * (a linear phase gave monotone energies and every residue the same
    * fingerprint) while a handful of residue pairs land within small
    * hamming — real near-dups, not just exact ones. */
  def synthDedupAudioSamples(id: Long): Array[Short] = {
    val sid = Math.floorMod(id, 256L)
    val n = 256 + Math.floorMod(id, 8L).toInt * 64
    Array.tabulate(n)(i =>
      (Math.floorMod(sid * 257 + 7L * i * i + 31L * i, 65536L) - 32768L).toShort)
  }

  /** One dedup-corpus WAV row per document id (executor-built). */
  def syntheticDedupAudio(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        MediaRow(id, wavBytes(synthDedupAudioSamples(id)), "audio/wav")))
  }

  /** Decode-backed audio statistics: rate/channel metadata plus
    * integer-exact signal features — energy `Σ s²`, zero crossings
    * (sign flips), peak `max |s|`. Partition-parallel; per-row map for the
    * stateless JDK codec (see [[extractImageFeatures]] on batching). */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, ch, s) = decodeAudio(r.payload)
      var energy = 0L; var zc = 0L; var peak = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toLong
        energy += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (s(i - 1) < 0) != (v < 0)) zc += 1
        i += 1
      }
      AudioFeatures(r.id, rate, ch, s.length.toLong, energy, zc, peak)
    })
  }

  /** The documents table viewed as a media table (text bytes as payload). */
  def documentsAsMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/utf-8").as("format"))
      .as[MediaRow]
  }
}
