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
    val avg = cells.sum / 64
    var hash = 0L
    var j = 0
    while (j < 64) { if (cells(j) > avg) hash |= (1L << j); j += 1 }
    hash
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
  def synthWavBytes(id: Long): Array[Byte] = {
    val samples = synthAudioSamples(id)
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
      .mapPartitions(_.map(id => MediaRow(id, synthWavBytes(id), "audio/wav")))
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
