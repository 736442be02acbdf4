package graft.operators

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
  * The DECODE ITSELF IS A STUB: this environment has no image/audio codecs,
  * so `decodeStub` derives deterministic pseudo-dimensions/features from the
  * payload bytes. Swap `decodeStub`/`featuresStub` for a real codec call and
  * everything else stands.
  */
object Multimodal {

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
