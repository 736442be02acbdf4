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
