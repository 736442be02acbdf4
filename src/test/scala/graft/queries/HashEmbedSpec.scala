package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Feature-hashing document embedder: the dense L2-normalized vector must
  * be consistent with the oracle-checked integer skeleton, deterministic,
  * and content-addressed (identical texts embed identically).
  */
class HashEmbedSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"
  private val dim = 64

  private lazy val docs = graft.Tables.t(spark, sfDir, "documents")

  test("dense vectors are unit-norm, dim-sized, and match the integer skeleton") {
    val dense = PipelineOps.hashEmbed(docs, dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sparse = PipelineOps.hashEmbedSparse(docs, dim).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }
    assert(dense.nonEmpty && dense.keySet == sparse.keySet)
    dense.foreach { case (id, v) =>
      assert(v.size == dim, s"doc $id dim")
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"doc $id norm $norm")
      // un-normalizing must reproduce the exact integer bucket values
      val sq = sparse(id).values.map(x => x.toDouble * x).sum
      val scale = math.sqrt(sq)
      v.zipWithIndex.foreach { case (x, b) =>
        val want = sparse(id).getOrElse(b.toLong, 0L)
        assert(math.abs(x * scale - want) < 1e-6, s"doc $id bucket $b")
      }
    }
  }

  test("content-addressed and deterministic: same text, same vector") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "different text entirely here")).toDF("doc_id", "text")
    val vs = PipelineOps.hashEmbed(d, dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vs(1L) == vs(2L))
    assert(vs(1L) != vs(3L))
    // cosine of identical docs is exactly the unit norm product
    val cos = vs(1L).zip(vs(2L)).map { case (a, b) => a * b }.sum
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("hashed embeddings feed semDedup: exact-duplicate texts collapse") {
    // copies of a doc's text under fresh ids embed to IDENTICAL vectors,
    // land in the same kmeans cell (deterministic distance tie-break), and
    // semDedup keeps exactly one per cell-local duplicate family
    val copies = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val corpus = docs.unionByName(copies)
    val emb = PipelineOps.hashEmbed(corpus, dim)
      .select(col("doc_id").as("vec_id"), col("emb").as("embedding"))
    val kept = PipelineOps.semDedup(emb, thresh = 0.999999)
      .collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    (0L until 5L).foreach { id =>
      assert(!(kept.contains(id) && kept.contains(id + 100000L)),
        s"duplicate pair ($id, ${id + 100000L}) survived semDedup intact")
    }
  }
}
