package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Vocabulary build + tokenize-to-ids: ranking semantics, the bound cap,
  * bit-exact agreement with a driver replica, and the shuffle-free encode
  * plan. */
class VocabSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  private def docsDf = graft.Tables.t(spark, sfDir, "documents")

  /** Replica of the [[graft.functions.TextFunctions.tokens]] +
    * length-filter chain (ASCII corpus: JVM lower == Spark lower). */
  private def toks(text: String): Array[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)

  private lazy val rawDocs: Seq[(Long, String)] = docsDf
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), r.getString(1))).toSeq

  private lazy val replicaCounts: Map[String, Long] = rawDocs
    .flatMap(d => toks(d._2)).groupBy(identity)
    .map { case (t, xs) => t -> xs.length.toLong }

  test("vocab ids are dense ranks over (count DESC, term ASC)") {
    val vb = PipelineOps.vocabBuild(docsDf, 1024)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(vb.map(_._1).toSeq == vb.indices.map(_.toLong))
    val expect = replicaCounts.toSeq.sortBy { case (t, n) => (-n, t) }
    assert(vb.map(t => (t._2, t._3)).toSeq == expect.take(vb.length))
  }

  test("the cap binds: v=16 keeps exactly the 16 most frequent terms") {
    val vb16 = PipelineOps.vocabBuild(docsDf, 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(vb16.length == 16)
    val expect = replicaCounts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(16).map(_._1)
    assert(vb16.map(_._2).toSeq == expect)
  }

  test("encode matches the driver replica exactly (counts, oov, checksum)") {
    val vmap = PipelineOps.vocabBuild(docsDf, 16)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = PipelineOps.vocabEncode(docsDf, vmap, unkId = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == rawDocs.length)
    val byId = rawDocs.toMap
    got.foreach { case (id, n, oov, ck) =>
      val ts = toks(byId(id))
      var en = 0L; var eo = 0L; var ec = 0L
      ts.foreach { t =>
        en += 1
        val tid = vmap.getOrElse(t, -1L)
        val eff = if (tid < 0) { eo += 1; 16L } else tid
        ec += (eff + 1L) * en
      }
      assert((n, oov, ck) == ((en, eo, ec)), s"doc $id")
    }
    assert(got.map(_._3).sum > 0, "oov must be exercised at v=16")
  }

  test("ngram count table matches a driver replica (multiplicity-preserving)") {
    val got = PipelineOps.dfQueries("doc_ngram_counts")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // replica: every bigram occurrence over the token sequence; a 1-token
    // doc contributes its single token (the ngramsAll short-doc rule)
    val counts = rawDocs.flatMap { case (_, text) =>
      val ts = toks(text)
      if (ts.isEmpty) Seq.empty
      else if (ts.length == 1) Seq(ts(0))
      else ts.sliding(2).map(_.mkString(" ")).toSeq
    }.groupBy(identity).map { case (g, xs) => (g, xs.length.toLong) }
    val expect = counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(100)
      .zipWithIndex.map { case ((g, n), i) => (i + 1L, g, n) }
    assert(got.toSeq == expect)
  }

  test("encode plan is shuffle-free (broadcast map, no token explode)") {
    val vmap = Map("the" -> 0L)
    val plan = PipelineOps.vocabEncode(docsDf, vmap, unkId = 1L)
      .queryExecution.executedPlan.toString
    // the single Exchange allowed is the final presentation orderBy
    assert(plan.indexOf("Exchange") == plan.lastIndexOf("Exchange"),
      s"encode must not shuffle before the output sort:\n$plan")
    assert(!plan.contains("Generate"), s"no token-level explode:\n$plan")
  }
}
