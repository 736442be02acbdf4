package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the round-9 evaluation/observability operators:
  * `dedup_lsh_recall`, `dedup_minhash_estimate`, `dedup_cluster_stats`,
  * `dedup_survivors`, `doc_dup_rate_by_source`, `ann_ivf_stats`.
  * (Value-level correctness is the DuckDB oracle's job; these pin the
  * invariants the oracles cannot express — cross-query consistency and
  * statistical bounds.) */
class DedupEvalSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("dedup_lsh_recall: found <= true per bucket, recall in [0,1]") {
    val rows = q("dedup_lsh_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrue, nFound, recall) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nFound <= nTrue)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall == nFound.toDouble / nTrue.toDouble)
    }
  }

  test("dedup_lsh_recall: verified LSH pairs are a subset of exact pairs") {
    // the left join's n_found sums to exactly the LSH pair count over the
    // SAME eval-42 sampled sub-corpus the query measures on — no LSH pair
    // exists outside the exact ground truth (same threshold)
    val totalFound = q("dedup_lsh_recall").agg(sum(col("n_found"))).head.getLong(0)
    val lshPairs = PipelineOps.minhashLshJoin(
      PipelineOps.evalCorpus(spark, sf0001), threshold = 0.3).count()
    assert(totalFound == lshPairs)
  }

  test("eval queries sample the corpus: eval corpus is a strict, deterministic subset") {
    val full = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val sampled = PipelineOps.evalCorpus(spark, sf0001).count()
    assert(sampled > 0 && sampled < full)
    // deterministic: same subset on re-evaluation
    assert(PipelineOps.evalCorpus(spark, sf0001).agg(sum(col("doc_id"))).head.getLong(0) ==
      PipelineOps.evalCorpus(spark, sf0001).agg(sum(col("doc_id"))).head.getLong(0))
  }

  test("dedup_band_curve: three config rows with NULL recall on a pair-free corpus") {
    // the degenerate contract (round-9 advice): a sampled sub-corpus with
    // ZERO exact pairs still emits the 8/16/32 config rows, n_true = 0,
    // recall explicitly NULL (the oracle's cfg LEFT JOIN + CASE mirrors it)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_degen").toString
    (0L until 40L).map(i =>
        (i, s"utterly unique document nr${i} with token${i * 7} and token${i * 13}",
          "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("dedup_band_curve")(spark, dir)
      .orderBy(col("bands")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    rows.foreach { r =>
      assert(r.getLong(3) == 0L, "expected zero true pairs")
      assert(r.isNullAt(4), "recall must be NULL on 0/0, not NaN or 0")
    }
  }

  test("eval exact ground truth is memoized: zero re-measures across eval faces") {
    // round-10 verdict #2: band_curve and lsh_recall grade against ONE
    // memoized exact pair set — once built, running both eval queries must
    // trigger zero further ngramJaccardJoin stats actions
    PipelineOps.evalExactPairsFor(spark, sf0001).count() // ensure built
    val before = PipelineOps.statsActions.get()
    q("dedup_band_curve").collect()
    q("dedup_lsh_recall").collect()
    assert(PipelineOps.statsActions.get() == before,
      "eval queries re-measured the exact ground truth despite the memo")
  }

  test("dedup_band_precision agrees with the recall curve's found counts") {
    val prec = q("dedup_band_precision").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(prec.keySet === Set(8L, 16L, 32L))
    prec.values.foreach { case (cand, ver) => assert(ver <= cand) }
    // verified pairs at the shared threshold ARE exact pairs, so the
    // recall curve's per-config n_found equals the precision curve's
    // n_verified — the two evaluations must tell one story
    val found = q("dedup_band_curve").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    prec.foreach { case (b, (_, ver)) => assert(found(b) == ver,
      s"bands=$b: precision n_verified $ver != recall n_found ${found(b)}") }
  }

  test("dedup_minhash_estimate: rows are the verified LSH pairs; est within Hoeffding-ish bound") {
    val est = q("dedup_minhash_estimate").collect()
    assert(est.length == q("dedup_minhash_lsh").count())
    est.foreach { r =>
      val (jac, e, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(e >= 0.0 && e <= 1.0)
      assert(err == math.abs(e - jac))
      // 64 permutations: P(|est - j| > 0.25) < 2*exp(-2*64*0.0625) ~ 7e-4;
      // a fixed corpus with ~25 pairs should never trip this
      assert(err <= 0.25, s"estimator off by $err for pair $r")
    }
  }

  test("cluster stats, survivors, and clusters agree on the corpus partition") {
    val clusters = q("dedup_clusters")
    val stats = q("dedup_cluster_stats")
    val survivors = q("dedup_survivors")
    val nDocs = clusters.count()
    // histogram covers every doc exactly once
    assert(stats.agg(sum(col("n_docs"))).head.getLong(0) == nDocs)
    // one survivor per cluster, absorbing exactly the non-representatives
    assert(survivors.count() ==
      clusters.select(col("cluster_rep")).distinct().count())
    assert(survivors.agg(sum(col("n_merged"))).head.getLong(0) ==
      nDocs - survivors.count())
    // every survivor is its own cluster representative
    val notRep = survivors.join(clusters,
        survivors("doc_id") === clusters("doc_id") &&
          clusters("doc_id") =!= clusters("cluster_rep"))
    assert(notRep.count() == 0)
  }

  test("doc_dup_rate_by_source: totals match the corpus; rates bounded") {
    val bySource = q("doc_dup_rate_by_source").collect()
    val nDocs = graft.queries.PipelineOps.dfQueries("dedup_clusters")(spark, sf0001).count()
    assert(bySource.map(_.getLong(1)).sum == nDocs)
    bySource.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("ann_lsh_recall: multi-probe recall dominates single-bucket per probe") {
    // provable: single-bucket candidates ⊆ multi-probe candidates, and a
    // brute-top-10 member displaced from the multi top-10 would need 10
    // globally-better vectors — impossible for a global top-10 member. So
    // per-element containment holds, hence recall_multi >= recall_single.
    val rows = q("ann_lsh_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, m) = (r.getDouble(1), r.getDouble(2))
      assert(s >= 0.0 && s <= 1.0 && m >= 0.0 && m <= 1.0)
      assert(m >= s, s"multi-probe recall $m < single $s for probe ${r.getLong(0)}")
    }
  }

  test("emb_knn_graph: <=3 ranked neighbors per source, valid cosines") {
    val g = q("emb_knn_graph").collect()
    assert(g.nonEmpty)
    g.groupBy(_.getLong(0)).foreach { case (src, rows) =>
      val ranks = rows.map(_.getLong(3)).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"ranks not contiguous for $src")
      assert(ranks.length <= 3)
      rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    }
  }

  test("doc_chunk: contiguous chunk indexes, bounded token counts, hash determinism") {
    val c = q("doc_chunk").collect()
    c.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val idx = rows.map(_.getLong(1)).sorted.toSeq
      assert(idx == (0L until idx.length), s"chunk_idx gap in doc $doc")
      rows.foreach { r =>
        val n = r.getLong(2)
        assert(n >= 1 && n <= 32, s"chunk token count $n out of bounds")
      }
    }
    // identical chunk content always hashes identically (hash = content id)
    val again = q("doc_chunk").collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    c.foreach(r => assert(again((r.getLong(0), r.getLong(1))) == r.getLong(3)))
  }

  test("dedup_containment: bounded measure; symmetric pairs only when sizes equal") {
    val rows = q("dedup_containment").collect()
    rows.foreach { r =>
      val cont = r.getDouble(2)
      assert(cont >= 0.8 && cont <= 1.0)
    }
  }

  test("ann_ivf_recall_curve: recall non-decreasing in nprobe") {
    // nprobe candidate sets nest, and a brute-top-k member displaced from
    // a larger candidate set's top-k would need k globally-better vectors
    // — impossible for a global top-k member (the multi-probe argument)
    val rows = q("ann_ivf_recall_curve").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b >= a, s"recall decreased: $a -> $b")
    }
  }

  test("doc_curate_report agrees with the packer's output") {
    val report = q("doc_curate_report").head
    val packed = q("doc_curate")
    // the funnel's final stage count IS the packed corpus size, and the
    // funnel is monotone non-increasing stage to stage
    assert(report.getLong(5) == packed.count())
    val counts = (0 to 5).map(report.getLong)
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"funnel increased: $a -> $b")
    }
  }

  test("ann_ivf_pq_refine: exact re-rank never loses recall vs plain ADC") {
    // provable: a brute-top-10 member in the ADC shortlist has at most 9
    // globally better vectors, so at most 9 shortlist rows outrank it
    // exactly — it survives the re-rank. ADC's own top-10 is a shortlist
    // subset, so per-probe recall(refine) >= recall(adc).
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; s += t * t; i += 1 }
      s
    }
    val adc = q("ann_ivf_pq").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = q("ann_ivf_pq_refine").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ref.nonEmpty)
    (0L until 5L).foreach { qid =>
      val brute = vecs.keys.filter(_ != qid).toSeq
        .sortBy(v => (l2(vecs(qid), vecs(v)), v)).take(10).toSet
      val recallAdc = adc.collect { case (q, v) if q == qid => v }.count(brute)
      val recallRef = ref.collect { case (q, v) if q == qid => v }.count(brute)
      assert(recallRef >= recallAdc,
        s"probe $qid: refine recall $recallRef < adc $recallAdc")
    }
  }

  test("emb_curate: a subset of semdedup survivors, zero contaminated, deterministic") {
    val curated = q("emb_curate").collect().map(_.getLong(0)).toSet
    assert(curated.nonEmpty)
    val survivors = q("emb_semdedup").collect().map(_.getLong(0)).toSet
    assert(curated.subsetOf(survivors), "curate must not resurrect dropped dups")
    val contaminated = q("emb_decontaminate").collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(curated.intersect(contaminated).isEmpty,
      "curate must exclude every contaminated vector")
    // deterministic: the hash sample yields the identical set on re-run
    assert(q("emb_curate").collect().map(_.getLong(0)).toSet === curated)
  }

  test("ann_ivf_stats: occupancy sums to the corpus, fractions to 1") {
    val stats = q("ann_ivf_stats")
    val nVecs = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(stats.agg(sum(col("n_vecs"))).head.getLong(0) == nVecs)
    val fracSum = stats.agg(sum(col("frac"))).head.getDouble(0)
    assert(math.abs(fracSum - 1.0) < 1e-9)
    // cells are a subset of the configured k, each non-empty
    val cells = stats.select(col("cell")).collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < 16))
    assert(cells.distinct.length == cells.length)
  }
}
