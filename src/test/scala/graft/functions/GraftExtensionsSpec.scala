package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Engine expressions registered as SQL functions (SparkSessionExtensions):
  * callable from every SQL frontend and identical to the Scala API. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  private def registerDocs(): Unit =
    graft.Tables.t(spark, sfDir, "documents").createOrReplaceTempView("documents")
  private def registerEmbs(): Unit =
    graft.Tables.t(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")

  test("text functions match the Scala API on the corpus") {
    registerDocs()
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(text) AS sh, rolling_fingerprint(text) AS fp,
        |       fnv_mix64(text) AS h, size(word_ngrams(text, 3)) AS n3,
        |       size(word_ngrams_all(text, 2)) AS na
        |FROM documents ORDER BY doc_id""".stripMargin).collect()
    val viaApi = graft.Tables.t(spark, sfDir, "documents").select(col("doc_id"),
        TextFunctions.simhash64(col("text")).as("sh"),
        TextFunctions.rollingFingerprint(col("text")).as("fp"),
        TextFunctions.fnvMix64(col("text")).as("h"),
        size(TextFunctions.shingles(col("text"), 3)).as("n3"),
        size(TextFunctions.ngramsAll(col("text"), 2)).as("na"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toSeq).toSeq === viaApi.map(_.toSeq).toSeq)
  }

  test("vector functions + minhash work from SQL") {
    registerEmbs()
    val r = spark.sql(
      """SELECT vec_id, l2_norm(embedding) AS nrm,
        |       dot_product(embedding, embedding) AS selfdot
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    r.foreach { row =>
      val nrm = row.getDouble(1)
      assert(math.abs(nrm * nrm - row.getDouble(2)) < 1e-9 * (1 + row.getDouble(2)))
    }
    registerDocs()
    val sig = spark.sql(
      "SELECT minhash_signature(word_ngrams(text, 3), 16, 42L) AS sig FROM documents LIMIT 3")
      .collect()
    sig.foreach(row => assert(row.getSeq[Long](0).length === 16))
  }

  test("non-literal arity/argument errors are clear") {
    registerDocs()
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngrams(text, doc_id) FROM documents").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("word_ngrams"))
  }

  test("functions reach the HTTP SQL surface") {
    val engine = new graft.server.Engine(spark, readOnly = true)
    engine.registerTable(graft.sources.TableSource(
      "docs_ext", s"$sfDir/documents.parquet", Some("parquet")))
    val n = engine.querySql(
      "SELECT count(*) AS n FROM docs_ext WHERE size(word_ngrams(text, 2)) > 3")
      .head().getLong(0)
    assert(n > 0)
  }
}
