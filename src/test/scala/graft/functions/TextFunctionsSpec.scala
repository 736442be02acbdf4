package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash: identical texts hash equal; near-identical within small hamming") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away",
      "the quick brown fox jumps over the lazy dog and runs far home",
      "completely different words about database engines and columnar storage"
    ).toDF("text")
    val hs = docs.select(simhash64(col("text"))).collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0), hs(1)) <= 8)
    assert(hamming(hs(0), hs(2)) > 8)
    // determinism across evaluations
    val hs2 = docs.select(simhash64(col("text"))).collect().map(_.getLong(0))
    assert(hs.toSeq == hs2.toSeq)
  }

  test("minhash signature: k values, deterministic, similar sets agree on most") {
    val d = Seq("a b c d e f g h i j", "a b c d e f g h i k", "z y x w v u t s r q")
      .toDF("text").select(minhashSignature(shingles(col("text"), 2)).as("sig"))
    val sigs = d.collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 64))
    val agree01 = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    val agree02 = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(agree01 > 30, s"similar docs agreed on $agree01/64")
    assert(agree02 < 10, s"dissimilar docs agreed on $agree02/64")
  }

  test("rolling fingerprint is order-sensitive; simhash is not") {
    val d = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
    val fps = d.select(rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
    val shs = d.select(simhash64(col("text"))).collect().map(_.getLong(0))
    assert(shs(0) == shs(1))
  }

  test("langId picks the lexicon language; und on no hits") {
    val d = Seq(
      "the cat sat of the mat and it was fine",
      "le chat est sur la table et il est content",
      "qwerty zzz xxx").toDF("text")
    val langs = d.select(langId(col("text"))).collect().map(_.getString(0))
    assert(langs.toSeq == Seq("en", "fr", "und"))
  }

  test("codegen'd shingles equal the composed-builtins form exactly") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    for (n <- Seq(2, 3, 5)) {
      val diff = docs.select(shingles(col("text"), n).as("fast"),
          shinglesComposed(col("text"), n).as("slow"))
        .filter(not(col("fast") === col("slow")))
      assert(diff.count() === 0L, s"n=$n shingle mismatch")
    }
    // edge shapes: empty, whitespace-only, fewer tokens than n, tabs/newlines
    val edge = Seq("", "   ", "one", "one two", "a\tb\nc  d", " UPPER lower ").toDF("text")
    val rows = edge.select(shingles(col("text"), 3).as("fast"),
      shinglesComposed(col("text"), 3).as("slow")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("codegen'd ngramsAll equals the composed HOF form exactly") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    for (n <- Seq(2, 3)) {
      val diff = docs.select(ngramsAll(col("text"), n).as("fast"),
          ngramsAllComposed(col("text"), n).as("slow"))
        .filter(not(col("fast") === col("slow")))
      assert(diff.count() === 0L, s"n=$n ngram mismatch")
    }
    val edge = Seq("", "   ", "one", "one two", "a a a", "a\tb\nc  d").toDF("text")
    val rows = edge.select(ngramsAll(col("text"), 2).as("fast"),
      ngramsAllComposed(col("text"), 2).as("slow")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // multiplicity preserved, unlike shingles()
    val rep = Seq("x y x y x").toDF("text")
      .select(ngramsAll(col("text"), 2)).head.getSeq[String](0)
    assert(rep == Seq("x y", "y x", "x y", "y x"))
  }

  test("token counts and shingles") {
    val d = Seq("  Hello   world  foo ").toDF("text")
    assert(d.select(tokenCount(col("text"))).head.getLong(0) == 3L)
    val sh = d.select(shingles(col("text"), 2)).head.getSeq[String](0)
    assert(sh == Seq("hello world", "world foo"))
  }
}
