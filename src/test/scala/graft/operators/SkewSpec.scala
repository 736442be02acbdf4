package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SkewSpec extends SparkSpec {

  test("salted join is result-identical to the plain join") {
    val li = Tables.t(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val o = Tables.t(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("o_orderkey"))
    val salted = Skew.saltedJoin(li, o, "o_orderkey", salt = 8)
    assert(salted.count() == plain.count())
    // exact multiset equality via exceptAll in both directions
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted join spreads a hot key across salt buckets") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val dim = Seq(("hot", "x")).toDF("k", "name")
    val salted = Skew.saltedJoin(hot, dim, "k", salt = 4)
    assert(salted.count() == 1000)
    // the scatter expression actually uses multiple buckets for identical rows
    val nSalts = hot
      .withColumn("s", pmod(xxhash64(monotonically_increasing_id()), lit(4)))
      .select("s").distinct().count()
    assert(nSalts > 1, "identical hot rows should scatter over multiple salts")
  }
}
