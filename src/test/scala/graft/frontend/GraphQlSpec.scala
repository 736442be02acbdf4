package graft.frontend

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphQlSpec extends SparkSpec {
  import spark.implicits._

  private def withTable[A](f: => A): A = {
    Seq((1L, "a", 10.0), (2L, "b", 5.0), (3L, "a", 7.5), (4L, "c", 2.0))
      .toDF("id", "tag", "score").createOrReplaceTempView("t")
    f
  }

  test("parse: single field with args and selection set") {
    val f = GraphQl.parse("""{ t(filter: {tag: {eq: "a"}}, limit: 5) { id tag } }""")
    assert(f.name == "t")
    assert(f.selections == List("id", "tag"))
    assert(f.args.map(_._1) == List("filter", "limit"))
  }

  test("filter object, literal-equality shorthand, sort, limit+page") {
    withTable {
      val got = GraphQl.query(spark,
        """{ t(filter: {score: {gt: 2.0}, tag: "a"},
          |     sort: [{field: "score", order: "desc"}], limit: 1, page: 2) { id score } }""".stripMargin)
        .collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    }
  }

  test("plan equivalence: filter -> project -> sort -> limit") {
    withTable {
      val got = GraphQl.query(spark,
        """{ t(filter: {tag: {eq: "a"}}, sort: [{field: "id"}], limit: 2) { id score } }""")
      val want = spark.table("t").filter(col("tag") === "a")
        .select(col("id"), col("score"))
        .orderBy(col("id").asc_nulls_first).limit(2)
      assert(got.queryExecution.optimizedPlan.sameResult(want.queryExecution.optimizedPlan))
    }
  }

  test("rejects mutations, multi-field selections, bad operators") {
    intercept[GraphQl.GraphQlError](GraphQl.parse("mutation { t { id } }"))
    intercept[GraphQl.GraphQlError](GraphQl.parse("{ a { id } b { id } }"))
    intercept[GraphQl.GraphQlError] {
      withTable(GraphQl.query(spark, """{ t(filter: {tag: {matches: "a"}}) { id } }""").count())
    }
  }

  test("in: list operand filters membership and feeds the column index") {
    withTable {
      val got = GraphQl.query(spark,
        """{ t(filter: {tag: {in: ["a", "c"]}}, sort: [{field: "id"}]) { id } }""")
        .collect().map(_.getLong(0))
      assert(got.toSeq == Seq(1L, 3L, 4L))
      // mixed-type and numeric lists work like scalar literals
      val n = GraphQl.query(spark, """{ t(filter: {id: {in: [1, 4]}}) { id } }""").count()
      assert(n == 2)
      // non-list operand is a loud error
      intercept[GraphQl.GraphQlError] {
        GraphQl.query(spark, """{ t(filter: {id: {in: 3}}) { id } }""").count()
      }
    }
    val f = GraphQl.parse("""{ t(filter: {tag: {in: ["a", "c"]}, id: {gt: 0}}) { id } }""")
    val sep = graft.sources.ColumnIndex.InSep
    assert(GraphQl.filterTriples(f).toSet == Set(
      ("tag", graft.sources.ColumnIndex.InOp, s"'a'$sep'c'"), ("id", "gt", "0")))
    // a bool element yields no pruning evidence (triple dropped), but the
    // filter itself still applies
    val fb = GraphQl.parse("""{ t(filter: {tag: {in: [true]}}) { id } }""")
    assert(GraphQl.filterTriples(fb).isEmpty)
  }

  test("like: string pattern filter; prefix feeds the index as a range") {
    withTable {
      val got = GraphQl.query(spark,
        """{ t(filter: {tag: {like: "a%"}}, sort: [{field: "id"}]) { id } }""")
        .collect().map(_.getLong(0))
      assert(got.toSeq == Seq(1L, 3L))
      intercept[GraphQl.GraphQlError] {
        GraphQl.query(spark, """{ t(filter: {tag: {like: 5}}) { id } }""").count()
      }
      // like on a NUMERIC column fails loudly (same rule as REST — a
      // silent cast would match id=1,10-19,... for "1%")
      intercept[GraphQl.GraphQlError] {
        GraphQl.query(spark, """{ t(filter: {id: {like: "1%"}}) { id } }""").count()
      }
    }
    val f = GraphQl.parse("""{ t(filter: {tag: {like: "ab%"}}) { id } }""")
    assert(GraphQl.filterTriples(f) == Seq(("tag", "gte", "'ab'"), ("tag", "lt", "'ac'")))
    val fs = GraphQl.parse("""{ t(filter: {tag: {like: "%ab"}}) { id } }""")
    assert(GraphQl.filterTriples(fs).isEmpty)
  }

  test("queries the registered catalog end to end") {
    graft.Tables.registerAll(spark, sf0001)
    val rows = GraphQl.query(spark,
      """{ nation(filter: {n_regionkey: {lt: 2}}, sort: [{field: "n_name"}], limit: 3) { n_nationkey n_name } }""")
      .collect()
    assert(rows.length == 3)
  }
}
