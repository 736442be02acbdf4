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
      withTable(GraphQl.query(spark, """{ t(filter: {tag: {like: "a"}}) { id } }""").count())
    }
  }

  test("queries the registered catalog end to end") {
    graft.Tables.registerAll(spark, sf0001)
    val rows = GraphQl.query(spark,
      """{ nation(filter: {n_regionkey: {lt: 2}}, sort: [{field: "n_name"}], limit: 3) { n_nationkey n_name } }""")
      .collect()
    assert(rows.length == 3)
  }
}
