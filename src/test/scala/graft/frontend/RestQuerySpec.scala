package graft.frontend

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RestQuerySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", 10.0), (2L, "b", 5.0), (3L, "a", 7.5), (4L, null.asInstanceOf[String], 2.0)
  ).toDF("id", "tag", "score")

  test("literal typing: quoted string, long, double") {
    assert(RestQuery(df, Map("filter[tag]" -> "'a'")).count() == 2)
    assert(RestQuery(df, Map("filter[id]gte" -> "3")).count() == 2)
    assert(RestQuery(df, Map("filter[score]lt" -> "7.5")).count() == 2)
  }

  test("schema-directed input conversion: bare strings work on string columns") {
    // the reference's unshipped roadmap item (README.md:332): no '..'
    // ceremony needed when the column is string-typed
    assert(RestQuery(df, Map("filter[tag]" -> "a")).count() == 2)
    // a numeric-looking value on a STRING column compares as a string,
    // not by casting the column to bigint
    val df2 = Seq(("5", 1L), ("05", 2L), ("x", 3L)).toDF("code", "n")
    assert(RestQuery(df2, Map("filter[code]" -> "5")).count() == 1)
    // quoted strings and non-string columns keep the reference typing
    assert(RestQuery(df, Map("filter[tag]" -> "'a'")).count() == 2)
    assert(RestQuery(df, Map("filter[id]" -> "3")).count() == 1)
    // bare junk on a NUMERIC column still fails loudly (no silent string
    // comparison against a long column)
    intercept[RestQuery.RestError] {
      RestQuery(df, Map("filter[id]" -> "abc")).count()
    }
  }

  test("operator order is filter -> project -> sort -> limit (plan equivalence)") {
    val got = RestQuery(df, Map(
      "filter[score]gt" -> "2", "columns" -> "id,score",
      "sort" -> "-score", "limit" -> "2"))
    val want = df.filter(col("score") > 2)
      .select(col("id"), col("score"))
      .orderBy(col("score").desc_nulls_first)
      .limit(2)
    assert(got.queryExecution.optimizedPlan.sameResult(want.queryExecution.optimizedPlan))
  }

  test("desc sort is nulls-first (reference parity)") {
    val got = RestQuery(df, Map("sort" -> "-tag", "columns" -> "tag"))
      .collect().map(_.getString(0))
    assert(got.head == null) // Spark default desc would put null last
  }

  test("pagination skips (page-1)*limit rows") {
    val got = RestQuery(df, Map("sort" -> "id", "limit" -> "2", "page" -> "2"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, 4L))
  }

  test("unsupported operator and bad literal raise rest_query errors") {
    intercept[RestQuery.RestError](RestQuery(df, Map("filter[id]like" -> "3")).count())
    intercept[RestQuery.RestError](RestQuery(df, Map("filter[id]" -> "abc")).count())
  }
}
