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

  test("in: comma-separated value list, typed per element") {
    assert(RestQuery(df, Map("filter[id]in" -> "1,3")).count() == 2)
    assert(RestQuery(df, Map("filter[tag]in" -> "'a','b'")).count() == 3)
    // schema-directed: bare elements on a string column are the strings
    // themselves, exact (no trim)
    assert(RestQuery(df, Map("filter[tag]in" -> "a,b")).count() == 3)
    assert(RestQuery(df, Map("filter[tag]in" -> "a, b")).count() == 2) // " b" != "b"
    // bad element on a numeric column fails like a single value would
    intercept[RestQuery.RestError](RestQuery(df, Map("filter[id]in" -> "1,x")).count())
  }

  test("in: commas and escaped quotes inside '..' stay literal") {
    val d2 = Seq(("a,b", 1L), ("a", 2L), ("it's", 3L)).toDF("tag", "n")
    assert(RestQuery(d2, Map("filter[tag]in" -> "'a,b','it''s'"))
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 3L))
    assert(RestQuery.splitInList("'a,b','it''s'") == Seq("'a,b'", "'it''s'"))
    assert(RestQuery.splitInList("1,2,3") == Seq("1", "2", "3"))
    assert(RestQuery.splitInList("a,,b") == Seq("a", "", "b"))
  }

  test("like: SQL pattern on string columns, loud on numeric columns") {
    val d2 = Seq(("alpha", 1L), ("alps", 2L), ("beta", 3L), ("a%c", 4L)).toDF("tag", "n")
    assert(RestQuery(d2, Map("filter[tag]like" -> "alp%"))
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    assert(RestQuery(d2, Map("filter[tag]like" -> "'a%c'")).count() == 1) // matches only "a%c" itself (a…c)
    assert(RestQuery(d2, Map("filter[tag]like" -> "_lp__")).count() == 1)
    intercept[RestQuery.RestError](RestQuery(d2, Map("filter[n]like" -> "1%")).count())
  }

  test("like: prefix patterns expand to range triples, others to none") {
    assert(RestQuery.likePrefixTriples("c", "s01%") ==
      Seq(("c", "gte", "'s01'"), ("c", "lt", "'s02'")))
    assert(RestQuery.likePrefixTriples("c", "o'k%") ==
      Seq(("c", "gte", "'o''k'"), ("c", "lt", "'o''l'")))
    assert(RestQuery.likePrefixTriples("c", "%s01").isEmpty)   // suffix
    assert(RestQuery.likePrefixTriples("c", "s_1%").isEmpty)   // inner wildcard
    assert(RestQuery.likePrefixTriples("c", "%").isEmpty)      // no prefix
    assert(RestQuery.likePrefixTriples("c", "café%").isEmpty)  // non-ASCII
    assert(RestQuery.filterTriples(Map("filter[s]like" -> "ab%")) ==
      Seq(("s", "gte", "'ab'"), ("s", "lt", "'ac'")))
    assert(RestQuery.filterTriples(Map("filter[s]like" -> "%x")).isEmpty)
  }

  test("in: filterTriples re-encodes the list for the column index") {
    val ts = RestQuery.filterTriples(Map("filter[id]in" -> "1,2", "limit" -> "5"))
    val sep = graft.sources.ColumnIndex.InSep
    assert(ts == Seq(("id", graft.sources.ColumnIndex.InOp, s"1${sep}2")))
    // a separator-bearing value yields no triple (a mis-split decode could
    // wrongly prune; the runtime filter still applies on the fallback path)
    assert(RestQuery.filterTriples(Map("filter[id]in" -> s"1${sep}2")).isEmpty)
    // empty elements too: String.split drops trailing empties at decode,
    // which would under-approximate the disjunction (review finding)
    assert(RestQuery.filterTriples(Map("filter[tag]in" -> "a,")).isEmpty)
    assert(RestQuery.filterTriples(Map("filter[tag]in" -> "")).isEmpty)
    // but a QUOTED empty element survives (its surface '' is non-empty)
    assert(RestQuery.filterTriples(Map("filter[tag]in" -> "'',a")) ==
      Seq(("tag", graft.sources.ColumnIndex.InOp, s"''${sep}a")))
  }
}
