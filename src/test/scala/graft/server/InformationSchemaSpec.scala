package graft.server

import graft.SparkSpec
import graft.sources.TableSource

/** information_schema parity with the reference CLI's
  * `with_information_schema(true)` (columnq-cli/src/main.rs:93-94). */
class InformationSchemaSpec extends SparkSpec {

  private lazy val engine = {
    val e = new Engine(spark, readOnly = true)
    e.registerTable(TableSource("region", s"$sf0001/region.parquet", Some("parquet")))
    e.registerTable(TableSource("nation", s"$sf0001/nation.parquet", Some("parquet")))
    e
  }

  test("information_schema.tables lists registered tables") {
    val rows = engine.querySql(
      "SELECT table_name, table_type FROM information_schema.tables ORDER BY table_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.map(_._1).toSeq === Seq("nation", "region"))
    assert(rows.forall(_._2 == "BASE TABLE"))
  }

  test("information_schema.columns exposes names, positions, types, nullability") {
    val rows = engine.querySql(
      """SELECT column_name, ordinal_position, data_type
        |FROM information_schema.columns WHERE table_name = 'region'
        |ORDER BY ordinal_position""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).toSeq === Seq("r_regionkey", "r_name"))
    assert(rows.map(_._2).toSeq === Seq(1L, 2L))
    assert(rows.head._3.toUpperCase.contains("INT"))
  }

  test("a dropped table disappears from information_schema") {
    val e = new Engine(spark, readOnly = false)
    e.registerTable(TableSource("tmp_t", s"$sf0001/region.parquet", Some("parquet")))
    assert(e.querySql(
      "SELECT count(*) FROM information_schema.tables WHERE table_name = 'tmp_t'")
      .head().getLong(0) === 1L)
    e.dropTable("tmp_t")
    assert(e.querySql(
      "SELECT count(*) FROM information_schema.tables WHERE table_name = 'tmp_t'")
      .head().getLong(0) === 0L)
  }

  test("information_schema inside a string literal is NOT rewritten") {
    val lit = engine.querySql("SELECT 'see information_schema.tables' AS s")
      .head().getString(0)
    assert(lit === "see information_schema.tables")
  }

  test("rewrite skips literals/comments/quoted identifiers but hits real refs") {
    val rw = engine.rewriteInformationSchema(
      "SELECT 'information_schema.tables', `information_schema.columns` " +
        "-- information_schema.tables\n" +
        "/* information_schema.columns */ FROM Information_Schema.Tables")
    assert(rw ===
      "SELECT 'information_schema.tables', `information_schema.columns` " +
        "-- information_schema.tables\n" +
        "/* information_schema.columns */ FROM information_schema_tables")
    // doubled-quote escape stays inside the literal
    assert(engine.rewriteInformationSchema(
      "SELECT 'it''s information_schema.tables' FROM information_schema.columns") ===
      "SELECT 'it''s information_schema.tables' FROM information_schema_columns")
    // identifier-boundary: a prefixed name is not a schema reference
    assert(engine.rewriteInformationSchema(
      "SELECT * FROM my_information_schema.tables") ===
      "SELECT * FROM my_information_schema.tables")
  }

  test("backslash-escaped quotes stay inside the literal (non-ANSI lexer)") {
    // 'it\'s information_schema.tables' is ONE literal under Spark's default
    // lexer — nothing inside may be rewritten, and the real reference after
    // it still must be
    assert(engine.rewriteInformationSchema(
      "SELECT 'it\\'s information_schema.tables' FROM information_schema.columns") ===
      "SELECT 'it\\'s information_schema.tables' FROM information_schema_columns")
    // same for double-quoted literals; backticks escape only by doubling, so
    // a backslash inside backticks is a plain character
    assert(engine.rewriteInformationSchema(
      "SELECT \"a\\\" information_schema.tables\" FROM information_schema.tables") ===
      "SELECT \"a\\\" information_schema.tables\" FROM information_schema_tables")
    assert(engine.rewriteInformationSchema(
      "SELECT `a\\` + 1 FROM information_schema.tables") ===
      "SELECT `a\\` + 1 FROM information_schema_tables")
    // a trailing backslash-escape at end-of-input must not overrun
    assert(engine.rewriteInformationSchema("SELECT 'oops\\") === "SELECT 'oops\\")
  }
}
