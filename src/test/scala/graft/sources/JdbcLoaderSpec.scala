package graft.sources

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Reference-style database URIs map onto Spark JDBC URLs
  * (columnq/src/table/database.rs: connectorx URIs mysql://, postgres://,
  * sqlite://; table name from the `table` option, else the source name). */
class JdbcUrlSpec extends AnyFunSuite {
  test("database URI shapes rewrite to JDBC URLs") {
    assert(Loaders.jdbcUrl("mysql://u:p@host:3306/db") === "jdbc:mysql://u:p@host:3306/db")
    assert(Loaders.jdbcUrl("postgres://u@host/db") === "jdbc:postgresql://u@host/db")
    assert(Loaders.jdbcUrl("postgresql://host/db") === "jdbc:postgresql://host/db")
    assert(Loaders.jdbcUrl("sqlite:///tmp/sample.db") === "jdbc:sqlite:/tmp/sample.db")
    assert(Loaders.jdbcUrl("jdbc:derby:/tmp/x") === "jdbc:derby:/tmp/x")
  }

  test("database URIs infer format=jdbc without an extension") {
    assert(TableSource("t", "mysql://h/db").resolvedFormat === "jdbc")
    assert(TableSource("t", "sqlite:///tmp/sample.db").resolvedFormat === "jdbc")
    assert(TableSource("t", "jdbc:derby:memory:db").resolvedFormat === "jdbc")
  }
}

/** format=jdbc executes a REAL load end-to-end against the embedded Derby
  * engine Spark bundles for its Hive metastore — the same `spark.read.jdbc`
  * path a MySQL/Postgres driver jar would take. */
class JdbcLoaderSpec extends SparkSpec {

  test("jdbc table loads through spark.read.jdbc from embedded Derby") {
    val db = s"memory:graftjdbc${System.nanoTime()}"
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE people (id INT NOT NULL, name VARCHAR(32), score DOUBLE)")
      st.execute("INSERT INTO people VALUES (1, 'ada', 1.5), (2, 'bob', 2.5), (3, 'eve', 3.5)")
      st.close()

      val src = TableSource("people", s"jdbc:derby:$db", Some("jdbc"),
        options = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
      val df = Loaders.load(spark, src)
      val rows = df.orderBy("ID").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      assert(rows.toSeq === Seq((1, "ada", 1.5), (2, "bob", 2.5), (3, "eve", 3.5)))

      // `table` option selects a different dbtable than the source name
      val src2 = TableSource("alias", s"jdbc:derby:$db", Some("jdbc"),
        options = Map("table" -> "people",
          "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
      assert(Loaders.load(spark, src2).count() === 3L)

      // registered view is queryable like any other table
      Loaders.register(spark, src)
      assert(spark.sql("SELECT count(*) FROM people WHERE score > 2").head().getLong(0) === 2L)
    } finally conn.close()
  }
}
