package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** stdin table source + schema_from_files declared-sample inference
  * (reference: columnq/src/table/mod.rs:704-752, 888-896). */
class SourceExtrasSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()

  test("stdin source buffers bytes and loads under the declared format") {
    val csv = "city,pop\nparis,100\nlyon,50\n"
    Loaders.stdinStream = () => new ByteArrayInputStream(csv.getBytes("UTF-8"))
    try {
      val df = Loaders.load(spark,
        TableSource("cities", "stdin", format = Some("csv")))
      assert(df.count() === 2)
      assert(df.columns.toSeq === Seq("city", "pop"))
      assert(df.filter(df("city") === "paris").head().getInt(1) === 100)
    } finally Loaders.stdinStream = () => System.in
  }

  test("stdin without an explicit format is rejected") {
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("x", "stdin"))
    }
    assert(e.getMessage.contains("format"))
  }

  test("schema_from_files infers from only the named files and merges") {
    val dir = Files.createTempDirectory("graft_sff")
    // sample files with complementary columns; the bulk file would vote wrong
    Files.write(dir.resolve("a.json"), """{"id": 1, "x": "one"}""".getBytes)
    Files.write(dir.resolve("b.json"), """{"id": 2, "y": 2.5}""".getBytes)
    // bulk file where id looks like a string — must NOT influence the schema
    Files.write(dir.resolve("bulk.json"),
      """{"id": 3, "x": "three", "y": 1.5}""".getBytes)
    val df = Loaders.load(spark, TableSource("t", dir.toString,
      format = Some("ndjson"),
      options = Map("schema_from_files" -> "a.json;b.json")))
    val s = df.schema
    assert(s.fieldNames.sorted.toSeq === Seq("id", "x", "y"))
    assert(s("id").dataType === LongType)
    assert(s("y").dataType === DoubleType)
    assert(df.count() === 3) // full listing still read
  }

  test("empty schema_from_files list is an error") {
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("t", "/tmp", format = Some("ndjson"),
        options = Map("schema_from_files" -> " ; ")))
    }
    assert(e.getMessage.contains("empty list"))
  }
}
