package graft.encoding

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EncodersSpec extends SparkSpec {
  import spark.implicits._

  test("json: temporal golden formats (reference encoding/json.rs goldens)") {
    val df = Seq(1).toDF("x").select(
      to_date(lit("2021-04-12")).as("d32"),
      to_timestamp(lit("2021-04-12 04:04:28")).as("sec"),
      to_timestamp(lit("2021-05-12 04:04:28.000002")).as("usec"))
    val got = new String(Encoders.toJsonBytes(df), UTF_8)
    assert(got ==
      """[{"d32":"2021-04-12","sec":"2021-04-12T04:04:28","usec":"2021-05-12T04:04:28.000002"}]""")
  }

  test("json: nulls, nested arrays and structs") {
    val df = Seq((1L, Seq(1, 2), ("in", 2.5)), (2L, Seq.empty[Int], (null.asInstanceOf[String], 0.0)))
      .toDF("id", "xs", "st")
    val got = new String(Encoders.toJsonBytes(df.orderBy("id")), UTF_8)
    assert(got ==
      """[{"id":1,"xs":[1,2],"st":{"_1":"in","_2":2.5}},{"id":2,"xs":[],"st":{"_1":null,"_2":0.0}}]""")
  }

  test("csv: header, quoting, temporal formats") {
    val df = Seq(("a,b", 1), ("plain", 2)).toDF("s", "n").orderBy("n")
    val got = new String(Encoders.toCsvBytes(df), UTF_8)
    assert(got == "s,n\n\"a,b\",1\nplain,2\n")
  }

  test("accept header negotiation with fallback") {
    assert(Encoders.fromAccept(None) == Encoders.Json)
    assert(Encoders.fromAccept(Some("*/*")) == Encoders.Json)
    assert(Encoders.fromAccept(Some("application/csv")) == Encoders.Csv)
    assert(Encoders.fromAccept(Some("application/arrow.stream")) == Encoders.ArrowStream)
    assert(Encoders.fromAccept(Some("text/html")) == Encoders.Json)
  }

  test("arrow ipc stream bytes round-trip through arrow-java reader") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val bytes = org.apache.spark.sql.GraftArrowBridge.toIpcStreamBytes(df)
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    var rows = 0
    while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    reader.close(); alloc.close()
    assert(rows == 2)
  }
}
