package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard over the driver-generated testdata (TESTDATA.md).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed physical types once (round 7: events.ts went TIMESTAMP(NANOS)
  * → naive timestamp[us], silently breaking two queries at analysis time).
  * This spec pins the Spark-visible schema of every table so a
  * regeneration surfaces as ONE named failure here instead of as mystery
  * errors scattered across the query gate.
  */
class TestdataSchemaSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  private val expected = Map(
    "region" -> "struct<r_regionkey:int,r_name:string>",
    "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer" -> ("struct<c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>"),
    "supplier" -> "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part" -> ("struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double>"),
    "orders" -> ("struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:TS,o_orderpriority:string>"),
    "lineitem" -> ("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double," +
      "l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:TS>"),
    "events" -> ("struct<event_id:bigint,ts:TS,user_id:bigint,event_type:string," +
      "value:double,props:string>"),
    "documents" -> "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>")

  test("every testdata table has the pinned Spark schema") {
    Tables.all.foreach { name =>
      val df = Tables.t(spark, sfDir, name)
      // timestamp columns may surface as TIMESTAMP or TIMESTAMP_NTZ
      // depending on the driver's pyarrow flags; downstream casts are
      // robust to both (Relational.scala q_sessionize/q_range_join), so
      // the guard accepts either — anything else is drift.
      val got = "struct<" + df.schema.fields.map { f =>
        val t = f.dataType match {
          case TimestampType | TimestampNTZType => "TS"
          case other                            => other.simpleString
        }
        s"${f.name}:$t"
      }.mkString(",") + ">"
      assert(got == expected(name),
        s"testdata table '$name' drifted: got $got — the driver regenerated " +
          "the parquet with a new schema; audit every query reading this table " +
          "(round-7 precedent: ts NTZ broke q_sessionize/q_range_join)")
    }
  }
}
