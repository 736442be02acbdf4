package graft.plans

import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The serving-path local folds: Sort/Limit over a LocalRelation complete
  * at optimization time, with semantics identical to the distributed
  * operators (ordering, null placement, ties, limit), and the fold never
  * touches distributed (file-scan) plans. */
class LocalFoldSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  import spark.implicits._

  private def localDf = Seq(
    ("c", Some(3.0)), ("a", Some(1.0)), ("d", None: Option[Double]),
    ("b", Some(2.0)), ("e", Some(2.0))).toDF("k", "v")

  test("ORDER BY + LIMIT over a local relation folds to a bare LocalTableScan") {
    localDf.createOrReplaceTempView("lf_t")
    val df = spark.sql(
      "SELECT k, v FROM lf_t WHERE v IS NOT NULL ORDER BY v DESC, k LIMIT 3")
    val plan = df.queryExecution.executedPlan
    assert(plan.isInstanceOf[LocalTableScanExec], plan.toString)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("c", "b", "e"))
  }

  test("fold preserves null ordering, desc/asc mix, and tie stability") {
    localDf.createOrReplaceTempView("lf_t")
    // every ordering is TOTAL (k is unique): "v DESC" alone would leave the
    // (b, e) tie unspecified, where the distributed side's answer depends
    // on partition read order — not a fold bug, an under-specified query
    for (order <- Seq("v DESC NULLS FIRST, k", "v ASC NULLS LAST, k DESC",
                      "v DESC, k DESC", "k")) {
      val sql = s"SELECT k, v FROM lf_t ORDER BY $order"
      val folded = spark.sql(sql).collect().map(_.getString(0)).toSeq
      // reference: the same sort over a DISTRIBUTED copy of the rows (a
      // parquet round-trip defeats the LocalRelation pattern)
      val dir = java.nio.file.Files.createTempDirectory("lfold").toString
      localDf.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView("lf_dist")
      val dist = spark.sql(s"SELECT k, v FROM lf_dist ORDER BY $order")
      assert(!dist.queryExecution.executedPlan.isInstanceOf[LocalTableScanExec])
      assert(folded == dist.collect().map(_.getString(0)).toSeq, s"order=$order")
    }
  }

  test("the engine re-pins small tables locally; use_memory_table=false opts out") {
    import graft.server.Engine
    import graft.sources.TableSource
    val csv = "/root/reference/test_data/uk_cities_with_headers.csv"
    val e = new Engine(spark, readOnly = true)
    e.registerTable(TableSource("lf_cities", csv))
    val plan = e.querySql(
      "SELECT city FROM lf_cities WHERE lat > 51 ORDER BY lat DESC LIMIT 5")
      .queryExecution.executedPlan
    assert(plan.isInstanceOf[LocalTableScanExec], plan.toString)
    e.registerTable(TableSource("lf_cities_fs", csv,
      options = Map("use_memory_table" -> "false")))
    val scan = e.querySql("SELECT city FROM lf_cities_fs ORDER BY lat LIMIT 5")
      .queryExecution.executedPlan.toString
    assert(scan.contains("FileScan"), scan)
    // identical results either way
    val a = e.querySql("SELECT city, lat FROM lf_cities ORDER BY lat DESC LIMIT 5")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = e.querySql("SELECT city, lat FROM lf_cities_fs ORDER BY lat DESC LIMIT 5")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b)
    e.dropTable("lf_cities"); e.dropTable("lf_cities_fs")
  }
}
