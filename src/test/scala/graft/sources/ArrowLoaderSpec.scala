package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.GraftArrowBridge
import graft.SparkSpec

class ArrowLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "s", "x")

  test("arrow IPC stream file round-trips through the loader") {
    val dir = Files.createTempDirectory("graft_arrow")
    val p = dir.resolve("t.arrows")
    Files.write(p, GraftArrowBridge.toIpcStreamBytes(sample))
    val df = Loaders.load(spark, TableSource("t", p.toString))
    assert(df.schema.fieldNames.toSeq == Seq("id", "s", "x"))
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("arrow IPC file format round-trips through the loader") {
    val dir = Files.createTempDirectory("graft_arrow")
    val p = dir.resolve("t.arrow")
    Files.write(p, GraftArrowBridge.toIpcFileBytes(sample))
    val df = Loaders.load(spark, TableSource("t", p.toString))
    assert(df.count() == 3)
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }
}
