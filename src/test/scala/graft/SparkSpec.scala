package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM for all suites. */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.get("4")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
}
