package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // default 32 to match the local[32] contract (and Bench's default)
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q1,q2 restricts the dump (focused local checks)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly — an empty dump + empty oracle json
    // reads as a CLEAN run to the downstream checker
    only.foreach { f =>
      val unknown = f -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_VERIFY_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    var nOk, nFail = 0
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        nOk += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        nFail += 1
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = only.fold(SparkEntry.oracleSql)(f => SparkEntry.oracleSql.filter(kv => f(kv._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // version stamp: float formatting / semantics can drift across JDK and
    // Spark releases — make every dump attributable to its toolchain
    Files.writeString(Paths.get(s"$outDir/versions.json"),
      s"""{"java": ${q(System.getProperty("java.version"))}, "spark": ${q(spark.version)}}""")
    // One-line machine-readable summary, printed LAST (round-20 verdict,
    // next-round item 1): the driver keeps a bounded stdout tail, and three
    // rounds of CORRECTNESS artifacts came back `{}` with no parseable
    // evidence of what this run did. The dump contents are unchanged; this
    // only makes the run's outcome visible in a truncated capture.
    println(s"""{"verified":$nOk,"failed":$nFail,"out":${q(outDir)}}""")
    spark.stop()
  }
}
