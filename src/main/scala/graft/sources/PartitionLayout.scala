package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StringType

/** The hive dynamic-partition directory layout both table-format writers
  * write through (Spark's `partitionBy` scratch output): ONE shared set of
  * helpers so the escape rules, segment grammar, and validation guards
  * cannot drift between [[DeltaWriter]] and [[IcebergWriter]] (review
  * finding: three near-verbatim copies). */
private[sources] object PartitionLayout {

  /** A file path in the SCAN's `_metadata.file_path` string domain: Spark
    * publishes the `Path.toUri` percent-ENCODED spelling there (a space in
    * a partition dir reads back as `%20`, a literal `%` as `%25`), so any
    * code matching scan rows back to log/manifest paths by STRING must
    * reproduce that exact encoding driver-side — comparing the raw on-disk
    * spelling silently misses and RESURRECTS deleted rows (the bug class
    * the compact path's review finding documented). `file:` spelling
    * normalized like every other scan-path comparison in this package. */
  def scanPathKey(abs: String): String =
    new HPath(abs).toUri.toString.replaceFirst("^file:/+", "/")

  /** The RAW spelling normalizer the whole package shares: `file:`-scheme
    * spellings fold to plain paths so the two valid local forms compare
    * equal (the string-domain half of [[scanPathKey]], for values that
    * must stay in the raw/manifest domain). */
  def stripFileScheme(p: String): String = p.replaceFirst("^file:/+", "/")

  /** Un-escape one hive partition-dir value; None for the hive
    * default-partition (null) marker. Hive path escaping is %XX on a fixed
    * char set — NOT URL encoding ('+' stays literal), so %XX decodes by
    * hand. */
  def unescape(raw: String): Option[String] = {
    if (raw == "__HIVE_DEFAULT_PARTITION__") return None
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '%' && i + 3 <= raw.length) {
        sb.append(Integer.parseInt(raw.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  /** Part files under a dynamic-partition scratch dir, each with its tuple
    * dir segments (outermost first). */
  def collectParts(fs: FileSystem, p: HPath,
                   segs: Seq[String] = Seq.empty): Seq[(HPath, Seq[String])] =
    fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.contains("="))
        collectParts(fs, st.getPath, segs :+ n)
      else if (n.startsWith("part-") && n.endsWith(".parquet"))
        Seq((st.getPath, segs))
      else Seq.empty
    }

  /** One `name=rawValue` dir segment -> (name, raw value); loud otherwise. */
  def parseSegment(seg: String): (String, String) = {
    val i = seg.indexOf('=')
    require(i > 0, s"unparseable partition dir `$seg` in scratch")
    seg.substring(0, i) -> seg.substring(i + 1)
  }

  /** Refuse empty-string values in string partition columns: the layout
    * maps "" and null to the SAME `__HIVE_DEFAULT_PARTITION__` dir, so an
    * empty-string value would be recorded as null downstream and its rows
    * lost to partition-aware readers. One pushed-down limit-1 scan. */
  def refuseEmptyStringKeys(df: DataFrame, partCols: Seq[String],
                            writer: String): Unit = {
    val stringParts = partCols.filter(c => df.schema(c).dataType == StringType)
    if (stringParts.nonEmpty) {
      import org.apache.spark.sql.functions.{col, lit}
      val bad = df.filter(stringParts.map(c => col(c) === lit("")).reduce(_ || _))
        .limit(1).count()
      require(bad == 0L,
        s"$writer: empty-string values in partition column(s) " +
          s"${stringParts.mkString(",")} are indistinguishable from null in " +
          "the partition layout — filter or NULLIF them first")
    }
  }
}
