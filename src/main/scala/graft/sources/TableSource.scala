package graft.sources

import org.apache.spark.sql.types.{DataType, StructType}

/** Declarative table source, mirroring the reference's TableSource
  * (reference: columnq/src/table/mod.rs:509-522) re-expressed for Spark.
  *
  * `option` keys are passed through to the DataFrameReader; `memTable`
  * replicates `use_memory_table` (cache + materialize vs lazy listing scan).
  */
final case class TableSource(
    name: String,
    uri: String,
    format: Option[String] = None,
    options: Map[String, String] = Map.empty,
    schema: Option[StructType] = None,
    pointer: Option[String] = None,       // RFC-6901 pointer into a JSON doc
    arrayEncoded: Boolean = false,        // positional-array rows (needs schema)
    // tri-state `use_memory_table`: Some(true) = cache + materialize,
    // Some(false) = serve straight from the backing store (opts OUT of the
    // engine's small-table local re-pin), None = unset (engine decides)
    memTable: Option[Boolean] = None,
    reloadIntervalSec: Option[Long] = None,
    // Accepted for config-file compatibility (the reference parses a
    // per-table batch_size on every table, columnq/src/table/mod.rs:569-572,
    // default 8192 = Arrow RecordBatch sizing). Spark has no RecordBatch to
    // size — partitions are split by bytes (files.maxPartitionBytes) — so
    // the value is recorded but intentionally has no execution effect.
    batchSize: Option[Int] = None) {

  /** Format resolution: explicit option beats URI scheme beats extension. */
  def resolvedFormat: String = format.getOrElse {
    // scheme-addressed sources FIRST: their path component is a table/db
    // name that may well end in `.csv`-like text (review finding) —
    // extension sniffing must never capture them
    val dbSchemes = Seq("jdbc:", "mysql://", "postgres://", "postgresql://", "sqlite://")
    if (dbSchemes.exists(uri.startsWith)) return "jdbc"
    if (uri.startsWith("airtable://")) return "airtable"
    val path = uri.takeWhile(_ != '?')
    path.split('.').lastOption.map(_.toLowerCase) match {
      case Some("csv") => "csv"
      case Some("tsv") => "tsv"
      case Some("parquet") => "parquet"
      case Some("orc") => "orc"
      case Some("json") => "json"
      case Some("ndjson") | Some("jsonl") => "ndjson"
      case Some("arrow") => "arrow"
      case Some("arrows") => "arrows"
      case Some("xlsx") => "xlsx"
      case Some("ods") => "ods"
      case Some("xls") => "xls"   // legacy binary, BIFF8 via XlsLoader
      case Some("xlsb") => "xlsb"
      case other =>
        // extension-less local dir with a transaction log => Delta table
        val local = if (uri.startsWith("file://")) uri.stripPrefix("file://") else uri
        if (!uri.contains("://") || uri.startsWith("file://")) {
          val p = java.nio.file.Paths.get(local, "_delta_log")
          if (java.nio.file.Files.isDirectory(p)) "delta"
          else throw new IllegalArgumentException(
            s"cannot infer format for table `$name` from uri `$uri` (ext=$other)")
        } else throw new IllegalArgumentException(
          s"cannot infer format for table `$name` from uri `$uri` (ext=$other)")
    }
  }
}

object TableSource {

  /** CLI/URI grammar `name=uri,opt=val,...`
    * (reference: columnq/src/table/mod.rs:861-923). */
  def parseUriArg(arg: String): TableSource = {
    val eq = arg.indexOf('=')
    require(eq > 0, s"table arg must be `name=uri[,opt=val...]`, got `$arg`")
    val name = arg.substring(0, eq)
    val parts = arg.substring(eq + 1).split(',')
    val uri = parts.head
    val opts = parts.tail.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap
    fromOptions(name, uri, opts)
  }

  def fromOptions(name: String, uri: String, opts: Map[String, String]): TableSource =
    TableSource(
      name = name,
      uri = uri,
      format = opts.get("format"),
      // use_memory_table is surfaced as the TYPED memTable field (the
      // engine reads that to decide local re-pinning) and STRIPPED from
      // reader options — forwarding it let strict JDBC drivers reject the
      // unknown connection property (round-12 advice; toBoolean parses
      // case-insensitively, so FALSE opts out like false)
      options = opts -- Seq("format", "pointer", "array_encoded",
        "reload_interval", "batch_size", "use_memory_table"),
      pointer = opts.get("pointer"),
      arrayEncoded = opts.get("array_encoded").exists(_.toBoolean),
      memTable = opts.get("use_memory_table").map(_.toBoolean),
      reloadIntervalSec = opts.get("reload_interval").map(_.toLong),
      batchSize = opts.get("batch_size").map(_.toInt))

  /** Declared-schema parsing from simple `name:type:nullable` column specs
    * (the reference's YAML schema.columns, columnq/src/table/mod.rs:170-219). */
  def parseSchema(cols: Seq[(String, String, Boolean)]): StructType =
    StructType(cols.map { case (n, t, nullable) =>
      org.apache.spark.sql.types.StructField(n, DataType.fromDDL(t), nullable)
    })
}
