package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Per-format load dispatch (reference: columnq/src/table/mod.rs:790-858).
  *
  * Listing-mode formats map straight onto `spark.read` (partition discovery,
  * filter pushdown and column pruning come free and survive a 100 TB
  * listing); the single-document JSON loader with RFC-6901 pointer /
  * positional-array rows is custom, as no Spark reader covers it
  * (reference: columnq/src/table/json.rs:49-235).
  */
object Loaders {

  /** stdin byte source, swappable for tests (reference: columnq/src/table/
    * mod.rs:888-896 buffers stdin into a memory-backed table source). */
  @volatile var stdinStream: () => java.io.InputStream = () => System.in

  def load(spark: SparkSession, rawSrc: TableSource): DataFrame = {
    if (rawSrc.uri == "stdin") return loadStdin(spark, rawSrc)
    // object-store URIs (s3/gs/az/...) resolve onto Hadoop connector schemes
    // with env credentials injected (reference: columnq.rs:209-273)
    val src = ObjectStores.resolve(spark, rawSrc)
    val df = src.resolvedFormat match {
      case "csv" => csv(spark, src, delimiter = src.options.getOrElse("delimiter", ","))
      case "tsv" => csv(spark, src, delimiter = "\t")
      case "parquet" =>
        val r = spark.read.options(src.options)
        effectiveSchema(spark, src, "parquet").map(r.schema).getOrElse(r).parquet(src.uri)
      case "ndjson" =>
        val r = spark.read.options(src.options)
        effectiveSchema(spark, src, "ndjson").map(r.schema).getOrElse(r).json(src.uri)
      // beyond-reference listing format: Spark-native ORC — same predicate
      // pushdown / column pruning / partition discovery story as parquet
      case "orc" =>
        val r = spark.read.options(src.options)
        src.schema.map(r.schema).getOrElse(r).orc(src.uri)
      case "json" => jsonDocument(spark, src)
      case "arrow" => // IPC file format
        org.apache.spark.sql.GraftArrowBridge.fromIpcFileBytes(spark,
          fetchBytes(src.uri, httpHeaders(src), spark.sparkContext.hadoopConfiguration))
      case "arrows" => // IPC stream format
        org.apache.spark.sql.GraftArrowBridge.fromIpcStreamBytes(spark,
          fetchBytes(src.uri, httpHeaders(src), spark.sparkContext.hadoopConfiguration))
      case "xlsx" | "ods" | "xls" | "xlsb" => ExcelLoader.load(spark, src)
      case "delta" => DeltaLoader.load(spark, src)
      case "iceberg" => IcebergLoader.load(spark, src)
      case "google_spreadsheet" | "gsheet" => GsheetLoader.load(spark, src)
      case "airtable" => AirtableLoader.load(spark, src)
      case "jdbc" | "mysql" | "postgres" | "sqlite" => jdbc(spark, src)
      case other => throw new IllegalArgumentException(
        s"unsupported table format `$other` for `${src.name}`")
    }
    if (src.memTable.contains(true)) df.cache() else df
  }

  /** Database tables (reference: columnq/src/table/database.rs:37-73 loads
    * `SELECT * FROM {table}` over connectorx from mysql/postgres/sqlite
    * URIs into a mem table). Spark-native: `spark.read.jdbc` — predicate
    * pushdown and parallel partitioned reads come from the stock JDBC
    * source, and the reference's partition-free "read it all" shape is just
    * the default single partition. Reference-style `mysql://`,
    * `postgres://`, `sqlite://` URIs map onto JDBC URLs; partition options
    * (partitionColumn/lowerBound/upperBound/numPartitions) and `driver`
    * pass straight through — that is the 100 TB parallel-ingest path.
    * Exercised end-to-end against Spark's bundled embedded Derby. */
  private[sources] def jdbcUrl(uri: String): String =
    if (uri.startsWith("jdbc:")) uri
    else if (uri.startsWith("mysql://")) "jdbc:" + uri
    else if (uri.startsWith("postgres://")) "jdbc:postgresql://" + uri.stripPrefix("postgres://")
    else if (uri.startsWith("postgresql://")) "jdbc:" + uri
    else if (uri.startsWith("sqlite://")) "jdbc:sqlite:" + uri.stripPrefix("sqlite://")
    else uri

  private def jdbc(spark: SparkSession, src: TableSource): DataFrame =
    spark.read.options(src.options - "table")
      .format("jdbc").option("url", jdbcUrl(src.uri))
      .option("dbtable", src.options.getOrElse("table", src.name))
      .load()

  /** Load + register as a temp view; returns the DataFrame. */
  def register(spark: SparkSession, src: TableSource): DataFrame = {
    val df = load(spark, src)
    df.createOrReplaceTempView(src.name)
    df
  }

  private def csv(spark: SparkSession, src: TableSource, delimiter: String): DataFrame = {
    val r = spark.read
      .option("header", src.options.getOrElse("has_header", "true"))
      .option("delimiter", delimiter)
      .options(src.options - "has_header")
    effectiveSchema(spark, src, "csv").map(r.schema)
      .getOrElse(r.option("inferSchema", "true"))
      .csv(src.uri)
  }

  /** Declared schema, else `schema_from_files` (comma-separated paths under
    * the table root): infer from ONLY those files in one reader pass — Spark
    * merges across them, the analog of the reference's Schema::try_merge
    * (columnq/src/table/mod.rs:704-752). At 100 TB this skips listing-wide
    * inference (a full-footer scan for parquet, a data scan for csv/json)
    * in favor of a declared sample. */
  private[sources] def effectiveSchema(spark: SparkSession, src: TableSource,
                                       fmt: String): Option[StructType] =
    src.schema.orElse(src.options.get("schema_from_files").map { list =>
      val files = list.split("[;,]").map(_.trim).filter(_.nonEmpty)
      require(files.nonEmpty, s"table `${src.name}`: schema_from_files is an empty list")
      val root = src.uri.stripSuffix("/")
      val paths = files.map(f => if (f.startsWith("/") || f.contains("://")) f else s"$root/$f")
      val r = spark.read
      (fmt match {
        case "csv" => r.option("header", src.options.getOrElse("has_header", "true"))
          .option("inferSchema", "true").csv(paths.toIndexedSeq: _*)
        case "ndjson" => r.json(paths.toIndexedSeq: _*)
        case _ => r.option("mergeSchema", "true").parquet(paths.toIndexedSeq: _*)
      }).schema
    })

  /** Buffer stdin to a spill file, then load it under the declared format. */
  private def loadStdin(spark: SparkSession, src: TableSource): DataFrame = {
    val fmt = src.format.getOrElse(throw new IllegalArgumentException(
      s"table `${src.name}`: stdin source needs an explicit format option"))
    val bytes = stdinStream().readAllBytes()
    val tmp = java.nio.file.Files.createTempFile("graft_stdin_", s".$fmt")
    tmp.toFile.deleteOnExit()
    java.nio.file.Files.write(tmp, bytes)
    load(spark, src.copy(uri = tmp.toString, format = Some(fmt)))
  }

  // ---- single-document JSON (pointer + array_encoded) ----------------------

  /** Table options prefixed `header.` become HTTP request headers
    * (reference: columnq/src/io/http.rs:59-72 header override). */
  private[sources] def httpHeaders(src: TableSource): Map[String, String] =
    src.options.collect { case (k, v) if k.startsWith("header.") =>
      k.stripPrefix("header.") -> v
    }

  // One shared client: connection pooling across fetches, and a refresh tick
  // re-reading an HTTP table no longer builds a client per call
  private lazy val httpClient = java.net.http.HttpClient.newHttpClient()

  /** Single-document fetch: HTTP(S) via the JDK client (custom headers);
    * everything else — local paths, file://, and object-store URIs once
    * their connectors are on the classpath — through the Hadoop FileSystem
    * API (the reference's object-or-listing IO layer, io/object_store.rs).
    * `hadoopConf` is required (no default): the session conf carries the
    * object-store credentials wired by [[ObjectStores]] — a fresh
    * `new Configuration()` would silently drop them. */
  private[sources] def fetchBytes(uri: String,
                                  headers: Map[String, String],
                                  hadoopConf: org.apache.hadoop.conf.Configuration): Array[Byte] =
    if (uri.startsWith("http://") || uri.startsWith("https://")) {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri)).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = httpClient.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() / 100 == 2, s"GET $uri -> HTTP ${resp.statusCode()}")
      resp.body()
    } else {
      val p = new org.apache.hadoop.fs.Path(uri)
      val in = p.getFileSystem(hadoopConf).open(p)
      try in.readAllBytes() finally in.close()
    }

  /** RFC-6901 JSON pointer navigation. */
  private[sources] def pointTo(root: JsonNode, pointer: String): JsonNode = {
    val node = root.at(pointer)
    if (node.isMissingNode)
      throw new IllegalArgumentException(s"JSON pointer `$pointer` matched nothing")
    node
  }

  def jsonDocument(spark: SparkSession, src: TableSource): DataFrame = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(fetchBytes(src.uri, httpHeaders(src),
      spark.sparkContext.hadoopConfiguration))
    val data = src.pointer.map(pointTo(root, _)).getOrElse(root)
    require(data.isArray, s"table `${src.name}`: JSON document must be an array of rows")
    if (src.arrayEncoded) {
      val schema = src.schema.getOrElse(throw new IllegalArgumentException(
        s"table `${src.name}`: array_encoded requires a declared schema"))
      val rows = new scala.collection.mutable.ArrayBuffer[Row](data.size)
      data.forEach { arr =>
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          jsonScalar(arr.get(i), f.dataType)
        }
        rows += Row.fromSeq(vals.toIndexedSeq)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
    } else {
      // array of objects: re-serialize each element and let Spark's JSON
      // reader do inference/merging (mirrors infer_json_schema_from_iterator)
      val lines = new scala.collection.mutable.ArrayBuffer[String](data.size)
      data.forEach(el => lines += mapper.writeValueAsString(el))
      import spark.implicits._
      val ds = spark.createDataset(lines.toSeq)
      val r = spark.read
      src.schema.map(r.schema).getOrElse(r).json(ds)
    }
  }

  private def jsonScalar(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) null
    else dt match {
      case StringType => n.asText()
      case IntegerType => n.asInt()
      case LongType => n.asLong()
      case DoubleType => n.asDouble()
      case FloatType => n.asDouble().toFloat
      case BooleanType => n.asBoolean()
      case TimestampType => java.sql.Timestamp.from(java.time.Instant.parse(n.asText()))
      case DateType => java.sql.Date.valueOf(n.asText())
      case _ => n.asText()
    }
  }
}
