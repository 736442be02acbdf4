package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.types._

/** OpenAPI 3.0 document generation for the REST layer — the reference's
  * unshipped roadmap item (README.md:331, "auto gen OpenAPI doc for rest
  * layer"): `GET /api/openapi` renders the live registry as a machine-
  * readable API description — one path per registered table carrying the
  * reference's ACTUAL query grammar (`filter[col](op)=`, `columns`,
  * `sort`, `limit`, `page` — rest.rs:23-156), component schemas derived
  * from the current Spark schemas, and the shared /api/sql, /api/graphql
  * and /api/schema routes. Regenerated per request, so a register/drop/
  * refresh is reflected immediately (the registry IS the spec). */
object OpenApi {

  private val mapper = new ObjectMapper()

  def document(engine: Engine): String = {
    val root = mapper.createObjectNode()
    root.put("openapi", "3.0.3")
    val info = root.putObject("info")
    info.put("title", "graft")
    info.put("description",
      "Spark-native roapi-compatible analytics serving layer")
    info.put("version", "0.1.0")
    val paths = root.putObject("paths")
    val schemas = root.putObject("components").putObject("schemas")

    sqlPath(paths)
    graphqlPath(paths)
    schemaPath(paths)

    engine.tableNames.foreach { name =>
      val schema = engine.spark.table(name).schema
      tablePath(paths, name, schema)
      schemas.set[ObjectNode](name, objectSchema(schema))
      ()
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  // ---- per-route builders ---------------------------------------------------

  private def tablePath(paths: ObjectNode, name: String, schema: StructType): Unit = {
    val get = paths.putObject(s"/api/tables/$name").putObject("get")
    get.put("summary", s"Query table `$name`")
    get.put("description",
      "Filters combine as a conjunction; operator order is fixed: " +
        "filters, projection, sort, limit/page (the reference's plan order). " +
        "Single-quoted filter values are strings, integral values are int64, " +
        "anything else float64.")
    val params = get.putArray("parameters")
    queryParam(params, "columns", "string",
      "comma-separated projection, e.g. `col_a,col_b`")
    queryParam(params, "sort", "string",
      "comma-separated sort keys; `-col` = DESC, `+col`/`col` = ASC " +
        "(nulls first in both directions)")
    queryParam(params, "limit", "integer", "max rows returned")
    queryParam(params, "page", "integer", "1-based page over `limit`-sized pages")
    schema.fields.foreach { f =>
      val p = params.addObject()
      p.put("name", s"filter[${f.name}]")
      p.put("in", "query")
      p.put("description",
        s"equality filter on `${f.name}`; append an operator suffix to the " +
          "parameter name for ranges: `filter[" + f.name + "]lt=`, `lte`, " +
          "`gt`, `gte` (aliases `lteq`/`gteq`); `filter[" + f.name +
          "]in=` takes a comma-separated value list (commas inside '..' " +
          "quoting stay literal); `filter[" + f.name + "]like=` takes a " +
          "SQL LIKE pattern (string columns only)")
      p.set[ObjectNode]("schema", typeSchema(f.dataType))
      ()
    }
    val resp = get.putObject("responses").putObject("200")
    resp.put("description", "matching rows (content negotiated via ACCEPT: " +
      "application/json, csv, vnd.apache.arrow.stream/file, parquet, msgpack)")
    resp.putObject("content").putObject("application/json")
      .putObject("schema")
      .put("type", "array")
      .putObject("items").put("$ref", s"#/components/schemas/$name")
    ()
  }

  private def sqlPath(paths: ObjectNode): Unit = {
    val post = paths.putObject("/api/sql").putObject("post")
    post.put("summary", "Execute a SQL statement")
    post.putObject("requestBody").putObject("content")
      .putObject("text/plain").putObject("schema").put("type", "string")
    post.putObject("responses").putObject("200")
      .put("description", "result rows, ACCEPT-negotiated")
    ()
  }

  private def graphqlPath(paths: ObjectNode): Unit = {
    val post = paths.putObject("/api/graphql").putObject("post")
    post.put("summary", "Execute a GraphQL query over the registered tables")
    post.putObject("requestBody").putObject("content")
      .putObject("text/plain").putObject("schema").put("type", "string")
    post.putObject("responses").putObject("200")
      .put("description", "result rows, ACCEPT-negotiated")
    ()
  }

  private def schemaPath(paths: ObjectNode): Unit = {
    val get = paths.putObject("/api/schema").putObject("get")
    get.put("summary", "Arrow-shaped JSON schemas of every registered table")
    get.putObject("responses").putObject("200").put("description", "schemas")
    ()
  }

  // ---- Spark -> OpenAPI schema ---------------------------------------------

  private def objectSchema(st: StructType): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", "object")
    val props = o.putObject("properties")
    st.fields.foreach { f =>
      props.set[ObjectNode](f.name, typeSchema(f.dataType))
      ()
    }
    o
  }

  private def typeSchema(dt: DataType): ObjectNode = {
    val o = mapper.createObjectNode()
    dt match {
      case ByteType | ShortType | IntegerType =>
        o.put("type", "integer"); o.put("format", "int32")
      case LongType => o.put("type", "integer"); o.put("format", "int64")
      case FloatType => o.put("type", "number"); o.put("format", "float")
      case DoubleType => o.put("type", "number"); o.put("format", "double")
      case _: DecimalType => o.put("type", "number")
      case BooleanType => o.put("type", "boolean")
      case DateType => o.put("type", "string"); o.put("format", "date")
      case TimestampType | TimestampNTZType =>
        o.put("type", "string"); o.put("format", "date-time")
      case BinaryType => o.put("type", "string"); o.put("format", "byte")
      case a: ArrayType =>
        o.put("type", "array"); o.set[ObjectNode]("items", typeSchema(a.elementType))
      case s: StructType => return objectSchema(s)
      case m: MapType =>
        o.put("type", "object")
        o.set[ObjectNode]("additionalProperties", typeSchema(m.valueType))
      case _ => o.put("type", "string")
    }
    o
  }

  private def queryParam(params: ArrayNode, name: String, tpe: String,
                         desc: String): Unit = {
    val p = params.addObject()
    p.put("name", name)
    p.put("in", "query")
    p.put("description", desc)
    p.putObject("schema").put("type", tpe)
    ()
  }
}
