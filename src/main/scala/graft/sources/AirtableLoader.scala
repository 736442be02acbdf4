package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Airtable loader — the reference's unshipped roadmap box
  * (reference: README.md:320 "[ ] Airtable"), built against Airtable's public
  * REST API (`GET /v0/{baseId}/{table}` with `pageSize`/`offset` pagination
  * and Bearer personal-access-token auth).
  *
  * URI grammar: `airtable://{baseId}/{tableNameOrId}`. Options:
  *   - `auth_token` (required): personal access token / legacy API key;
  *   - `api_base` (default `https://api.airtable.com`): the sandbox has no
  *     egress, so specs point this at a local mock serving the same JSON;
  *   - `view`: optional view name forwarded to the API (server-side filter
  *     and record ordering);
  *   - `page_size`: records per page (API caps at 100, the default).
  *
  * Schema: Airtable records OMIT empty fields, so the column set is the
  * union of field keys over all records in first-seen order, typed by the
  * same vote-and-coerce lattice the Sheets loader uses
  * (columnq/src/table/google_spreadsheets.rs:106-148) extended with JSON
  * shapes: scalar number/bool/string vote directly; homogeneous scalar
  * arrays (multi-select, linked-record ids) vote `array<coerced>`; objects
  * and mixed arrays fall back to their raw JSON text. Record metadata is
  * surfaced as leading `_id` / `_created_time` columns.
  *
  * Scale: one page is <=100 records and a base tops out at ~500k records
  * (Airtable's own plan limits), so driver-side parse + createDataFrame is
  * the same dim-table shape as the Sheets/MemTable path — Airtable is
  * config/dim data, never the 100 TB fact side.
  */
object AirtableLoader {

  private val mapper = new ObjectMapper()

  final private case class Target(baseId: String, table: String)

  private def parseTarget(src: TableSource): Target = src.uri match {
    case u if u.startsWith("airtable://") =>
      u.stripPrefix("airtable://").split("/", 2) match {
        case Array(b, t) if b.nonEmpty && t.nonEmpty => Target(b, t)
        case _ => throw new IllegalArgumentException(
          s"table `${src.name}`: airtable uri must be airtable://{baseId}/{table}, got `$u`")
      }
    case other => throw new IllegalArgumentException(
      s"table `${src.name}`: not an airtable uri: `$other`")
  }

  def load(spark: SparkSession, src: TableSource): DataFrame = {
    val tgt = parseTarget(src)
    val apiBase = src.options.getOrElse("api_base", "https://api.airtable.com")
    val token = src.options.getOrElse("auth_token", throw new IllegalArgumentException(
      s"table `${src.name}`: airtable loader needs an `auth_token` option"))
    val pageSize = src.options.get("page_size").flatMap(_.toIntOption).getOrElse(100)
    require(pageSize > 0 && pageSize <= 100,
      s"table `${src.name}`: page_size must be in [1,100], got $pageSize")
    val records = fetchAll(apiBase, token, tgt, src.options.get("view"), pageSize)
    recordsToDataFrame(spark, records)
  }

  /** Follow the `offset` cursor until the API stops returning one. */
  private def fetchAll(apiBase: String, token: String, tgt: Target,
                       view: Option[String], pageSize: Int): Vector[JsonNode] = {
    val client = HttpClient.newHttpClient()
    val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    val baseUrl = s"$apiBase/v0/${enc(tgt.baseId)}/${enc(tgt.table)}?pageSize=$pageSize" +
      view.map(v => s"&view=${enc(v)}").getOrElse("")
    val out = Vector.newBuilder[JsonNode]
    var offset: Option[String] = None
    var pages = 0
    while ({
      val url = baseUrl + offset.map(o => s"&offset=${enc(o)}").getOrElse("")
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Authorization", s"Bearer $token").GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() / 100 == 2, s"airtable api $url -> HTTP ${resp.statusCode()}")
      val node = mapper.readTree(resp.body())
      Option(node.get("records")).foreach(rs => rs.elements().asScala.foreach(out += _))
      // a JSON-null offset means "last page", not the cursor string "null"
      offset = Option(node.get("offset")).filterNot(_.isNull)
        .map(_.asText()).filter(_.nonEmpty)
      pages += 1
      require(pages <= 100000, "airtable pagination did not terminate (offset loop?)")
      offset.isDefined
    }) ()
    out.result()
  }

  // ---- typing ---------------------------------------------------------------

  /** One JSON value's vote. Objects / mixed arrays degrade to StringType via
    * coerce; empty arrays vote array<string> (no element evidence). */
  private[sources] def inferNodeType(v: JsonNode): DataType = v.getNodeType match {
    case JsonNodeType.BOOLEAN => BooleanType
    case JsonNodeType.NUMBER => if (v.isIntegralNumber) LongType else DoubleType
    case JsonNodeType.STRING => StringType
    case JsonNodeType.ARRAY =>
      val elems = v.elements().asScala.map(inferNodeType).toSeq
      if (elems.exists(_.isInstanceOf[ArrayType])) StringType // nested arrays -> json text
      else ArrayType(elems.reduceOption(GsheetLoader.coerce).getOrElse(StringType))
    case _ => StringType // objects, null-in-value, anything exotic
  }

  private[sources] def coerceTop(l: DataType, r: DataType): DataType = (l, r) match {
    case (ArrayType(a, _), ArrayType(b, _)) => ArrayType(GsheetLoader.coerce(a, b))
    case (_: ArrayType, _) | (_, _: ArrayType) => StringType
    case (a, b) => GsheetLoader.coerce(a, b)
  }

  private[sources] def inferSchema(records: Seq[JsonNode]): StructType = {
    val votes = mutable.LinkedHashMap[String, DataType]()
    records.foreach { rec =>
      val fields = Option(rec.get("fields")).getOrElse(mapper.createObjectNode())
      fields.properties().asScala.foreach { e =>
        if (!e.getValue.isNull) {
          val t = inferNodeType(e.getValue)
          votes(e.getKey) = votes.get(e.getKey).map(coerceTop(_, t)).getOrElse(t)
        }
      }
    }
    StructType(
      StructField("_id", StringType, nullable = false) +:
      StructField("_created_time", StringType, nullable = true) +:
      votes.toSeq.map { case (n, t) => StructField(n, t, nullable = true) })
  }

  private def scalarValue(v: JsonNode, t: DataType): Any = t match {
    case LongType => v.asLong()
    case DoubleType => v.asDouble()
    case BooleanType => v.asBoolean()
    case _ => if (v.isTextual) v.asText() else v.toString // objects keep raw json
  }

  private[sources] def recordsToDataFrame(spark: SparkSession,
                                          records: Seq[JsonNode]): DataFrame = {
    val schema = inferSchema(records)
    val rows = records.map { rec =>
      val fields = Option(rec.get("fields")).getOrElse(mapper.createObjectNode())
      Row.fromSeq(schema.fields.toIndexedSeq.map { f =>
        f.name match {
          case "_id" => Option(rec.get("id")).map(_.asText()).getOrElse("")
          case "_created_time" => Option(rec.get("createdTime")).map(_.asText()).orNull
          case n =>
            val v = fields.get(n)
            if (v == null || v.isNull) null
            else f.dataType match {
              case ArrayType(et, _) =>
                // null elements stay SQL NULL, not the string "null"
                if (v.isArray) v.elements().asScala
                  .map(e => if (e.isNull) null else scalarValue(e, et)).toSeq
                else Seq(scalarValue(v, et)) // scalar coerced into a 1-elem array
              case t => scalarValue(v, t)
            }
        }
      })
    }
    spark.createDataFrame(rows.asJava, schema)
  }
}
