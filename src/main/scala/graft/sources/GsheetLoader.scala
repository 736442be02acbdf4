package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Google Sheets loader: the Sheets v4 REST flow and the parse-vote typing
  * lattice of the reference (columnq/src/table/google_spreadsheets.rs:106-183,
  * 260-311), HTTP layer on java.net.http.
  *
  * The sandbox has no egress, so `api_base` is an option (default the public
  * endpoint) — specs point it at a local mock serving the same JSON shapes.
  * Auth: pass a ready bearer token via `auth_token`; the reference's
  * service-account JWT exchange needs Google's token endpoint and is not
  * reproducible offline.
  *
  * Scale: a sheet API response is bounded (10M cell hard product limit), so
  * driver-side parse + createDataFrame is the same shape as the reference's
  * MemTable — sheets are config/dim data, never the 100 TB fact side.
  */
object GsheetLoader {

  private val mapper = new ObjectMapper()
  private val sheetUriRx = "https://docs.google.com/spreadsheets/d/([^/#?]+).*".r

  def load(spark: SparkSession, src: TableSource): DataFrame = {
    val spreadsheetId = src.uri match {
      case sheetUriRx(id) => id
      case other => throw new IllegalArgumentException(
        s"table `${src.name}`: not a Google Sheets uri: `$other`")
    }
    val apiBase = src.options.getOrElse("api_base", "https://sheets.googleapis.com")
    val token = src.options.getOrElse("auth_token", throw new IllegalArgumentException(
      s"table `${src.name}`: gsheet loader needs an `auth_token` option"))

    val title = src.options.get("sheet_title").getOrElse {
      resolveSheetTitle(apiBase, token, spreadsheetId, gidFromFragment(src.uri))
    }
    val values = fetchValues(apiBase, token, spreadsheetId, title)
    valuesToDataFrame(spark, values)
  }

  /** `#gid=123` fragment -> sheet id (google_spreadsheets.rs:280-294). */
  private[sources] def gidFromFragment(uri: String): Option[Long] = {
    val frag = uri.dropWhile(_ != '#').stripPrefix("#")
    frag.split('=') match {
      case Array("gid", v) => v.toLongOption
      case _ => None
    }
  }

  private def get(url: String, token: String): JsonNode = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Authorization", s"Bearer $token").GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() / 100 == 2, s"sheets api $url -> HTTP ${resp.statusCode()}")
    mapper.readTree(resp.body())
  }

  /** Sheet title by gid, else the index-0 sheet (rs:296-310). */
  private def resolveSheetTitle(apiBase: String, token: String,
                                id: String, gid: Option[Long]): String = {
    val meta = get(s"$apiBase/v4/spreadsheets/$id", token)
    val sheets = Option(meta.get("sheets")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val chosen = gid match {
      case Some(g) => sheets.find(_.at("/properties/sheetId").asLong() == g)
        .getOrElse(throw new IllegalArgumentException(s"no sheet with gid $g"))
      case None => sheets.find(_.at("/properties/index").asInt() == 0)
        .getOrElse(throw new IllegalArgumentException("spreadsheet has no sheets"))
    }
    chosen.at("/properties/title").asText()
  }

  private def fetchValues(apiBase: String, token: String,
                          id: String, title: String): Vector[Vector[String]] = {
    val encoded = java.net.URLEncoder.encode(title, "UTF-8").replace("+", "%20")
    val node = get(s"$apiBase/v4/spreadsheets/$id/values/$encoded", token)
    Option(node.get("values")).map { vs =>
      vs.elements().asScala.map(row =>
        row.elements().asScala.map(_.asText()).toVector).toVector
    }.getOrElse(Vector.empty)
  }

  // ---- typing lattice (rs:106-148) ------------------------------------------

  private[sources] def inferValueType(v: String): DataType =
    if (v.toLongOption.isDefined) LongType
    else if (v.toDoubleOption.isDefined) DoubleType
    else v.toLowerCase match {
      case "true" | "false" => BooleanType
      case _ => StringType
    }

  private[sources] def coerce(l: DataType, r: DataType): DataType = (l, r) match {
    case (BooleanType, BooleanType) => BooleanType
    case (LongType, LongType) => LongType
    case (DoubleType, DoubleType) | (DoubleType, LongType) | (LongType, DoubleType) =>
      DoubleType
    case _ => StringType
  }

  private[sources] def inferSchema(rows: Seq[Vector[String]]): StructType = {
    require(rows.nonEmpty, "empty sheet: no header row")
    val names = rows.head
    val votes = scala.collection.mutable.LinkedHashMap[Int, Set[DataType]]()
    rows.drop(1).foreach { row =>
      require(row.length <= names.length,
        s"row has ${row.length} values but header has ${names.length} columns")
      row.zipWithIndex.foreach { case (v, i) =>
        votes(i) = votes.getOrElse(i, Set.empty) + inferValueType(v)
      }
    }
    StructType(names.zipWithIndex.map { case (n, i) =>
      val set = votes.getOrElse(i, Set(StringType: DataType))
      StructField(n.replace(' ', '_'), set.reduce(coerce), nullable = true)
    })
  }

  private[sources] def valuesToDataFrame(spark: SparkSession,
                                         values: Seq[Vector[String]]): DataFrame = {
    val schema = inferSchema(values)
    val rows = values.drop(1).map { row =>
      Row.fromSeq(schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        if (i >= row.length) null
        else f.dataType match {
          case LongType => row(i).toLongOption.getOrElse(
            throw new IllegalArgumentException(s"expected i64, got `${row(i)}`"))
          case DoubleType => row(i).toDoubleOption.getOrElse(
            throw new IllegalArgumentException(s"expected f64, got `${row(i)}`"))
          case BooleanType => row(i).equalsIgnoreCase("true")
          case _ => row(i)
        }
      })
    }
    spark.createDataFrame(rows.asJava, schema)
  }
}
