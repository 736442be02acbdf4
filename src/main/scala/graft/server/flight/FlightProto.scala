package graft.server.flight

import ProtoWire.{Reader, Writer}

/** Hand-coded encode/decode for the subset of Arrow Flight + Flight SQL
  * protobuf messages the frontend speaks. Field numbers come from the
  * PUBLIC Apache Arrow protocol definitions (format/Flight.proto and
  * format/FlightSql.proto); message semantics mirror the reference server
  * (roapi/src/server/flight_sql.rs). */
object FlightProto {

  private val Empty = Array.emptyByteArray

  // ---- google.protobuf.Any --------------------------------------------------

  final case class AnyMsg(typeUrl: String, value: Array[Byte]) {
    def encode: Array[Byte] =
      new Writer().string(1, typeUrl).bytes(2, value).result()
    def is(url: String): Boolean = typeUrl == url
  }
  object AnyMsg {
    val SqlPrefix = "type.googleapis.com/arrow.flight.protocol.sql."
    def parse(b: Array[Byte]): AnyMsg = {
      val r = new Reader(b); var url = ""; var v = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => url = r.readString()
        case (2, 2) => v = r.readBytes()
        case (_, w) => r.skip(w)
      }
      AnyMsg(url, v)
    }
    def pack(url: String, body: Array[Byte]): AnyMsg = AnyMsg(url, body)
  }

  // ---- Flight.proto ---------------------------------------------------------

  final case class HandshakeRequest(protocolVersion: Long, payload: Array[Byte])
  object HandshakeRequest {
    def parse(b: Array[Byte]): HandshakeRequest = {
      val r = new Reader(b); var pv = 0L; var pl = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 0) => pv = r.readVarint()
        case (2, 2) => pl = r.readBytes()
        case (_, w) => r.skip(w)
      }
      HandshakeRequest(pv, pl)
    }
    def encode(protocolVersion: Long, payload: Array[Byte]): Array[Byte] =
      new Writer().int64(1, protocolVersion).bytes(2, payload).result()
  }

  /** HandshakeResponse has the same shape as the request. */
  object HandshakeResponse {
    def encode(protocolVersion: Long, payload: Array[Byte]): Array[Byte] =
      HandshakeRequest.encode(protocolVersion, payload)
    def parse(b: Array[Byte]): HandshakeRequest = HandshakeRequest.parse(b)
  }

  /** type: 0 unknown, 1 path, 2 cmd. */
  final case class FlightDescriptor(dtype: Int, cmd: Array[Byte], path: Seq[String]) {
    def encode: Array[Byte] = {
      val w = new Writer().int64(1, dtype.toLong).bytes(2, cmd)
      path.foreach(p => w.string(3, p))
      w.result()
    }
  }
  object FlightDescriptor {
    def cmd(bytes: Array[Byte]): FlightDescriptor = FlightDescriptor(2, bytes, Nil)
    def parse(b: Array[Byte]): FlightDescriptor = {
      val r = new Reader(b); var t = 0; var c = Empty
      val p = Seq.newBuilder[String]
      while (r.hasNext) r.readTag() match {
        case (1, 0) => t = r.readVarint().toInt
        case (2, 2) => c = r.readBytes()
        case (3, 2) => p += r.readString()
        case (_, w) => r.skip(w)
      }
      FlightDescriptor(t, c, p.result())
    }
  }

  final case class Ticket(ticket: Array[Byte]) {
    def encode: Array[Byte] = new Writer().bytes(1, ticket).result()
  }
  object Ticket {
    def parse(b: Array[Byte]): Ticket = {
      val r = new Reader(b); var t = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => t = r.readBytes()
        case (_, w) => r.skip(w)
      }
      Ticket(t)
    }
  }

  final case class FlightInfo(schema: Array[Byte], descriptor: FlightDescriptor,
                              ticket: Ticket) {
    def encode: Array[Byte] = {
      val endpoint = new Writer().message(1, new Writer().bytes(1, ticket.ticket))
      new Writer()
        .bytes(1, schema)
        .bytesAlways(2, descriptor.encode)
        .message(3, endpoint)
        .result()
    }
  }
  object FlightInfo {
    /** Parses schema + FIRST endpoint's ticket (what the catalog/query flow
      * uses — the reference likewise always emits exactly one endpoint). */
    def parse(b: Array[Byte]): FlightInfo = {
      val r = new Reader(b); var sch = Empty; var desc = FlightDescriptor(0, Empty, Nil)
      var tk = Ticket(Empty)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => sch = r.readBytes()
        case (2, 2) => desc = FlightDescriptor.parse(r.readBytes())
        case (3, 2) =>
          val er = new Reader(r.readBytes())
          while (er.hasNext) er.readTag() match {
            case (1, 2) => tk = Ticket.parse(er.readBytes())
            case (_, w) => er.skip(w)
          }
        case (_, w) => r.skip(w)
      }
      FlightInfo(sch, desc, tk)
    }
  }

  /** data_body is field 1000 (the public Flight.proto quirk that keeps the
    * potentially-huge buffer last on the wire). */
  final case class FlightData(dataHeader: Array[Byte], dataBody: Array[Byte]) {
    def encode: Array[Byte] =
      new Writer().bytes(2, dataHeader).bytes(1000, dataBody).result()
  }
  object FlightData {
    def parse(b: Array[Byte]): FlightData = {
      val r = new Reader(b); var h = Empty; var body = Empty
      while (r.hasNext) r.readTag() match {
        case (2, 2)    => h = r.readBytes()
        case (1000, 2) => body = r.readBytes()
        case (_, w)    => r.skip(w)
      }
      FlightData(h, body)
    }
  }

  final case class Action(actionType: String, body: Array[Byte]) {
    def encode: Array[Byte] =
      new Writer().string(1, actionType).bytes(2, body).result()
  }
  object Action {
    def parse(b: Array[Byte]): Action = {
      val r = new Reader(b); var t = ""; var body = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => t = r.readString()
        case (2, 2) => body = r.readBytes()
        case (_, w) => r.skip(w)
      }
      Action(t, body)
    }
  }

  /** arrow.flight.protocol.Result (one element of the DoAction stream). */
  object ActionResult {
    def encode(body: Array[Byte]): Array[Byte] = new Writer().bytes(1, body).result()
    def parse(b: Array[Byte]): Array[Byte] = {
      val r = new Reader(b); var body = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => body = r.readBytes()
        case (_, w) => r.skip(w)
      }
      body
    }
  }

  // ---- FlightSql.proto commands --------------------------------------------

  final case class CommandStatementQuery(query: String) {
    def encode: Array[Byte] = new Writer().string(1, query).result()
  }
  object CommandStatementQuery {
    val Url = AnyMsg.SqlPrefix + "CommandStatementQuery"
    def parse(b: Array[Byte]): CommandStatementQuery = {
      val r = new Reader(b); var q = ""
      while (r.hasNext) r.readTag() match {
        case (1, 2) => q = r.readString()
        case (_, w) => r.skip(w)
      }
      CommandStatementQuery(q)
    }
  }

  final case class CommandPreparedStatementQuery(handle: Array[Byte]) {
    def encode: Array[Byte] = new Writer().bytes(1, handle).result()
  }
  object CommandPreparedStatementQuery {
    val Url = AnyMsg.SqlPrefix + "CommandPreparedStatementQuery"
    def parse(b: Array[Byte]): CommandPreparedStatementQuery = {
      val r = new Reader(b); var h = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => h = r.readBytes()
        case (_, w) => r.skip(w)
      }
      CommandPreparedStatementQuery(h)
    }
  }

  case object CommandGetCatalogs {
    val Url = AnyMsg.SqlPrefix + "CommandGetCatalogs"
    def encode: Array[Byte] = Empty
  }

  final case class CommandGetDbSchemas(catalog: Option[String],
                                       dbSchemaFilterPattern: Option[String]) {
    def encode: Array[Byte] = {
      val w = new Writer()
      catalog.foreach(w.stringAlways(1, _))
      dbSchemaFilterPattern.foreach(w.stringAlways(2, _))
      w.result()
    }
  }
  object CommandGetDbSchemas {
    val Url = AnyMsg.SqlPrefix + "CommandGetDbSchemas"
    def parse(b: Array[Byte]): CommandGetDbSchemas = {
      val r = new Reader(b); var c: Option[String] = None; var f: Option[String] = None
      while (r.hasNext) r.readTag() match {
        case (1, 2) => c = Some(r.readString())
        case (2, 2) => f = Some(r.readString())
        case (_, w) => r.skip(w)
      }
      CommandGetDbSchemas(c, f)
    }
  }

  final case class CommandGetTables(catalog: Option[String],
                                    dbSchemaFilterPattern: Option[String],
                                    tableNameFilterPattern: Option[String],
                                    tableTypes: Seq[String],
                                    includeSchema: Boolean) {
    def encode: Array[Byte] = {
      val w = new Writer()
      catalog.foreach(w.stringAlways(1, _))
      dbSchemaFilterPattern.foreach(w.stringAlways(2, _))
      tableNameFilterPattern.foreach(w.stringAlways(3, _))
      tableTypes.foreach(w.string(4, _))
      w.bool(5, includeSchema)
      w.result()
    }
  }
  object CommandGetTables {
    val Url = AnyMsg.SqlPrefix + "CommandGetTables"
    def parse(b: Array[Byte]): CommandGetTables = {
      val r = new Reader(b)
      var c: Option[String] = None; var sf: Option[String] = None
      var tf: Option[String] = None; var inc = false
      val tt = Seq.newBuilder[String]
      while (r.hasNext) r.readTag() match {
        case (1, 2) => c = Some(r.readString())
        case (2, 2) => sf = Some(r.readString())
        case (3, 2) => tf = Some(r.readString())
        case (4, 2) => tt += r.readString()
        case (5, 0) => inc = r.readVarint() != 0
        case (_, w) => r.skip(w)
      }
      CommandGetTables(c, sf, tf, tt.result(), inc)
    }
  }

  case object CommandGetTableTypes {
    val Url = AnyMsg.SqlPrefix + "CommandGetTableTypes"
    def encode: Array[Byte] = Empty
  }

  /** `repeated uint32 info = 1` — packed (proto3 default) or unpacked. */
  final case class CommandGetSqlInfo(info: Seq[Long]) {
    def encode: Array[Byte] =
      if (info.isEmpty) Empty
      else {
        val packed = new Writer()
        info.foreach(packed.varintRaw)
        new Writer().bytesAlways(1, packed.result()).result()
      }
  }
  object CommandGetSqlInfo {
    val Url = AnyMsg.SqlPrefix + "CommandGetSqlInfo"
    def parse(b: Array[Byte]): CommandGetSqlInfo = {
      val r = new Reader(b)
      val ids = Seq.newBuilder[Long]
      while (r.hasNext) r.readTag() match {
        case (1, 2) =>
          val pr = new Reader(r.readBytes())
          while (pr.hasNext) ids += pr.readVarint()
        case (1, 0) => ids += r.readVarint()
        case (_, w) => r.skip(w)
      }
      CommandGetSqlInfo(ids.result())
    }
  }

  /** `string query = 1` (transaction_id ignored). */
  final case class CommandStatementUpdate(query: String) {
    def encode: Array[Byte] = new Writer().string(1, query).result()
  }
  object CommandStatementUpdate {
    val Url = AnyMsg.SqlPrefix + "CommandStatementUpdate"
    def parse(b: Array[Byte]): CommandStatementUpdate = {
      val r = new Reader(b); var q = ""
      while (r.hasNext) r.readTag() match {
        case (1, 2) => q = r.readString()
        case (_, w) => r.skip(w)
      }
      CommandStatementUpdate(q)
    }
  }

  /** `optional int32 data_type = 1` — when present, filters the xdbc type
    * table to that SQL data type code. */
  final case class CommandGetXdbcTypeInfo(dataType: Option[Long]) {
    def encode: Array[Byte] = {
      val w = new Writer()
      dataType.foreach(w.int64Always(1, _))
      w.result()
    }
  }
  object CommandGetXdbcTypeInfo {
    val Url = AnyMsg.SqlPrefix + "CommandGetXdbcTypeInfo"
    def parse(b: Array[Byte]): CommandGetXdbcTypeInfo = {
      val r = new Reader(b); var dt: Option[Long] = None
      while (r.hasNext) r.readTag() match {
        case (1, 0) => dt = Some(r.readVarint())
        case (_, w) => r.skip(w)
      }
      CommandGetXdbcTypeInfo(dt)
    }
  }

  final case class ActionCreatePreparedStatementRequest(query: String) {
    def encode: Array[Byte] = new Writer().string(1, query).result()
  }
  object ActionCreatePreparedStatementRequest {
    val Url = AnyMsg.SqlPrefix + "ActionCreatePreparedStatementRequest"
    def parse(b: Array[Byte]): ActionCreatePreparedStatementRequest = {
      val r = new Reader(b); var q = ""
      while (r.hasNext) r.readTag() match {
        case (1, 2) => q = r.readString()
        case (_, w) => r.skip(w)
      }
      ActionCreatePreparedStatementRequest(q)
    }
  }

  final case class ActionCreatePreparedStatementResult(handle: Array[Byte],
                                                       datasetSchema: Array[Byte]) {
    def encode: Array[Byte] =
      new Writer().bytes(1, handle).bytes(2, datasetSchema).result()
  }
  object ActionCreatePreparedStatementResult {
    val Url = AnyMsg.SqlPrefix + "ActionCreatePreparedStatementResult"
    def parse(b: Array[Byte]): ActionCreatePreparedStatementResult = {
      val r = new Reader(b); var h = Empty; var s = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => h = r.readBytes()
        case (2, 2) => s = r.readBytes()
        case (_, w) => r.skip(w)
      }
      ActionCreatePreparedStatementResult(h, s)
    }
  }

  final case class ActionClosePreparedStatementRequest(handle: Array[Byte]) {
    def encode: Array[Byte] = new Writer().bytes(1, handle).result()
  }
  object ActionClosePreparedStatementRequest {
    val Url = AnyMsg.SqlPrefix + "ActionClosePreparedStatementRequest"
    def parse(b: Array[Byte]): ActionClosePreparedStatementRequest = {
      val r = new Reader(b); var h = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => h = r.readBytes()
        case (_, w) => r.skip(w)
      }
      ActionClosePreparedStatementRequest(h)
    }
  }

  /** The reference's private ticket payload (flight_sql.rs:190-206): a
    * result handle wrapped in an Any with roapi's own type url — kept
    * byte-compatible so a client written against the reference server can
    * exercise the same do_get flow here. */
  final case class FetchResults(handle: String) {
    def encode: Array[Byte] = new Writer().string(1, handle).result()
  }
  object FetchResults {
    val Url = "type.googleapis.com/roapi.example.com.sql.FetchResults"
    def parse(b: Array[Byte]): FetchResults = {
      val r = new Reader(b); var h = ""
      while (r.hasNext) r.readTag() match {
        case (1, 2) => h = r.readString()
        case (_, w) => r.skip(w)
      }
      FetchResults(h)
    }
  }
}
