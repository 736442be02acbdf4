package graft.frontend

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphQL read-only query frontend.
  *
  * Replicates the reference's deliberately small GraphQL subset
  * (reference: columnq/src/query/graphql.rs): a single operation containing a
  * single top-level field — the table name — with optional `filter` / `sort` /
  * `limit` / `page` arguments and a flat selection set (the projection).
  * Fragments, mutations and subscriptions are rejected (graphql.rs:155-224).
  *
  * {{{
  * { table(filter: {col: {gte: 1, lt: 5}, col2: "x"},
  *         sort: [{field: "col", order: "desc"}], limit: 10, page: 2)
  *   { col col2 } }
  * }}}
  *
  * Operator order matches the reference: filter -> projection -> sort ->
  * limit (graphql.rs:253-342). Sorts are nulls-first in both directions.
  * Literal typing: Boolean / String / Int64 / Float64 (graphql.rs:80-101).
  *
  * The parser is a tiny hand-rolled recursive-descent over the June-2018
  * GraphQL grammar subset (offline build: no graphql dependency available).
  */
object GraphQl {

  final case class GraphQlError(message: String)
      extends RuntimeException(s"invalid graphql query: $message")

  // ---- AST -----------------------------------------------------------------
  sealed trait GVal
  final case class GStr(v: String) extends GVal
  final case class GInt(v: Long) extends GVal
  final case class GFloat(v: Double) extends GVal
  final case class GBool(v: Boolean) extends GVal
  final case class GEnum(v: String) extends GVal
  final case class GList(vs: List[GVal]) extends GVal
  final case class GObj(fields: List[(String, GVal)]) extends GVal

  final case class GField(name: String, args: List[(String, GVal)],
                          selections: List[String])

  // ---- Tokenizer -----------------------------------------------------------
  private sealed trait Tok
  private case class TPunct(c: Char) extends Tok
  private case class TName(s: String) extends Tok
  private case class TInt(v: Long) extends Tok
  private case class TFloat(v: Double) extends Tok
  private case class TStr(s: String) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val toks = List.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace || c == ',') i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if ("{}()[]:!".contains(c)) { toks += TPunct(c); i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && q.charAt(i) != '"') {
          if (q.charAt(i) == '\\' && i + 1 < n) {
            q.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case 'r' => sb += '\r'; case other => sb += other
            }
            i += 2
          } else { sb += q.charAt(i); i += 1 }
        }
        if (i >= n) throw GraphQlError("unterminated string")
        i += 1
        toks += TStr(sb.toString)
      } else if (c == '-' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (q.charAt(i).isDigit || q.charAt(i) == '.' ||
          q.charAt(i) == 'e' || q.charAt(i) == 'E' || q.charAt(i) == '+' ||
          (q.charAt(i) == '-' && (q.charAt(i - 1) == 'e' || q.charAt(i - 1) == 'E')))) i += 1
        val s = q.substring(start, i)
        toks += s.toLongOption.map(TInt(_))
          .getOrElse(s.toDoubleOption.map(TFloat(_))
            .getOrElse(throw GraphQlError(s"invalid number $s")))
      } else if (c == '_' || c.isLetter) {
        val start = i
        while (i < n && (q.charAt(i) == '_' || q.charAt(i).isLetterOrDigit)) i += 1
        toks += TName(q.substring(start, i))
      } else throw GraphQlError(s"unexpected character '$c'")
    }
    toks.result()
  }

  // ---- Parser --------------------------------------------------------------
  private final class Parser(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil    => throw GraphQlError("unexpected end of query")
    }
    def expect(c: Char): Unit = next() match {
      case TPunct(`c`) => ()
      case other       => throw GraphQlError(s"expected '$c', got $other")
    }
    def name(): String = next() match {
      case TName(s) => s
      case other    => throw GraphQlError(s"expected name, got $other")
    }

    def value(): GVal = next() match {
      case TStr(s)       => GStr(s)
      case TInt(v)       => GInt(v)
      case TFloat(v)     => GFloat(v)
      case TName("true") => GBool(true)
      case TName("false") => GBool(false)
      case TName("null") => throw GraphQlError("null literals are not supported")
      case TName(s)      => GEnum(s)
      case TPunct('[') =>
        val items = List.newBuilder[GVal]
        while (!peek.contains(TPunct(']'))) items += value()
        expect(']'); GList(items.result())
      case TPunct('{') =>
        val fields = List.newBuilder[(String, GVal)]
        while (!peek.contains(TPunct('}'))) { val k = name(); expect(':'); fields += (k -> value()) }
        expect('}'); GObj(fields.result())
      case other => throw GraphQlError(s"unexpected value token $other")
    }

    def field(): GField = {
      val fname = name()
      val args = List.newBuilder[(String, GVal)]
      if (peek.contains(TPunct('('))) {
        expect('(')
        while (!peek.contains(TPunct(')'))) { val k = name(); expect(':'); args += (k -> value()) }
        expect(')')
      }
      val sels = List.newBuilder[String]
      if (peek.contains(TPunct('{'))) {
        expect('{')
        while (!peek.contains(TPunct('}'))) {
          sels += name()
          if (peek.contains(TPunct('{')))
            throw GraphQlError("selection set in query should only contain Fields")
        }
        expect('}')
      }
      GField(fname, args.result(), sels.result())
    }

    /** document := ('query' name?)? '{' field '}'  — single op, single field. */
    def document(): GField = {
      peek match {
        case Some(TName("query")) => next(); peek match {
          case Some(TName(_)) => next(); case _ => ()
        }
        case Some(TName(op)) if op == "mutation" || op == "subscription" =>
          throw GraphQlError(s"$op is not supported, please use query")
        case _ => ()
      }
      expect('{')
      val f = field()
      if (!peek.contains(TPunct('}')))
        throw GraphQlError("only one field is supported in query selection")
      expect('}')
      if (toks.nonEmpty) throw GraphQlError("only one definition is supported per query")
      f
    }
  }

  def parse(query: String): GField = new Parser(tokenize(query)).document()

  // ---- Translation to DataFrame ops ---------------------------------------
  private def literal(v: GVal): Column = v match {
    case GBool(b)  => lit(b)
    case GStr(s)   => lit(s)
    case GInt(n)   => lit(n)
    case GFloat(f) => lit(f)
    case other     => throw GraphQlError(s"invalid operand in filter predicate: $other")
  }

  private def predicates(c: String, filter: GVal,
      dt: Option[org.apache.spark.sql.types.DataType]): Seq[Column] = filter match {
    case GObj(ops) => ops.map { case (op, operand) =>
      val l = col(c)
      op match {
        case "eq"           => l === literal(operand)
        case "lt"           => l < literal(operand)
        case "lte" | "lteq" => l <= literal(operand)
        case "gt"           => l > literal(operand)
        case "gte" | "gteq" => l >= literal(operand)
        // beyond-reference extension mirroring the REST `in` op: the
        // operand is a GraphQL list, each element typed like a scalar
        case "in" => operand match {
          case GList(vs) => l.isin(vs.map(literal): _*)
          case other => throw GraphQlError(s"in predicate takes a list, got: $other")
        }
        // SQL LIKE pattern (%/_ wildcards) over a string operand; string
        // columns only — same loud rule as the REST frontend (a numeric
        // LIKE would silently cast the column)
        case "like" => operand match {
          case GStr(s) =>
            RestQuery.requireStringColumn(dt,
              other => GraphQlError(s"like predicate requires a string column, got $other"))
            l.like(s)
          case other => throw GraphQlError(s"like predicate takes a string pattern, got: $other")
        }
        case other => throw GraphQlError(s"invalid filter predicate operator, got: $other")
      }
    }
    case GBool(_) | GInt(_) | GFloat(_) | GStr(_) =>
      Seq(col(c) === literal(filter))
    case other => throw GraphQlError(s"filter predicate should be defined as object, got: $other")
  }

  private def sortCol(v: GVal): Column = v match {
    case GObj(opts) =>
      val field = opts.collectFirst { case ("field", GStr(s)) => s }
        .getOrElse(throw GraphQlError("sort option requires `field` argument"))
      opts.collectFirst { case ("order", GStr(s)) => s } match {
        case None | Some("asc") => col(field).asc_nulls_first
        case Some("desc")       => col(field).desc_nulls_first
        case Some(other) =>
          throw GraphQlError(s"sort order needs to be either `desc` or `asc`, got: $other")
      }
    case other => throw GraphQlError(s"sort condition should be defined as object, got: $other")
  }

  /** Apply a parsed field to a DataFrame: filter -> project -> sort -> limit. */
  def applyField(df0: DataFrame, f: GField): DataFrame = {
    var df = df0
    lazy val colTypes = RestQuery.columnTypes(df0.schema)
    f.args.collectFirst { case ("filter", v) => v }.foreach {
      case GObj(filters) =>
        filters.foreach { case (c, fv) =>
          predicates(c, fv, colTypes.get(c.toLowerCase)).foreach(p => df = df.filter(p)) }
      case other => throw GraphQlError(s"filter argument takes object as value, got: $other")
    }
    if (f.selections.nonEmpty)
      df = df.select(f.selections.map(col): _*)
    f.args.collectFirst { case ("sort", v) => v }.foreach {
      case GList(opts) => df = df.orderBy(opts.map(sortCol): _*)
      case other => throw GraphQlError(s"sort argument takes list as value, got: $other")
    }
    f.args.collectFirst { case ("limit", v) => v }.foreach {
      case GInt(n) =>
        val skip = f.args.collectFirst { case ("page", GInt(p)) => (p - 1) * n }.getOrElse(0L)
        df = if (skip > 0) df.offset(skip.toInt).limit(n.toInt) else df.limit(n.toInt)
      case other => throw GraphQlError(s"limit argument takes int as value, got: $other")
    }
    df
  }

  /** Full pipeline: parse the query, resolve the table, apply the ops. */
  def query(spark: SparkSession, q: String): DataFrame =
    queryParsed(spark, parse(q))

  /** [[query]] after the parse step — lets the engine parse once, consult
    * the column index with [[filterTriples]], and still fall back here. */
  def queryParsed(spark: SparkSession, f: GField): DataFrame =
    // same invalid_table error slug as the REST frontend (error.rs:193-198)
    applyField(RestQuery.resolveTable(spark, f.name), f)

  /** The raw (column, op, value) filter conjuncts of a parsed query, in
    * the REST literal surface the column index consumes (strings re-quoted,
    * numerics verbatim; bools and exotic operands contribute nothing —
    * no pruning evidence). */
  def filterTriples(f: GField): Seq[(String, String, String)] =
    f.args.collectFirst { case ("filter", GObj(filters)) => filters }
      .getOrElse(Seq.empty)
      .flatMap {
        case (c, GObj(ops)) =>
          ops.flatMap {
            // `in` lists re-encode through the shared encoder when every
            // element is a scalar with a raw surface; any exotic element
            // (bool, nested) drops the triple — no pruning evidence
            case ("in", GList(vs)) =>
              graft.sources.ColumnIndex.inTripleOpt(c, vs.map(rawValue))
            // prefix LIKE -> the [prefix, prefix+1) range pair (or nothing)
            case ("like", GStr(s)) => RestQuery.likePrefixTriples(c, s)
            case (op, v) => rawValue(v).map((c, op, _))
          }
        case (c, v) => rawValue(v).map((c, "eq", _))
      }

  private def rawValue(v: GVal): Option[String] = v match {
    case GStr(s)   => Some("'" + s.replace("'", "''") + "'")
    case GInt(n)   => Some(n.toString)
    case GFloat(f) => Some(f.toString)
    case _         => None
  }
}
