package graft.frontend

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REST query-param frontend.
  *
  * Replicates the reference grammar and semantics
  * (reference: columnq/src/query/rest.rs:23-156):
  *
  *   - `filter[col]=v`, `filter[col]eq=`, `lt`, `lte`/`lteq`, `gt`,
  *     `gte`/`gteq` — each filter is a separate conjunct.
  *   - `columns=a,b,c` — projection.
  *   - `sort=a,-b,+c` — `-` is DESC; sorts are nulls-first for BOTH
  *     directions (reference: columnq/src/query/mod.rs:6-20; Spark's DESC
  *     default is nulls-last, hence the explicit `desc_nulls_first`).
  *   - `limit=n`, `page=p` (1-based) — skip `(p-1)*n` rows then take `n`.
  *
  * Operator order is fixed: filters -> projection -> sort -> limit
  * (observable in reference plan-equivalence tests, rest.rs:233-267).
  *
  * Literal typing matches `rest_query_value_to_expr` (rest.rs:23-51):
  * single-quoted -> string, integral -> long, otherwise double.
  */
object RestQuery {
  private val FilterKey = """filter\[(.+?)\](.*)""".r

  final case class RestError(error: String, message: String)
      extends RuntimeException(s"$error: $message")

  /** THE one `'..'`-unquote rule of the REST literal surface (with `''`
    * the escaped quote): Some(string) when `v` is quoted, None when bare.
    * Shared by runtime typing here AND the column index's decode
    * (`ColumnIndex.literalFor`) — the two must agree exactly or prune
    * evidence could desynchronize from runtime matching (review finding). */
  private[graft] def unquote(v: String): Option[String] = {
    val t = v.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      Some(t.substring(1, t.length - 1).replace("''", "'"))
    else None
  }

  def literal(v: String): Column =
    unquote(v).map(lit(_)).getOrElse {
      val t = v.trim
      t.toLongOption.map(lit(_))
        .orElse(t.toDoubleOption.map(lit(_)))
        .getOrElse(throw RestError("rest_query_value", s"invalid REST query value $v"))
    }

  def predicate(c: Column, op: String, v: String): Column =
    predicate(c, op, v, None)

  /** Schema-directed variant — the reference's unshipped "query input type
    * conversion based on table schema" roadmap item (README.md:332): when
    * the filtered column is STRING-typed, a bare unquoted value is taken
    * as the string itself (`filter[name]=BRAZIL` works without the `'..'`
    * ceremony, and `filter[name]=5` compares as the STRING "5" instead of
    * casting the column to bigint). Quoted values and non-string columns
    * keep the reference's literal typing exactly. */
  def predicate(c: Column, op: String, v: String,
                dt: Option[org.apache.spark.sql.types.DataType]): Column = {
    // `in` takes a comma-separated value LIST (beyond-reference extension;
    // commas inside '..' quoting stay literal), each element typed by the
    // same schema-directed rules as a single value
    if (op == "in")
      return c.isin(splitInList(v).map(typedLiteral(_, dt)): _*)
    // `like` takes a SQL LIKE pattern (%/_ wildcards), quoted or bare —
    // string columns only (a numeric LIKE would silently cast; loud beats
    // surprising). Prefix patterns prune through the column index.
    if (op == "like") {
      requireStringColumn(dt,
        other => RestError("rest_query", s"like filter requires a string column, got $other"))
      return c.like(stringSurface(v))
    }
    val l = typedLiteral(v, dt)
    op match {
      case "" | "eq"      => c === l
      case "lt"           => c < l
      case "lte" | "lteq" => c <= l
      case "gt"           => c > l
      case "gte" | "gteq" => c >= l
      case other => throw RestError("rest_query", s"unsupported filter operator $other")
    }
  }

  /** Split a REST `in` list on commas. Commas inside `'..'` quoting stay
    * literal and `''` remains the escaped quote; elements keep their raw
    * surface (quotes included) so each is typed by the same rules as a
    * single filter value. Bare elements are NOT trimmed — the single-value
    * rule (boundary whitespace stays matchable) applies per element, and
    * the quoted form is available when a value needs padding around it. */
  private[graft] def splitInList(v: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < v.length) {
      val ch = v.charAt(i)
      if (ch == '\'') {
        if (inQ && i + 1 < v.length && v.charAt(i + 1) == '\'') {
          cur.append("''"); i += 1
        } else { inQ = !inQ; cur.append(ch) }
      } else if (ch == ',' && !inQ) {
        out += cur.result(); cur.clear()
      } else cur.append(ch)
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** The string a REST value denotes: quoted values unquote, bare values
    * are taken verbatim — the same rule [[typedLiteral]] applies on
    * string columns. */
  private def stringSurface(v: String): String = unquote(v).getOrElse(v)

  /** A pure-prefix LIKE pattern (`abc%`, no other wildcards or escapes)
    * -> the shared [prefix, prefix+1) range expansion — the same one
    * IndexPruneRule applies to Catalyst `StartsWith`. Anything else: no
    * pruning evidence. */
  private[frontend] def likePrefixTriples(c: String, pattern: String): Seq[(String, String, String)] =
    if (pattern.length >= 2 && pattern.last == '%' &&
        pattern.init.forall(ch => ch != '%' && ch != '_' && ch != '\\'))
      graft.sources.ColumnIndex.prefixRangeTriples(c, pattern.init)
    else Seq.empty

  /** Lowercased column-type map (Spark resolves filter columns
    * case-insensitively, so the schema-directed lookups must too) —
    * shared by both frontends. */
  private[frontend] def columnTypes(schema: org.apache.spark.sql.types.StructType)
      : Map[String, org.apache.spark.sql.types.DataType] =
    schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap

  /** The `like` guard, shared by both frontends: string columns only —
    * a numeric LIKE would silently cast the column; `err` supplies the
    * frontend's error type. Unknown columns pass (resolution errors
    * surface downstream with their own slug). */
  private[frontend] def requireStringColumn(
      dt: Option[org.apache.spark.sql.types.DataType],
      err: org.apache.spark.sql.types.DataType => Exception): Unit =
    dt.filterNot(_ == org.apache.spark.sql.types.StringType).foreach(d => throw err(d))

  private def typedLiteral(v: String,
                           dt: Option[org.apache.spark.sql.types.DataType]): Column =
    dt match {
      case Some(org.apache.spark.sql.types.StringType) =>
        val t = v.trim
        if (t.length >= 2 && t.head == '\'' && t.last == '\'') literal(v)
        // the bare value is taken EXACTLY as sent (no trim): boundary
        // whitespace in data must stay matchable (review finding); the
        // quoted form remains available for values that LOOK quoted
        else lit(v)
      case _ => literal(v)
    }

  def sortCol(spec: String): Column = spec.headOption match {
    case Some('-') => col(spec.tail).desc_nulls_first
    case Some('+') => col(spec.tail).asc_nulls_first
    case _         => col(spec).asc_nulls_first
  }

  /** The raw (column, op, value) conjuncts of a param map — the shape the
    * engine's column index prunes on before any Column is built. `in`
    * lists re-encode through [[graft.sources.ColumnIndex.inTriple]], which
    * refuses lists with empty or separator-bearing elements (no pruning
    * evidence beats a mis-split decode). */
  def filterTriples(params: Map[String, String]): Seq[(String, String, String)] =
    params.toSeq.sortBy(_._1).collect { case (FilterKey(c, op), v) => (c, op, v) }
      .flatMap { case (c, op, v) =>
        if (op == "in") graft.sources.ColumnIndex.inTriple(c, splitInList(v))
        else if (op == "like") likePrefixTriples(c, stringSurface(v))
        else Seq((c, op, v))
      }

  /** Apply REST params to a DataFrame in the reference's fixed order. */
  def apply(df0: DataFrame, params: Map[String, String]): DataFrame = {
    var df = df0
    // Filters first (conjunction; Catalyst folds chained filters into one
    // And); a case-mismatched filter key must not lose its schema-directed
    // typing (review finding), hence the lowercased shared map
    val colTypes = columnTypes(df0.schema)
    params.toSeq.sortBy(_._1).foreach {
      case (key @ FilterKey(c, op), v) =>
        val _ = key
        df = df.filter(predicate(col(c), op, v, colTypes.get(c.toLowerCase)))
      case (key, _) if key.startsWith("filter[") =>
        throw RestError("rest_query", s"invalid filter condition $key")
      case _ => ()
    }
    params.get("columns").foreach { v =>
      df = df.select(v.split(',').toIndexedSeq.map(col): _*)
    }
    params.get("sort").foreach { v =>
      df = df.orderBy(v.split(',').toIndexedSeq.map(sortCol): _*)
    }
    params.get("limit").foreach { v =>
      val n = v.toInt
      val skip = params.get("page").map(p => (p.toInt - 1) * n).getOrElse(0)
      df = if (skip > 0) df.offset(skip).limit(n) else df.limit(n)
    }
    df
  }

  /** Query a registered table by name (reference: rest.rs:159-170). */
  def table(spark: org.apache.spark.sql.SparkSession, name: String,
            params: Map[String, String]): DataFrame =
    apply(resolveTable(spark, name), params)

  /** Unresolvable table names get the reference's `invalid_table` error
    * slug (columnq/src/error.rs:193-198), not a generic execution error. */
  private[frontend] def resolveTable(spark: org.apache.spark.sql.SparkSession,
                                     name: String): DataFrame =
    try spark.table(name)
    catch { case e: Throwable =>
      throw RestError("invalid_table",
        s"Failed to load table $name: ${e.getMessage}")
    }
}
