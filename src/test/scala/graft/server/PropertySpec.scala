package graft.server

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (scalacheck) for the hand-written parsers whose
  * input spaces are too big to enumerate: the TOML config reader, the
  * FlightSQL LIKE matcher, and the REST literal typing rule. Each test
  * runs a few hundred generated cases and reports the shrunk
  * counter-example on failure. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, min: Int = 300): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- TOML round-trip ------------------------------------------------------

  private val bareKey: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'), Gen.const('-')))
    } yield (h :: t).mkString

  /** Keys that REQUIRE quoting: dots, spaces, anything bare TOML rejects. */
  private val quotedKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', ' ', '/')))
      .map(_.mkString.trim).suchThat(_.nonEmpty)

  private val scalarGen: Gen[Object] = Gen.oneOf(
    Gen.asciiPrintableStr.map(s => s: Object),
    Gen.choose(Long.MinValue, Long.MaxValue).map(l => java.lang.Long.valueOf(l): Object),
    Gen.oneOf(java.lang.Boolean.TRUE: Object, java.lang.Boolean.FALSE: Object))

  private def renderScalar(v: Object): String = v match {
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        case c => c.toString
      } + "\""
    case other => other.toString
  }

  private def renderKey(k: String): String =
    if (k.matches("[A-Za-z][A-Za-z0-9_-]*")) k else "\"" + k + "\""

  /** One top-level table of scalars, one nested table, one array of tables
    * — the shapes a server config uses. */
  private val configGen: Gen[(String, java.util.HashMap[String, Object])] =
    for {
      rootKeys <- Gen.listOfN(3, bareKey).map(_.distinct)
      rootVals <- Gen.listOfN(rootKeys.size, scalarGen)
      sectKey <- bareKey.suchThat(k => !rootKeys.contains(k))
      sectKeys <- Gen.listOfN(3, Gen.oneOf(bareKey, quotedKey)).map(_.distinct)
        .suchThat(ks => ks.forall(k => !rootKeys.contains(k)))
      sectVals <- Gen.listOfN(sectKeys.size, scalarGen)
      arrKey <- bareKey.suchThat(k => k != sectKey && !rootKeys.contains(k))
      nEntries <- Gen.choose(1, 3)
      entryKeys <- Gen.listOfN(2, bareKey).map(_.distinct)
      entryVals <- Gen.listOfN(nEntries,
        Gen.listOfN(2, scalarGen))
    } yield {
      val sb = new StringBuilder
      val expected = new java.util.HashMap[String, Object]()
      rootKeys.zip(rootVals).foreach { case (k, v) =>
        sb.append(s"${renderKey(k)} = ${renderScalar(v)}\n")
        expected.put(k, v)
      }
      val sect = new java.util.HashMap[String, Object]()
      sb.append(s"[$sectKey]\n")
      sectKeys.zip(sectVals).foreach { case (k, v) =>
        sb.append(s"${renderKey(k)} = ${renderScalar(v)}\n")
        sect.put(k, v)
      }
      expected.put(sectKey, sect)
      val arr = new java.util.ArrayList[Object]()
      entryVals.foreach { vs =>
        sb.append(s"[[$arrKey]]\n")
        val entry = new java.util.HashMap[String, Object]()
        entryKeys.zip(vs).foreach { case (k, v) =>
          sb.append(s"${renderKey(k)} = ${renderScalar(v)}\n")
          entry.put(k, v)
        }
        arr.add(entry)
      }
      expected.put(arrKey, arr)
      (sb.result(), expected)
    }

  test("TOML reader: render -> parse round-trips arbitrary config shapes") {
    check(Prop.forAll(configGen) { case (text, expected) =>
      Toml.parse(text) == expected
    })
  }

  // ---- FlightSQL LIKE matcher ----------------------------------------------

  test("LIKE matcher: literal patterns match exactly themselves") {
    // no metacharacters -> the pattern matches the value iff equal
    // (charset excludes them up front: suchThat-filtering two independent
    // printable-string gens exhausts the generator)
    val lit = Gen.listOf(
      Gen.oneOf((' ' to '~').filterNot(c => c == '%' || c == '_')))
      .map(_.mkString)
    check(Prop.forAll(lit, lit) { (p, v) =>
      graft.server.flight.FlightSqlServer.likeMatches(p, v) == (p == v)
    })
  }

  test("LIKE matcher: %infix%, prefix%, %suffix, and _ wildcards") {
    val frag = Gen.alphaNumStr
    check(Prop.forAll(frag, frag, frag) { (a, b, c) =>
      val v = a + b + c
      graft.server.flight.FlightSqlServer.likeMatches(s"%$b%", v) &&
        graft.server.flight.FlightSqlServer.likeMatches(s"$a%", v) &&
        graft.server.flight.FlightSqlServer.likeMatches(s"%$c", v) &&
        (v.isEmpty || graft.server.flight.FlightSqlServer.likeMatches(
          "_" * v.length, v))
    })
  }

  // ---- ACCEPT negotiation totality -------------------------------------------

  test("fromAccept is total: arbitrary header junk falls back to the default") {
    import graft.encoding.Encoders
    val known = Set("*/*", "application/json", "application/csv",
      "application/arrow.file", "application/vnd.apache.arrow.file",
      "application/arrow.stream", "application/vnd.apache.arrow.stream",
      "application/parquet", "application/vnd.apache.parquet")
    check(Prop.forAll(Gen.asciiPrintableStr) { h =>
      val r = Encoders.fromAccept(Some(h), Encoders.Csv)
      if (known(h.trim)) r != null // mapped explicitly (values pinned elsewhere)
      else r == Encoders.Csv // everything else: the configured default
    })
  }

  test("GraphQL parser: rendered queries round-trip names, literals, args") {
    import graft.frontend.GraphQl
    import graft.frontend.GraphQl._
    val ident: Gen[String] = for {
      h <- Gen.oneOf(Gen.alphaChar, Gen.const('_'))
      t <- Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    } yield (h :: t).mkString
    val gval: Gen[GVal] = Gen.oneOf(
      Gen.asciiPrintableStr.map(GStr(_)),
      arbitraryUnicode.map(GStr(_)),
      Gen.choose(Long.MinValue, Long.MaxValue).map(GInt(_)),
      Gen.choose(-1e12, 1e12).suchThat(d => d != Math.rint(d)).map(GFloat(_)),
      Gen.oneOf(GBool(true), GBool(false)))
    def renderStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c => c.toString
      } + "\""
    def renderVal(v: GVal): String = v match {
      case GStr(s)   => renderStr(s)
      case GInt(n)   => n.toString
      case GFloat(f) => f.toString
      case GBool(b)  => b.toString
      case other     => sys.error(s"unexpected $other")
    }
    val queryGen = for {
      tbl <- ident
      sels <- Gen.nonEmptyListOf(ident).map(_.take(3))
      fcols <- Gen.listOfN(2, ident).suchThat(l => l.distinct.size == 2)
      fvals <- Gen.listOfN(2, gval)
      lim <- Gen.choose(1, 1000000)
    } yield {
      val filters = fcols.zip(fvals)
        .map { case (c, v) => s"$c: {eq: ${renderVal(v)}}" }.mkString(", ")
      val q = s"{ $tbl(filter: {$filters}, limit: $lim) { ${sels.mkString(" ")} } }"
      (q, tbl, sels, fcols.zip(fvals), lim)
    }
    check(Prop.forAll(queryGen) { case (q, tbl, sels, filters, lim) =>
      val f = GraphQl.parse(q)
      val parsedFilters = f.args.collectFirst { case ("filter", GObj(fs)) => fs }.get
        .collect { case (c, GObj(List(("eq", v)))) => (c, v) }
      f.name == tbl && f.selections == sels &&
        parsedFilters == filters &&
        f.args.collectFirst { case ("limit", GInt(n)) => n }.contains(lim.toLong)
    })
  }

  /** Arbitrary unicode including quotes, backslashes, newlines, emoji. */
  private val arbitraryUnicode: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.oneOf('"', '\\', '\n', '\t', 'π', '你', '\uD83D'), // lone surrogate too
      Gen.choose(' ', '퟿'))).map(_.mkString)

  test("REST in-list: quote -> join-with-commas -> splitInList round-trips") {
    import graft.frontend.RestQuery
    // the quoted form must survive splitting for ANY value content —
    // commas, quotes (as ''), unicode; the split keeps the raw surface,
    // so unquoting each element must recover the original values
    val value: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '\'', ' ', '%')))
        .map(_.mkString))
    def quote(s: String) = "'" + s.replace("'", "''") + "'"
    def unquote(t0: String) = {
      val t = t0.trim
      t.substring(1, t.length - 1).replace("''", "'")
    }
    check(Prop.forAll(Gen.nonEmptyListOf(value)) { vs =>
      val joined = vs.map(quote).mkString(",")
      val parts = RestQuery.splitInList(joined)
      parts.length == vs.length && parts.map(unquote) == vs
    })
  }
}
