package graft.server

/** Minimal TOML reader for the server-config surface — the reference
  * accepts `.toml` configs next to YAML (roapi/src/config.rs:185-199), so
  * the same keys must load from both (no TOML library exists on the
  * offline classpath). Produces the `java.util.Map` shape snakeyaml
  * yields, so one [[Config]] interpreter serves both formats.
  *
  * Supported subset (everything a roapi-style config uses):
  *   - `[table.path]` headers and `[[array.of.tables]]` entries
  *   - bare, "quoted", and dotted keys (quoted segments keep their dots —
  *     how spark conf keys are written)
  *   - values: basic strings (with \" \\ \n \t \r escapes), literal
  *     'strings', integers, floats, booleans, inline arrays `[..]`, and
  *     inline tables `{ k = v, .. }`
  *   - `#` comments, blank lines
  *
  * Fails loudly on anything else (multi-line strings, datetimes) — a
  * config typo must never silently drop keys. */
private[server] object Toml {

  type JMap = java.util.HashMap[String, Object]

  def parse(text: String): java.util.Map[String, Object] = {
    val root = new JMap()
    // the table the next key = value lines land in
    var current: java.util.Map[String, Object] = root
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = stripComment(raw).trim
      def fail(msg: String) =
        throw new IllegalArgumentException(s"toml line ${ln + 1}: $msg in `$raw`")
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val path = keyPath(line.substring(2, line.length - 2).trim)
          val parent = descend(root, path.dropRight(1))
          val arr = parent.get(path.last) match {
            case l: java.util.List[_] => l.asInstanceOf[java.util.List[Object]]
            case null =>
              val l = new java.util.ArrayList[Object]()
              parent.put(path.last, l); l
            case _ => fail(s"`${path.last}` is not an array of tables")
          }
          val t = new JMap()
          arr.add(t)
          current = t
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val path = keyPath(line.substring(1, line.length - 1).trim)
          current = descend(root, path)
        } else {
          val eq = indexOfUnquoted(line, '=')
          if (eq < 0) fail("expected `key = value`")
          val path = keyPath(line.substring(0, eq).trim)
          val target = descend(current, path.dropRight(1))
          target.put(path.last, value(line.substring(eq + 1).trim, fail))
          ()
        }
      }
    }
    root
  }

  /** Walk (creating) nested tables; an intermediate that is an array of
    * tables resolves to its LAST element (standard TOML: `[tables.option]`
    * after `[[tables]]` belongs to the latest entry). */
  private def descend(from: java.util.Map[String, Object],
                      path: Seq[String]): java.util.Map[String, Object] =
    path.foldLeft(from) { (m, k) =>
      m.get(k) match {
        case t: java.util.Map[_, _] => t.asInstanceOf[java.util.Map[String, Object]]
        case l: java.util.List[_] if !l.isEmpty =>
          l.get(l.size - 1).asInstanceOf[java.util.Map[String, Object]]
        case null => val t = new JMap(); m.put(k, t); t
        case other => throw new IllegalArgumentException(
          s"toml: `$k` is a ${other.getClass.getSimpleName}, not a table")
      }
    }

  /** `a.b."c.d"` → Seq(a, b, c.d). */
  private def keyPath(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    var qc = '"'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == qc) inQ = false else cur.append(c) }
      else if (c == '"' || c == '\'') { inQ = true; qc = c }
      else if (c == '.') { out += cur.result().trim; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  private def stripComment(line: String): String = {
    val i = indexOfUnquoted(line, '#')
    if (i < 0) line else line.substring(0, i)
  }

  private def indexOfUnquoted(s: String, target: Char): Int = {
    var i = 0
    var inQ = false
    var qc = '"'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '\\' && qc == '"') i += 1 // basic-string escape
        else if (c == qc) inQ = false
      }
      else if (c == '"' || c == '\'') { inQ = true; qc = c }
      else if (c == target) return i
      i += 1
    }
    -1
  }

  private def value(v: String, fail: String => Nothing): Object = v match {
    case "" => fail("empty value")
    case "true" => java.lang.Boolean.TRUE
    case "false" => java.lang.Boolean.FALSE
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      unescape(s.substring(1, s.length - 1))
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case s if s.startsWith("[") && s.endsWith("]") =>
      val out = new java.util.ArrayList[Object]()
      splitTop(s.substring(1, s.length - 1)).foreach(e => out.add(value(e, fail)))
      out
    case s if s.startsWith("{") && s.endsWith("}") =>
      val out = new JMap()
      splitTop(s.substring(1, s.length - 1)).foreach { e =>
        val eq = indexOfUnquoted(e, '=')
        if (eq < 0) fail("inline table expects `k = v`")
        val path = keyPath(e.substring(0, eq).trim)
        descend(out, path.dropRight(1)).put(path.last, value(e.substring(eq + 1).trim, fail))
      }
      out
    case s if s.matches("[+-]?\\d[\\d_]*") =>
      java.lang.Long.valueOf(s.replace("_", ""))
    case s if s.matches("[+-]?[\\d_]*\\.[\\d_]+([eE][+-]?\\d+)?") ||
              s.matches("[+-]?[\\d_]+[eE][+-]?\\d+") =>
      java.lang.Double.valueOf(s.replace("_", ""))
    case other => fail(s"unsupported toml value `$other`")
  }

  /** Split on top-level commas (respecting quotes, [..] and {..}). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    var qc = '"'
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '\\' && qc == '"') { cur.append(c); i += 1; if (i < s.length) cur.append(s.charAt(i)) }
        else { if (c == qc) inQ = false; cur.append(c) }
      } else c match {
        case '"' | '\'' => inQ = true; qc = c; cur.append(c)
        case '[' | '{' => depth += 1; cur.append(c)
        case ']' | '}' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  private def unescape(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => out.append('"')
          case '\\' => out.append('\\')
          case 'n' => out.append('\n')
          case 't' => out.append('\t')
          case 'r' => out.append('\r')
          case other => out.append('\\').append(other)
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.result()
  }
}
