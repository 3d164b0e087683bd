package graft.slt

import scala.collection.mutable

/** Token-level GlareDB→Spark SQL dialect rewriter.
  *
  * Handles the GlareDB parser sugar Spark's parser lacks (reference grammar:
  * `crates/glaredb_parser/src/ast/expr.rs:812` list literals, `expr.rs:818`
  * `::` casts, precedence `expr.rs:924`):
  *
  *  - `expr::type` → `CAST(expr AS type)` (left-associative, chains,
  *    postfix-aware: `f(x)::int`, `(a+b)::text::int`, `a.b::int`);
  *  - `[e1, e2, …]` in *value* position → `array(e1, e2, …)` (brackets in
  *    postfix position are indexing and left untouched);
  *  - GlareDB/Postgres type names → Spark names (TEXT→STRING, REAL→FLOAT,
  *    INT4→INT, unsigned types → next wider signed type, …), applied ONLY
  *    in type positions (after `::`, in CAST … AS, in column definitions) —
  *    never to column references;
  *  - `columnN` (anonymous VALUES columns) → Spark's `colN`, as identifier
  *    tokens only.
  *
  * Everything operates on a token stream, so string literals, quoted
  * identifiers, and comments are never rewritten (a raw-regex approach was
  * tried in round 1 and reverted — it corrupted literals like `'TEXT'`).
  */
object Dialect {

  sealed trait Tok { def text: String }
  private case class Ws(text: String) extends Tok
  private case class Str(text: String) extends Tok    // '…' with '' escapes
  private case class QIdent(text: String) extends Tok // "…"
  private case class Ident(text: String) extends Tok
  private case class Num(text: String) extends Tok
  private case class Op(text: String) extends Tok     // ::, <=, +, …
  private case class Punct(text: String) extends Tok  // ( ) [ ] , . ;

  private val typeMap: Map[String, String] = Map(
    "TEXT" -> "STRING", "VARCHAR" -> "STRING", "BPCHAR" -> "STRING",
    "UTF8" -> "STRING",
    "REAL" -> "FLOAT", "FLOAT4" -> "FLOAT", "FLOAT8" -> "DOUBLE",
    "HALF" -> "FLOAT", "F16" -> "FLOAT",
    "INT2" -> "SMALLINT", "INT4" -> "INT", "INT8" -> "BIGINT",
    "BOOL" -> "BOOLEAN",
    // unsigned → next wider signed type (value-preserving; overflow
    // semantics necessarily differ)
    "UTINYINT" -> "SMALLINT", "USMALLINT" -> "INT", "UINT" -> "BIGINT",
    "UBIGINT" -> "DECIMAL(20,0)",
    "INT1" -> "TINYINT", "UINT1" -> "SMALLINT", "UINT2" -> "INT",
    "UINT4" -> "BIGINT", "UINT8" -> "DECIMAL(20,0)")

  /** SQL keywords that must never be absorbed as a "function name" when the
    * cast operand is a parenthesized group (`(SELECT -128)::TINYINT`). */
  private val keywords: Set[String] = Set(
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "IN", "EXISTS", "VALUES",
    "THEN", "ELSE", "WHEN", "END", "AS", "ON", "BY", "HAVING", "LIMIT",
    "OFFSET", "JOIN", "UNION", "ALL", "DISTINCT", "CASE", "LIKE", "ILIKE",
    "BETWEEN", "IS", "GROUP", "ORDER", "INSERT", "INTO", "SET", "WITH",
    "RETURNING", "OVER", "PARTITION", "ANY", "SOME")

  /** Type keywords that form Postgres typed string literals (`bool 'true'`)
    * which Spark's parser lacks; DATE/TIMESTAMP/INTERVAL are Spark-native
    * and left alone. */
  private val typedLiteralTypes: Set[String] = Set(
    "BOOL", "BOOLEAN", "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT",
    "FLOAT", "REAL", "DOUBLE", "TEXT", "VARCHAR", "DECIMAL") ++
    Set("UTINYINT", "USMALLINT", "UINT", "UBIGINT", "HALF", "F16",
      "INT1", "INT2", "INT4", "INT8", "UINT1", "UINT2", "UINT4", "UINT8")

  // ---- lexer ---------------------------------------------------------------

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) {
        val j = i; while (i < n && s(i).isWhitespace) i += 1
        out += Ws(s.substring(j, i))
      } else if (c == '-' && i + 1 < n && s(i + 1) == '-') {
        val j = i; while (i < n && s(i) != '\n') i += 1
        out += Ws(s.substring(j, i))
      } else if (c == '/' && i + 1 < n && s(i + 1) == '*') {
        val j = i; i += 2
        while (i + 1 < n && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
        out += Ws(s.substring(j, i))
      } else if (c == '\'') {
        val j = i; i += 1
        var done = false
        while (i < n && !done) {
          if (s(i) == '\'') {
            if (i + 1 < n && s(i + 1) == '\'') i += 2 else { i += 1; done = true }
          } else i += 1
        }
        out += Str(s.substring(j, i))
      } else if (c == '"') {
        val j = i; i += 1
        while (i < n && s(i) != '"') i += 1
        i = math.min(i + 1, n)
        out += QIdent(s.substring(j, i))
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val j = i
        while (i < n && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
          s(i) == 'E' || ((s(i) == '+' || s(i) == '-') && i > j &&
            (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        out += Num(s.substring(j, i))
      } else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Ident(s.substring(j, i))
      } else if (c == ':' && i + 1 < n && s(i + 1) == ':') {
        out += Op("::"); i += 2
      } else if ("()[],.;".indexOf(c) >= 0) {
        out += Punct(c.toString); i += 1
      } else {
        // operator characters, greedily grouped
        val j = i
        while (i < n && "+-*/%<>=!|&^~#?@".indexOf(s(i)) >= 0) i += 1
        if (i == j) i += 1 // unknown char — pass through
        out += Op(s.substring(j, math.max(i, j + 1)))
      }
    }
    out.result()
  }

  private def render(ts: Seq[Tok]): String = ts.map(_.text).mkString

  // ---- helpers -------------------------------------------------------------

  private def prevSig(ts: Vector[Tok], i: Int): Int = {
    var j = i - 1
    while (j >= 0 && ts(j).isInstanceOf[Ws]) j -= 1
    j
  }

  private def nextSig(ts: Vector[Tok], i: Int): Int = {
    var j = i + 1
    while (j < ts.length && ts(j).isInstanceOf[Ws]) j += 1
    j
  }

  /** Index of the opener matching a closer at `close` (same bracket kind). */
  private def matchBack(ts: Vector[Tok], close: Int): Int = {
    val (open, shut) = ts(close).text match {
      case ")" => ("(", ")")
      case "]" => ("[", "]")
      case _ => return close
    }
    var depth = 0
    var j = close
    while (j >= 0) {
      ts(j) match {
        case Punct(`shut`) => depth += 1
        case Punct(`open`) =>
          depth -= 1
          if (depth == 0) return j
        case _ =>
      }
      j -= 1
    }
    close
  }

  /** Start index of the postfix-primary operand ending at `end`
    * (an Ident/Num/Str/QIdent or a closing bracket).
    */
  private def operandStart(ts: Vector[Tok], end: Int): Int = {
    var start = end
    ts(end) match {
      case Punct(")") | Punct("]") =>
        val open = matchBack(ts, end)
        start = open
        val before = prevSig(ts, open)
        if (before >= 0) ts(before) match {
          // f( … ) — function call: absorb the name; a[ … ] — indexing:
          // absorb the indexed primary. SQL keywords are not function names.
          case Ident(name) if ts(open).text == "(" &&
              !keywords.contains(name.toUpperCase) =>
            start = operandStart(ts, before)
          case QIdent(_) if ts(open).text == "(" =>
            start = operandStart(ts, before)
          case Ident(_) | QIdent(_) | Punct(")") | Punct("]") | Str(_)
              if ts(open).text == "[" =>
            start = operandStart(ts, before)
          case _ =>
        }
      case Ident(_) | QIdent(_) | Num(_) | Str(_) =>
        // absorb dotted chains a.b.c
        var s0 = end
        var dot = prevSig(ts, s0)
        while (dot >= 0 && ts(dot) == Punct(".") && {
          val before = prevSig(ts, dot)
          before >= 0 && (ts(before).isInstanceOf[Ident] ||
            ts(before).isInstanceOf[QIdent])
        }) {
          s0 = prevSig(ts, dot)
          dot = prevSig(ts, s0)
        }
        start = s0
      case _ =>
    }
    start
  }

  private def mapTypeName(name: String): String =
    typeMap.getOrElse(name.toUpperCase, name)

  // ---- rewrites ------------------------------------------------------------

  /** Rewrite the leftmost `::` cast; returns None when none remain. */
  private def rewriteOneCast(ts: Vector[Tok]): Option[Vector[Tok]] = {
    val c = ts.indexWhere(_ == Op("::"))
    if (c < 0) return None
    val opEnd = prevSig(ts, c)
    if (opEnd < 0) return Some(ts.updated(c, Ws(""))) // stray — drop
    val opStart = operandStart(ts, opEnd)
    // type: Ident, optionally with (args)
    val tn = nextSig(ts, c)
    if (tn >= ts.length || !ts(tn).isInstanceOf[Ident])
      return Some(ts.updated(c, Op("CAST_ERR")))
    var typeEnd = tn
    val maybeParen = nextSig(ts, tn)
    if (maybeParen < ts.length && ts(maybeParen) == Punct("(")) {
      var depth = 0
      var j = maybeParen
      var found = -1
      while (j < ts.length && found < 0) {
        ts(j) match {
          case Punct("(") => depth += 1
          case Punct(")") => depth -= 1; if (depth == 0) found = j
          case _ =>
        }
        j += 1
      }
      if (found >= 0) typeEnd = found
    }
    val typeText = render(ts.slice(tn, typeEnd + 1))
    val mapped =
      if (typeEnd == tn) {
        // bare DECIMAL defaults to the reference's Decimal64 shape
        // (crates/glaredb_core/src/arrays/scalar/decimal.rs:108 — 18,3)
        val up = ts(tn).text.toUpperCase
        if (up == "DECIMAL" || up == "NUMERIC") "DECIMAL(18,3)"
        else mapTypeName(ts(tn).text)
      } else {
        // parameterized type: map only the head name
        mapTypeName(ts(tn).text) match {
          case m if m.contains("(") => m // head mapped to parameterized → keep ours
          case m if m.equalsIgnoreCase(ts(tn).text) =>
            m + render(ts.slice(tn + 1, typeEnd + 1))
          case _ =>
            // head maps to a non-parameterized name (VARCHAR→STRING):
            // STRING(10) is invalid SQL, but Spark 4 accepts VARCHAR(10)
            // natively — keep the original head with its args.
            render(ts.slice(tn, typeEnd + 1))
        }
      }
    val out = Vector.newBuilder[Tok]
    out ++= ts.slice(0, opStart)
    out += Ident("CAST"); out += Punct("(")
    out ++= ts.slice(opStart, opEnd + 1)
    out += Ws(" "); out += Ident("AS"); out += Ws(" ")
    out += Ident(mapped)
    out += Punct(")")
    out ++= ts.slice(typeEnd + 1, ts.length)
    Some(out.result())
  }

  /** `[…]` in value position → `array(…)`; postfix brackets untouched. */
  private def rewriteListLiterals(ts0: Vector[Tok]): Vector[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    // stack of booleans: true = this open bracket was a literal
    val stack = mutable.Stack.empty[Boolean]
    var lastSig: Tok = Punct("(") // value position at start
    for (t <- ts0) {
      t match {
        case Punct("[") =>
          val isIndex = lastSig match {
            case Ident(name) =>
              // keyword before '[' means value position (ARRAY[1,2] ~ n/a,
              // IN [..]); a plain identifier means indexing
              !keywords.contains(name.toUpperCase)
            case QIdent(_) | Num(_) | Str(_) | Punct(")") | Punct("]") => true
            case _ => false
          }
          if (isIndex) { stack.push(false); out += t }
          else { stack.push(true); out += Ident("array"); out += Punct("(") }
        case Punct("]") =>
          if (stack.nonEmpty && stack.pop()) {
            // drop a dangling trailing comma ( ['a', 'b',] is accepted by
            // the reference parser, Spark's array() is not )
            var k = out.length - 1
            while (k >= 0 && out(k).isInstanceOf[Ws]) k -= 1
            if (k >= 0 && out(k) == Punct(",")) out.remove(k)
            out += Punct(")")
          } else out += t
        case Op("#") => out += Op("^") // GlareDB xor operator
        case _ => out += t
      }
      if (!t.isInstanceOf[Ws]) lastSig = t
    }
    out.toVector
  }

  /** Postfix index brackets are 1-based in the reference (list_extract
    * semantics); Spark's `a[i]` is 0-based — rewrite `expr[i]` to
    * `element_at(expr, i)` (slices `a[i:j]` are left untouched). */
  private def rewriteIndexing(ts0: Vector[Tok]): Vector[Tok] = {
    // find a postfix '[' (previous significant token ends a primary)
    var ts = ts0
    var guard = 0
    var changed = true
    while (changed && guard < 50) {
      changed = false
      guard += 1
      var i = 0
      while (i < ts.length && !changed) {
        if (ts(i) == Punct("[")) {
          val p = prevSig(ts, i)
          val postfix = p >= 0 && (ts(p) match {
            case Ident(name) => !keywords.contains(name.toUpperCase)
            case QIdent(_) | Punct(")") | Punct("]") | Str(_) => true
            case _ => false
          })
          if (postfix) {
            // matching ']' and no ':' at depth 1 (slice)
            var depth = 0
            var j = i
            var close = -1
            var hasColon = false
            while (j < ts.length && close < 0) {
              ts(j) match {
                case Punct("[") => depth += 1
                case Punct("]") => depth -= 1; if (depth == 0) close = j
                // bare ':' only — a '::' cast inside the index (a[i::INT])
                // is not a slice
                case Op(":") if depth == 1 => hasColon = true
                case _ =>
              }
              j += 1
            }
            if (close > 0 && !hasColon) {
              val start = operandStart(ts, p)
              val out = Vector.newBuilder[Tok]
              out ++= ts.slice(0, start)
              out += Ident("element_at"); out += Punct("(")
              out ++= ts.slice(start, p + 1)
              out += Punct(",")
              out ++= ts.slice(i + 1, close)
              out += Punct(")")
              out ++= ts.slice(close + 1, ts.length)
              ts = out.result()
              changed = true
            }
          }
        }
        i += 1
      }
    }
    ts
  }

  /** `EXTRACT('day' FROM x)` → `EXTRACT(day FROM x)` (Spark requires a bare
    * field keyword). */
  private def rewriteExtractField(ts: Vector[Tok]): Vector[Tok] =
    ts.zipWithIndex.map { case (t, i) =>
      t match {
        case Str(text) =>
          val p1 = prevSig(ts, i)
          val p0 = if (p1 >= 0) prevSig(ts, p1) else -1
          val n = nextSig(ts, i)
          val isExtractField = p1 >= 0 && ts(p1) == Punct("(") && p0 >= 0 &&
            (ts(p0) match {
              case Ident(w) => w.toUpperCase == "EXTRACT" || w.toUpperCase == "DATE_PART"
              case _ => false
            }) && n < ts.length && (ts(n) match {
              case Ident(w) => w.toUpperCase == "FROM"
              case _ => false
            })
          if (isExtractField) Ident(text.stripPrefix("'").stripSuffix("'"))
          else t
        case other => other
      }
    }

  /** Postgres typed string literals: `bool 'true'` → `CAST('true' AS BOOLEAN)`.
    * DATE/TIMESTAMP/INTERVAL literals are Spark-native and untouched. */
  private def rewriteTypedLiterals(ts: Vector[Tok]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Ident(name) if typedLiteralTypes.contains(name.toUpperCase) && {
          val n = nextSig(ts, i)
          val p = prevSig(ts, i)
          n < ts.length && ts(n).isInstanceOf[Str] &&
            (p < 0 || (ts(p) match {
              case Ident(w) => w.toUpperCase != "AS"
              case Punct(".") => false
              case _ => true
            }))
        } =>
          val n = nextSig(ts, i)
          out += Ident("CAST"); out += Punct("(")
          out += ts(n)
          out += Ws(" "); out += Ident("AS"); out += Ws(" ")
          out += Ident(mapTypeName(name))
          out += Punct(")")
          i = n + 1
        case t => out += t; i += 1
      }
    }
    out.result()
  }

  /** Drop GlareDB-isms Spark's parser rejects: the MATERIALIZED CTE
    * modifier (`WITH x AS MATERIALIZED (…)`) and the `temp.` catalog
    * qualifier (Spark's v1 session catalog has no nested namespaces; temp
    * objects live in the single session namespace anyway). */
  private def dropUnsupportedQualifiers(ts: Vector[Tok]): Vector[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Ident(w) if w.toUpperCase == "MATERIALIZED" && {
          val p = prevSig(ts, i)
          p >= 0 && (ts(p) match {
            case Ident(a) => a.toUpperCase == "AS"
            case _ => false
          })
        } =>
          // drop the token and the whitespace before it
          while (out.nonEmpty && out.last.isInstanceOf[Ws]) out.remove(out.length - 1)
          i += 1
        case Ident(w) if w.toUpperCase == "TEMP" && {
          val n = nextSig(ts, i)
          val p = prevSig(ts, i)
          n < ts.length && ts(n) == Punct(".") &&
            (p < 0 || (ts(p) match {
              case Ident(a) => !Set("CREATE", "DROP").contains(a.toUpperCase)
              case _ => true
            }))
        } =>
          i = nextSig(ts, i) + 1 // skip `temp` and the dot
        case t => out += t; i += 1
      }
    }
    out.toVector
  }

  /** Identifier-level renames (never inside strings/quoted idents). */
  private def mapIdents(ts: Vector[Tok]): Vector[Tok] = {
    val columnN = "(?i)^column(\\d+)$".r
    ts.zipWithIndex.map {
      case (Ident(name), i) =>
        columnN.findFirstMatchIn(name) match {
          case Some(m) => Ident("col" + m.group(1))
          case None =>
            // TEXT as a *type keyword* also appears in column definitions
            // (CREATE TABLE t (a TEXT)): map when the previous significant
            // token is an identifier or '(' preceded by CREATE-ish context.
            // Safe approximation: map when it is NOT followed by '(' (a
            // function call) and NOT preceded by '.' (column ref path) and
            // the name is exactly a known type alias in a def/AS position.
            if (typeMap.contains(name.toUpperCase) && isTypePosition(ts, i))
              Ident(mapTypeName(name))
            else Ident(name)
        }
      case (t, _) => t
    }
  }

  /** Type position: after `AS` (cast tail), or inside a column-definition
    * list (previous significant token is an identifier and we're inside a
    * CREATE TABLE … ( … ) block), or after a comma following such. This is
    * intentionally conservative: plain column references (`SELECT text FROM
    * docs`) are never renamed.
    */
  private def isTypePosition(ts: Vector[Tok], i: Int): Boolean = {
    val p = prevSig(ts, i)
    if (p < 0) return false
    ts(p) match {
      case Ident(w) if w.toUpperCase == "AS" =>
        // Only a type position when this AS is the tail of an open
        // CAST(... AS T) — a select-list alias that happens to collide
        // with a type name (SELECT 1 AS text) must NOT be renamed.
        var depth = 0; var j = p - 1; var inCast = false; var done = false
        while (j >= 0 && !done) {
          ts(j) match {
            case Punct(")") => depth += 1
            case Punct("(") =>
              if (depth == 0) {
                val q = prevSig(ts, j)
                inCast = q >= 0 && (ts(q) match {
                  case Ident(n) =>
                    val u = n.toUpperCase
                    u == "CAST" || u == "TRY_CAST"
                  case _ => false
                })
                done = true
              } else depth -= 1
            case _ =>
          }
          j -= 1
        }
        inCast
      case Ident(_) | QIdent(_) =>
        // ident ident — second ident in a column def (a TEXT) or a DDL type
        val hasCreate = ts.take(i).exists {
          case Ident(w) => w.toUpperCase == "CREATE" || w.toUpperCase == "RETURNS"
          case _ => false
        }
        hasCreate
      case _ => false
    }
  }

  /** Full rewrite pipeline. */
  def rewrite(sql: String): String = {
    var ts = mapIdents(rewriteTypedLiterals(rewriteExtractField(
      dropUnsupportedQualifiers(rewriteIndexing(
        rewriteListLiterals(tokenize(sql)))))))
    var guard = 0
    var more = true
    while (more && guard < 200) {
      rewriteOneCast(ts) match {
        case Some(next) => ts = next; guard += 1
        case None => more = false
      }
    }
    render(ts)
  }
}
