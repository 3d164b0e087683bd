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

  /** Forward paren/bracket match: index of the closer for the opener at
    * `open`. */
  private def matchFwd(ts: Vector[Tok], open: Int): Int = {
    val (o, c) = ts(open).text match {
      case "(" => ("(", ")")
      case _ => ("[", "]")
    }
    var depth = 0
    var i = open
    while (i < ts.length) {
      ts(i) match {
        case Punct(`o`) => depth += 1
        case Punct(`c`) => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    open
  }

  /** End index (inclusive) of the primary operand starting at/after `from`:
    * optional unary sign, a literal/ident/call/paren group, then postfix
    * `.field` / `(args)` / `[idx]` chains. */
  private def operandEnd(ts: Vector[Tok], from: Int): Int = {
    var i = from
    while (i < ts.length && ts(i).isInstanceOf[Ws]) i += 1
    if (i >= ts.length) return ts.length - 1
    ts(i) match {
      case Op("-") | Op("+") => return operandEnd(ts, i + 1)
      case _ =>
    }
    var end = i
    ts(i) match {
      case Punct("(") | Punct("[") => end = matchFwd(ts, i)
      case Ident(_) | QIdent(_) | Num(_) | Str(_) => end = i
      case _ => return i
    }
    var done = false
    while (!done) {
      val n = nextSig(ts, end)
      if (n >= ts.length) done = true
      else ts(n) match {
        case Punct(".") =>
          val m = nextSig(ts, n)
          if (m < ts.length && (ts(m).isInstanceOf[Ident] ||
            ts(m).isInstanceOf[QIdent])) end = m
          else done = true
        case Punct("(") if ts(end).isInstanceOf[Ident] ||
            ts(end).isInstanceOf[QIdent] =>
          end = matchFwd(ts, n)
        case Punct("[") => end = matchFwd(ts, n)
        case _ => done = true
      }
    }
    end
  }

  // ---- rewrites ------------------------------------------------------------

  /** Integer-type value ranges (reference Int8…UInt64). Spark's LEGACY
    * cast wraps silently and the widened unsigned types lose their bounds,
    * so out-of-range integer LITERAL casts are rewritten to a runtime
    * error (cast/integer_minmax.slt, cast/unsigned_int.slt). */
  private val intRanges: Map[String, (BigInt, BigInt)] = {
    val u8 = BigInt("18446744073709551615")
    Map(
      "TINYINT" -> (BigInt(-128), BigInt(127)),
      "INT1" -> (BigInt(-128), BigInt(127)),
      "SMALLINT" -> (BigInt(-32768), BigInt(32767)),
      "INT2" -> (BigInt(-32768), BigInt(32767)),
      "INT" -> (BigInt(Int.MinValue), BigInt(Int.MaxValue)),
      "INT4" -> (BigInt(Int.MinValue), BigInt(Int.MaxValue)),
      "INTEGER" -> (BigInt(Int.MinValue), BigInt(Int.MaxValue)),
      "BIGINT" -> (BigInt(Long.MinValue), BigInt(Long.MaxValue)),
      "INT8" -> (BigInt(Long.MinValue), BigInt(Long.MaxValue)),
      "UTINYINT" -> (BigInt(0), BigInt(255)),
      "UINT1" -> (BigInt(0), BigInt(255)),
      "USMALLINT" -> (BigInt(0), BigInt(65535)),
      "UINT2" -> (BigInt(0), BigInt(65535)),
      "UINT" -> (BigInt(0), BigInt(4294967295L)),
      "UINT4" -> (BigInt(0), BigInt(4294967295L)),
      "UINTEGER" -> (BigInt(0), BigInt(4294967295L)),
      "UBIGINT" -> (BigInt(0), u8),
      "UINT8" -> (BigInt(0), u8))
  }

  /** The integer value of a (possibly parenthesized/negated) literal token
    * span, if that is all it is. */
  private def intLitValue(ts: Vector[Tok], from: Int, to: Int): Option[BigInt] = {
    val sig = ts.slice(from, to + 1).filterNot(t =>
      t.isInstanceOf[Ws] || t == Punct("(") || t == Punct(")"))
    sig match {
      case Vector(Num(n)) if !n.contains('.') && !n.toLowerCase.contains('e') =>
        Some(BigInt(n))
      case Vector(Op("-"), Num(n))
          if !n.contains('.') && !n.toLowerCase.contains('e') =>
        Some(-BigInt(n))
      case _ => None
    }
  }

  private def rangeErrorTokens(v: BigInt, tpe: String): Vector[Tok] =
    Vector(Ident("CAST"), Punct("("), Ident("raise_error"), Punct("("),
      Str(s"'integer $v out of range for $tpe'"), Punct(")"),
      Ws(" "), Ident("AS"), Ws(" "), Ident("BIGINT"), Punct(")"))

  /** Direct-form `CAST(<int literal> AS <bounded int type>)` out-of-range
    * check; runs before type names are widened. */
  private def rewriteCastRange(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      val matched = ts(i) match {
        case Ident(w) if w.toUpperCase == "CAST" =>
          nextSigOpt(ts, i) match {
            case Some((pi, Punct("("))) =>
              val close = matchFwd(ts, pi)
              var j = pi + 1; var depth = 1; var asIdx = -1
              while (j < close && asIdx < 0) {
                ts(j) match {
                  case Punct("(") => depth += 1
                  case Punct(")") => depth -= 1
                  case Ident(a) if depth == 1 && a.toUpperCase == "AS" =>
                    asIdx = j
                  case _ =>
                }
                j += 1
              }
              val tnOpt = if (asIdx > 0) Some(nextSig(ts, asIdx)) else None
              tnOpt match {
                case Some(tn) if tn < close =>
                  val tname = ts(tn).text.toUpperCase
                  (intRanges.get(tname),
                    intLitValue(ts, pi + 1, asIdx - 1)) match {
                    case (Some((lo, hi)), Some(v)) if v < lo || v > hi =>
                      ts = ts.slice(0, i) ++ rangeErrorTokens(v, tname) ++
                        ts.slice(close + 1, ts.length)
                      true
                    case _ => false
                  }
                case _ => false
              }
            case _ => false
          }
        case _ => false
      }
      if (!matched) i += 1
    }
    ts
  }

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
        // parameterized type: map only the head name. Negative decimal
        // scales (DECIMAL(8,-1)) clamp to 0 — Spark has no negative
        // scales; the reference's test values round-trip unchanged.
        def clampNeg(s: String): String = s.replaceAll("-\\s*(\\d+)", "0")
        mapTypeName(ts(tn).text) match {
          case m if m.contains("(") => m // head mapped to parameterized → keep ours
          case m if m.equalsIgnoreCase(ts(tn).text) =>
            m + clampNeg(render(ts.slice(tn + 1, typeEnd + 1)))
          case _ =>
            // head maps to a non-parameterized name (VARCHAR→STRING):
            // STRING(10) is invalid SQL, but Spark 4 accepts VARCHAR(10)
            // natively — keep the original head with its args.
            clampNeg(render(ts.slice(tn, typeEnd + 1)))
        }
      }
    // out-of-range integer literal → runtime error (reference bounds)
    (intRanges.get(ts(tn).text.toUpperCase),
      intLitValue(ts, opStart, opEnd)) match {
      case (Some((lo, hi)), Some(v)) if v < lo || v > hi =>
        return Some(ts.slice(0, opStart) ++
          rangeErrorTokens(v, ts(tn).text.toUpperCase) ++
          ts.slice(typeEnd + 1, ts.length))
      case _ =>
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

  /** Infix operator sugar: `XOR` / `#` → `^` (arith/xor.rs), and the
    * Postgres starts-with operator `x ^@ y` → `startswith(x, y)`. */
  private def rewriteOperatorSugar(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    // 1. source `^` / `**` = POWER (Postgres), leftmost-first for left
    //    associativity; the function-form `^(a, b)` (no left operand) is
    //    the reference's xor.
    var j = 0
    while (j < ts.length) {
      ts(j) match {
        case Op("^") | Op("**") =>
          val lp = prevSig(ts, j)
          val hasLeft = lp >= 0 && (ts(lp) match {
            case Num(_) | Str(_) | Ident(_) | QIdent(_) | Punct(")") |
                 Punct("]") => true
            case _ => false
          })
          if (!hasLeft && ts(j) == Op("^")) {
            ts = ts.updated(j, Ident("xor")); j += 1
          } else if (hasLeft) {
            val ls = operandStart(ts, lp)
            val re = operandEnd(ts, j + 1)
            val out = Vector.newBuilder[Tok]
            out ++= ts.slice(0, ls)
            out += Ident("power"); out += Punct("(")
            out ++= ts.slice(ls, lp + 1)
            out += Punct(","); out += Ws(" ")
            out ++= ts.slice(j + 1, re + 1).dropWhile(_.isInstanceOf[Ws])
            out += Punct(")")
            out ++= ts.slice(re + 1, ts.length)
            ts = out.result()
            j = ls // rescan: the call is a primary for the next ^
          } else j += 1
        case _ => j += 1
      }
    }
    // 2. xor infixes (`#`, infix `XOR`) map to Spark's `^`; the function
    //    form `xor(a, b)` stays a call
    ts = ts.zipWithIndex.map {
      case (Ident(w), k) if w.toUpperCase == "XOR" &&
          !nextSigOpt(ts, k).exists(_._2 == Punct("(")) => Op("^")
      case (Op("#"), _) => Op("^")
      case (t, _) => t
    }
    // 3. first()/last() skip NULLs in the reference; Spark's parser owns
    //    these names (grammar rule with ignoreNulls=false), so route them
    //    to the registered glare_first/glare_last
    ts = ts.zipWithIndex.map {
      case (Ident(w), k) if (w.toUpperCase == "FIRST" ||
          w.toUpperCase == "LAST") &&
          nextSigOpt(ts, k).exists(_._2 == Punct("(")) =>
        Ident("glare_" + w.toLowerCase)
      case (t, _) => t
    }
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Op("^@") =>
          val lp = prevSig(ts, i)
          if (lp < 0) { i += 1 }
          else {
            val ls = operandStart(ts, lp)
            val re = operandEnd(ts, i + 1)
            val out = Vector.newBuilder[Tok]
            out ++= ts.slice(0, ls)
            out += Ident("startswith"); out += Punct("(")
            out ++= ts.slice(ls, lp + 1)
            out += Punct(","); out += Ws(" ")
            out ++= ts.slice(i + 1, re + 1).dropWhile(_.isInstanceOf[Ws])
            out += Punct(")")
            out ++= ts.slice(re + 1, ts.length)
            ts = out.result()
            i = ls
          }
        case _ => i += 1
      }
      ()
    }
    ts
  }

  /** Method chaining `expr.f(args)` → `f(expr, args)` (the reference's
    * function-chaining sugar), and qualified builtins `default.abs(x)` →
    * `abs(x)` (schema-qualified function resolution). */
  private def rewriteChaining(
      ts0: Vector[Tok], enableChaining: Boolean = true): Vector[Tok] = {
    val schemas = Set("default", "system", "builtin", "pg_catalog")
    var ts = ts0
    var guard = 0
    var changed = true
    while (changed && guard < 50) {
      changed = false
      guard += 1
      var i = 0
      while (i < ts.length && !changed) {
        (ts(i), nextSigOpt(ts, i), nextSig2Opt(ts, i)) match {
          case (Punct("."), Some((ni, Ident(fn))), Some((pi, Punct("("))))
              if pi == nextSig(ts, ni) =>
            val lp = prevSig(ts, i)
            if (lp >= 0) {
              val prevTok = ts(lp)
              val ls = operandStart(ts, lp)
              val isSchemaPrefix = ls == lp && (prevTok match {
                case Ident(w) => schemas.contains(w.toLowerCase)
                case _ => false
              }) && {
                // a schema prefix is not itself preceded by a dot
                val pp = prevSig(ts, ls)
                pp < 0 || ts(pp) != Punct(".")
              }
              // a dotted chain of only schema idents (`system.default.`)
              // is a qualified-function prefix, not a chaining receiver
              val chainAllSchemas = ts.slice(ls, lp + 1).forall {
                case Ident(w) => schemas.contains(w.toLowerCase)
                case Punct(".") => true
                case _: Ws => true
                case _ => false
              }
              if (isSchemaPrefix || chainAllSchemas) {
                // drop `schema(.schema)* .`
                ts = ts.slice(0, ls) ++ ts.slice(ni, ts.length)
                changed = true
              } else if (enableChaining && (prevTok.isInstanceOf[Ident] ||
                prevTok.isInstanceOf[QIdent] || prevTok.isInstanceOf[Str] ||
                prevTok == Punct(")"))) {
                // only rewrite when the receiver is a CALL or literal —
                // `t.col(` with a plain ident receiver is ambiguous with a
                // qualified column, EXCEPT when the call result is chained
                // (`x.upper().lower()` has Punct(")") receivers after one
                // step). A bare-ident receiver still chains: the corpus has
                // no qualified scalar-function tables.
                val close = matchFwd(ts, pi)
                val argsEmpty = nextSig(ts, pi) == close
                val out = Vector.newBuilder[Tok]
                out ++= ts.slice(0, ls)
                out += Ident(fn); out += Punct("(")
                out ++= ts.slice(ls, lp + 1)
                if (!argsEmpty) { out += Punct(","); out += Ws(" ") }
                out ++= ts.slice(pi + 1, ts.length)
                ts = out.result()
                changed = true
              }
            }
            if (!changed) i += 1
          case _ => i += 1
        }
      }
    }
    ts
  }

  private def nextSigOpt(ts: Vector[Tok], i: Int): Option[(Int, Tok)] = {
    val n = nextSig(ts, i)
    if (n < ts.length) Some((n, ts(n))) else None
  }
  private def nextSig2Opt(ts: Vector[Tok], i: Int): Option[(Int, Tok)] = {
    val n = nextSig(ts, i)
    if (n >= ts.length) return None
    val m = nextSig(ts, n)
    if (m < ts.length) Some((m, ts(m))) else None
  }

  /** Multi-argument `GROUPING(a, b, …)` → explicit bitmask arithmetic
    * `(GROUPING(a) * 2^(n-1) + … + GROUPING(z))` — the reference computes
    * the bitmask over its argument list; Spark's GROUPING takes one column
    * and its grouping_id() demands the exact grouping-set order. */
  private def rewriteGroupingMulti(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      val advanced = ts(i) match {
        case Ident(w) if w.toUpperCase == "GROUPING" =>
          nextSigOpt(ts, i) match {
            case Some((pi, Punct("("))) =>
              val close = matchFwd(ts, pi)
              // split args on depth-1 commas
              val argRanges = mutable.ListBuffer.empty[(Int, Int)]
              var depth = 0; var start = pi + 1
              var j = pi
              while (j <= close) {
                ts(j) match {
                  case Punct("(") => depth += 1
                  case Punct(")") =>
                    depth -= 1
                    if (depth == 0) argRanges += ((start, j - 1))
                  case Punct(",") if depth == 1 =>
                    argRanges += ((start, j - 1)); start = j + 1
                  case _ =>
                }
                j += 1
              }
              if (argRanges.length > 1) {
                val n = argRanges.length
                val out = Vector.newBuilder[Tok]
                out ++= ts.slice(0, i)
                out += Punct("(")
                argRanges.zipWithIndex.foreach { case ((s, e), k) =>
                  if (k > 0) { out += Ws(" "); out += Op("+"); out += Ws(" ") }
                  out += Ident("GROUPING"); out += Punct("(")
                  out ++= ts.slice(s, e + 1)
                  out += Punct(")")
                  val shift = 1 << (n - 1 - k)
                  if (shift > 1) {
                    out += Ws(" "); out += Op("*"); out += Ws(" ")
                    out += Num(shift.toString)
                  }
                }
                out += Punct(")")
                out ++= ts.slice(close + 1, ts.length)
                ts = out.result()
                true
              } else false
            case _ => false
          }
        case _ => false
      }
      if (!advanced) i += 1 else i += 2
    }
    ts
  }

  /** `GROUPING(x)` outside CUBE/ROLLUP/GROUPING SETS → literal 0 (the
    * reference returns 0 for plain GROUP BY; Spark rejects it). */
  private def rewriteGroupingNoRollup(ts0: Vector[Tok]): Vector[Tok] = {
    val hasRollup = ts0.indices.exists { i =>
      ts0(i) match {
        case Ident(w) if w.toUpperCase == "ROLLUP" || w.toUpperCase == "CUBE" =>
          true
        case Ident(w) if w.toUpperCase == "GROUPING" =>
          nextSigOpt(ts0, i).exists {
            case (_, Ident(s)) => s.toUpperCase == "SETS"
            case _ => false
          }
        case _ => false
      }
    }
    if (hasRollup) return ts0
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Ident(w) if w.toUpperCase == "GROUPING" =>
          nextSigOpt(ts, i) match {
            case Some((pi, Punct("("))) =>
              val close = matchFwd(ts, pi)
              ts = ts.slice(0, i) ++ Vector(Num("0")) ++
                ts.slice(close + 1, ts.length)
            case _ =>
          }
          i += 1
        case _ => i += 1
      }
    }
    ts
  }

  /** Index of the `)` matching the `(` at `open`. */
  private def matchingClose(ts: Vector[Tok], open: Int): Int = {
    var d = 0
    var i = open
    while (i < ts.length) {
      ts(i) match {
        case Punct("(") => d += 1
        case Punct(")") => d -= 1; if (d == 0) return i
        case _ =>
      }
      i += 1
    }
    ts.length - 1
  }

  /** Non-first FROM items of the form `(VALUES (…), (…))` become
    * `(SELECT … AS col1, … UNION ALL SELECT …)` so that (a) the reference's
    * lateral column references into VALUES (`(VALUES (2)) v(a), (VALUES
    * (a+1))` — values/lateral_values.slt) resolve, via the implicit-LATERAL
    * pass that runs right after, and (b) anonymous columns keep Spark's
    * `colN` names (displayed back as `columnN`). Spark's own inline-table
    * VALUES only admits foldable expressions, so the SELECT form is the
    * only way to express the correlation; for uncorrelated VALUES the two
    * forms are equivalent. The first FROM item stays a plain VALUES (no
    * preceding row to correlate to; LATERAL would be invalid there). */
  private def rewriteFromValues(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    val fromEnders = Set("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
      "UNION", "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY", "OFFSET")
    var i = 0
    var depth = 0
    val inFrom = mutable.Map.empty[Int, Boolean].withDefaultValue(false)
    while (i < ts.length) {
      ts(i) match {
        case Punct("(") => depth += 1; inFrom(depth) = false
        case Punct(")") => inFrom(depth) = false; depth -= 1
        case Ident(w) if fromEnders.contains(w.toUpperCase) &&
            !inFrom.isEmpty && inFrom(depth) =>
          inFrom(depth) = false
        // FROM is ALSO a trigger: a first-item `FROM (VALUES (x))` inside
        // a LATERAL subquery may reference the outer scope
        // (select/distinct.slt) — the SELECT form resolves it, and no
        // LATERAL keyword is inserted for first items (the implicit-
        // lateral pass only fires on comma/JOIN).
        case t if (t match {
              case Ident(w) if w.toUpperCase == "FROM" =>
                inFrom(depth) = true; true
              case _ => false
            }) || (inFrom(depth) && (t == Punct(",") ||
            (t match {
              case Ident(w) => Set("JOIN", "LATERAL").contains(w.toUpperCase)
              case _ => false
            }))) =>
          (nextSigOpt(ts, i), nextSig2Opt(ts, i)) match {
            case (Some((pi, Punct("("))), Some((vi, Ident(v))))
                if v.toUpperCase == "VALUES" && vi == nextSig(ts, pi) =>
              val close = matchingClose(ts, pi)
              // parse rows: `( … )` groups separated by top-level commas
              val rows = mutable.ArrayBuffer[Vector[Tok]]()
              var j = nextSig(ts, vi)
              while (j < close) {
                ts(j) match {
                  case Punct("(") =>
                    val rc = matchingClose(ts, j)
                    rows += ts.slice(j + 1, rc)
                    j = rc + 1
                  case _ => j += 1
                }
              }
              // only rewrite when a row references an identifier (i.e. a
              // potential lateral reference) — literal-only VALUES keep
              // Spark's native inline-table form (equality_join.slt uses
              // `JOIN (VALUES …) ON …`, which must not become LATERAL)
              val correlated = rows.exists(_.exists {
                case Ident(w) =>
                  !Set("NULL", "TRUE", "FALSE").contains(w.toUpperCase)
                case _ => false
              })
              if (rows.nonEmpty && correlated) {
                // split a row on top-level commas
                def cells(row: Vector[Tok]): Vector[Vector[Tok]] = {
                  val out = mutable.ArrayBuffer[Vector[Tok]]()
                  var d = 0
                  var last = 0
                  row.zipWithIndex.foreach {
                    case (Punct("("), _) | (Punct("["), _) => d += 1
                    case (Punct(")"), _) | (Punct("]"), _) => d -= 1
                    case (Punct(","), k) if d == 0 =>
                      out += row.slice(last, k); last = k + 1
                    case _ =>
                  }
                  out += row.slice(last, row.length)
                  out.toVector
                }
                val sel = mutable.ArrayBuffer[Tok]()
                rows.zipWithIndex.foreach { case (row, r) =>
                  if (r > 0)
                    sel ++= Vector(Ws(" "), Ident("UNION"), Ws(" "),
                      Ident("ALL"), Ws(" "))
                  sel += Ident("SELECT")
                  sel += Ws(" ")
                  val cs = cells(row)
                  cs.zipWithIndex.foreach { case (c, k) =>
                    if (k > 0) { sel += Punct(","); sel += Ws(" ") }
                    sel ++= c
                    if (r == 0) { // first row names the columns
                      sel ++= Vector(Ws(" "), Ident("AS"), Ws(" "),
                        Ident(s"col${k + 1}"))
                    }
                  }
                }
                ts = ts.slice(0, pi + 1) ++ sel.toVector ++
                  ts.slice(close, ts.length)
              }
              // resume AT the `(` so depth tracking still sees it
              i = pi - 1
            case (Some((vi, Ident(v))), _) if v.toUpperCase == "VALUES" =>
              // BARE `, VALUES (…) alias` without wrapping parens
              // (subqueries/correlated_lateral.slt) — same transform, the
              // replacement supplies its own parentheses
              val rows = mutable.ArrayBuffer[Vector[Tok]]()
              var j = nextSig(ts, vi)
              var endIdx = vi
              var continue = true
              while (continue && j < ts.length && ts(j) == Punct("(")) {
                val rc = matchingClose(ts, j)
                rows += ts.slice(j + 1, rc)
                endIdx = rc
                val n1 = nextSig(ts, rc)
                if (n1 < ts.length && ts(n1) == Punct(",") && {
                  val n2 = nextSig(ts, n1)
                  n2 < ts.length && ts(n2) == Punct("(")
                }) j = nextSig(ts, n1)
                else continue = false
              }
              val correlated = rows.exists(_.exists {
                case Ident(w) =>
                  !Set("NULL", "TRUE", "FALSE").contains(w.toUpperCase)
                case _ => false
              })
              if (rows.nonEmpty && correlated) {
                def cells(row: Vector[Tok]): Vector[Vector[Tok]] = {
                  val out = mutable.ArrayBuffer[Vector[Tok]]()
                  var d = 0
                  var last = 0
                  row.zipWithIndex.foreach {
                    case (Punct("("), _) | (Punct("["), _) => d += 1
                    case (Punct(")"), _) | (Punct("]"), _) => d -= 1
                    case (Punct(","), k) if d == 0 =>
                      out += row.slice(last, k); last = k + 1
                    case _ =>
                  }
                  out += row.slice(last, row.length)
                  out.toVector
                }
                val sel = mutable.ArrayBuffer[Tok]()
                sel += Punct("(")
                rows.zipWithIndex.foreach { case (row, r) =>
                  if (r > 0)
                    sel ++= Vector(Ws(" "), Ident("UNION"), Ws(" "),
                      Ident("ALL"), Ws(" "))
                  sel += Ident("SELECT")
                  sel += Ws(" ")
                  val cs = cells(row)
                  cs.zipWithIndex.foreach { case (c, k) =>
                    if (k > 0) { sel += Punct(","); sel += Ws(" ") }
                    sel ++= c
                    if (r == 0) {
                      sel ++= Vector(Ws(" "), Ident("AS"), Ws(" "),
                        Ident(s"col${k + 1}"))
                    }
                  }
                }
                sel += Punct(")")
                ts = ts.slice(0, vi) ++ sel.toVector ++
                  ts.slice(endIdx + 1, ts.length)
                // resume AT the inserted `(` for depth tracking
                i = vi - 1
              } else i = endIdx
            case _ =>
          }
        case _ =>
      }
      i += 1
    }
    ts
  }

  /** A table function whose argument references a column of an earlier
    * FROM item (`…, generate_series(1, 6, a)` — values/lateral_values.slt;
    * `…, unnest(v.a)` — functions/table/unnest_list.slt) cannot be
    * expressed as a Spark TVF call; rewrite to a LATERAL generator
    * subquery. Applied only when an argument is a bare identifier (a
    * potential lateral reference) — literal-only calls keep the
    * registered TVF path. generate_series output is Int64 in the
    * reference regardless of argument width, hence the BIGINT casts. */
  private def rewriteCorrelatedSeries(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    val fromEnders = Set("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
      "UNION", "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY", "OFFSET")
    var i = 0
    var depth = 0
    val inFrom = mutable.Map.empty[Int, Boolean].withDefaultValue(false)
    while (i < ts.length) {
      ts(i) match {
        case Punct("(") => depth += 1; inFrom(depth) = false
        case Punct(")") => inFrom(depth) = false; depth -= 1
        case Ident(w) if w.toUpperCase == "FROM" => inFrom(depth) = true
        case Ident(w) if fromEnders.contains(w.toUpperCase) =>
          inFrom(depth) = false
        case t if inFrom(depth) && (t == Punct(",") ||
            (t match {
              case Ident(w) => w.toUpperCase == "JOIN"
              case _ => false
            })) =>
          nextSigOpt(ts, i) match {
            case Some((fi, Ident(f)))
                if (f.equalsIgnoreCase("generate_series") ||
                  f.equalsIgnoreCase("unnest")) &&
                  nextSigOpt(ts, fi).exists(_._2 == Punct("(")) =>
              val pi = nextSig(ts, fi)
              val close = matchingClose(ts, pi)
              val args = ts.slice(pi + 1, close)
              // correlated iff some argument token is a bare identifier
              // (not a function call — i.e. not followed by `(`)
              val correlated = args.zipWithIndex.exists { case (tok, k) =>
                tok match {
                  case Ident(_) =>
                    val nxt = args.drop(k + 1).find(!_.isInstanceOf[Ws])
                    !nxt.contains(Punct("("))
                  case _ => false
                }
              }
              if (correlated) {
                val repl =
                  if (f.equalsIgnoreCase("unnest"))
                    Vector(Ident("LATERAL"), Ws(" "), Punct("("),
                      Ident("SELECT"), Ws(" "), Ident("explode"), Punct("(")) ++
                      args ++
                      Vector(Punct(")"), Ws(" "), Ident("AS"), Ws(" "),
                        Ident("unnest"), Punct(")"))
                  else {
                    // split top-level commas, wrap each arg in BIGINT()
                    val groups = mutable.ArrayBuffer[Vector[Tok]]()
                    var d = 0
                    var last = 0
                    args.zipWithIndex.foreach {
                      case (Punct("("), _) => d += 1
                      case (Punct(")"), _) => d -= 1
                      case (Punct(","), k) if d == 0 =>
                        groups += args.slice(last, k); last = k + 1
                      case _ =>
                    }
                    groups += args.slice(last, args.length)
                    val casted = groups.zipWithIndex.flatMap { case (g, k) =>
                      (if (k > 0) Vector(Punct(","), Ws(" ")) else Vector.empty) ++
                        Vector(Ident("BIGINT"), Punct("(")) ++ g :+ Punct(")")
                    }.toVector
                    Vector(Ident("LATERAL"), Ws(" "), Punct("("),
                      Ident("SELECT"), Ws(" "), Ident("explode"), Punct("("),
                      Ident("sequence"), Punct("(")) ++ casted ++
                      Vector(Punct(")"), Punct(")"), Ws(" "), Ident("AS"),
                        Ws(" "), Ident("generate_series"), Punct(")"))
                  }
                ts = ts.slice(0, fi) ++ repl ++ ts.slice(close + 1, ts.length)
                // skip past the balanced replacement (net-zero depth)
                i = fi + repl.length - 1
              } else i = close
            case _ =>
          }
        case _ =>
      }
      i += 1
    }
    ts
  }

  /** Implicit lateral correlation: in a FROM clause, `, (SELECT …)` and
    * `JOIN (SELECT …)` become `, LATERAL (SELECT …)` / `JOIN LATERAL (…)` —
    * the reference allows correlated FROM subqueries without the keyword;
    * Spark requires LATERAL (harmless when uncorrelated). */
  private def rewriteImplicitLateral(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    val fromEnders = Set("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
      "UNION", "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY", "OFFSET")
    var i = 0
    // inFrom state per paren depth
    var depth = 0
    val inFrom = mutable.Map.empty[Int, Boolean].withDefaultValue(false)
    while (i < ts.length) {
      ts(i) match {
        case Punct("(") => depth += 1; inFrom(depth) = false
        case Punct(")") => inFrom(depth) = false; depth -= 1
        case Ident(w) if w.toUpperCase == "FROM" => inFrom(depth) = true
        case Ident(w) if fromEnders.contains(w.toUpperCase) =>
          inFrom(depth) = false
        case t if inFrom(depth) &&
            (t == Punct(",") || (t match {
              case Ident(w) if w.toUpperCase == "JOIN" =>
                // Spark supports LATERAL only on inner/cross/left joins
                val p = prevSig(ts, i)
                !(p >= 0 && (ts(p) match {
                  case Ident(k) =>
                    Set("NATURAL", "RIGHT", "FULL", "OUTER")
                      .contains(k.toUpperCase) &&
                      // LEFT OUTER is fine; RIGHT/FULL OUTER are not
                      (k.toUpperCase != "OUTER" || {
                        val pp = prevSig(ts, p)
                        pp >= 0 && (ts(pp) match {
                          case Ident(k2) =>
                            Set("RIGHT", "FULL").contains(k2.toUpperCase)
                          case _ => false
                        })
                      })
                  case _ => false
                }))
              case _ => false
            })) =>
          (nextSigOpt(ts, i), nextSig2Opt(ts, i)) match {
            case (Some((pi, Punct("("))), Some((si, Ident(sel))))
                if sel.toUpperCase == "SELECT" && si == nextSig(ts, pi) =>
              ts = ts.slice(0, pi) ++
                Vector(Ident("LATERAL"), Ws(" ")) ++ ts.slice(pi, ts.length)
              i = pi + 1
            case _ =>
          }
        case _ =>
      }
      i += 1
    }
    ts
  }

  /** Division is polymorphic in the reference (arith/div.rs): integer
    * division on integral inputs, Float64 otherwise — `5/2 = 2` but
    * `1.0/3.0 = 0.333…`. `a / b` → `div(a, b)` (the registered GlareDiv
    * expression implements exactly that). Runs after the cast pass. */
  private def rewriteDivToDouble(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Op("/") =>
          val lp = prevSig(ts, i)
          if (lp < 0) { i += 1 }
          else {
            val ls = operandStart(ts, lp)
            val re = operandEnd(ts, i + 1)
            val out = Vector.newBuilder[Tok]
            out ++= ts.slice(0, ls)
            out += Ident("div"); out += Punct("(")
            out ++= ts.slice(ls, lp + 1)
            out += Punct(","); out += Ws(" ")
            out ++= ts.slice(i + 1, re + 1).dropWhile(_.isInstanceOf[Ws])
            out += Punct(")")
            out ++= ts.slice(re + 1, ts.length)
            ts = out.result()
            // resume at the right operand (now just after `div ( left , `)
            // so a `/` inside it is still visited; this one is consumed
            i = ls + 2 + (lp - ls + 1) + 2
          }
        case _ => i += 1
      }
    }
    ts
  }

  /** AVG is Float64 in the reference (aggregate/avg.rs): wrap the argument
    * in CAST(… AS DOUBLE) so Spark's decimal avg doesn't surface. */
  private def rewriteAvgToDouble(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Ident(w) if w.toUpperCase == "AVG" =>
          nextSigOpt(ts, i) match {
            case Some((pi, Punct("("))) =>
              val close = matchFwd(ts, pi)
              var argStart = nextSig(ts, pi)
              ts(argStart) match {
                case Ident(d) if d.toUpperCase == "DISTINCT" =>
                  argStart = nextSig(ts, argStart)
                case Op("*") | Punct("*") => argStart = close // leave avg(*)
                case _ =>
              }
              if (argStart < close) {
                val out = Vector.newBuilder[Tok]
                out ++= ts.slice(0, argStart)
                out += Ident("CAST"); out += Punct("(")
                out ++= ts.slice(argStart, close)
                out += Ws(" "); out += Ident("AS"); out += Ws(" ")
                out += Ident("DOUBLE"); out += Punct(")")
                out ++= ts.slice(close, ts.length)
                ts = out.result()
              }
              i = pi + 1
            case _ => i += 1
          }
        case _ => i += 1
      }
    }
    ts
  }

  /** `CAST(<int literal> AS DATE)` → days-since-epoch date (the reference
    * casts integers to DATE; Spark does not). Literal forms only. */
  private def rewriteIntDateCast(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      val matched = ts(i) match {
        case Ident(w) if w.toUpperCase == "CAST" =>
          nextSigOpt(ts, i) match {
            case Some((pi, Punct("("))) =>
              val close = matchFwd(ts, pi)
              // find AS at depth 1
              var j = pi + 1; var depth = 1; var asIdx = -1
              while (j < close && asIdx < 0) {
                ts(j) match {
                  case Punct("(") => depth += 1
                  case Punct(")") => depth -= 1
                  case Ident(a) if depth == 1 && a.toUpperCase == "AS" =>
                    asIdx = j
                  case _ =>
                }
                j += 1
              }
              if (asIdx > 0 && {
                val tn = nextSig(ts, asIdx)
                tn < close && (ts(tn) match {
                  case Ident(t) => t.toUpperCase == "DATE" &&
                    nextSig(ts, tn) == close
                  case _ => false
                })
              }) {
                val operand = ts.slice(pi + 1, asIdx)
                val isIntLit = operand.forall {
                  case Num(n) => !n.contains('.') && !n.toLowerCase.contains('e')
                  case Op("-") | Op("+") | Punct("(") | Punct(")") => true
                  case _: Ws => true
                  case _ => false
                } && operand.exists(_.isInstanceOf[Num])
                if (isIntLit) {
                  val out = Vector.newBuilder[Tok]
                  out ++= ts.slice(0, i)
                  out += Punct("("); out += Ident("DATE"); out += Ws(" ")
                  out += Str("'1970-01-01'")
                  out += Ws(" "); out += Op("+"); out += Ws(" ")
                  out += Ident("CAST"); out += Punct("(")
                  out ++= operand
                  out += Ws(" "); out += Ident("AS"); out += Ws(" ")
                  out += Ident("INT"); out += Punct(")")
                  out += Punct(")")
                  out ++= ts.slice(close + 1, ts.length)
                  ts = out.result()
                  true
                } else false
              } else false
            case _ => false
          }
        case _ => false
      }
      if (!matched) i += 1
    }
    ts
  }

  /** `x NOT BETWEEN a AND b` → `(x < a OR x > b)` — the reference's
    * three-valued evaluation filters rows when a bound is NULL, while
    * Spark's NOT(a AND b) form lets `false AND NULL = false` through. */
  private def rewriteNotBetween(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      val matched = (ts(i), nextSigOpt(ts, i)) match {
        case (Ident(n), Some((bi, Ident(b))))
            if n.toUpperCase == "NOT" && b.toUpperCase == "BETWEEN" =>
          val lp = prevSig(ts, i)
          if (lp < 0) false
          else {
            val ls = operandStart(ts, lp)
            val loEnd = operandEnd(ts, bi + 1)
            val andIdx = nextSig(ts, loEnd)
            if (andIdx < ts.length && (ts(andIdx) match {
              case Ident(a) => a.toUpperCase == "AND"
              case _ => false
            })) {
              val hiEnd = operandEnd(ts, andIdx + 1)
              val x = ts.slice(ls, lp + 1)
              val lo = ts.slice(bi + 1, loEnd + 1)
                .dropWhile(_.isInstanceOf[Ws])
              val hi = ts.slice(andIdx + 1, hiEnd + 1)
                .dropWhile(_.isInstanceOf[Ws])
              def kw(s: String): Seq[Tok] = Seq(Ws(" "), Ident(s), Ws(" "))
              val out = Vector.newBuilder[Tok]
              out ++= ts.slice(0, ls)
              // NULL-strict: any NULL operand → NULL (the reference's
              // ternary BETWEEN), not Spark's false-absorbing AND
              out += Punct("("); out += Ident("CASE")
              out ++= kw("WHEN")
              out ++= x; out ++= kw("IS"); out += Ident("NULL")
              out ++= kw("OR")
              out ++= lo; out ++= kw("IS"); out += Ident("NULL")
              out ++= kw("OR")
              out ++= hi; out ++= kw("IS"); out += Ident("NULL")
              out ++= kw("THEN"); out += Ident("NULL")
              out ++= kw("ELSE")
              out ++= x; out += Ws(" "); out += Op("<"); out += Ws(" ")
              out ++= lo
              out ++= kw("OR")
              out ++= x; out += Ws(" "); out += Op(">"); out += Ws(" ")
              out ++= hi
              out ++= kw("END"); out += Punct(")")
              out ++= ts.slice(hiEnd + 1, ts.length)
              ts = out.result()
              true
            } else false
          }
        case _ => false
      }
      if (!matched) i += 1
    }
    ts
  }

  /** `agg(*)` for non-count aggregates is an error in the reference; drop
    * the star so Spark raises an arity error. Trailing commas in select
    * lists (`select 1, 2,`) are reference-legal — drop them. */
  private def rewriteMiscSugar(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    // agg(*) → agg()
    var i = 0
    while (i < ts.length) {
      (ts(i), nextSigOpt(ts, i), nextSig2Opt(ts, i)) match {
        case (Ident(fn), Some((pi, Punct("("))), Some((si, Op("*"))))
            if Set("SUM", "AVG", "MIN", "MAX").contains(fn.toUpperCase) &&
              si == nextSig(ts, pi) &&
              nextSigOpt(ts, si).exists(_._2 == Punct(")")) =>
          ts = ts.slice(0, si) ++ ts.slice(si + 1, ts.length)
        case _ =>
      }
      i += 1
    }
    // quantified comparison sugar Spark's parser lacks:
    // `= ANY(subquery)` → `IN (…)`, `<>/!= ALL(subquery)` → `NOT IN (…)`
    // (subqueries/any_all.slt; the other operators have no IN equivalent)
    i = 0
    while (i < ts.length) {
      (ts(i), nextSigOpt(ts, i)) match {
        case (Op("="), Some((ai, Ident(a))))
            if a.toUpperCase == "ANY" && {
              val pi = nextSig(ts, ai)
              pi < ts.length && ts(pi) == Punct("(") &&
                (nextSigOpt(ts, pi) match {
                  case Some((_, Ident(s))) => s.toUpperCase == "SELECT"
                  case _ => false
                })
            } =>
          ts = ts.slice(0, i) ++ Vector(Ident("IN"), Ws(" ")) ++
            ts.slice(ai + 1, ts.length)
        case (Op("<>") | Op("!="), Some((ai, Ident(a))))
            if a.toUpperCase == "ALL" && {
              val pi = nextSig(ts, ai)
              pi < ts.length && ts(pi) == Punct("(") &&
                (nextSigOpt(ts, pi) match {
                  case Some((_, Ident(s))) => s.toUpperCase == "SELECT"
                  case _ => false
                })
            } =>
          ts = ts.slice(0, i) ++
            Vector(Ident("NOT"), Ws(" "), Ident("IN"), Ws(" ")) ++
            ts.slice(ai + 1, ts.length)
        case _ =>
      }
      i += 1
    }
    ts = rewriteLateralAgg(rewriteQuantifiedCompare(ts))
    // trailing comma: `, <terminator>`
    val enders = Set("FROM", "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
      "UNION", "EXCEPT", "INTERSECT", "WINDOW", "OFFSET")
    ts.zipWithIndex.filter { case (t, k) =>
      !(t == Punct(",") && {
        val n = nextSig(ts, k)
        n >= ts.length || (ts(n) match {
          case Punct(";") => true
          case Ident(w) => enders.contains(w.toUpperCase)
          case _ => false
        })
      })
    }.map(_._1)
  }

  /** Ordering quantified comparisons Spark's parser lacks:
    * `x > ANY(sub)` and friends (reference: plan_subquery.rs decorrelates
    * these natively; slt/standard/subqueries/correlated_any.slt).
    *
    * Rewritten to correlated-scalar MIN/MAX aggregate subqueries — the agg
    * is injected INTO the subquery's select list (not wrapped around a
    * derived table) so any outer correlation stays one level deep, which is
    * the shape Spark's DecorrelateInnerQuery handles:
    *   x >  ANY(SELECT e FROM r)  →  x >  (SELECT MIN(e) FROM r)
    *   x <= ALL(SELECT e FROM r)  →  x <= (SELECT MAX(e) FROM r)
    *   x =  ALL(sub)  →  x = (SELECT MIN…) AND x = (SELECT MAX…)
    *   x <> ANY(sub)  →  x <> (SELECT MIN…) OR x <> (SELECT MAX…)
    * The reference's quantified comparisons are two-valued (empty/NULL
    * collapse: ANY→false, ALL→true), so when the left operand is a simple
    * primary whose extent we can identify, the whole comparison is wrapped
    * in COALESCE(…, false|true); otherwise the bare scalar form is emitted
    * (identical under WHERE, where UNKNOWN filters like FALSE).
    * `= ANY`→IN and `<> ALL`→NOT IN are handled earlier. */
  private def rewriteQuantifiedCompare(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0

    // wrap the subquery's single select expression in an aggregate; None if
    // the select list isn't a single wrappable expression
    def aggSub(sub: Vector[Tok], agg: String): Option[Vector[Tok]] = {
      val selIdx = sub.indexWhere(!_.isInstanceOf[Ws])
      if (selIdx < 0) return None
      sub(selIdx) match {
        case Ident(s) if s.toUpperCase == "SELECT" =>
        case _ => return None
      }
      // top-level FROM (or end of subquery when there is no FROM clause)
      var depth = 0
      var fromIdx = sub.length
      var j = selIdx + 1
      while (j < sub.length && fromIdx == sub.length) {
        sub(j) match {
          case Punct("(") => depth += 1
          case Punct(")") => depth -= 1
          case Ident(w) if depth == 0 && w.toUpperCase == "FROM" => fromIdx = j
          case _ =>
        }
        j += 1
      }
      val e = sub.slice(selIdx + 1, fromIdx)
      val sig = e.filter(!_.isInstanceOf[Ws])
      val blocked = sig.exists {
        case Punct(",") => true // multi-column select list
        case Op("*") if sig.length == 1 => true // SELECT *
        case Ident(w) => Set("DISTINCT", "AS")(w.toUpperCase)
        case _ => false
      }
      if (sig.isEmpty || blocked) None
      else Some(sub.slice(0, selIdx + 1) ++
        Vector(Ws(" "), Ident(agg), Punct("(")) ++ e ++
        Vector(Punct(")"), Ws(" ")) ++ sub.slice(fromIdx, sub.length))
    }

    // start index of the simple primary ending just before `opIdx`, if its
    // left boundary is unambiguous (qualified ident chain, literal, or
    // call/paren group preceded by a clause keyword / '(' / ',')
    def operandStart(opIdx: Int): Option[Int] = {
      val j = prevSig(ts, opIdx)
      if (j < 0) return None
      var st = ts(j) match {
        case Punct(")") =>
          val open = matchBack(ts, j)
          val b = prevSig(ts, open)
          if (b >= 0 && ts(b).isInstanceOf[Ident]) b else open
        case _: Ident | _: QIdent | _: Num | _: Str => j
        case _ => return None
      }
      // absorb `tbl.` / `a.b.` qualification
      var b = prevSig(ts, st)
      while (b > 0 && ts(b) == Punct(".") && {
        val q = prevSig(ts, b)
        q >= 0 && (ts(q).isInstanceOf[Ident] || ts(q).isInstanceOf[QIdent])
      }) { st = prevSig(ts, b); b = prevSig(ts, st) }
      val boundary = b < 0 || (ts(b) match {
        case Punct("(") | Punct(",") => true
        case Ident(w) => Set("SELECT", "WHERE", "AND", "OR", "ON", "WHEN",
          "THEN", "ELSE", "HAVING", "BY", "NOT")(w.toUpperCase)
        case _ => false
      })
      if (boundary) Some(st) else None
    }

    var i = 0
    while (i < ts.length) {
      val hit = ts(i) match {
        case Op(op) if Set("<", "<=", ">", ">=", "=", "<>", "!=")(op) =>
          nextSigOpt(ts, i) match {
            case Some((qi, Ident(q)))
                if Set("ANY", "SOME", "ALL")(q.toUpperCase) =>
              val isAll = q.toUpperCase == "ALL"
              val pi = nextSig(ts, qi)
              val isSub = pi < ts.length && ts(pi) == Punct("(") &&
                (nextSigOpt(ts, pi) match {
                  case Some((_, Ident(s))) => s.toUpperCase == "SELECT"
                  case _ => false
                })
              // = ANY / <> ALL were mapped to IN / NOT IN earlier; anything
              // of that shape left here is not ours to touch
              val ours = isSub &&
                !(op == "=" && !isAll) && !(Set("<>", "!=")(op) && isAll)
              if (!ours) None
              else {
                val close = matchFwd(ts, pi)
                val sub = ts.slice(pi + 1, close)
                val deflt = Ident(if (isAll) "TRUE" else "FALSE")
                def scalar(agg: String): Option[Vector[Tok]] =
                  aggSub(sub, agg).map(w =>
                    Vector(Punct("(")) ++ w ++ Vector(Punct(")")))
                val eq = op == "=" || op == "<>" || op == "!="
                val rewritten: Option[(Vector[Tok], Boolean)] =
                  if (eq) {
                    // x = ALL / x <> ANY need the operand twice
                    (operandStart(i), scalar("MIN"), scalar("MAX")) match {
                      case (Some(st), Some(mn), Some(mx)) =>
                        val x = ts.slice(st, i)
                        val cmp = Op(if (op == "=") "=" else "<>")
                        val link = Ident(if (op == "=") "AND" else "OR")
                        Some((ts.slice(0, st) ++
                          Vector(Ident("COALESCE"), Punct("(")) ++
                          x ++ Vector(cmp, Ws(" ")) ++ mn ++
                          Vector(Ws(" "), link, Ws(" ")) ++
                          x ++ Vector(cmp, Ws(" ")) ++ mx ++
                          Vector(Punct(","), Ws(" "), deflt, Punct(")")) ++
                          ts.slice(close + 1, ts.length), true))
                      case _ => None
                    }
                  } else {
                    val agg =
                      if ((op.startsWith(">")) != isAll) "MIN" else "MAX"
                    scalar(agg).map { w =>
                      operandStart(i) match {
                        case Some(st) =>
                          (ts.slice(0, st) ++
                            Vector(Ident("COALESCE"), Punct("(")) ++
                            ts.slice(st, i) ++ Vector(Op(op), Ws(" ")) ++ w ++
                            Vector(Punct(","), Ws(" "), deflt, Punct(")")) ++
                            ts.slice(close + 1, ts.length), true)
                        case None =>
                          (ts.slice(0, i) ++ Vector(Op(op), Ws(" ")) ++ w ++
                            ts.slice(close + 1, ts.length), true)
                      }
                    }
                  }
                rewritten
              }
            case _ => None
          }
        case _ => None
      }
      hit match {
        case Some((next, _)) => ts = next // restart scan past nothing: stay
        case None =>
      }
      i += 1
    }
    ts
  }

  /** Correlated aggregates in LATERAL subqueries (reference decorrelates
    * them natively; slt/standard/join/lateral_join_aggregate.slt). Spark's
    * analyzer rejects outer references inside an Aggregate's expressions
    * (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY), so two sound shapes are
    * rewritten into forms it does decorrelate:
    *
    * 1. `LATERAL (SELECT agg(e))` with no FROM — the aggregate ranges over
    *    exactly one implicit row, so it IS its input (modulo sum/avg type
    *    promotion): SUM→CAST(e AS BIGINT), MIN/MAX→e, AVG→CAST(e AS
    *    DOUBLE), COUNT→IF(e IS NULL, 0, 1).
    * 2. `LATERAL (SELECT SUM(a * b * …) FROM r)` where some factors are
    *    outer-qualified (qualifier not a local FROM alias) and the rest
    *    local — multiplication distributes over SUM, so outer factors hoist
    *    out of a derived-table aggregate:
    *    `SELECT outer… * __s FROM (SELECT SUM(local…) AS __s FROM r) __q`
    *    leaving the outer reference in a plain projection, which Spark
    *    supports. SUM only (MIN/MAX would need sign knowledge). */
  private def rewriteLateralAgg(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    val aggs = Set("SUM", "MIN", "MAX", "AVG", "COUNT")

    def isKw(t: Tok, w: String): Boolean = t match {
      case Ident(x) => x.toUpperCase == w
      case _ => false
    }

    var i = 0
    while (i < ts.length) {
      if (isKw(ts(i), "LATERAL")) {
        val pi = nextSig(ts, i)
        val subOk = pi < ts.length && ts(pi) == Punct("(") &&
          nextSigOpt(ts, pi).exists(p => isKw(p._2, "SELECT"))
        if (subOk) {
          val close = matchFwd(ts, pi)
          val sub = ts.slice(pi + 1, close)
          val selIdx = sub.indexWhere(!_.isInstanceOf[Ws])
          // top-level FROM
          var depth = 0; var fromIdx = sub.length; var j = selIdx + 1
          while (j < sub.length && fromIdx == sub.length) {
            sub(j) match {
              case Punct("(") => depth += 1
              case Punct(")") => depth -= 1
              case t if depth == 0 && isKw(t, "FROM") => fromIdx = j
              case _ =>
            }
            j += 1
          }
          val e = sub.slice(selIdx + 1, fromIdx).filter(!_.isInstanceOf[Ws])
          // select list must be exactly AGG ( arg )
          val shaped = e.length >= 3 && (e.head match {
            case Ident(f) => aggs(f.toUpperCase)
            case _ => false
          }) && e(1) == Punct("(") && e.last == Punct(")") && {
            // the arg parens must close at the end (single call)
            var d = 0; var bal = true
            e.drop(2).dropRight(1).foreach {
              case Punct("(") => d += 1
              case Punct(")") => d -= 1; if (d < 0) bal = false
              case _ =>
            }
            bal && d == 0
          }
          if (shaped) {
            val fn = e.head.text.toUpperCase
            val arg = e.slice(2, e.length - 1)
            val replaced: Option[Vector[Tok]] =
              if (fromIdx == sub.length) {
                // shape 1: one-row aggregate → identity form
                val body = fn match {
                  case "SUM" =>
                    Vector(Ident("CAST"), Punct("(")) ++ arg ++
                      Vector(Ws(" "), Ident("AS"), Ws(" "), Ident("BIGINT"),
                        Punct(")"))
                  case "AVG" =>
                    Vector(Ident("CAST"), Punct("(")) ++ arg ++
                      Vector(Ws(" "), Ident("AS"), Ws(" "), Ident("DOUBLE"),
                        Punct(")"))
                  case "COUNT" =>
                    Vector(Ident("IF"), Punct("(")) ++ arg ++
                      Vector(Ws(" "), Ident("IS"), Ws(" "), Ident("NULL"),
                        Punct(","), Ws(" "), Num("0"), Punct(","), Ws(" "),
                        Num("1"), Punct(")"))
                  case _ => arg
                }
                Some(Vector(Ident("SELECT"), Ws(" ")) ++ body)
              } else if (fn == "SUM") {
                // shape 2: factor outer multiplicands out of the SUM
                val rest = sub.slice(fromIdx, sub.length)
                // local aliases: for `x AS a` the alias wins; bare `x` is
                // its own alias (comma/JOIN-separated relation list)
                val fr = rest.filter(!_.isInstanceOf[Ws])
                val locals = scala.collection.mutable.Set[String]()
                var k = 1
                while (k < fr.length) {
                  fr(k) match {
                    case Ident(w) if w.toUpperCase == "AS" &&
                        k + 1 < fr.length && fr(k + 1).isInstanceOf[Ident] =>
                      // alias replaces the relation name just recorded
                      fr(k - 1) match {
                        case Ident(prev) => locals -= prev.toUpperCase
                        case _ =>
                      }
                      locals += fr(k + 1).text.toUpperCase
                      k += 1
                    case Ident(w)
                        if !Set("JOIN", "ON", "INNER", "LEFT", "RIGHT",
                          "FULL", "CROSS", "OUTER", "WHERE", "GROUP",
                          "USING", "AS", "FROM")(w.toUpperCase) &&
                          (fr(k - 1) match {
                            case Ident(p) => Set("FROM", "JOIN",
                              "CROSS")(p.toUpperCase)
                            case Punct(",") => true
                            case _ => false
                          }) =>
                      locals += w.toUpperCase
                    case _ =>
                  }
                  k += 1
                }
                // split the agg arg by top-level '*'
                val factors = scala.collection.mutable.ArrayBuffer(
                  scala.collection.mutable.ArrayBuffer[Tok]())
                var d = 0
                arg.foreach {
                  case Punct("(") => d += 1; factors.last += Punct("(")
                  case Punct(")") => d -= 1; factors.last += Punct(")")
                  case Op("*") if d == 0 =>
                    factors += scala.collection.mutable.ArrayBuffer[Tok]()
                  case t => factors.last += t
                }
                // classify: qualified chain with non-local qualifier → outer
                def cls(f: Seq[Tok]): Option[Boolean] = { // Some(isOuter)
                  val sig = f.filter(!_.isInstanceOf[Ws])
                  sig.toList match {
                    case Ident(q) :: Punct(".") :: Ident(_) :: Nil =>
                      Some(!locals.contains(q.toUpperCase))
                    case Ident(_) :: Nil | Num(_) :: Nil => Some(false)
                    case _ => None // complex factor: bail
                  }
                }
                val classed = factors.map(f => (f.toVector, cls(f.toSeq)))
                if (factors.length >= 2 && classed.forall(_._2.isDefined) &&
                  classed.exists(_._2.contains(true)) &&
                  classed.exists(_._2.contains(false))) {
                  def prod(fs: Seq[Vector[Tok]]): Vector[Tok] =
                    fs.reduce((a, b) => a ++ Vector(Ws(" "), Op("*"),
                      Ws(" ")) ++ b)
                  val outer = prod(classed.filter(_._2.contains(true))
                    .map(_._1).toSeq)
                  val local = prod(classed.filter(_._2.contains(false))
                    .map(_._1).toSeq)
                  Some(Vector(Ident("SELECT"), Ws(" ")) ++ outer ++
                    Vector(Ws(" "), Op("*"), Ws(" "), Ident("__s"), Ws(" "),
                      Ident("FROM"), Ws(" "), Punct("("), Ident("SELECT"),
                      Ws(" "), Ident("SUM"), Punct("(")) ++ local ++
                    Vector(Punct(")"), Ws(" "), Ident("AS"), Ws(" "),
                      Ident("__s"), Ws(" ")) ++ rest ++
                    Vector(Punct(")"), Ws(" "), Ident("__q")))
                } else None
              } else None
            replaced.foreach { r =>
              ts = ts.slice(0, pi + 1) ++ r ++ ts.slice(close, ts.length)
            }
          }
        }
      }
      i += 1
    }
    ts
  }

  /** `EXPLAIN (FORMAT JSON) …` → `EXPLAIN …` (Spark's parser has no
    * parenthesized options; explain.slt only asserts the statement runs). */
  private def rewriteExplainFormat(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Ident(w) if w.toUpperCase == "EXPLAIN" =>
          val pi = nextSig(ts, i)
          if (pi < ts.length && ts(pi) == Punct("(")) {
            val close = matchFwd(ts, pi)
            val inner = ts.slice(pi + 1, close).filter(!_.isInstanceOf[Ws])
            val isFormat = inner.headOption.exists {
              case Ident(f) => f.toUpperCase == "FORMAT"
              case _ => false
            }
            if (isFormat)
              ts = ts.slice(0, pi) ++ ts.slice(close + 1, ts.length)
          }
        case _ =>
      }
      i += 1
    }
    ts
  }

  /** `array(…) <cmp> array(…)` → `graft_list_cmp(a, b) <cmp> 0` — the
    * reference's list comparisons are element-wise lexicographic with
    * nulls-high (list_comparisons.slt: `[NULL, 4] > [4]` is true), which
    * Spark's binary comparison on arrays doesn't match. */
  private def rewriteListCompare(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    def arrayCallAt(open: Int): Boolean = {
      val f = prevSig(ts, open)
      f >= 0 && (ts(f) match {
        case Ident(w) => w.toUpperCase == "ARRAY"
        case _ => false
      })
    }
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Op(op)
            if Set("=", "==", "<>", "!=", "<", "<=", ">", ">=")(op) =>
          val l = prevSig(ts, i)
          val r = nextSig(ts, i)
          val leftIsArray = l >= 0 && ts(l) == Punct(")") &&
            arrayCallAt(matchBack(ts, l))
          val rightIsArray = r < ts.length && (ts(r) match {
            case Ident(w) if w.toUpperCase == "ARRAY" =>
              val p = nextSig(ts, r)
              p < ts.length && ts(p) == Punct("(")
            case _ => false
          })
          if (leftIsArray && rightIsArray) {
            val lStart = prevSig(ts, matchBack(ts, l)) // ARRAY ident
            val rClose = matchFwd(ts, nextSig(ts, r))
            ts = ts.slice(0, lStart) ++
              Vector(Ident("graft_list_cmp"), Punct("(")) ++
              ts.slice(lStart, l + 1) ++ Vector(Punct(","), Ws(" ")) ++
              ts.slice(r, rClose + 1) ++
              Vector(Punct(")"), Ws(" "), Op(op), Ws(" "), Num("0")) ++
              ts.slice(rClose + 1, ts.length)
          }
        case _ =>
      }
      i += 1
    }
    ts
  }

  /** Decimal-literal × float32 arithmetic runs in Float32 in the reference
    * (decimal_arith_mul.slt: `4.5 * CAST(16.2 AS FLOAT)` displays 72.9);
    * Spark promotes to double (72.90000343…). Wrap the product back to
    * FLOAT so the display matches the engine that computed in f32. */
  private def rewriteFloat32Arith(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    def isDecimalLit(t: Tok): Boolean = t match {
      case Num(n) => n.contains(".")
      case _ => false
    }
    // CAST( … AS FLOAT|REAL ) starting at `open-1` (the CAST ident)?
    def floatCastEnd(castIdx: Int): Option[Int] = ts(castIdx) match {
      case Ident(c) if c.toUpperCase == "CAST" =>
        val open = nextSig(ts, castIdx)
        if (open < ts.length && ts(open) == Punct("(")) {
          val close = matchFwd(ts, open)
          val inner = ts.slice(open + 1, close).filter(!_.isInstanceOf[Ws])
          val tail = inner.takeRight(2)
          val isFloat = tail.length == 2 && (tail(0) match {
            case Ident(a) => a.toUpperCase == "AS"
            case _ => false
          }) && (tail(1) match {
            case Ident(t) => Set("FLOAT", "REAL")(t.toUpperCase)
            case _ => false
          })
          if (isFloat) Some(close) else None
        } else None
      case _ => None
    }
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Op(op) if Set("*", "+", "-", "/")(op) =>
          val l = prevSig(ts, i)
          val r = nextSig(ts, i)
          if (l >= 0 && r < ts.length && isDecimalLit(ts(l))) {
            floatCastEnd(r).foreach { rEnd =>
              ts = ts.slice(0, l) ++ Vector(Ident("CAST"), Punct("(")) ++
                ts.slice(l, rEnd + 1) ++
                Vector(Ws(" "), Ident("AS"), Ws(" "), Ident("FLOAT"),
                  Punct(")")) ++ ts.slice(rEnd + 1, ts.length)
              i = rEnd + 7 // skip past the wrap so it can't re-fire
            }
          }
        case _ =>
      }
      i += 1
    }
    ts
  }

  /** Output-name propagation out of subqueries, as the reference resolves
    * it (scalar_subquery.slt, reference_through_cast.slt):
    *  - a single-item subquery select list that is an unaliased bare
    *    column or a cast-chain of one column gets `AS <col>` injected, so
    *    the name survives the subquery boundary;
    *  - a scalar subquery standing alone as a select item gets the inner
    *    item's (possibly just-injected) alias appended as its outer alias,
    *    so `ORDER BY my_alias` and DESCRIBE both see the inner name. */
  private def rewriteSubqueryItemAliases(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      if (ts(i) == Punct("(") &&
        nextSigOpt(ts, i).exists {
          case (_, Ident(s)) => s.toUpperCase == "SELECT"
          case _ => false
        }) {
        val close = matchFwd(ts, i)
        val selIdx = nextSig(ts, i)
        // top-level select-list span inside the subquery
        var depth = 0
        var j = selIdx + 1
        var listEnd = close
        var comma = false
        while (j < close && listEnd == close) {
          ts(j) match {
            case Punct("(") => depth += 1
            case Punct(")") => depth -= 1
            case Punct(",") if depth == 0 => comma = true; j = close
            case Ident(w) if depth == 0 && Set("FROM", "WHERE", "GROUP",
              "ORDER", "HAVING", "LIMIT", "UNION", "EXCEPT",
              "INTERSECT")(w.toUpperCase) => listEnd = j
            case _ =>
          }
          j += 1
        }
        if (!comma) {
          val item = ts.slice(selIdx + 1, listEnd)
          val sig = item.filter(!_.isInstanceOf[Ws])
          // alias already present?
          val aliased = sig.length >= 2 && (sig(sig.length - 2) match {
            case Ident(a) => a.toUpperCase == "AS"
            case _ => false
          })
          val innerName: Option[String] =
            if (aliased) sig.lastOption.collect { case Ident(n) => n }
            else sig.toList match {
              case Ident(n) :: Nil => Some(n)
              case Ident(_) :: Punct(".") :: Ident(n) :: Nil => Some(n)
              case Ident(c) :: _ if c.toUpperCase == "CAST" =>
                // cast-chain of exactly one referenced column
                val castKw = Set("CAST", "TRY_CAST", "AS", "STRING",
                  "VARCHAR", "TEXT", "INT", "INTEGER", "BIGINT", "SMALLINT",
                  "TINYINT", "FLOAT", "REAL", "DOUBLE", "DECIMAL", "BOOL",
                  "BOOLEAN", "DATE", "TIMESTAMP", "BINARY")
                val cols = sig.collect { case Ident(w)
                    if !castKw(w.toUpperCase) => w }
                if (cols.length == 1) Some(cols.head) else None
              case _ => None
            }
          innerName match {
            case Some(n) =>
              var next = ts
              if (!aliased)
                next = next.slice(0, listEnd) ++
                  Vector(Ws(" "), Ident("AS"), Ws(" "), Ident(n), Ws(" ")) ++
                  next.slice(listEnd, next.length)
              // scalar select-item position: `(sub)` bounded by select-list
              // punctuation on both sides, with no outer alias yet
              val newClose = if (aliased) close else close + 5
              val before = prevSig(next, i)
              val after = nextSig(next, newClose)
              val scalarItem = (before < 0 || (next(before) match {
                case Punct(",") => true
                case Ident(w) => w.toUpperCase == "SELECT"
                case _ => false
              })) && (after >= next.length || (next(after) match {
                case Punct(",") | Punct(";") => true
                case Ident(w) => Set("FROM", "ORDER", "LIMIT", "UNION",
                  "EXCEPT", "INTERSECT", "WHERE", "GROUP",
                  "HAVING")(w.toUpperCase)
                case _ => false
              }))
              if (scalarItem)
                next = next.slice(0, newClose + 1) ++
                  Vector(Ws(" "), Ident("AS"), Ws(" "), Ident(n)) ++
                  next.slice(newClose + 1, next.length)
              ts = next
            case None =>
          }
        }
      }
      i += 1
    }
    ts
  }

  /** Duplicate select-list aliases: the reference resolves a later bare
    * reference to the LAST duplicate (`SELECT 1 AS a, 2 AS a, a + 3` → 5;
    * reference_alias_in_select.slt) where Spark raises
    * AMBIGUOUS_LATERAL_COLUMN_ALIAS. Rename all but the last duplicate —
    * goldens compare values, not names, for plain query records. */
  private def rewriteDupAliases(ts0: Vector[Tok]): Vector[Tok] = {
    val ts = ts0
    // collect top-level `AS <ident>` positions (depth 0 of the statement)
    var depth = 0
    val pos = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case Ident(w) if depth == 0 && w.toUpperCase == "AS" =>
          val n = nextSig(ts, i)
          if (n < ts.length) ts(n) match {
            case Ident(a) => pos += ((n, a.toUpperCase))
            case _ =>
          }
        case Ident(w) if depth == 0 && Set("FROM", "UNION", "EXCEPT",
          "INTERSECT")(w.toUpperCase) => i = ts.length // stop at clause end
        case _ =>
      }
      i += 1
    }
    val dups = pos.groupBy(_._2).filter(_._2.length > 1)
    if (dups.isEmpty) ts
    else {
      var next = ts
      dups.foreach { case (_, occ) =>
        occ.dropRight(1).zipWithIndex.foreach { case ((idx, name), k) =>
          next = next.updated(idx, Ident(s"${name.toLowerCase}__dup$k"))
        }
      }
      next
    }
  }

  /** Full rewrite pipeline. `chaining=false` disables the method-chaining
    * sugar (the reference's `enable_function_chaining` session var). */
  def rewrite(sql: String, chaining: Boolean = true): String = {
    val base0 = rewriteMiscSugar(rewriteNotBetween(
      rewriteOperatorSugar(tokenize(sql))))
    val base = rewriteCastRange(rewriteChaining(base0, chaining))
    var ts = mapIdents(rewriteTypedLiterals(rewriteExtractField(
      dropUnsupportedQualifiers(rewriteIndexing(
        rewriteListLiterals(rewriteImplicitLateral(rewriteCorrelatedSeries(
          rewriteFromValues(rewriteGroupingNoRollup(
            rewriteGroupingMulti(base)))))))))))
    ts = rewriteDupAliases(rewriteSubqueryItemAliases(
      rewriteListCompare(rewriteExplainFormat(ts))))
    var guard = 0
    var more = true
    while (more && guard < 200) {
      rewriteOneCast(ts) match {
        case Some(next) => ts = next; guard += 1
        case None => more = false
      }
    }
    ts = rewriteFloat32Arith(ts)
    render(rewriteIntDateCast(rewriteAvgToDouble(rewriteDivToDouble(ts))))
  }
}
