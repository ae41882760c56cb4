package graft.dialect

/** TQL frontend: AST + lexer + recursive-descent parser (SURVEY.md §7
  * `dialect/`). Grammar mirrors the reference surface — Hyrise-parsed
  * SELECT statements (`cpp/tql/executor.hpp:27-31`) with TQL extensions:
  * glob LIKE (`tql.md:207-228`), Python-style array index/slice
  * (`tql.md:587-604`, `cpp/query_core/expr.hpp:255-318`), JSON string
  * indexing (`tql.md:143-166`), `cond: weight` function arg pairs
  * (`cpp/query_core/expr.hpp:158`), SAMPLE BY (`sample_statement.hpp`),
  * GROUP BY / UNGROUP BY sequence semantics (`group_statement.hpp`),
  * per-branch set ops (`statement.hpp:64-84`), LIMIT n PERCENT, `?`
  * positional params (`expr.hpp:107-126`).
  *
  * Hand-rolled (no parser-combinator dependency); the whole frontend is
  * driver-side analysis work — execution stays in Catalyst.
  */
object ast {
  sealed trait Expr
  case class Lit(v: Any) extends Expr // Long | Double | String | Boolean | null
  case object Star extends Expr
  case class Param(idx: Int) extends Expr
  case class Ref(parts: Seq[String]) extends Expr // col | alias.col
  case class Fn(name: String, args: Seq[Expr], pairs: Seq[(Expr, Expr)] = Nil) extends Expr
  case class Un(op: String, e: Expr) extends Expr // - | NOT | ISNULL | ISNOTNULL
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Between(e: Expr, lo: Expr, hi: Expr, neg: Boolean) extends Expr
  case class In(e: Expr, items: Seq[Expr], neg: Boolean) extends Expr
  case class ArrayLit(items: Seq[Expr]) extends Expr
  case class Index(e: Expr, idx: Expr) extends Expr // e[i] | e['key']
  case class Slice(e: Expr, lo: Option[Expr], hi: Option[Expr], step: Option[Expr]) extends Expr

  case class Proj(e: Expr, alias: Option[String])
  /** EXPAND BY h [w] [OVERLAP [bool]] [AS name] (vendored grammar
    * opt_expand, `bison_parser.y:875-884`; `tql.md:370-386`) */
  case class Expand(h: Int, w: Int, overlap: Boolean, alias: Option[String])
  /** UNGROUP BY col [SPLIT n | SPLIT [l1, ...]] — split variants per
    * `cpp/query_core/ungroup_statement.hpp:15-19` */
  case class Ungroup(col: String, splitNumber: Option[Int], splitLengths: Option[Seq[Int]])
  sealed trait Source { def alias: Option[String] }
  /** reserved table name for an omitted FROM clause: `ds.query("SELECT *
    * WHERE ...")` queries the dataset itself (reference `tql.md:266-276`
    * subquery/basic examples carry no FROM) */
  val SelfTable = "\u0000self"
  case class TableRef(name: String, alias: Option[String]) extends Source
  case class SubQuery(q: Query, alias: Option[String]) extends Source
  case class JoinClause(tpe: String, src: Source, on: Option[Expr], using: Seq[String])
  case class OrderItem(e: Expr, asc: Boolean)
  case class Select(
      projs: Seq[Proj],
      from: Source,
      joins: Seq[JoinClause],
      where: Option[Expr],
      expand: Option[Expand],
      groupBy: Seq[Proj],
      acrossSpace: Boolean,
      ungroup: Option[Ungroup],
      sampleBy: Option[(Expr, Boolean)], // (weight expr, with replacement)
      orderBy: Seq[OrderItem],
      limit: Option[(Expr, Boolean)], // (count expr: literal or ?, isPercent)
      offset: Option[Expr])
  // ops.size == selects.size-1; explain = Some(mode) when the statement
  // is EXPLAIN-prefixed (mode: FORMATTED | JSON | EXTENDED | CODEGEN | COST)
  case class Query(selects: Seq[Select], ops: Seq[String],
      explain: Option[String] = None)
}

private[dialect] object Lexer {
  sealed trait Tok
  case class Ident(s: String) extends Tok
  case class Kw(s: String) extends Tok // uppercased keyword
  case class NumL(v: Long) extends Tok
  case class NumD(v: Double) extends Tok
  case class Str(s: String) extends Tok
  case class Sym(s: String) extends Tok
  case object EOF extends Tok

  val keywords: Set[String] = Set(
    "SELECT", "FROM", "WHERE", "GROUP", "UNGROUP", "SAMPLE", "BY", "ORDER",
    "ASC", "DESC", "LIMIT", "OFFSET", "PERCENT", "REPLACE", "AS", "AND",
    "OR", "NOT", "IN", "BETWEEN", "LIKE", "ILIKE", "IS", "NULL", "TRUE",
    "FALSE", "ARRAY", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER",
    "CROSS", "ON", "USING", "UNION", "INTERSECT", "EXCEPT",
    "EXPAND", "OVERLAP", "SPLIT", "ACROSS", "TIME", "SPACE", "EXPLAIN")

  def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val j = i
        while (i < n && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        val t = s.substring(j, i)
        if (t.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) out += NumD(t.toDouble)
        else out += NumL(t.toLong)
      } else if (c == '\'' || c == '"') {
        val q = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s(i) != q) {
          if (s(i) == '\\' && i + 1 < n) { sb += s(i + 1); i += 2 }
          else { sb += s(i); i += 1 }
        }
        require(i < n, s"unterminated string literal in TQL: $s")
        i += 1
        out += Str(sb.toString)
      } else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val t = s.substring(j, i)
        if (keywords.contains(t.toUpperCase)) out += Kw(t.toUpperCase) else out += Ident(t)
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("==", "!=", "<>", "<=", ">=").contains(two)) { out += Sym(two); i += 2 }
        else { out += Sym(c.toString); i += 1 }
      }
    }
    out += EOF
    out.result()
  }
}

class TqlParser(input: String) {
  import Lexer._
  import ast._

  private val toks = Lexer.lex(input)
  private var pos = 0
  private var paramCount = 0

  private def peek: Tok = toks(pos)
  private def next(): Tok = { val t = toks(pos); pos += 1; t }
  private def expectSym(s: String): Unit = next() match {
    case Sym(`s`) => ()
    case t => fail(s"expected '$s' but found $t")
  }
  private def expectKw(s: String): Unit = next() match {
    case Kw(`s`) => ()
    case t => fail(s"expected $s but found $t")
  }
  private def atKw(s: String): Boolean = peek == Kw(s)
  private def eatKw(s: String): Boolean = if (atKw(s)) { pos += 1; true } else false
  private def eatSym(s: String): Boolean = if (peek == Sym(s)) { pos += 1; true } else false
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"TQL parse error at token $pos: $msg\n  in: $input")

  def parse(): Query = {
    // EXPLAIN [FORMATTED|JSON|EXTENDED|CODEGEN|COST] <query> — plan text
    // instead of rows (explain_query analog, `python/deeplake/__init__
    // .pyi:837`; the mode word is an ident, not reserved, so columns
    // named `json` etc. keep working)
    val explainMode: Option[String] =
      if (!eatKw("EXPLAIN")) None
      else peek match {
        case Ident(m) if Set("FORMATTED", "JSON", "EXTENDED", "CODEGEN",
            "COST").contains(m.toUpperCase) =>
          pos += 1; Some(m.toUpperCase)
        case _ => Some("FORMATTED")
      }
    val first = parseBranch()
    val selects = Seq.newBuilder[Select]
    val ops = Seq.newBuilder[String]
    selects += first
    var going = true
    while (going) peek match {
      case Kw(op @ ("UNION" | "INTERSECT" | "EXCEPT")) =>
        pos += 1
        ops += op
        selects += parseBranch()
      case _ => going = false
    }
    peek match {
      case EOF => ()
      case t => fail(s"trailing token $t")
    }
    Query(selects.result(), ops.result(), explainMode)
  }

  /** A set-op branch: a SELECT, optionally parenthesized — the
    * reference documents the parenthesized form
    * (`tql.md:350-366`: "(SELECT ... LIMIT 10) UNION (SELECT ...)"),
    * which is how per-branch ORDER/LIMIT reads naturally. */
  private def parseBranch(): Select =
    if (eatSym("(")) {
      val s = if (peekIsSym("(")) parseBranch() else parseSelect()
      expectSym(")")
      s
    } else parseSelect()

  private def peekIsSym(s: String): Boolean = peek match {
    case Sym(x) => x == s
    case _ => false
  }

  /** EXPAND BY h [w] [OVERLAP [bool]] [AS name] — the reference's docs
    * show the clause both directly after the select list and after WHERE
    * (`tql.md:372-382`); both positions are accepted. OVERLAP default
    * when the keyword is absent is false (per the documented examples;
    * the vendored grammar's empty-default-true at `bison_parser.y:884`
    * contradicts its own docs). */
  private def parseExpand(): Option[Expand] =
    if (!eatKw("EXPAND")) None
    else {
      expectKw("BY")
      def intLit(): Int = next() match {
        case NumL(v) => v.toInt
        case t => fail(s"expected EXPAND BY integer, found $t")
      }
      val h = intLit()
      val w = peek match { case NumL(_) => intLit(); case _ => h }
      val overlap =
        if (eatKw("OVERLAP")) peek match {
          case Kw("TRUE") => pos += 1; true
          case Kw("FALSE") => pos += 1; false
          case _ => true
        }
        else false
      val alias = if (eatKw("AS")) Some(parseIdent()) else None
      Some(Expand(h, w, overlap, alias))
    }

  private def parseSelect(): Select = {
    expectKw("SELECT")
    val projs = parseProjList()
    // FROM is optional: without it the statement queries the implicit
    // dataset (the `ds.query(...)` form — the reference's main entry)
    val from =
      if (eatKw("FROM")) parseSource()
      else TableRef(ast.SelfTable, None)
    val joins = Seq.newBuilder[JoinClause]
    var joining = true
    while (joining) peek match {
      case Kw("JOIN") | Kw("INNER") | Kw("LEFT") | Kw("RIGHT") | Kw("FULL") | Kw("CROSS") =>
        joins += parseJoin()
      case _ => joining = false
    }
    var expand = parseExpand()
    val where = if (eatKw("WHERE")) Some(parseExpr()) else None
    if (expand.isEmpty) expand = parseExpand()
    var groupBy: Seq[Proj] = Nil
    var acrossSpace = false
    var ungroup: Option[Ungroup] = None
    if (eatKw("GROUP")) {
      expectKw("BY")
      groupBy = parseGroupKeys()
      // [ACROSS TIME|SPACE], default TIME (`bison_parser.y:886-888`)
      if (eatKw("ACROSS")) {
        if (eatKw("SPACE")) acrossSpace = true
        else expectKw("TIME")
      }
    }
    if (eatKw("UNGROUP")) {
      expectKw("BY")
      val c = parseIdent()
      ungroup = Some(
        if (eatKw("SPLIT")) peek match {
          case NumL(n) => pos += 1; Ungroup(c, Some(n.toInt), None)
          case Sym("[") =>
            pos += 1
            val ls = Seq.newBuilder[Int]
            var more = peek != Sym("]")
            while (more) {
              next() match {
                case NumL(v) => ls += v.toInt
                case t => fail(s"expected SPLIT length, found $t")
              }
              more = eatSym(",")
            }
            expectSym("]")
            Ungroup(c, None, Some(ls.result()))
          case t => fail(s"expected SPLIT count or [lengths], found $t")
        }
        else Ungroup(c, None, None))
    }
    var sampleBy: Option[(Expr, Boolean)] = None
    if (eatKw("SAMPLE")) {
      expectKw("BY")
      val w = parseExpr()
      val rep = if (eatKw("REPLACE")) parseBoolLit() else false
      sampleBy = Some((w, rep))
    }
    val orderBy = if (eatKw("ORDER")) {
      expectKw("BY")
      val items = Seq.newBuilder[OrderItem]
      var more = true
      while (more) {
        val e = parseExpr()
        val asc = if (eatKw("DESC")) false else { eatKw("ASC"); true }
        items += OrderItem(e, asc)
        more = eatSym(",")
      }
      items.result()
    } else Nil
    var limit: Option[(Expr, Boolean)] = None
    var offset: Option[Expr] = None
    if (eatKw("LIMIT")) {
      val v = next() match {
        case NumL(x) => Lit(x)
        case NumD(x) => Lit(x.toLong)
        case Sym("?") => paramCount += 1; Param(paramCount - 1)
        case t => fail(s"expected LIMIT count, found $t")
      }
      val pct = eatKw("PERCENT")
      limit = Some((v, pct))
      if (eatKw("OFFSET")) offset = Some(next() match {
        case NumL(x) => Lit(x)
        case Sym("?") => paramCount += 1; Param(paramCount - 1)
        case t => fail(s"expected OFFSET count, found $t")
      })
    }
    Select(projs, from, joins.result(), where, expand, groupBy, acrossSpace,
      ungroup, sampleBy, orderBy, limit, offset)
  }

  private def parseProjList(): Seq[Proj] = {
    val out = Seq.newBuilder[Proj]
    var more = true
    while (more) {
      if (eatSym("*")) out += Proj(Star, None)
      else {
        val e = parseExpr()
        val alias =
          if (eatKw("AS")) Some(parseIdent())
          else peek match { // bare alias (ident not followed by '.' or '(')
            case Ident(a) if toks(pos + 1) != Sym(".") && toks(pos + 1) != Sym("(") =>
              pos += 1; Some(a)
            case _ => None
          }
        out += Proj(e, alias)
      }
      more = eatSym(",")
    }
    out.result()
  }

  private def parseGroupKeys(): Seq[Proj] = {
    val out = Seq.newBuilder[Proj]
    var more = true
    while (more) {
      val e = parseExpr()
      val alias = if (eatKw("AS")) Some(parseIdent()) else None
      out += Proj(e, alias)
      more = eatSym(",")
    }
    out.result()
  }

  private def parseSource(): Source = {
    if (eatSym("(")) {
      val q = parse0Subquery()
      expectSym(")")
      TqlParser.sourceAlias(SubQuery(q, None), parseOptAlias())
    } else next() match {
      case Ident(name) => TableRef(name, parseOptAlias())
      case Str(path) => TableRef(path, parseOptAlias()) // FROM "url" form
      case t => fail(s"expected table name, found $t")
    }
  }

  private def parse0Subquery(): Query = {
    val first = parseBranch()
    val selects = Seq.newBuilder[Select]
    val ops = Seq.newBuilder[String]
    selects += first
    var going = true
    while (going) peek match {
      case Kw(op @ ("UNION" | "INTERSECT" | "EXCEPT")) =>
        pos += 1; ops += op; selects += parseBranch()
      case _ => going = false
    }
    Query(selects.result(), ops.result())
  }

  private def parseOptAlias(): Option[String] = {
    if (eatKw("AS")) Some(parseIdent())
    else peek match {
      case Ident(a) => pos += 1; Some(a)
      case _ => None
    }
  }

  private def parseJoin(): JoinClause = {
    val tpe = next() match {
      case Kw("JOIN") => "inner"
      case Kw("INNER") => expectKw("JOIN"); "inner"
      case Kw("CROSS") => expectKw("JOIN"); "cross"
      case Kw(k @ ("LEFT" | "RIGHT" | "FULL")) =>
        eatKw("OUTER"); expectKw("JOIN"); k.toLowerCase
      case t => fail(s"expected join, found $t")
    }
    val src = parseSource()
    if (tpe == "cross") JoinClause(tpe, src, None, Nil)
    else if (eatKw("USING")) {
      expectSym("(")
      val cols = Seq.newBuilder[String]
      var more = true
      while (more) { cols += parseIdent(); more = eatSym(",") }
      expectSym(")")
      JoinClause(tpe, src, None, cols.result())
    } else {
      expectKw("ON")
      JoinClause(tpe, src, Some(parseExpr()), Nil)
    }
  }

  private def parseIdent(): String = next() match {
    case Ident(s) => s
    case t => fail(s"expected identifier, found $t")
  }

  private def parseBoolLit(): Boolean = next() match {
    case Kw("TRUE") => true
    case Kw("FALSE") => false
    case t => fail(s"expected TRUE/FALSE, found $t")
  }

  // ---- expressions (precedence: OR < AND < NOT < cmp < add < mul < unary < postfix) ----
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (eatKw("OR")) l = Bin("OR", l, parseAnd())
    l
  }

  private def parseAnd(): Expr = {
    var l = parseNot()
    while (eatKw("AND")) l = Bin("AND", l, parseNot())
    l
  }

  private def parseNot(): Expr =
    if (eatKw("NOT")) Un("NOT", parseNot()) else parseCmp()

  private def parseCmp(): Expr = {
    val l = parseAdd()
    peek match {
      case Sym(op @ ("=" | "==" | "!=" | "<>" | "<" | "<=" | ">" | ">=")) =>
        pos += 1
        val norm = op match { case "==" => "="; case "<>" => "!="; case o => o }
        Bin(norm, l, parseAdd())
      case Kw("IS") =>
        pos += 1
        val neg = eatKw("NOT")
        expectKw("NULL")
        Un(if (neg) "ISNOTNULL" else "ISNULL", l)
      case Kw("BETWEEN") =>
        pos += 1
        val lo = parseAdd(); expectKw("AND"); Between(l, lo, parseAdd(), neg = false)
      case Kw("IN") =>
        pos += 1
        expectSym("(")
        val items = Seq.newBuilder[Expr]
        var more = true
        while (more) { items += parseExpr(); more = eatSym(",") }
        expectSym(")")
        In(l, items.result(), neg = false)
      case Kw("LIKE") => pos += 1; Bin("LIKE", l, parseAdd())
      case Kw("ILIKE") => pos += 1; Bin("ILIKE", l, parseAdd())
      case Kw("NOT") if toks(pos + 1) == Kw("LIKE") =>
        pos += 2; Un("NOT", Bin("LIKE", l, parseAdd()))
      case Kw("NOT") if toks(pos + 1) == Kw("IN") =>
        pos += 2
        expectSym("(")
        val items = Seq.newBuilder[Expr]
        var more = true
        while (more) { items += parseExpr(); more = eatSym(",") }
        expectSym(")")
        In(l, items.result(), neg = true)
      case Kw("NOT") if toks(pos + 1) == Kw("BETWEEN") =>
        pos += 2
        val lo = parseAdd(); expectKw("AND"); Between(l, lo, parseAdd(), neg = true)
      case _ => l
    }
  }

  private def parseAdd(): Expr = {
    var l = parseMul()
    var going = true
    while (going) peek match {
      case Sym(op @ ("+" | "-")) => pos += 1; l = Bin(op, l, parseMul())
      case _ => going = false
    }
    l
  }

  private def parseMul(): Expr = {
    var l = parseUnary()
    var going = true
    while (going) peek match {
      case Sym(op @ ("*" | "/" | "%")) => pos += 1; l = Bin(op, l, parseUnary())
      case _ => going = false
    }
    l
  }

  private def parseUnary(): Expr =
    if (eatSym("-")) Un("-", parseUnary()) else parsePostfix()

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    var going = true
    while (going) {
      if (eatSym("[")) {
        // index or slice: [i] | [a:b] | [a:b:c] with any part omitted
        def part(): Option[Expr] = peek match {
          case Sym(":") | Sym("]") => None
          case _ => Some(parseExpr())
        }
        val p1 = part()
        if (eatSym(":")) {
          val p2 = part()
          val p3 = if (eatSym(":")) part() else None
          expectSym("]")
          e = Slice(e, p1, p2, p3)
        } else {
          expectSym("]")
          e = Index(e, p1.getOrElse(fail("empty index")))
        }
      } else going = false
    }
    e
  }

  private def parsePrimary(): Expr = next() match {
    case NumL(v) => Lit(v)
    case NumD(v) => Lit(v)
    case Str(s) => Lit(s)
    case Kw("TRUE") => Lit(true)
    case Kw("FALSE") => Lit(false)
    case Kw("NULL") => Lit(null)
    case Sym("?") => paramCount += 1; Param(paramCount - 1)
    case Sym("(") =>
      val e = parseExpr(); expectSym(")"); e
    case Kw("ARRAY") =>
      expectSym("[")
      val items = Seq.newBuilder[Expr]
      if (peek != Sym("]")) {
        var more = true
        while (more) { items += parseExpr(); more = eatSym(",") }
      }
      expectSym("]")
      ArrayLit(items.result())
    case Sym("[") => // bare [..] array literal (tql.md:95)
      val items = Seq.newBuilder[Expr]
      if (peek != Sym("]")) {
        var more = true
        while (more) { items += parseExpr(); more = eatSym(",") }
      }
      expectSym("]")
      ArrayLit(items.result())
    case Ident(name) =>
      peek match {
        case Sym("(") => // function call, args may be `cond: weight` pairs
          pos += 1
          val args = Seq.newBuilder[Expr]
          val pairs = Seq.newBuilder[(Expr, Expr)]
          if (peek != Sym(")")) {
            var more = true
            while (more) {
              val a = parseExpr()
              if (eatSym(":")) pairs += ((a, parseExpr())) else args += a
              more = eatSym(",")
            }
          }
          expectSym(")")
          Fn(name.toUpperCase, args.result(), pairs.result())
        case Sym(".") =>
          pos += 1
          val col = parseIdent()
          Ref(Seq(name, col))
        case _ => Ref(Seq(name))
      }
    case Sym("*") => Star
    case t => fail(s"unexpected token $t")
  }
}

object TqlParser {
  def apply(q: String): ast.Query = new TqlParser(q).parse()

  private[dialect] def sourceAlias(s: ast.Source, a: Option[String]): ast.Source =
    (s, a) match {
      case (sq: ast.SubQuery, Some(_)) => sq.copy(alias = a)
      case _ => s
    }
}
