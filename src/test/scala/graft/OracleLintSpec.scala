package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every registered oracle SQL string, guarding the repo's
  * #1 recurring correctness pitfall: DuckDB `sum(<integer expr>)` returns
  * HUGEINT, which the driver's comparison harness coerces to float64
  * (`149174.0` vs Spark's `149174`) and the hash compare goes red even when
  * both answers are right. Bit us in r7 (`q_expectations`), again in r9
  * (`q_cube`). The fix is always the same — `::BIGINT` (or float math) on
  * the aggregate output — so make the gate find the NEXT one at `sbt test`
  * time instead of at driver-compare time.
  *
  * Heuristic, tuned to this repo's oracle corpus: a `sum(...)` is risky iff
  * its argument is integer-typed (references a known INT test-table column,
  * or `len(`/`strlen(`, or integer literals only — and no float column, no
  * decimal literal, no `::double` inside) AND the enclosing output
  * expression shows no promotion (`::` cast, a decimal literal like `1.0`,
  * or a `/` division — all of which leave HUGEINT territory in DuckDB).
  */
object OracleLint {

  private val intCols = Set(
    "c_custkey", "c_nationkey", "doc_id", "event_id", "l_linenumber",
    "l_orderkey", "l_partkey", "l_suppkey", "label", "n_chars",
    "n_nationkey", "n_regionkey", "o_custkey", "o_orderkey", "p_partkey",
    "p_size", "r_regionkey", "s_nationkey", "s_suppkey", "user_id", "vec_id")

  private val floatCols = Set(
    "c_acctbal", "l_discount", "l_extendedprice", "l_quantity", "l_tax",
    "o_totalprice", "p_retailprice", "s_acctbal", "value")

  private val word = "[a-z_][a-z_0-9]*".r
  private val decimalLit = """\d\.\d|\d\.\s|\d\.$|\de[+-]?\d""".r

  private def referencedWords(expr: String): Set[String] =
    word.findAllIn(expr).toSet

  /** Is the sum argument integer-typed in DuckDB (→ sum yields HUGEINT)? */
  private def intTyped(arg: String): Boolean = {
    val a = arg.toLowerCase
    if (decimalLit.findFirstIn(a).isDefined) return false
    if (a.contains("::double") || a.contains("::float") || a.contains("::real"))
      return false
    val refs = referencedWords(a)
    if (refs.exists(floatCols)) return false
    val hasIntCol = refs.exists(intCols)
    val hasLen = a.contains("len(") || a.contains("strlen(") ||
      a.contains("length(") || a.contains("count(")
    val intLiteralOnly = """\b\d+\b""".r.findFirstIn(a).isDefined
    hasIntCol || hasLen || intLiteralOnly
  }

  /** Index of the close paren matching the open paren at `open`. */
  private def matching(sql: String, open: Int): Int = {
    var d = 0; var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i
        case _ =>
      }
      i += 1
    }
    sql.length - 1
  }

  /** The enclosing output expression around [from, to]: extend left/right
    * until a comma/paren at a depth at-or-below the sum's own, or a
    * depth-0 clause keyword. The boundary must be `<=` — select-list
    * commas sit at the SAME depth as a top-level sum, so a `<` test
    * never stops there and the window would swallow sibling
    * expressions, letting a neighbor's `::` cast mask a genuinely
    * uncast sum (the exact r7/r9 failure this lint exists to catch).
    * If the window's immediate wrapper is `round(`, that is a
    * promotion too (DuckDB round() returns DOUBLE even for HUGEINT
    * input), reported via a sentinel prefix. */
  private def exprWindow(sql: String, from: Int, to: Int): String = {
    val depth = new Array[Int](sql.length + 1)
    var d = 0
    for (i <- sql.indices) {
      if (sql.charAt(i) == '(') d += 1
      depth(i) = d
      if (sql.charAt(i) == ')') d -= 1
    }
    val dSum = depth(from)
    var lo = from
    while (lo > 0 && !(("(,".contains(sql.charAt(lo - 1)) && depth(lo - 1) <= dSum)
      || sql.toLowerCase.regionMatches(math.max(0, lo - 7), "select ", 0, 7))) lo -= 1
    var hi = to
    val low = sql.toLowerCase
    def clauseAt(i: Int): Boolean =
      Seq(" from ", " order ", " group ", " where ", " window ", " having ")
        .exists(k => low.regionMatches(i, k, 0, k.length))
    while (hi < sql.length - 1 && !((",)".contains(sql.charAt(hi + 1)) && depth(hi + 1) <= dSum)
      || clauseAt(hi + 1)) && !clauseAt(hi + 1)) hi += 1
    // promotions that live just OUTSIDE the window's enclosing group:
    // `round(<win>)` (DuckDB round() returns DOUBLE even on HUGEINT),
    // `fn(<win>, <promoted sibling>)` (coalesce/greatest/if/nullif return
    // the args' common type, so a `0.0` or `::DOUBLE` sibling promotes —
    // the <= comma boundary cuts the window at the wrapper's comma, so
    // siblings must be inspected here), `(<win>)::BIGINT` (group-level
    // cast), `... / (<win>)` (the whole group is a divisor)
    // the enclosing group's open paren: nearest '(' left of the window
    // whose depth equals the window's (handles the sum being ANY argument
    // of the wrapper, not only the first)
    var wrapOpen = lo - 1
    while (wrapOpen >= 0 && !(sql.charAt(wrapOpen) == '(' && depth(wrapOpen) == dSum))
      wrapOpen -= 1
    val wrapped = wrapOpen >= 0
    val wrapperName = if (!wrapped) "" else {
      var s = wrapOpen
      while (s > 0 && (sql.charAt(s - 1).isLetterOrDigit || sql.charAt(s - 1) == '_')) s -= 1
      low.substring(s, wrapOpen)
    }
    val roundWrapped = wrapperName == "round"
    // only wrappers where EVERY argument participates in the result
    // type: a decimal in if()'s CONDITION would falsely read as a
    // promotion while the result stays HUGEINT-vs-INT. nullif is
    // excluded too — DuckDB types nullif(a, b) as a's type alone
    // (CASE WHEN a=b THEN NULL ELSE a), so a decimal second argument
    // does NOT promote.
    val commonTypeWrappers = Set("coalesce", "greatest", "least", "ifnull")
    val siblingPromoted = wrapped && commonTypeWrappers(wrapperName) && {
      val close = matching(sql, wrapOpen)
      val siblings = sql.substring(wrapOpen + 1, lo) +
        sql.substring(math.min(hi + 1, close), close)
      promoted.findFirstIn(siblings).isDefined
    }
    val groupCast = wrapped && {
      val close = matching(sql, wrapOpen)
      close + 2 < sql.length && sql.substring(close + 1, close + 3) == "::"
    }
    val groupDivided = wrapped && wrapOpen >= 1 &&
      sql.substring(0, wrapOpen).trim.endsWith("/")
    (if (roundWrapped || siblingPromoted || groupCast || groupDivided) "1.0 " else "") +
      sql.substring(lo, hi + 1)
  }

  private val promoted = """::|\d\.\d|/""".r

  /** All risky sum( sites in one oracle SQL; empty = clean. */
  def risks(sql: String): Seq[String] = {
    val low = sql.toLowerCase
    val out = Seq.newBuilder[String]
    var i = low.indexOf("sum(")
    while (i >= 0) {
      val boundaryOk = i == 0 || !low.charAt(i - 1).isLetterOrDigit && low.charAt(i - 1) != '_'
      if (boundaryOk) {
        val close = matching(sql, i + 3)
        val arg = sql.substring(i + 4, close)
        if (intTyped(arg)) {
          val window = exprWindow(sql, i, close)
          if (promoted.findFirstIn(window).isEmpty)
            out += s"uncast integer sum → DuckDB HUGEINT: `$window`"
        }
      }
      i = low.indexOf("sum(", i + 1)
    }
    out.result()
  }
}

class OracleLintSpec extends AnyFunSuite {

  test("every registered oracle SQL is free of uncast integer sums") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      OracleLint.risks(sql).map(r => s"$name: $r")
    }
    assert(bad.isEmpty,
      s"HUGEINT-risk oracle expressions (add ::BIGINT / ::DOUBLE):\n${bad.mkString("\n")}")
  }

  test("the lint catches the exact r9 q_cube failure") {
    val r9 = "SELECT coalesce(source,'ALL') AS src, coalesce(lang,'ALL') AS lng, " +
      "count(*) AS n, sum(n_chars) AS chars FROM documents GROUP BY CUBE(source, lang) " +
      "ORDER BY src, lng"
    assert(OracleLint.risks(r9).nonEmpty)
    val fixed = r9.replace("sum(n_chars)", "sum(n_chars)::BIGINT")
    assert(OracleLint.risks(fixed).isEmpty)
  }

  test("the lint is not fooled by safe shapes") {
    // float column sum
    assert(OracleLint.risks("SELECT sum(l_quantity) AS q FROM lineitem").isEmpty)
    // promotion via float multiply inside round()
    assert(OracleLint.risks(
      "SELECT round(sum(n_chars) * 1.0, 1) AS c FROM documents").isEmpty)
    // promotion via division
    assert(OracleLint.risks(
      "SELECT sum(n_chars)::DOUBLE / sum(len(string_split(text,' '))) AS r FROM documents").isEmpty)
    // CASE-WHEN integer sum must be flagged
    assert(OracleLint.risks(
      "SELECT sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS n FROM documents").nonEmpty)
    // a SIBLING expression's cast must not mask an uncast sum (the
    // select-list comma sits at the sum's own depth — boundary is <=)
    assert(OracleLint.risks(
      "SELECT count(*)::BIGINT AS n, sum(n_chars) AS chars FROM documents").nonEmpty)
    // group-level promotions just outside the window
    assert(OracleLint.risks(
      "SELECT (count(*) - sum(n_chars))::BIGINT AS d FROM documents").isEmpty)
    assert(OracleLint.risks(
      "SELECT round(sum(n_chars), 1) AS c FROM documents").isEmpty)
    assert(OracleLint.risks(
      "SELECT x / (count(*) + sum(n_chars)) AS r FROM documents").isEmpty)
    // a promoted SIBLING ARGUMENT of a common-type wrapper promotes the
    // sum (coalesce/greatest return the args' common type) — in either
    // argument position
    assert(OracleLint.risks(
      "SELECT coalesce(sum(n_chars), 0.0) AS c FROM documents").isEmpty)
    assert(OracleLint.risks(
      "SELECT greatest(0.0, sum(n_chars)) AS c FROM documents").isEmpty)
    // …but an integer sibling does NOT promote
    assert(OracleLint.risks(
      "SELECT coalesce(sum(n_chars), 0) AS c FROM documents").nonEmpty)
    // a function merely NAMED like round( must not count as a promotion
    assert(OracleLint.risks(
      "SELECT wround(sum(n_chars)) AS c FROM documents").nonEmpty)
    // a decimal in a NON-value argument position (if's condition) does
    // not promote the result — still flagged
    assert(OracleLint.risks(
      "SELECT if(doc_id > 0.5, sum(n_chars), 0) AS c FROM documents").nonEmpty)
    // nullif types as its FIRST argument alone: a decimal second
    // argument does not promote — still flagged
    assert(OracleLint.risks(
      "SELECT nullif(sum(n_chars), 0.0) AS c FROM documents").nonEmpty)
  }
}
