package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.dialect.TqlParser
import graft.dialect.ast._

/** Property fuzz for the TQL lexer+parser: generate random expression
  * TREES, render them to TQL text (fully parenthesized, so the test is
  * precedence-agnostic), parse, and require the EXACT tree back.
  * Catches lexer token boundaries, keyword/identifier collisions,
  * operator normalization (== → =, <> → !=), postfix chaining, slice
  * part omission, pair-argument syntax — the whole grammar surface —
  * against hundreds of random programs per run. Seeded generators via
  * scalacheck's own size machinery; no wall-clock dependence. */
class TqlParserPropSpec extends AnyFunSuite {

  private def render(e: Expr): String = e match {
    case Lit(null) => "NULL"
    case Lit(b: Boolean) => if (b) "TRUE" else "FALSE"
    case Lit(l: Long) => l.toString
    case Lit(d: Double) => d.toString
    case Lit(s: String) => s"'$s'"
    case Lit(other) => sys.error(s"unrenderable literal $other")
    case Star => "*"
    case Param(_) => sys.error("params excluded (indices are positional)")
    case Ref(parts) => parts.mkString(".")
    case Fn(n, args, pairs) =>
      n + "(" + (args.map(a => s"(${render(a)})") ++
        pairs.map { case (a, b) => s"(${render(a)}) : (${render(b)})" })
        .mkString(", ") + ")"
    case Un("-", x) => s"-(${render(x)})"
    case Un("NOT", x) => s"NOT (${render(x)})"
    case Un("ISNULL", x) => s"(${render(x)}) IS NULL"
    case Un("ISNOTNULL", x) => s"(${render(x)}) IS NOT NULL"
    case Un(op, _) => sys.error(s"unknown unary $op")
    case Bin(op, l, r) => s"(${render(l)}) $op (${render(r)})"
    case Between(x, lo, hi, neg) =>
      s"(${render(x)}) ${if (neg) "NOT " else ""}BETWEEN (${render(lo)}) AND (${render(hi)})"
    case In(x, items, neg) =>
      s"(${render(x)}) ${if (neg) "NOT " else ""}IN (" +
        items.map(i => s"(${render(i)})").mkString(", ") + ")"
    case ArrayLit(items) =>
      "ARRAY[" + items.map(i => s"(${render(i)})").mkString(", ") + "]"
    case Index(x, i) => s"(${render(x)})[(${render(i)})]"
    case Slice(x, lo, hi, st) =>
      s"(${render(x)})[" + lo.fold("")(render) + ":" + hi.fold("")(render) +
        st.fold("")(s => ":" + render(s)) + "]"
  }

  // identifiers prefixed so they can never collide with a keyword; fn
  // names pre-uppercased because the parser canonicalizes to upper
  private val genIdent: Gen[String] = for {
    c <- Gen.alphaLowerChar
    rest <- Gen.listOfN(4, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield s"c_$c${rest.mkString}"
  private val genFnName: Gen[String] = for {
    c <- Gen.alphaUpperChar
    rest <- Gen.listOfN(3, Gen.alphaUpperChar)
  } yield s"F_$c${rest.mkString}"

  private val genLeaf: Gen[Expr] = Gen.frequency(
    3 -> Gen.choose(0L, 100000L).map(Lit(_)),
    // n/8 keeps Double.toString in plain decimal form (never exponent)
    2 -> Gen.choose(1L, 80000L).map(n => Lit(n / 8.0)),
    2 -> Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const(' ')))
      .map(cs => Lit(cs.mkString.trim)),
    1 -> Gen.oneOf(Lit(true), Lit(false), Lit(null)),
    3 -> genIdent.map(n => Ref(Seq(n))),
    1 -> Gen.zip(genIdent, genIdent).map { case (a, b) => Ref(Seq(a, b)) },
    1 -> Gen.const(Star))

  private val binOps =
    Seq("=", "!=", "<", "<=", ">", ">=", "AND", "OR", "LIKE", "ILIKE",
      "+", "-", "*", "/", "%")

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genLeaf
    else {
      val sub = Gen.lzy(genExpr(depth - 1))
      Gen.frequency(
        3 -> genLeaf,
        3 -> (for {
          op <- Gen.oneOf(binOps); l <- sub; r <- sub
        } yield Bin(op, l, r)),
        2 -> (for {
          n <- genFnName
          args <- Gen.listOfN(2, sub).map(_.take(2))
          nPairs <- Gen.choose(0, 1)
          pairs <- Gen.listOfN(nPairs, Gen.zip(sub, sub))
        } yield Fn(n, args, pairs)),
        1 -> sub.map(Un("-", _)),
        1 -> sub.map(Un("NOT", _)),
        1 -> sub.map(Un("ISNULL", _)),
        1 -> sub.map(Un("ISNOTNULL", _)),
        1 -> (for { x <- sub; lo <- sub; hi <- sub; n <- Gen.oneOf(true, false) }
          yield Between(x, lo, hi, n)),
        1 -> (for {
          x <- sub
          items <- Gen.nonEmptyListOf(sub).map(_.take(3))
          n <- Gen.oneOf(true, false)
        } yield In(x, items, n)),
        1 -> Gen.listOf(sub).map(_.take(3)).map(ArrayLit(_)),
        1 -> Gen.zip(sub, sub).map { case (x, i) => Index(x, i) },
        1 -> (for {
          x <- sub
          lo <- Gen.option(sub); hi <- Gen.option(sub); st <- Gen.option(sub)
        } yield Slice(x, lo, hi, st)))
    }

  test("render -> parse is the identity on 500 random expression trees") {
    val prop = Prop.forAll(genExpr(4)) { e =>
      val sql = s"SELECT (${render(e)}) AS x FROM t"
      val parsed = TqlParser(sql).selects.head.projs.head.e
      if (parsed == e) true
      else {
        System.err.println(s"MISMATCH\n  rendered: $sql\n  expected: $e\n  parsed:   $parsed")
        false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("alias, order, limit and set-op scaffolding survive around a fuzzed projection") {
    val prop = Prop.forAll(genExpr(3), genExpr(2)) { (e1, e2) =>
      val sql = s"SELECT (${render(e1)}) AS a, (${render(e2)}) AS b FROM t " +
        s"WHERE (${render(e2)}) ORDER BY (${render(e1)}) DESC LIMIT 7"
      val q = TqlParser(sql)
      val s = q.selects.head
      s.projs.map(_.e) == Seq(e1, e2) &&
        s.projs.flatMap(_.alias) == Seq("a", "b") &&
        s.where.contains(e2) &&
        s.orderBy.map(o => (o.e, o.asc)) == Seq((e1, false)) &&
        s.limit.contains((Lit(7L), false))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
