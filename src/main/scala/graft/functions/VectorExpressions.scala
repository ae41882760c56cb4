package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the reference's vector kernel
  * (SURVEY.md §2.9; deeplake `cpp/nd/norm.hpp`, `cpp/nd/functions.hpp:136`).
  *
  * All run inside whole-stage codegen (tight primitive loops, no boxing,
  * no UDF serialization) over `array<float>` / `array<double>` columns —
  * the Spark-idiomatic replacement for the reference's vectorized batch
  * functors (`cpp/query_core/functor.hpp:355`). Null array -> null result;
  * null *elements* are read as 0 (embeddings never carry null elements);
  * length mismatch folds over the common prefix.
  */
trait VectorArrayOp { self: Expression =>
  protected def checkArray(e: Expression, side: String): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<float|double|tinyint>, got ${other.catalogString}")
  }
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  /** java source to read element `i` of `arr` as double */
  protected def readJ(e: Expression, arr: String, i: String): String = elemType(e) match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case ByteType  => s"(double) $arr.getByte($i)"
    case _         => s"$arr.getDouble($i)"
  }
  protected def readS(e: Expression, arr: ArrayData, i: Int): Double = elemType(e) match {
    case FloatType => arr.getFloat(i).toDouble
    case ByteType  => arr.getByte(i).toDouble
    case _         => arr.getDouble(i)
  }
}

/** Shared shape: fold two numeric arrays into a double with one loop. */
abstract class BinaryVectorFold extends BinaryExpression with VectorArrayOp {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkArray(left, "left")
    if (l.isFailure) l else checkArray(right, "right")
  }

  /** accumulator names -> (init java, per-element java given va/vb, finish java assigning to `result`) */
  protected def loopBody(acc: Seq[String], va: String, vb: String, result: String): (String, String, String)
  protected def accCount: Int
  protected def evalScala(x: ArrayData, y: ArrayData, n: Int): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    require(x.numElements() == y.numElements(),
      s"$prettyName: vector length mismatch (${x.numElements()} vs ${y.numElements()})")
    evalScala(x, y, x.numElements())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val acc = (0 until accCount).map(k => ctx.freshName(s"acc$k"))
      val (init, step, finish) = loopBody(acc, va, vb, ev.value.toString)
      // a silent min() here would truncate a mismatched pair and return
      // a plausible-but-wrong number; shape mismatches fail loudly like
      // the reference's nd-array ops
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: vector length mismatch ("
         |    + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |final int $n = $a.numElements();
         |$init
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $va = ${readJ(left, a, i)};
         |  final double $vb = ${readJ(right, b, i)};
         |  $step
         |}
         |$finish
         |""".stripMargin
    })
}

/** COSINE_SIMILARITY(a, b) — deeplake `cpp/nd/norm.hpp:35`. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "cosine_similarity"
  override protected def accCount = 3
  override protected def loopBody(acc: Seq[String], va: String, vb: String, result: String) = (
    s"double ${acc(0)} = 0.0; double ${acc(1)} = 0.0; double ${acc(2)} = 0.0;",
    s"${acc(0)} += $va * $vb; ${acc(1)} += $va * $va; ${acc(2)} += $vb * $vb;",
    s"$result = ${acc(0)} / (java.lang.Math.sqrt(${acc(1)}) * java.lang.Math.sqrt(${acc(2)}));")
  override protected def evalScala(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val va = readS(left, x, i); val vb = readS(right, y, i)
      dot += va * vb; nx += va * va; ny += vb * vb; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** DOT(a, b) — deeplake `cpp/nd/functions.hpp:136`. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "dot"
  override protected def accCount = 1
  override protected def loopBody(acc: Seq[String], va: String, vb: String, result: String) = (
    s"double ${acc(0)} = 0.0;",
    s"${acc(0)} += $va * $vb;",
    s"$result = ${acc(0)};")
  override protected def evalScala(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var i = 0
    while (i < n) { dot += readS(left, x, i) * readS(right, y, i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Minkowski distances of (a - b): ord 1 = L1, 2 = L2, Int.MaxValue = Linf
  * — deeplake `cpp/nd/norm.hpp:20,25,30` (norms applied to vector diff,
  * `docs/docs/advanced/tql.md:98-111`).
  */
case class VectorDistance(left: Expression, right: Expression, ord: Int) extends BinaryVectorFold {
  override def prettyName: String = ord match {
    case 1 => "l1_norm"; case 2 => "l2_norm"; case _ => "linf_norm"
  }
  override protected def accCount = 1
  override protected def loopBody(acc: Seq[String], va: String, vb: String, result: String) = ord match {
    case 1 => (s"double ${acc(0)} = 0.0;",
      s"${acc(0)} += java.lang.Math.abs($va - $vb);",
      s"$result = ${acc(0)};")
    case 2 => (s"double ${acc(0)} = 0.0;",
      s"${acc(0)} += ($va - $vb) * ($va - $vb);",
      s"$result = java.lang.Math.sqrt(${acc(0)});")
    case _ => (s"double ${acc(0)} = 0.0;",
      s"${acc(0)} = java.lang.Math.max(${acc(0)}, java.lang.Math.abs($va - $vb));",
      s"$result = ${acc(0)};")
  }
  override protected def evalScala(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) {
      val d = readS(left, x, i) - readS(right, y, i)
      ord match {
        case 1 => s += math.abs(d)
        case 2 => s += d * d
        case _ => s = math.max(s, math.abs(d))
      }
      i += 1
    }
    if (ord == 2) math.sqrt(s) else s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** HAMMING_DISTANCE(a, b): count of differing elements — `cpp/nd/norm.hpp:40`. */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression with VectorArrayOp {
  override def prettyName: String = "hamming_distance"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkArray(left, "left")
    if (l.isFailure) l else checkArray(right, "right")
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L; var i = 0
    while (i < n) { if (readS(left, x, i) != readS(right, y, i)) c += 1; i += 1 }
    // elements beyond the common prefix always differ
    c + math.abs(x.numElements() - y.numElements())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (${readJ(left, a, i)} != ${readJ(right, b, i)}) $c++;
         |}
         |${ev.value} = $c + java.lang.Math.abs($a.numElements() - $b.numElements());
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** MAXSIM(doc, query): ColPali late interaction — for each query vector,
  * max cosine similarity over doc vectors, summed over query vectors.
  * deeplake `cpp/nd/norm.hpp:46-56`, `docs/docs/advanced/tql.md:114-136`.
  * Children are `array<array<float|double>>` (bags of embeddings).
  */
case class MaxSim(left: Expression, right: Expression) extends BinaryExpression with VectorArrayOp {
  override def prettyName: String = "maxsim"
  override def dataType: DataType = DoubleType

  private def checkNested(e: Expression, side: String): TypeCheckResult = e.dataType match {
    case ArrayType(ArrayType(FloatType | DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<array<float|double>>, got ${other.catalogString}")
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkNested(left, "doc")
    if (l.isFailure) l else checkNested(right, "query")
  }
  private def innerIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val doc = a.asInstanceOf[ArrayData]; val query = b.asInstanceOf[ArrayData]
    val df = innerIsFloat(left); val qf = innerIsFloat(right)
    var total = 0.0
    var qi = 0
    while (qi < query.numElements()) {
      val q = query.getArray(qi)
      var best = Double.NegativeInfinity
      var di = 0
      while (di < doc.numElements()) {
        val d = doc.getArray(di)
        val n = math.min(q.numElements(), d.numElements())
        var dot = 0.0; var nq = 0.0; var nd = 0.0; var i = 0
        while (i < n) {
          val vq = if (qf) q.getFloat(i).toDouble else q.getDouble(i)
          val vd = if (df) d.getFloat(i).toDouble else d.getDouble(i)
          dot += vq * vd; nq += vq * vq; nd += vd * vd; i += 1
        }
        val sim = dot / (math.sqrt(nq) * math.sqrt(nd))
        if (sim > best) best = sim
        di += 1
      }
      if (doc.numElements() > 0) total += best
      qi += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getQ = if (innerIsFloat(right)) "getFloat" else "getDouble"
      val getD = if (innerIsFloat(left)) "getFloat" else "getDouble"
      val total = ctx.freshName("total"); val qi = ctx.freshName("qi")
      val di = ctx.freshName("di"); val i = ctx.freshName("i")
      val q = ctx.freshName("q"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val dot = ctx.freshName("dot")
      val nq = ctx.freshName("nq"); val nd = ctx.freshName("nd")
      val n = ctx.freshName("n"); val sim = ctx.freshName("sim")
      val vq = ctx.freshName("vq"); val vd = ctx.freshName("vd")
      s"""
         |double $total = 0.0;
         |for (int $qi = 0; $qi < $b.numElements(); $qi++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $q = $b.getArray($qi);
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $di = 0; $di < $a.numElements(); $di++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $d = $a.getArray($di);
         |    final int $n = java.lang.Math.min($q.numElements(), $d.numElements());
         |    double $dot = 0.0, $nq = 0.0, $nd = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $vq = (double) $q.$getQ($i);
         |      final double $vd = (double) $d.$getD($i);
         |      $dot += $vq * $vd; $nq += $vq * $vq; $nd += $vd * $vd;
         |    }
         |    final double $sim = $dot / (java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nd));
         |    if ($sim > $best) $best = $sim;
         |  }
         |  if ($a.numElements() > 0) $total += $best;
         |}
         |${ev.value} = $total;
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** L2_NORM(a) of a single vector (no diff) — `cpp/nd/norm.hpp:25`. */
case class VectorNorm(child: Expression, ord: Int) extends UnaryExpression with VectorArrayOp {
  override def prettyName: String = s"norm$ord"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkArray(child, "input")
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    while (i < x.numElements()) {
      val v = readS(child, x, i)
      ord match {
        case 1 => s += math.abs(v)
        case 2 => s += v * v
        case _ => s = math.max(s, math.abs(v))
      }
      i += 1
    }
    if (ord == 2) math.sqrt(s) else s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
      val step = ord match {
        case 1 => s"$s += java.lang.Math.abs($v);"
        case 2 => s"$s += $v * $v;"
        case _ => s"$s = java.lang.Math.max($s, java.lang.Math.abs($v));"
      }
      val fin = if (ord == 2) s"${ev.value} = java.lang.Math.sqrt($s);" else s"${ev.value} = $s;"
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $v = ${readJ(child, a, i)};
         |  $step
         |}
         |$fin
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
