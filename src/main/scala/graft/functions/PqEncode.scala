package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder: maps a dim-width vector to its `m`
  * nearest-centroid codes, one per contiguous sub-vector block
  * (Jégou et al., TPAMI'11 — the codebooks come from driver-side
  * [[graft.operators.LocalKMeans]] fits on a bounded sample).
  *
  * Why a native expression: the literal-expression formulation
  * (`array_min` over m × ncent `struct(ssq − 2·vec_dot(slice(v), lit
  * array), idx)` trees — 256 VectorDot nodes at m=16, ncent=16) grows
  * past Janino's 64 KB method limit, so the whole projection fell back
  * to interpreted eval and every downstream stage lost whole-stage
  * codegen. Here the codebooks ride along as one reference object and
  * the generated code is three fixed nested loops — a few hundred
  * bytes of bytecode at any (m, ncent, dim).
  *
  * Score semantics are IDENTICAL to the literal form, bit for bit:
  * score(b, c) = ssq(b, c) − 2.0 · Σ_j x[b·sub+j]·book[b][c][j] with
  * left-to-right double accumulation, ssq precomputed driver-side with
  * the same left-to-right fold; argmin keeps the LOWEST index on ties
  * (the `array_min` struct order), and NaN scores never win (Spark
  * sorts NaN greatest). Null input, width mismatch, a null element,
  * or an all-NaN block (the one divergence from `array_min`, which
  * would pick code 0) → null.
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val m = books.length
  @transient private lazy val ncent = books.head.length
  @transient private lazy val sub = books.head.head.length
  // flattened (m·ncent) × sub centroid matrix + matching squared norms,
  // Scala-fold ssq so the constant is bit-identical to the literal form
  @transient private lazy val flat: Array[Array[Double]] =
    books.flatMap(_.map(_.toArray)).toArray
  @transient private lazy val ssq: Array[Double] =
    books.flatMap(_.map(c => c.map(x => x * x).sum)).toArray

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val shapeOk = books.nonEmpty && books.forall(b =>
      b.length == books.head.length &&
        b.forall(_.length == books.head.head.length))
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if shapeOk =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> input and a " +
            "rectangular m x ncent x sub codebook")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m * sub) return null
    if (elemNullable) {
      var i = 0
      while (i < m * sub) {
        if (x.isNullAt(i)) return null
        i += 1
      }
    }
    val isFloat = elemIsFloat
    val codes = new Array[Int](m)
    var b = 0
    while (b < m) {
      var best = Double.PositiveInfinity
      var bestC = -1
      var c = 0
      while (c < ncent) {
        val row = flat(b * ncent + c)
        var acc = 0.0
        var j = 0
        while (j < sub) {
          val xv = if (isFloat) x.getFloat(b * sub + j).toDouble
            else x.getDouble(b * sub + j)
          acc += xv * row(j)
          j += 1
        }
        val score = ssq(b * ncent + c) - 2.0 * acc
        if (score < best) { best = score; bestC = c }
        c += 1
      }
      if (bestC < 0) return null
      codes(b) = bestC
      b += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[][]")
    val ssqRef = ctx.addReferenceObj("pqSsq", ssq, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val score = ctx.freshName("score")
      val row = ctx.freshName("row")
      val nullCheck =
        if (elemNullable)
          s"""for (int $j = 0; $j < ${m * sub} && !${ev.isNull}; $j++)
             |  if ($a.isNullAt($j)) ${ev.isNull} = true;""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullCheck
         |  if (!${ev.isNull}) {
         |    int[] $codes = new int[$m];
         |    for (int $b = 0; $b < $m && !${ev.isNull}; $b++) {
         |      double $best = Double.POSITIVE_INFINITY;
         |      int $bestC = -1;
         |      for (int $c = 0; $c < $ncent; $c++) {
         |        double[] $row = $flatRef[$b * $ncent + $c];
         |        double $acc = 0.0;
         |        for (int $j = 0; $j < $sub; $j++) {
         |          $acc += (double) $a.$getter($b * $sub + $j) * $row[$j];
         |        }
         |        double $score = $ssqRef[$b * $ncent + $c] - 2.0 * $acc;
         |        if ($score < $best) { $best = $score; $bestC = $c; }
         |      }
         |      if ($bestC < 0) { ${ev.isNull} = true; } else { $codes[$b] = $bestC; }
         |    }
         |    if (!${ev.isNull}) {
         |      ${ev.value} =
         |        new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
