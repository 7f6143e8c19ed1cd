package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization asymmetric-distance lookup table: for a query
  * vector, the flattened m × ncent array of squared L2 distances from
  * each sub-vector block to each codebook centroid —
  * `lut[b·ncent + c] = ‖x_b‖² − 2·<x_b, book[b][c]> + ‖book[b][c]‖²`,
  * evaluated as `(dot(x_b,x_b) − 2.0·acc) + ssq` with left-to-right
  * double accumulation: the exact association order of the literal
  * `dist2` expression it replaces, so ADC scores are bit-identical.
  *
  * Native for the same reason as [[PqEncode]]: the literal form loads
  * m × ncent × sub double constants through Janino `ldc2` sites and
  * blows the 64 KB method limit at m=16 (the query side is small, but
  * the failed compile costs seconds and drops the stage to interpreted
  * eval). Null input / width mismatch / null element → null.
  */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val m = books.length
  @transient private lazy val ncent = books.head.length
  @transient private lazy val sub = books.head.head.length
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
    val out = new Array[Double](m * ncent)
    var b = 0
    while (b < m) {
      // ‖x_b‖² once per block, same element order as dot(x_b, x_b)
      var xx = 0.0
      var j = 0
      while (j < sub) {
        val xv = if (isFloat) x.getFloat(b * sub + j).toDouble
          else x.getDouble(b * sub + j)
        xx += xv * xv
        j += 1
      }
      var c = 0
      while (c < ncent) {
        val row = flat(b * ncent + c)
        var acc = 0.0
        j = 0
        while (j < sub) {
          val xv = if (isFloat) x.getFloat(b * sub + j).toDouble
            else x.getDouble(b * sub + j)
          acc += xv * row(j)
          j += 1
        }
        out(b * ncent + c) = (xx - 2.0 * acc) + ssq(b * ncent + c)
        c += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[][]")
    val ssqRef = ctx.addReferenceObj("pqSsq", ssq, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xx = ctx.freshName("xx")
      val xv = ctx.freshName("xv")
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
         |    double[] $out = new double[${m * ncent}];
         |    for (int $b = 0; $b < $m; $b++) {
         |      double $xx = 0.0;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        double $xv = (double) $a.$getter($b * $sub + $j);
         |        $xx += $xv * $xv;
         |      }
         |      for (int $c = 0; $c < $ncent; $c++) {
         |        double[] $row = $flatRef[$b * $ncent + $c];
         |        double $acc = 0.0;
         |        for (int $j = 0; $j < $sub; $j++) {
         |          $acc += (double) $a.$getter($b * $sub + $j) * $row[$j];
         |        }
         |        $out[$b * $ncent + $c] = ($xx - 2.0 * $acc) + $ssqRef[$b * $ncent + $c];
         |      }
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
