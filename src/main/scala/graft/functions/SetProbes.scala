package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probes over driver-built side structures (the
  * decontamination gates' benchmark window set / bloom filter).
  *
  * Why native expressions and not Scala UDFs: a UDF wraps the call in
  * encoder/converter boundaries and breaks whole-stage codegen for the
  * entire projection; these ride the side structure along as ONE
  * reference object (the [[PqEncode]] recipe) and generate a single
  * static call — the surrounding filter stays inside the codegen span,
  * and the per-row work is the same set/bloom probe the UDF did.
  * Semantics preserved exactly: a null window array probes FALSE ("no
  * contaminated window seen"), so `!contains` keeps null-text docs,
  * matching the UDF's `ws != null && ws.exists(...)` form. All three
  * are deterministic, non-nullable boolean. */
object SetProbes {

  /** True iff any (h1, h2) window in `arr` is in `set` (full 128-bit
    * equality — the lane discipline of `StreamDecon.benchWindowSet`). */
  def windowSetContains(set: Set[(Long, Long)], arr: ArrayData): Boolean = {
    if (arr == null) return false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val r = arr.getStruct(i, 2)
      if (set.contains((r.getLong(0), r.getLong(1)))) return true
      i += 1
    }
    false
  }

  /** True iff any window's h1 lane might be in the bloom filter (one
    * lane keys the filter — `StreamDecon.benchBloom`'s construction). */
  def bloomWindowsContain(bf: BloomFilter, arr: ArrayData): Boolean = {
    if (arr == null) return false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (bf.mightContainLong(arr.getStruct(i, 2).getLong(0))) return true
      i += 1
    }
    false
  }
}

private[functions] trait WindowArrayProbe extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == RollingWindowHashes.OutType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires the RollingWindowHashes output type")
}

/** Exact-set window probe: `WindowSetContains(windows, benchSet)`. */
case class WindowSetContains(child: Expression, set: Set[(Long, Long)])
    extends WindowArrayProbe {
  override def prettyName: String = "window_set_contains"

  override def eval(input: InternalRow): Any =
    SetProbes.windowSetContains(set,
      child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("benchWindows", set,
      "scala.collection.immutable.Set")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = graft.functions.SetProbes.windowSetContains(
        $setRef, ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom window probe: any h1 lane `mightContain` → true. */
case class BloomWindowsContain(child: Expression, bloom: BloomFilter)
    extends WindowArrayProbe {
  override def prettyName: String = "bloom_windows_contain"

  override def eval(input: InternalRow): Any =
    SetProbes.bloomWindowsContain(bloom,
      child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("benchBloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = graft.functions.SetProbes.bloomWindowsContain(
        $bfRef, ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom probe over a single long hash column (the
  * `Sketches.bloomContaminatedDocs` filter). Null hash → false. */
case class BloomContainsLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def prettyName: String = "bloom_contains_long"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("benchBloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} =
        !${c.isNull} && $bfRef.mightContainLong(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
