package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a binary min-heap keyed "worst first" (lower
  * score first; ties — larger id first), capped at k entries, so the
  * aggregation buffer NEVER exceeds k (score, id) pairs regardless of
  * group size. Deterministic: the kept set and its final (score desc,
  * id asc) order are a pure function of the input multiset. */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  // a is WORSE than b -> a sorts toward the heap root. Compared via
  // java.lang.Double.compare (Spark's total ordering: NaN greatest,
  // -0.0 < 0.0) — raw `<` would make every NaN comparison false and
  // silently break the heap invariant, diverging from the window
  // row_number oracle which ranks NaN as the best score.
  @inline private def worse(sa: Double, ia: Long, sb: Double,
      ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) / 2
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    var done = false
    while (!done) {
      val l = pos * 2 + 1; val r = l + 1
      var m = pos
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) done = true
      else { swap(pos, m); pos = m }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown(0)
    }
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Entries as struct rows, best first (score desc, id asc). */
  def sortedRows: Array[AnyRef] = {
    // explicit total-order comparator: negation-based sortBy would
    // strand NaN scores (NaN == -NaN) instead of ranking them first
    val idx = (0 until size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(scores(a), scores(b))
      c > 0 || (c == 0 && ids(a) < ids(b))
    }
    idx.map(i => new GenericInternalRow(
      Array[Any](scores(i), ids(i))): AnyRef).toArray
  }
}

/** Native per-group top-k as a `TypedImperativeAggregate` — the scale
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY s
  * DESC)` + filter idiom: the window form SORTS every group in full
  * (O(n log n) per group, whole groups cross the shuffle), while this
  * aggregate keeps a k-bounded heap per group with map-side partial
  * aggregation — only k rows per (task, group) ever cross the wire.
  * Runs under ObjectHashAggregate (partial + final), exactly like
  * Spark's own `percentile`/`collect_list` family.
  *
  * Output: `array<struct<score double, id bigint>>`, best first, ties
  * by id ascending — a total order, so results hash-match the window
  * oracle row-for-row. Null score or id rows are skipped. */
case class TopKAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "k must be positive")

  override def prettyName: String = "top_k"
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint) inputs, got " +
          s"${scoreExpr.dataType.sql}, ${idExpr.dataType.sql}")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val i = idExpr.eval(input)
      if (i != null) b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedRows)

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + b.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.scores(i)); out.writeLong(b.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.insert(in.getDouble, in.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** Column-API wrapper: `topK(score, id, k)` aggregate column. */
  def topK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(TopKAgg(ColumnShim.expression(score),
      ColumnShim.expression(id), k).toAggregateExpression())
  }
}
