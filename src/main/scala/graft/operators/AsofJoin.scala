package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union + running-last trick: tag both inputs, union them, and take
  * `last(ignoreNulls)` over a (key)-partitioned window ordered by
  * (ts, side). This is ONE shuffle on the key — no range explosion, no
  * per-row subquery — and state per key is a single running value, so it
  * scales to arbitrarily many rows per key (unlike broadcast-and-filter
  * formulations). At equal timestamps the right row sorts first, making
  * the match inclusive (DuckDB/pandas `merge_asof` semantics).
  */
object AsofJoin {

  /** @param right      must contain `keyCol`, `tsCol`, and `payloadCols`
    * @param payloadCols right columns carried onto matching left rows,
    *                    renamed with `rightPrefix`; the right timestamp is
    *                    always carried as `<rightPrefix>ts`
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], rightPrefix: String = "r_")
      : DataFrame = {
    val rPayload = (tsCol +: payloadCols).distinct
    // The whole right payload travels as ONE struct column, so a single
    // running `last` carries it: the result row is row-atomic — every
    // filled column comes from the SAME right row, even when tied right
    // rows interleave nulls across payload columns.
    val structT = org.apache.spark.sql.types.StructType(rPayload.map(c =>
      org.apache.spark.sql.types.StructField(s"$rightPrefix$c",
        right.schema(c).dataType)))
    val l2 = left.withColumn("__side", lit(1))
      .withColumn("__rs", lit(null).cast(structT))
    val r2 = right.select(col(keyCol), col(tsCol),
        struct(rPayload.map(c => col(c).as(s"$rightPrefix$c")): _*)
          .as("__rs"))
      .withColumn("__side", lit(0))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // The payload struct is the final sort key so that when several right
    // rows share the same (key, ts) the winner is deterministic across
    // runs and partitionings (the greatest payload struct wins, compared
    // lexicographically); ts and __side alone would leave the tie to
    // shuffle order.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__rs").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__rs", last(col("__rs"), ignoreNulls = true).over(w))
    val unpacked = rPayload.foldLeft(filled) { (d, c) =>
      d.withColumn(s"$rightPrefix$c", col("__rs").getField(s"$rightPrefix$c"))
    }
    unpacked.where(col("__side") === 1).drop("__side", "__rs")
  }
}
