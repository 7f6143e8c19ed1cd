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
    val l2 = rPayload.foldLeft(left.withColumn("__side", lit(1))) {
      (d, c) => d.withColumn(s"$rightPrefix$c", lit(null).cast(
        right.schema(c).dataType))
    }
    val r2base = right.select((keyCol +: rPayload).map(col): _*)
    val r2 = rPayload.foldLeft(r2base) { (d, c) =>
      d.withColumnRenamed(c, s"$rightPrefix$c")
    }.withColumn(tsCol, col(s"$rightPrefix$tsCol"))
      .withColumn("__side", lit(0))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // The payload columns are the final sort keys so that when several
    // right rows share the same (key, ts) the winning payload is
    // deterministic across runs and partitionings (the greatest payload
    // tuple wins); ts and __side alone would leave the tie to shuffle
    // order.
    val tieBreak = rPayload.map(c => col(s"$rightPrefix$c").asc_nulls_first)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc +: col("__side").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rPayload.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"$rightPrefix$c",
        last(col(s"$rightPrefix$c"), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1).drop("__side")
  }
}
