package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval range join via bucketed candidate generation.
  *
  * Spark plans a bare overlap predicate (`s1 < e2 AND s2 < e1`) as a
  * broadcast-nested-loop / cartesian join — quadratic and undistributable.
  * The scalable composition: explode every interval into the fixed-width
  * time buckets it covers, equi-join on the bucket id (an ordinary
  * shuffled join), then re-check the exact predicate and de-duplicate
  * (an interval pair can meet in several buckets). Bucket width trades
  * shuffle fan-out (short buckets) against candidate precision (long
  * buckets) — pick it near the median interval length.
  */
object RangeJoin {

  private def buckets(startCol: Column, endCol: Column, widthSec: Long): Column =
    sequence(
      floor(unix_timestamp(startCol) / widthSec).cast("long"),
      floor(unix_timestamp(endCol) / widthSec).cast("long"))

  /** All pairs of overlapping intervals between `a` and `b` (half-open
    * [start, end)). Both inputs need `idCols ++ Seq(startCol, endCol)`;
    * output carries a's columns prefixed `a_` and b's prefixed `b_`. */
  def overlapJoin(a: DataFrame, b: DataFrame, idCols: Seq[String],
      startCol: String, endCol: String, bucketSec: Long = 3600L): DataFrame = {
    def sideify(df: DataFrame, p: String): DataFrame = {
      val renamed = (idCols ++ Seq(startCol, endCol)).foldLeft(df) {
        (d, c) => d.withColumnRenamed(c, s"$p$c")
      }
      renamed.withColumn("__bucket",
        explode(buckets(col(s"$p$startCol"), col(s"$p$endCol"), bucketSec)))
    }
    val l = sideify(a, "a_")
    val r = sideify(b, "b_")
    l.join(r, Seq("__bucket"))
      .where(col(s"a_$startCol") < col(s"b_$endCol") &&
        col(s"b_$startCol") < col(s"a_$endCol"))
      .drop("__bucket")
      .distinct() // same pair can meet in several buckets
  }
}
