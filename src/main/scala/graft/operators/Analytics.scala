package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.DetAgg

/** Closed-form statistical fits over groups. Everything here reduces to
  * sufficient statistics (Σx, Σy, Σxy, Σx², n) accumulated through
  * DetAgg's exact decimal route — ONE map-side-combinable aggregate per
  * group regardless of group size, then literal arithmetic. No solver,
  * no iteration, no driver collect: the estimate is part of the plan. */
object Analytics {

  /** Per-group simple linear regression y = slope·x + intercept (ordinary
    * least squares via the normal equations). The five sufficient sums
    * shuffle as one partial-aggregate row per (group, task) — the same
    * cost as a grouped mean at any scale. Groups with fewer than 2
    * points, or zero x-variance, yield NULL estimates. */
  def groupLinearRegression(df: DataFrame, groupCols: Seq[String],
      xCol: Column, yCol: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(when(xCol.isNotNull && yCol.isNotNull, lit(1))).as("n"),
        DetAgg.detSum(xCol).as("__sx"), DetAgg.detSum(yCol).as("__sy"),
        DetAgg.detSum(xCol * yCol).as("__sxy"),
        DetAgg.detSum(xCol * xCol).as("__sxx"))
    val n = col("n").cast("double")
    val denom = n * col("__sxx") - col("__sx") * col("__sx")
    val slope = when(col("n") >= 2 && denom =!= 0.0,
      (n * col("__sxy") - col("__sx") * col("__sy")) / denom)
    agg.withColumn("slope", round(slope, 6))
      .withColumn("intercept",
        round((col("__sy") - slope * col("__sx")) / n, 6))
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }
}
