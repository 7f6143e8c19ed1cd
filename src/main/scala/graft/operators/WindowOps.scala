package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.DetAgg

/** Ordered-window analytics (rolling means, running totals). The frames
  * accumulate through DECIMAL like DetAgg, so window results are exact
  * and engine/run-deterministic regardless of how the engine associates
  * the frame sum. Windows partition by an explicit key — state per key is
  * bounded, and the shuffle is the partition key, so these scale
  * horizontally (a global unpartitioned window would not). */
object WindowOps {

  /** Trailing `n`-row mean of `valueCol` within each partition, ordered by
    * `orderCols` (include a unique tie-breaker for determinism). */
  def rollingMean(df: DataFrame, valueCol: String, n: Int,
      partitionCols: Seq[String], orderCols: Seq[String],
      as: String = "rolling_mean"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.withColumn(as,
      sum(col(valueCol).cast(DetAgg.Dec)).over(w).cast("double") /
        count(col(valueCol)).over(w))
  }

  /** Consecutive-row delta of `valueCol` within each partition (lag-based;
    * NULL for each partition's first row). */
  def delta(df: DataFrame, valueCol: String, partitionCols: Seq[String],
      orderCols: Seq[String], as: String = "delta"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn(as, col(valueCol) - lag(col(valueCol), 1).over(w))
  }

  /** Running total of `valueCol` within each partition. */
  def runningTotal(df: DataFrame, valueCol: String,
      partitionCols: Seq[String], orderCols: Seq[String],
      as: String = "running_total"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as,
      sum(col(valueCol).cast(DetAgg.Dec)).over(w).cast("double"))
  }

  /** Equal-frequency (quantile) binning: every bin gets n/k consecutive
    * rows of the value order. The global ascending rank is assigned with
    * zipWithIndex over the range-partitioned sort output (per-partition
    * counts + offset arithmetic — no single-partition window, same idiom
    * as the load-duration curve), then `bin = rank·k / n` in exact long
    * arithmetic. Two jobs (count + sort) and one shuffle each; survives
    * any n. Ties must be broken unique by `tieCols` for determinism. */
  def equalFrequencyBins(df: DataFrame, valueCol: String,
      tieCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val n = df.count()
    val sorted = df
      .orderBy(col(valueCol).asc +: tieCols.map(col(_).asc): _*)
      .select(col(valueCol))
    val schema = StructType(Seq(
      StructField("bin", LongType, nullable = false),
      StructField(valueCol, sorted.schema(valueCol).dataType)))
    val binned = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row(i * k / n, row.get(0))
      }, schema)
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("bin_min"), max(col(valueCol)).as("bin_max"),
        DetAgg.detSum(col(valueCol)).as("bin_sum"))
  }

  /** Forward-fill (the pandas `ffill` analog): each null takes the most
    * recent non-null value within its partition — a keyed running-last,
    * so state per partition is one value and the shuffle is the window's
    * partition key (scale-safe; an UNpartitioned fill would funnel
    * everything through one task — give gap-filling a key). */
  def forwardFill(df: DataFrame, valueCol: String,
      partitionCols: Seq[String], orderCols: Seq[String],
      as: String = "filled"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }
}
