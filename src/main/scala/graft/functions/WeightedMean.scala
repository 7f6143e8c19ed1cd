package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[WeightedMean]] — scale-6 exact decimal accumulators. */
case class WMBuf(sumWX: BigDecimal, sumW: BigDecimal)

/** Typed custom aggregator (the `Aggregator[IN, BUF, OUT]` surface,
  * SURVEY §2.10): weight-weighted mean with the DetAgg discipline — both
  * accumulators are exact decimals, so the result is associative across
  * partitions and identical to the SQL formulation
  * `CAST(SUM(CAST(x*w AS DECIMAL(30,6))) AS DOUBLE)
  *  / CAST(SUM(CAST(w AS DECIMAL(30,6))) AS DOUBLE)`.
  *
  * Register per-session via `functions.udaf(WeightedMean)` or use
  * `WeightedMean.toColumn` on a typed Dataset.
  */
object WeightedMean extends Aggregator[(Double, Double), WMBuf, Double] {

  private def dec(v: Double): BigDecimal = BigDecimal(
    java.math.BigDecimal.valueOf(v).setScale(6,
      java.math.RoundingMode.HALF_UP))

  override def zero: WMBuf = WMBuf(BigDecimal(0), BigDecimal(0))

  /** input: (value, weight); the product rounds at scale 6 BEFORE
    * accumulation, mirroring the SQL cast of the double product. */
  override def reduce(b: WMBuf, in: (Double, Double)): WMBuf =
    WMBuf(b.sumWX + dec(in._1 * in._2), b.sumW + dec(in._2))

  override def merge(a: WMBuf, b: WMBuf): WMBuf =
    WMBuf(a.sumWX + b.sumWX, a.sumW + b.sumW)

  override def finish(r: WMBuf): Double =
    if (r.sumW == BigDecimal(0)) Double.NaN
    else r.sumWX.toDouble / r.sumW.toDouble

  override def bufferEncoder: Encoder[WMBuf] = Encoders.product[WMBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
