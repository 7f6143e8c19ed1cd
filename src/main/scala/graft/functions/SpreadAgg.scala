package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Example user-supplied aggregate for the `agg_func` callable hook
  * (reference: `/root/reference/energy_pandas/energypandas.py:289-291`,
  * where `agg_func` accepts any callable): the value spread (max − min)
  * of each timestamp group. A typed `Aggregator[Double, _, Double]` is
  * the Spark-native shape of "an arbitrary reduction the engine has no
  * builtin for" — it runs with map-side partial aggregation like any
  * builtin, and min/max composition keeps it float-order-insensitive,
  * so the cross-engine oracle (`max(v) - min(v)`) is exact. */
object SpreadAgg extends Aggregator[Double, (Double, Double), Double] {
  def zero: (Double, Double) =
    (Double.PositiveInfinity, Double.NegativeInfinity)
  def reduce(b: (Double, Double), v: Double): (Double, Double) =
    (math.min(b._1, v), math.max(b._2, v))
  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (math.min(a._1, b._1), math.max(a._2, b._2))
  def finish(b: (Double, Double)): Double =
    if (b._1 == Double.PositiveInfinity) 0.0 else b._2 - b._1
  def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
