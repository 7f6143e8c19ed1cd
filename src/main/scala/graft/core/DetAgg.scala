package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic floating-point aggregation.
  *
  * Double summation is order-dependent, and Spark's partition/merge order
  * is nondeterministic across runs and different from any single-node
  * engine — a correctness-gate and reproducibility hazard at 100 TB just
  * as much as at 60k rows. All engine aggregates over double measures
  * therefore route the accumulation through `DECIMAL(30,6)`: exact and
  * associative (int128 under Tungsten), so every run and every engine
  * produces bit-identical results, then cast back to double.
  *
  * Cost: decimal sum is a few ns/row slower than double sum but stays
  * inside hash-aggregate whole-stage codegen with map-side partial
  * aggregation — the shuffle shape is unchanged.
  */
object DetAgg {
  val Dec: DecimalType = DecimalType(30, 6)

  /** Exact, associative sum of a double column, returned as double. */
  def detSum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count (double
    * division of identical operands is deterministic). */
  def detAvg(c: Column): Column = detSum(c) / count(c)

  /** Equivalent DuckDB/ANSI SQL fragments (kept adjacent to the Column
    * versions so the two can never drift). */
  def sqlSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT($x)"
}
