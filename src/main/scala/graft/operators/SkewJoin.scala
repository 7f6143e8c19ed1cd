package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When a handful of hot keys dominate a shuffle join, all their rows land
  * on single reducers. Salting splits each hot key into `saltFactor`
  * sub-keys: the big side gets a deterministic per-row salt, the small
  * side is replicated once per salt value, and the join runs on
  * (key, salt) — fanning each hot key across `saltFactor` reducers at the
  * cost of replicating the small side. Result set is identical to the
  * plain join. (AQE's skew-join split covers sort-merge joins
  * automatically; explicit salting remains the tool for aggregations and
  * for engines/plans AQE doesn't reach.)
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    // deterministic salt: hash of the whole big row (not the key, which
    // is constant within a hot group)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)),
        lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
