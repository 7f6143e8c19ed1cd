package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for pipeline reproducibility.
  *
  * `rand()`-based sampling changes across runs and partitions; pipelines
  * that must be re-runnable (and auditable) sample by a content-derived
  * priority instead: hash the row id with a salt, keep the k smallest per
  * group. Same inputs → same sample, on any cluster, in any engine that
  * can compute the same hash. One window shuffle keyed by the group. */
object Sampling {

  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    val priority = md5(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(groupCol)
      .orderBy(priority.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  /** Training-data source mixing: draw a deterministic sample whose
    * per-group sizes follow the given weights (nₘ = ⌊weightₘ × total⌋) —
    * the "mixture proportions" step of corpus assembly (e.g. 60% web,
    * 30% code, 10% books), with the same hash-priority reproducibility
    * as [[samplePerGroup]]. Groups short of their allocation contribute
    * everything they have. One window shuffle keyed by the group. */
  def weightedMix(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], total: Long,
      salt: String = "graft"): DataFrame = {
    val priority = md5(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(groupCol)
      .orderBy(priority.asc, col(idCol).asc)
    val alloc = weights.foldLeft(lit(0L)) { case (acc, (g, wt)) =>
      when(col(groupCol) === g, lit((wt * total).toLong)).otherwise(acc)
    }
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= alloc).drop("__rn")
  }
}
