package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout helpers for the 100 TB path.
  *
  * A shuffle exists only because data is not already partitioned the way
  * the operator needs it; the cheapest shuffle is the one paid once at
  * write time. Fact tables that are repeatedly joined or aggregated on a
  * key should be written bucketed (hash-partitioned files + catalog
  * metadata): subsequent equi-joins and groupBys on that key run with NO
  * Exchange (verified by plan in LayoutSpec). Time-series tables should
  * be range-partitioned by date so time-window queries prune files.
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .format("parquet").mode("overwrite").saveAsTable(table)

  /** Write `df` partitioned by a (low-cardinality) column — the
    * file-pruning layout for time/date predicates. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(path)
}
