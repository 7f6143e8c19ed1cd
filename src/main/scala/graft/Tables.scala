package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Test-table loading + cross-engine type normalization.
  *
  * The driver's oracle (DuckDB) reads the same parquet files and treats
  * every timestamp as a naive (no-zone) wall time. To keep both engines on
  * the same values: on READ, NTZ parquet timestamps become session-UTC
  * instants (so Spark's time functions see the same wall clock DuckDB
  * does); on WRITE, instants are cast back to TIMESTAMP_NTZ so the dumped
  * parquet carries naive wall times that compare equal to the oracle's.
  */
object Tables {

  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    // The events table carries TIMESTAMP(NANOS) which Spark's parquet
    // reader rejects; read nanos as long and rebuild the timestamp with
    // integral division (ns epoch values overflow double precision).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  /** Cast every top-level instant-typed output column to NTZ wall time. */
  def ntzOut(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == TimestampType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast(TimestampNTZType))
    }
}
