package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 micro-probe: how much of a partitionBy("shard") artifact
  * write/read at bench scale is file-commit overhead (committer
  * algorithm, CRC shadow files, files-per-dir) vs real work — the
  * guide §6 small-files question asked of THIS engine's layout shape
  * (~100 shard dirs per increment at sf0.1).
  */
object ProfIoCommit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(0, 5000).select(col("id").as("doc_id"),
      (col("id") % 100).as("shard"),
      (col("id") * 37 % 1000).as("w"))
      .repartitionByRange(32, col("shard"), col("doc_id"))
      .persist()
    df.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"IOPROF $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val base = "/tmp/graft_ioprof"
    // warm
    df.write.mode("overwrite").partitionBy("shard").parquet(s"$base/warm")
    (1 to 3).foreach { i =>
      time(s"A_default_committer_v1_$i") {
        df.write.mode("overwrite").partitionBy("shard")
          .parquet(s"$base/a")
      }
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    (1 to 3).foreach { i =>
      time(s"B_committer_v2_$i") {
        df.write.mode("overwrite").partitionBy("shard")
          .parquet(s"$base/b")
      }
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    (1 to 3).foreach { i =>
      time(s"C_repart1_then_write_$i") {
        df.coalesce(1).write.mode("overwrite").partitionBy("shard")
          .parquet(s"$base/c")
      }
    }
    (1 to 3).foreach { i =>
      time(s"D_nopartition_single_dir_$i") {
        df.write.mode("overwrite").parquet(s"$base/d")
      }
    }
    // reads
    (1 to 3).foreach { i =>
      time(s"R_read_partitioned_agg_$i") {
        spark.read.parquet(s"$base/a").agg(sum("w")).collect()
      }
    }
    (1 to 3).foreach { i =>
      time(s"R_read_flat_agg_$i") {
        spark.read.parquet(s"$base/d").agg(sum("w")).collect()
      }
    }
    spark.stop()
  }
}
