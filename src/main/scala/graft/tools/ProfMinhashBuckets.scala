package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: MinHash-LSH band-bucket size distribution and the
  * candidate-pair mass Σ n·(n−1)/2 it implies, under several caps —
  * run at the 10x / 100x corpora to see where the quadratic mass lives
  * before choosing `bucketCap`.
  *
  * Usage: runMain graft.tools.ProfMinhashBuckets <dir> [bands] [rows]
  */
object ProfMinhashBuckets {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx1")
    val bands = args.lift(1).map(_.toInt).getOrElse(8)
    val rowsPerBand = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val numHashes = bands * rowsPerBand
    val exploded = docs.select(col("doc_id").as("id"),
      explode(array_distinct(
        graft.operators.Dedup.wordShingles(col("text"), 3))).as("shingle"))
    val sig = exploded.groupBy("id").agg(
      array((0 until numHashes).map(i =>
        min(xxhash64(col("shingle"), lit(i)))): _*).as("sig"))
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(slice(col("sig"),
            b * rowsPerBand + 1, lit(rowsPerBand)), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val sizes = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("n")).select(col("n"))
      .persist()
    val stats = sizes.agg(
      count(lit(1)).as("buckets"), max(col("n")).as("max_n"),
      expr("approx_percentile(n, array(0.5, 0.99, 0.999))").as("p"),
      sum(col("n") * (col("n") - 1) / 2).as("pairs_all"),
      sum(when(col("n") <= 2000, col("n") * (col("n") - 1) / 2)
        .otherwise(0)).as("pairs_cap2000"),
      sum(when(col("n") <= 500, col("n") * (col("n") - 1) / 2)
        .otherwise(0)).as("pairs_cap500"),
      sum(when(col("n") <= 100, col("n") * (col("n") - 1) / 2)
        .otherwise(0)).as("pairs_cap100"),
      sum(when(col("n") > 2000, lit(1)).otherwise(0)).as("nb_gt2000"),
      sum(when(col("n") > 500, lit(1)).otherwise(0)).as("nb_gt500"),
      sum(when(col("n") > 100, lit(1)).otherwise(0)).as("nb_gt100"))
    stats.show(truncate = false)
    spark.stop()
  }
}
