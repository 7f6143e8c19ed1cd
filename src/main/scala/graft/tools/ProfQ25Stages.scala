package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-wise timing of the q25 minhashLsh pipeline at a given corpus:
  * signature build, banding+cap, candidate join, jaccard filter —
  * isolates which stage the 100x probe's blow-up lives in.
  *
  * Usage: runMain graft.tools.ProfQ25Stages <dir>
  */
object ProfQ25Stages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val bands = 8; val rowsPerBand = 2; val numHashes = 16
    val exploded = docs.select(col("doc_id").as("id"),
      explode(array_distinct(Dedup.wordShingles(col("text"), 3)))
        .as("shingle"))
    timed("explode count")(println("  rows=" + exploded.count()))
    val sig = exploded.groupBy("id").agg(
      array((0 until numHashes).map(i =>
        min(xxhash64(col("shingle"), lit(i)))): _*).as("sig"))
      .persist()
    timed("signatures")(println("  rows=" + sig.count()))
    val banded = sig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(slice(col("sig"),
            b * rowsPerBand + 1, lit(rowsPerBand)), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist()
    timed("banded")(println("  rows=" + banded.count()))
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("b"), col("sig").as("sig_b"))
    val joined = l.join(r, Seq("band", "bucket"))
      .where(col("a") < col("b"))
    timed("candidate join")(println("  rows=" + joined.count()))
    val pairs = joined.select(col("a"), col("b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          x === y), c => c)) / lit(16.0)).as("est_jaccard"))
      .distinct()
    timed("distinct+jaccard")(println("  rows=" + pairs.count()))
    timed("full operator")(println("  rows=" +
      Dedup.minhashLsh(docs, "text", "doc_id", 3, 8, 2, 0.35).count()))
    spark.stop()
  }
}
