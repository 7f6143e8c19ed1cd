package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the lake-seeded ingest gate (q205): at the 100×
  * corpus, seed the StreamNearDup state from a half-corpus
  * banded-signature artifact and run the other half through the
  * batch twin — versus the replay alternative (stream the LAKE
  * through the gate first, then the increment: what a production
  * deploy without initialState would have to do). Measures the
  * seeded pass wall and the replay pass wall; the delta is what
  * initialState buys, and the seeded run's state build is the
  * grouped artifact read, not a corpus pass. */
object ProfSeededGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_seedprobe_").toString
    val lakeDocs = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val inc = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    def sec[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuild) = sec {
      graft.operators.Dedup.writeBandedSignatures(lakeDocs, "text",
        "doc_id", s"$root/sigs")
    }
    val (nSeeded, tSeeded) = sec {
      graft.streaming.StreamNearDup.batchFromLake(inc,
        spark.read.parquet(s"$root/sigs"), "text", "doc_id",
        minEstJaccard = 0.35).count()
    }
    println(f"SEEDGATE build=$tBuild%.1f s  seeded_pass=$tSeeded%.1f s  pairs=$nSeeded")
    // replay alternative: the lake text streams through the gate
    // before the increment (one batch job over the union — batch mode
    // arrival order is doc_id, so lake evens enroll ahead of odds
    // only per-bucket by id; to make the replay faithful, offset the
    // increment ids above the lake's so the lake is strictly earlier)
    val maxLake = lakeDocs.agg(max(col("doc_id"))).head().getLong(0)
    val union = lakeDocs.unionByName(
      inc.withColumn("doc_id", col("doc_id") + lit(maxLake + 1)))
    val (nReplay, tReplay) = sec {
      graft.streaming.StreamNearDup.batch(union, "text", "doc_id",
        minEstJaccard = 0.35).count()
    }
    println(f"SEEDGATE replay_pass=$tReplay%.1f s  pairs=$nReplay (includes lake-internal)")
    spark.stop()
  }
}
