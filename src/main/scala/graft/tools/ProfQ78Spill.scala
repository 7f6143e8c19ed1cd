// lives in the operators package to reach the private[operators]
// windowHashes scan it decomposes; kept under tools/ with the other
// diagnostics
package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables


/** Diagnostic: which stage of sharedSubstringPairs spills at 100× —
  * the w-keyed SHUFFLE_HASH self-join, or the (a,b) count aggregate
  * (partial-side hash fallback)? Times join-only vs join+agg with the
  * spill listener, at the scaled corpus. */
object ProfQ78Spill {
  private class SpillListener extends SparkListener {
    val written = new AtomicLong(0)
    val spilled = new AtomicLong(0)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)
    val docs = Tables.load(spark, dir, "documents")
    docs.count()

    def probe(name: String, release: Boolean = true)(f: => Long): Unit = {
      val w0 = listener.written.get; val s0 = listener.spilled.get
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-22s ${sec}%7.2f s  n=$n%-12d " +
        f"shuffle=${(listener.written.get - w0) / 1e6}%9.1f MB  " +
        f"spill=${(listener.spilled.get - s0) / 1e6}%9.1f MB")
      if (release) { Dedup.releaseIntermediates(); spark.catalog.clearCache() }
    }

    def full(): Long =
      Dedup.sharedSubstringPairs(docs, "text", "doc_id", 50, 1, 1000).count()
    probe("full run1", release = false)(full())
    probe("full run2", release = false)(full())
    Dedup.releaseIntermediates(); spark.catalog.clearCache()
  }
}
