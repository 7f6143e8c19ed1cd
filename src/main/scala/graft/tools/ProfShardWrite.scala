package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the physical shard landing (round-14): assign the
  * 100× corpus to shards, then land it with
  * [[graft.operators.Sampling.writeShards]], timing the two phases
  * separately and counting shuffle bytes in each — the claim under
  * test is that the WRITE phase moves nothing through a shuffle (the
  * assignment's range order streams task-locally into the shard
  * directories), so the landing cost is pure sequential IO.
  *
  * Usage: runMain graft.tools.ProfShardWrite <dir> [shardWeight]
  */
object ProfShardWrite {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val shardWeight = args.lift(1).map(_.toLong).getOrElse(100000L)
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
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null)
            shuffled.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    def drain(): Long = {
      var last = -1L; var cur = shuffled.get()
      while (cur != last) { Thread.sleep(100); last = cur
        cur = shuffled.get() }
      cur
    }
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long")
          .as("n_tokens"))
    docs.count() // warm scan
    val t0 = System.nanoTime()
    val assigned = graft.operators.Sampling.shardAssign(docs, "doc_id",
      "n_tokens", shardWeight)
    val rows = assigned.count()
    val tAssign = (System.nanoTime() - t0) / 1e9
    val sAssign = drain()
    val out = java.nio.file.Files
      .createTempDirectory("graft_shardwrite_").toString
    val t1 = System.nanoTime()
    graft.operators.Sampling.writeShards(assigned, out)
    val tWrite = (System.nanoTime() - t1) / 1e9
    val sWrite = drain() - sAssign
    val shards = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("shard="))
    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
    println(f"""SHARDWRITE {"rows":$rows,"shards":$shards,""" +
      f""""assign_sec":$tAssign%.1f,"assign_shuffle_mb":${sAssign / 1e6}%.1f,""" +
      f""""write_sec":$tWrite%.1f,"write_shuffle_mb":${sWrite / 1e6}%.1f,""" +
      f""""out_mb":${du(new java.io.File(out)) / 1e6}%.1f}""")
    spark.stop()
  }
}
