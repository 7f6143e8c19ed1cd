package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the STREAMED shard layout (round-16 directive #4):
  * drive >=20 micro-batches through the append loop on the 100x
  * corpus and measure the four costs the round-15 verdict said were
  * argued but not recorded —
  *
  *  1. per-batch wall (the increment's metadata-only sort +
  *     task-local landing + manifest + cursor);
  *  2. shuffle bytes per batch, with ONE batch decomposed into
  *     assignment vs landing so the landing job's expected ZERO is a
  *     measurement, not an inference from ProfShardWrite's batch twin;
  *  3. readLayout wall as the increment count grows (the
  *     one-scan-per-increment listing curve);
  *  4. the compactLayoutIsolated fold wall + the post-compaction
  *     readLayout cost (the curve's remedy), plus readShardManifest
  *     (the trainer's metadata-only view).
  *
  * Usage: runMain graft.tools.ProfShardStream <dir> [batches] [shardWeight]
  */
object ProfShardStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val shardWeight = args.lift(2).map(_.toLong).getOrElse(100000L)
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
    val rows = docs.count() // warm scan
    println(s"SHARDSTREAM rows=$rows batches=$nBatches " +
      s"shardWeight=$shardWeight dir=$dir")
    val root = java.nio.file.Files
      .createTempDirectory("graft_shardstream_prof").toString
    graft.streaming.StreamShardLayout.initLayout(spark, root)
    val readAt = Set(1, 2, 4, 8, 12, 16, 20, nBatches)
    (0 until nBatches).foreach { b =>
      val batch = docs.where(pmod(col("doc_id"), lit(nBatches)) === b)
      val s0 = drain()
      val t0 = System.nanoTime()
      val assigned = graft.streaming.StreamShardLayout.appendIncrement(
        batch, root, "doc_id", "n_tokens", shardWeight, b.toLong)
      val wall = (System.nanoTime() - t0) / 1e9
      val sMb = (drain() - s0) / 1e6
      graft.operators.Lineage.free(assigned)
      graft.operators.Dedup.releaseIntermediates()
      println(f"SHARDSTREAM batch=$b wall=$wall%.2f shuffle_mb=$sMb%.1f")
      if (readAt.contains(b + 1)) {
        val t1 = System.nanoTime()
        val n = graft.streaming.StreamShardLayout.readLayout(spark, root)
          .count()
        val tRead = (System.nanoTime() - t1) / 1e9
        println(f"SHARDSTREAM read_after=${b + 1} rows=$n " +
          f"read_sec=$tRead%.2f")
      }
    }
    // one batch DECOMPOSED: assignment (metadata-only sort — the only
    // shuffle) vs landing (partitionBy write — expect zero shuffle),
    // replaying appendIncrement's two phases on batch 0's rows
    val batch0 = docs.where(pmod(col("doc_id"), lit(nBatches)) === 0)
    val sA0 = drain()
    val tA0 = System.nanoTime()
    val assigned0 = graft.operators.Sampling.shardAssign(batch0,
      "doc_id", "n_tokens", shardWeight, "graft", startWeight = 0L)
    val n0 = assigned0.count()
    val tAssign = (System.nanoTime() - tA0) / 1e9
    val sAssign = drain() - sA0
    val tW0 = System.nanoTime()
    assigned0.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$root/decomposed_land")
    val tLand = (System.nanoTime() - tW0) / 1e9
    val sLand = drain() - sA0 - sAssign
    println(f"SHARDSTREAM decomposed rows=$n0 " +
      f"assign_sec=$tAssign%.2f assign_shuffle_mb=${sAssign / 1e6}%.1f " +
      f"land_sec=$tLand%.2f land_shuffle_mb=${sLand / 1e6}%.1f")
    graft.operators.Dedup.releaseIntermediates()
    // the remedy: isolated compaction fold wall + post-compaction read
    val tC0 = System.nanoTime()
    graft.streaming.StreamShardLayout.compactLayoutIsolated(spark, root)
    val tCompact = (System.nanoTime() - tC0) / 1e9
    val tR0 = System.nanoTime()
    val nAfter = graft.streaming.StreamShardLayout.readLayout(spark, root)
      .count()
    val tReadAfter = (System.nanoTime() - tR0) / 1e9
    val tM0 = System.nanoTime()
    val nShards = graft.streaming.StreamShardLayout
      .readShardManifest(spark, root, "n_tokens").count()
    val tManifest = (System.nanoTime() - tM0) / 1e9
    println(f"SHARDSTREAM compact_sec=$tCompact%.2f " +
      f"read_after_compact_sec=$tReadAfter%.2f rows=$nAfter " +
      f"manifest_shards=$nShards manifest_sec=$tManifest%.2f")
    spark.stop()
  }
}
