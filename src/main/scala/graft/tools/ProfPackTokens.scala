package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for SEQUENCE PACKING (`Sampling.packTokens`): the
  * per-token stream is the largest frame this engine ever keys a
  * shuffle on (every other operator works per document), so the probe
  * measures exactly where that cost lands at 10x/100x —
  *
  *  1. GLOBAL pack: wall + shuffle bytes (doc-keyed count aggregate +
  *     doc-keyed join; the doc-summary running sum is the two-pass
  *     scan — its shuffle is doc-summary-sized, not token-sized);
  *  2. GROUPED pack over a shardAssign layout: wall + shuffle bytes
  *     (the doc-summary cumsum becomes a shard-bounded window; the
  *     token stream additionally carries the shard column through
  *     the join);
  *  3. fullness audit: every sequence but the stream's last must hold
  *     exactly seqLen tokens — the packer's defining invariant,
  *     asserted at scale, not just in the unit spec.
  *
  * Usage: runMain graft.tools.ProfPackTokens <dir> [seqLen] [shardWeight]
  */
object ProfPackTokens {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx1")
    val seqLen = args.lift(1).map(_.toLong).getOrElse(2048L)
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
    val toks = docs.select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("p0", "token")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("token"))
    val nToks = toks.count() // warm scan
    println(s"PACK dir=$dir tokens=$nToks seqLen=$seqLen")

    // 1. global pack: wall + shuffle; fullness audit in the same pass
    val s0 = drain(); val t0 = System.nanoTime()
    val sizes = graft.operators.Sampling.packTokens(toks, seqLen)
      .groupBy("seq").count()
    val agg = sizes.agg(count(lit(1)).as("n_seq"),
      sum(when(col("count") === seqLen, 0).otherwise(1)).as("n_partial"))
      .collect().head
    val tGlobal = (System.nanoTime() - t0) / 1e9
    val sGlobal = (drain() - s0) / 1e6
    println(f"PACK global wall=$tGlobal%.2f shuffle_mb=$sGlobal%.1f " +
      f"sequences=${agg.getLong(0)} partial=${agg.getLong(1)} " +
      "(expect exactly 1 partial: the stream's last)")
    graft.operators.Dedup.releaseIntermediates()

    // 2. grouped pack over a shard layout
    val counts = docs.select(col("doc_id"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long")
        .as("n_tokens"))
    val asg = graft.operators.Sampling.shardAssign(counts, "doc_id",
      "n_tokens", shardWeight)
    val nShards = asg.select(max(col("shard"))).collect()
      .head.getLong(0) + 1
    val s1 = drain(); val t1 = System.nanoTime()
    val toksSh = toks.join(
      asg.select(col("doc_id"), col("shard"), col("offset")),
      Seq("doc_id"))
    val sizesG = graft.operators.Sampling.packTokens(toksSh, seqLen,
        groupCol = Some("shard"), orderCol = Some("offset"))
      .groupBy("shard", "seq").count()
    val aggG = sizesG.agg(count(lit(1)).as("n_seq"),
      sum(when(col("count") === seqLen, 0).otherwise(1)).as("n_partial"))
      .collect().head
    val tGrouped = (System.nanoTime() - t1) / 1e9
    val sGrouped = (drain() - s1) / 1e6
    println(f"PACK grouped shards=$nShards wall=$tGrouped%.2f " +
      f"shuffle_mb=$sGrouped%.1f sequences=${aggG.getLong(0)} " +
      f"partial=${aggG.getLong(1)} (expect <= 1 per shard)")
    graft.operators.Dedup.releaseIntermediates()

    // 3. the PRODUCTION composition: pack over a LANDED layout. The
    // docs land once as shard=N/ dirs (outside the timing — that cost
    // is the layout's, measured in ProfShardWrite); the pack then
    // reads the partitioned layout where `shard` is a partition
    // column — no token-stream join attaches it, and the only
    // token-sized exchange left is the doc-keyed offsets join.
    val root = java.nio.file.Files
      .createTempDirectory("graft_pack_prof").toString
    graft.operators.Sampling.writeShards(
      docs.join(asg, Seq("doc_id")), root)
    val s2 = drain(); val t2 = System.nanoTime()
    val landed = spark.read.parquet(root)
    val toksL = landed.select(col("doc_id"), col("shard"),
        col("offset"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("p0", "token")))
      .select(col("doc_id"), col("shard"), col("offset"),
        (col("p0") + 1).cast("long").as("pos"), col("token"))
    val sizesL = graft.operators.Sampling.packTokens(toksL, seqLen,
        groupCol = Some("shard"), orderCol = Some("offset"))
      .groupBy("shard", "seq").count()
    val aggL = sizesL.agg(count(lit(1)).as("n_seq"),
      sum(when(col("count") === seqLen, 0).otherwise(1)).as("n_partial"))
      .collect().head
    val tLanded = (System.nanoTime() - t2) / 1e9
    val sLanded = (drain() - s2) / 1e6
    println(f"PACK landed  shards=$nShards wall=$tLanded%.2f " +
      f"shuffle_mb=$sLanded%.1f sequences=${aggL.getLong(0)} " +
      f"partial=${aggL.getLong(1)} (expect <= 1 per shard)")
    graft.operators.Dedup.releaseIntermediates()
    spark.stop()
  }
}
