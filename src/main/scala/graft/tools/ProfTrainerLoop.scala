package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The STEADY-STATE TRAINER LOOP measured end to end on the loop
  * itself (round 17): N micro-batches land layout increments AND
  * their token streams (`appendIncrement` + `appendTokens` — the
  * ingestWithTokens pair, driven directly so each phase times
  * separately), and every `pollEvery` batches a trainer POLL runs the
  * full consumption arc from the WATERMARK —
  *
  *   readShardManifest (which shards are complete)
  *   → packLandedShards(fromShard = watermark)   [O(new) both sides]
  *   → packSequences → writeSequences            [the landed artifact]
  *   → readSequences                             [attested read-back]
  *
  * The claim under test: the POLL wall stays FLAT as the layout grows
  * (it depends on the newly closed shards only), while the landing
  * cost per batch stays flat too. Token ids are xxhash64 of the
  * whitespace tokens — the id assignment is not under test, the IO
  * and plan shapes are.
  *
  * Usage: runMain graft.tools.ProfTrainerLoop [dir] [batches] [pollEvery] [shardWeight] [seqLen]
  */
object ProfTrainerLoop {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val pollEvery = args.lift(2).map(_.toInt).getOrElse(6)
    val shardWeight = args.lift(3).map(_.toLong).getOrElse(500000L)
    val seqLen = args.lift(4).map(_.toLong).getOrElse(2048L)
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
    val base = graft.Tables.load(spark, dir, "documents")
    val docs = base.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long")
        .as("n_tokens"))
    val toks = base.select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("p0", "token")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        abs(xxhash64(col("token"))).cast("string").as("token"))
    println(s"TRAINERLOOP rows=${docs.count()} batches=$nBatches " +
      s"pollEvery=$pollEvery shardWeight=$shardWeight seqLen=$seqLen")
    val root = java.nio.file.Files
      .createTempDirectory("graft_trainerloop").toString
    val seqRoot = java.nio.file.Files
      .createTempDirectory("graft_trainerloop_seq").toString
    graft.streaming.StreamShardLayout.initLayout(spark, root)
    var watermark = 0L
    var poll = 0
    (0 until nBatches).foreach { b =>
      val part = docs.where(pmod(col("doc_id"), lit(nBatches)) === b)
      val t0 = System.nanoTime()
      val assigned = graft.streaming.StreamShardLayout.appendIncrement(
        part, root, "doc_id", "n_tokens", shardWeight, b.toLong)
      val tAssign = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.streaming.StreamShardLayout.appendTokens(
        toks.join(part.select("doc_id"), Seq("doc_id"), "left_semi"),
        assigned, root, b.toLong)
      val tTok = (System.nanoTime() - t1) / 1e9
      graft.operators.Lineage.free(assigned)
      graft.operators.Dedup.releaseIntermediates()
      println(f"TRAINERLOOP batch=$b%2d layout=$tAssign%5.2fs " +
        f"tokens=$tTok%5.2fs")
      if ((b + 1) % pollEvery == 0) {
        poll += 1
        val tP = System.nanoTime()
        val man = graft.streaming.StreamShardLayout
          .readShardManifest(spark, root, "n_tokens")
        val openNow = man.agg(max(col("shard").cast("long")))
          .collect().head.getLong(0)
        val tMan = (System.nanoTime() - tP) / 1e9
        if (openNow > watermark) {
          val t2 = System.nanoTime()
          val packed = graft.streaming.StreamShardLayout
            .packLandedShards(spark, root, seqLen,
              fromShard = watermark)
          graft.operators.Sampling.writeSequences(
            graft.operators.Sampling.packSequences(packed,
              groupCol = Some("shard")),
            s"$seqRoot/poll_$poll", groupCol = Some("shard"))
          val tPack = (System.nanoTime() - t2) / 1e9
          val t3 = System.nanoTime()
          val n = graft.operators.Sampling
            .readSequences(spark, s"$seqRoot/poll_$poll")
            .agg(count(lit(1)), sum(col("n_ids"))).collect().head
          val tRead = (System.nanoTime() - t3) / 1e9
          println(f"TRAINERLOOP poll=$poll manifest=$tMan%5.2fs " +
            f"pack_land=$tPack%5.2fs readback=$tRead%5.2fs " +
            f"shards=[$watermark,$openNow) seqs=${n.getLong(0)} " +
            f"ids=${n.getLong(1)}")
          watermark = openNow
          graft.operators.Dedup.releaseIntermediates()
        }
      }
    }
    spark.stop()
  }
}
