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
  * Usage: runMain graft.tools.ProfTrainerLoop [dir] [batches] [pollEvery] [shardWeight] [seqLen] [compactLayout]
  *
  * Passing `compactLayout` as arg 6 runs `compactLayoutIsolated`
  * after every poll — the remedy for the layout-side listing curve
  * (without it, packLandedShards unions one scan root per landed
  * batch and the poll wall creeps with batch count; the A/B is the
  * round-18 SCALE.md measurement).
  */
object ProfTrainerLoop {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val pollEvery = args.lift(2).map(_.toInt).getOrElse(6)
    val shardWeight = args.lift(3).map(_.toLong).getOrElse(500000L)
    val seqLen = args.lift(4).map(_.toLong).getOrElse(2048L)
    val compactLayout = args.lift(5).contains("compactLayout")
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
        man.agg(max(col("shard").cast("long"))).collect()
        val tMan = (System.nanoTime() - tP) / 1e9
        // the PRODUCTION poll (round 18): pollLandedShards derives
        // its watermark from the sequence lake itself (committed
        // shard= names) — the probe carries no in-memory cursor, so
        // this measures exactly what a cold-restarting trainer pays
        val t2 = System.nanoTime()
        val res = graft.streaming.SequenceLake.pollLandedShards(
          spark, root, seqRoot, seqLen)
        val tPack = (System.nanoTime() - t2) / 1e9
        res.foreach { case (from, open) =>
          val t3 = System.nanoTime()
          val n = graft.operators.Sampling
            .readSequences(spark, s"$seqRoot/inc_b$from")
            .agg(count(lit(1)), sum(col("n_ids"))).collect().head
          val tRead = (System.nanoTime() - t3) / 1e9
          val t4 = System.nanoTime()
          if (poll % 2 == 0)
            graft.streaming.SequenceLake.compactSequenceLake(spark,
              seqRoot, groupCol = Some("shard"))
          if (compactLayout)
            graft.streaming.StreamShardLayout
              .compactLayoutIsolated(spark, root)
          val tComp = (System.nanoTime() - t4) / 1e9
          println(f"TRAINERLOOP poll=$poll manifest=$tMan%5.2fs " +
            f"pack_land=$tPack%5.2fs readback=$tRead%5.2fs " +
            f"compact=$tComp%5.2fs " +
            f"shards=[$from,$open) seqs=${n.getLong(0)} " +
            f"ids=${n.getLong(1)}")
          graft.operators.Dedup.releaseIntermediates()
        }
      }
    }
    // ---- CONSUMPTION SIDE (round 18): the deterministic epoch
    // schedule over the landed lake — two epochs, each one narrow
    // distinct + join over the sequence rows (never the ids), plus
    // an independent driver-side md5 replay of the intra-shard order
    // for two shards (the q266 purity contract verified on the probe
    // table, not just the sf0.01 oracle).
    val lake = graft.streaming.SequenceLake
      .readSequenceLake(spark, seqRoot)
      .select(col("shard").cast("long").as("shard"), col("seq"),
        col("n_ids"))
    val nSeqs = lake.count()
    (1L to 2L).foreach { e =>
      val tE = System.nanoTime()
      val sched = graft.operators.Sampling.consumeEpoch(lake, e)
      val agg = sched.agg(count(lit(1)),
        countDistinct(col("shard")), max(col("shard_rank")),
        max(col("seq_rank"))).collect().head
      val tEpoch = (System.nanoTime() - tE) / 1e9
      println(f"TRAINERLOOP epoch=$e schedule=$tEpoch%5.2fs " +
        f"seqs=${agg.getLong(0)} shards=${agg.getLong(1)} " +
        f"maxShardRank=${agg.getLong(2)} maxSeqRank=${agg.getLong(3)}")
      require(agg.getLong(0) == nSeqs && agg.getLong(1) ==
        agg.getLong(2), "schedule must cover every sequence once")
      graft.operators.Dedup.releaseIntermediates()
    }
    // order verification: the first two shards by shard_rank, their
    // (seq, seq_rank) collected and replayed with driver-side md5 —
    // the schedule is a pure function of (shard, seq, epoch, salt)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sched1 = graft.operators.Sampling.consumeEpoch(lake, 1L)
    val firstShards = sched1.select(col("shard"), col("shard_rank"))
      .distinct().orderBy(col("shard_rank")).limit(2)
      .collect().map(_.getLong(0))
    firstShards.foreach { sh =>
      val got = sched1.where(col("shard") === sh)
        .select(col("seq"), col("seq_rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).map(_._1)
      val expect = got.sorted.map(q =>
          (md5hex(s"$sh|$q|1|graft"), q)).sortBy(identity).map(_._2)
      require(got.toSeq == expect.toSeq,
        s"shard $sh intra-shard order diverges from the md5 replay")
    }
    println("TRAINERLOOP epoch order verified against driver-side " +
      s"md5 replay on shards ${firstShards.mkString(",")}")
    // ---- FULL-EPOCH PAYLOAD READ (round 19): the number a trainer
    // actually budgets — one whole epoch's consume INCLUDING the id
    // payload, read in (shard_rank, seq_rank) order through the
    // distributed-loader shape (repartition by shard + in-partition
    // sort — whole shards sequentially, never a global sort). The
    // .rdd boundary keeps the optimizer from collapsing the ordered
    // read into a sort-free aggregate, so the wall is the honest
    // IO + decode + in-order walk. Pinned via the round-19 epoch
    // manifest (the growth-safe production path). Measured BEFORE and
    // AFTER a lake compaction: the wall must be flat across
    // generations (same rows through either pointer generation).
    val mfPath = java.nio.file.Files
      .createTempDirectory("graft_trainerloop_mf").toString + "/mf"
    def epochPayload(tag: String): (Long, Long) = {
      val t0 = System.nanoTime()
      val mf = graft.operators.Sampling.readEpochManifest(spark, mfPath)
      val full = graft.streaming.SequenceLake.consume(spark, seqRoot,
        3L, pinned = Some(mf))
      val rdd = full.repartition(col("shard"))
        .sortWithinPartitions(col("shard_rank"), col("seq_rank"))
        .select(col("ids")).rdd
      val (n, s) = rdd.mapPartitions { it =>
        var n = 0L; var s = 0L
        it.foreach { r =>
          val a = r.getSeq[Long](0); n += a.length; s += a.sum }
        Iterator((n, s))
      }.collect().foldLeft((0L, 0L)) { case ((an, as), (bn, bs)) =>
        (an + bn, as + bs) }
      val tRead = (System.nanoTime() - t0) / 1e9
      println(f"TRAINERLOOP epoch_payload[$tag] read=$tRead%6.2fs " +
        f"ids=$n (${n / 1e6 / tRead}%5.1f M ids/s)")
      graft.operators.Dedup.releaseIntermediates()
      (n, s)
    }
    graft.streaming.SequenceLake.pinEpoch(spark, seqRoot, mfPath, 3L)
    val pre = epochPayload("pre-compaction")
    graft.streaming.SequenceLake.compactSequenceLake(spark, seqRoot,
      groupCol = Some("shard"))
    val post = epochPayload("post-compaction")
    require(pre == post,
      s"epoch payload must be identical across the fold: $pre vs $post")
    spark.stop()
  }
}
