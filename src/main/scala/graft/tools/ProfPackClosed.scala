package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the INCREMENTAL trainer pack
  * (`StreamShardLayout.packClosedShards`): land N micro-batches of
  * the 100x corpus as a streamed layout, then measure —
  *
  *  1. the full closed-shard pack (what a trainer pays on first
  *     attach);
  *  2. one more batch landed, then the WATERMARKED pack (fromShard =
  *     the previous open shard) — the steady-state per-increment
  *     cost, expected O(newly closed shards) because the shard filter
  *     prunes `shard=N/` partitions at scan time.
  *
  * Usage: runMain graft.tools.ProfPackClosed [dir] [batches] [shardWeight] [seqLen]
  */
object ProfPackClosed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val shardWeight = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val seqLen = args.lift(3).map(_.toLong).getOrElse(2048L)
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
        col("token"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_packclosed_prof").toString
    graft.streaming.StreamShardLayout.initLayout(spark, root)
    def land(b: Long): Unit = {
      val part = docs.where(pmod(col("doc_id"), lit(nBatches + 1)) === b)
      val a = graft.streaming.StreamShardLayout.appendIncrement(
        part, root, "doc_id", "n_tokens", shardWeight, b)
      // the steady-state contract: the batch's token stream lands
      // beside its layout increment (shard-partitioned), so the pack
      // reads pruned partitions on BOTH sides
      val t0 = System.nanoTime()
      graft.streaming.StreamShardLayout.appendTokens(
        toks.join(part.select("doc_id"), Seq("doc_id"), "left_semi"),
        a, root, b)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PACKCLOSED land_tokens b=$b%2d wall=$s%6.2fs")
      graft.operators.Lineage.free(a)
      graft.operators.Dedup.releaseIntermediates()
    }
    (0 until nBatches).foreach(b => land(b.toLong))
    def pack(from: Long, label: String): Long = {
      val t0 = System.nanoTime()
      val r = graft.streaming.StreamShardLayout
        .packClosedShards(spark, root, toks, seqLen, fromShard = from)
        .groupBy("shard").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("shards"), sum(col("n")).as("tokens"))
        .collect().head
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PACKCLOSED $label%-16s wall=$s%6.2fs " +
        f"shards=${r.getLong(0)} tokens=${r.getLong(1)}")
      graft.operators.Dedup.releaseIntermediates()
      r.getLong(0)
    }
    def packLanded(from: Long, label: String): Long = {
      val t0 = System.nanoTime()
      val r = graft.streaming.StreamShardLayout
        .packLandedShards(spark, root, seqLen, fromShard = from)
        .groupBy("shard").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("shards"), sum(col("n")).as("tokens"))
        .collect().head
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PACKCLOSED $label%-16s wall=$s%6.2fs " +
        f"shards=${r.getLong(0)} tokens=${r.getLong(1)}")
      graft.operators.Dedup.releaseIntermediates()
      r.getLong(0)
    }
    val closed1 = pack(0L, "first_attach")
    packLanded(0L, "landed_full")
    // the trainer's steady state: one more increment, watermarked pack
    // — corpus-stream form (token side O(corpus)) vs landed form
    // (token side pruned to the newly closed shards)
    land(nBatches.toLong)
    pack(closed1, "incremental")
    packLanded(closed1, "landed_incr")
    pack(0L, "full_again")
    // the LAST MILE at scale: collapse the watermarked landed pack to
    // one row per sequence and LAND the per-shard sequences/ artifact
    // (ids here are the token strings' hash — the artifact shape and
    // IO cost are what's under measurement, not the id assignment),
    // then the digest-verified read-back a trainer pays per poll
    val seqDir = java.nio.file.Files
      .createTempDirectory("graft_seqart_prof").toString
    val t0 = System.nanoTime()
    val packed = graft.streaming.StreamShardLayout
      .packLandedShards(spark, root, seqLen, fromShard = closed1)
      .withColumn("token",
        abs(xxhash64(col("token"))).cast("string"))
    graft.operators.Sampling.writeSequences(
      graft.operators.Sampling.packSequences(packed,
        groupCol = Some("shard")),
      seqDir, groupCol = Some("shard"))
    val sWrite = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = graft.operators.Sampling.readSequences(spark, seqDir)
      .agg(count(lit(1)), sum(col("n_ids"))).collect().head
    val sRead = (System.nanoTime() - t1) / 1e9
    println(f"PACKCLOSED land_sequences wall=$sWrite%6.2fs " +
      f"readback=$sRead%6.2fs seqs=${n.getLong(0)} ids=${n.getLong(1)}")
    spark.stop()
  }
}
