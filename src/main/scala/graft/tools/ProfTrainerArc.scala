package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The PACKAGED trainer arc measured from INSIDE the arc itself
  * (round 19): `StreamShardLayout.ingestTrainerArc` driven by a
  * MemoryStream — one streaming query landing each micro-batch's
  * layout increment + token stream, polling the sequence lake every
  * `pollEvery` batches, and (the round-19 addition) running BOTH
  * reader-isolated compactions in-arc every `compactEvery` polls.
  *
  * The round-18 listing-curve A/B measured the walls by driving the
  * components directly (ProfTrainerLoop); this probe closes the gap
  * the verdict called out — the production entry point itself, with
  * its own maintenance, must reproduce the flat poll wall. Per-batch
  * wall clocks are printed as the batch stream advances: batches that
  * carry a poll (and those that also carry a compaction) stand out,
  * and the claim under test is that NEITHER creeps with batch count
  * when compactEvery > 0.
  *
  * Usage: runMain graft.tools.ProfTrainerArc
  *   [dir] [batches] [pollEvery] [shardWeight] [seqLen] [compactEvery]
  */
object ProfTrainerArc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val pollEvery = args.lift(2).map(_.toInt).getOrElse(6)
    val shardWeight = args.lift(3).map(_.toLong).getOrElse(500000L)
    val seqLen = args.lift(4).map(_.toLong).getOrElse(2048L)
    val compactEvery = args.lift(5).map(_.toInt).getOrElse(0)
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
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = graft.Tables.load(spark, dir, "documents")
    val docs = base.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long")
        .as("n_tokens")).persist()
    val toks = base.select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("p0", "token")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        abs(xxhash64(col("token"))).cast("string").as("token"))
    val nDocs = docs.count()
    println(s"TRAINERARC rows=$nDocs batches=$nBatches " +
      s"pollEvery=$pollEvery shardWeight=$shardWeight seqLen=$seqLen " +
      s"compactEvery=$compactEvery")
    val root = java.nio.file.Files
      .createTempDirectory("graft_arcprobe").toString
    val lake = java.nio.file.Files
      .createTempDirectory("graft_arcprobe_lake").toString
    graft.streaming.StreamShardLayout.initLayout(spark, root)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Long]
    val stream = mem.toDF().toDF("doc_id").join(docs, Seq("doc_id"))
    def tokenize(b: org.apache.spark.sql.DataFrame) =
      b.select(col("doc_id")).join(toks, Seq("doc_id"))
    val q = graft.streaming.StreamShardLayout.ingestTrainerArc(
      stream, root, lake,
      java.nio.file.Files.createTempDirectory("graft_arcprobe_cp")
        .toString,
      "doc_id", "n_tokens", shardWeight, tokenize, seqLen,
      pollEvery = pollEvery, compactEvery = compactEvery)
    // the batch id streams: doc_id % nBatches, one slice per batch —
    // the ids collect is one long per doc (the harness, not a data
    // collect)
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    try {
      (0 until nBatches).foreach { b =>
        val slice = ids.filter(i =>
          java.lang.Long.remainderUnsigned(i, nBatches) == b).toSeq
        val t0 = System.nanoTime()
        mem.addData(slice: _*)
        q.processAllAvailable()
        val tB = (System.nanoTime() - t0) / 1e9
        val polled = (b + 1) % pollEvery == 0
        val compacted = compactEvery > 0 &&
          (b + 1) % (pollEvery.toLong * compactEvery) == 0
        println(f"TRAINERARC batch=$b%2d wall=$tB%6.2fs " +
          f"poll=$polled compact=$compacted")
      }
    } finally q.stop()
    // the packaged loop's lake equals the direct pack of every closed
    // shard — content sanity after all the in-arc maintenance
    val n = graft.streaming.SequenceLake.readSequenceLake(spark, lake)
      .agg(count(lit(1)), sum(col("n_ids"))).collect().head
    println(s"TRAINERARC lake seqs=${n.getLong(0)} ids=${n.getLong(1)}")
    spark.stop()
  }
}
