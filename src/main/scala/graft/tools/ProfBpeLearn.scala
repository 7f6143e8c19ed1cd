package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE learning-wall probe (verdict r14 #2): drive `bpeMergesBatched`
  * to >= 1k REAL merges on the ScaleGen Zipf-vocabulary corpus
  * (zipfdocs: ~50k distinct syllable words, log-uniform ranks) and
  * record the learn wall at several merge counts plus the native
  * encode's flatness in merge-list length — replacing the previous
  * extrapolation from a 31-word corpus that saturated at ~90 merges.
  *
  * Usage: runMain graft.tools.ProfBpeLearn [zipfDir]
  * (generate first: runMain graft.tools.ScaleGen /root/testdata/sf0.1
  *  /tmp/sfx1 10 zipfdocs)
  */
object ProfBpeLearn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/zipfdocs.parquet")
    val nDocs = docs.count()
    val nWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct(col("w"))).collect().head.getLong(0)
    println(s"PROF corpus docs=$nDocs distinct_words=$nWords")

    def learn(rounds: Int, batch: Int): Seq[(String, String)] = {
      val fb0 = graft.operators.Tokenizer.exhaustFallbacks.get()
      val t0 = System.nanoTime()
      val m = graft.operators.Tokenizer.bpeMergesBatched(docs, "text",
          rounds = rounds, batch = batch).orderBy("step").collect()
        .map(r => (r.getString(2), r.getString(3))).toSeq
      val s = (System.nanoTime() - t0) / 1e9
      val fb = graft.operators.Tokenizer.exhaustFallbacks.get() - fb0
      println(f"PROF learn rounds=$rounds%3d batch=$batch merges=${m.size}%5d wall=${s}%7.1fs  (${s / rounds}%5.2fs/round) exhaust_fallback_rounds=$fb")
      graft.operators.Dedup.releaseIntermediates()
      m
    }
    def encode(m: Seq[(String, String)], label: String): Unit = {
      val t0 = System.nanoTime()
      val total = graft.operators.Tokenizer
        .bpeTokenCounts(docs, "text", "doc_id", m)
        .agg(sum(col("n_tokens"))).collect().head.getLong(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF encode $label%-12s merges=${m.size}%5d wall=${s}%6.2fs tokens=$total")
    }
    args.lift(1) match {
      // one deep point alone: ProfBpeLearn <dir> rounds=<N> — the
      // >=8k octave without re-running the shallow ladder
      case Some(a) if a.startsWith("rounds=") =>
        val m = learn(a.stripPrefix("rounds=").toInt, 128)
        encode(m, s"m${m.size}")
      case mode =>
        // the learn wall at 3+ points >= 256 merges. batch=64 is the
        // REQUESTED per-round pick count; early rounds learn fewer
        // (the within-round symbol-disjointness constraint caps picks
        // at half the live symbol inventory, which starts at this
        // corpus's 15 letters and grows with every merge) — so the
        // merge count is measured, not assumed.
        learn(16, 64)
        learn(32, 64)
        val m1024 = learn(48, 64)
        // encode flatness: the native expression's wall must be
        // ~constant in merge-list length (rank-priority fast path)
        encode(m1024.take(64), "cap64")
        encode(m1024.take(256), "m256")
        encode(m1024, "m1024")
        // the >=8k octave (round-16 directive #6): batch=128, enough
        // rounds that the DISJOINTNESS-capped early rounds still
        // leave thousands of real merges; per-round wall is the trend
        // under test now that merge application is ONE BpeSeqApply
        // projection per round (plan depth per round is constant, so
        // driver re-analysis cost no longer grows with the
        // batch-size x round-count product)
        if (mode.contains("deep")) {
          learn(16, 128)
          learn(48, 128)
          val m8k = learn(96, 128)
          encode(m8k, s"m${m8k.size}")
        }
    }
    spark.stop()
  }
}
