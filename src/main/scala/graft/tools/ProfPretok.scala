package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pre-tokenization fertility A/B at REALISTIC merge depth (round
  * 19): class-run vs GPT-2-style pretok segmentation, each learning
  * its own byte-fallback model with `bpeMergesBatched` (rounds x
  * batch merges — far past the 8-merge oracle harness), fertility
  * measured against the same denominator (whitespace words) on two
  * corpora:
  *
  *  - `raw`: the documents table as-is (synthetic prose, little
  *    punctuation — the modes should land close);
  *  - `punct`: the q242-style translate(text, 'eo', "'.") corruption
  *    (punctuation INSIDE words everywhere — the regime where the
  *    segmentation choice matters; class-run can merge ACROSS the
  *    letter/punct boundary, pretok cannot but reuses pieces).
  *
  * Prints one row per (corpus, mode): learn wall, initial piece
  * vocabulary size, merges learned, token total, fertility.
  *
  * NOTE the documents table's tiny synthetic vocabulary saturates
  * learning at ~90 merges (every distinct word memorized whole —
  * fertility 1.0 in BOTH modes; measured, see SCALE.md round 19), so
  * the informative run uses the ScaleGen `zipfdocs` table (50k
  * distinct Zipf-weighted words — regenerate /tmp/sfx1 first).
  *
  * Usage: runMain graft.tools.ProfPretok [dir] [rounds] [batch] [table]
  */
object ProfPretok {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(32)
    val batch = args.lift(2).map(_.toInt).getOrElse(32)
    val table = args.lift(3).getOrElse("documents")
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
    val base = graft.Tables.load(spark, dir, table)
    val corpora = Seq(
      "raw" -> base.select(col("doc_id"), col("text")),
      "punct" -> base.select(col("doc_id"),
        translate(col("text"), "eo", "'.").as("text")))
    println(s"PRETOK dir=$dir table=$table rounds=$rounds batch=$batch")
    corpora.foreach { case (cname, corpus) =>
      val c = corpus.persist()
      val denom = c.agg(sum(size(split(trim(lower(col("text"))),
        "\\s+"))).cast("long")).collect().head.getLong(0)
      Seq(false, true).foreach { pretok =>
        val mode = if (pretok) "pretok" else "classrun"
        val t0 = System.nanoTime()
        val m = graft.operators.Tokenizer.bpeMergesBatched(c, "text",
            rounds, batch, byteFallback = true, pretok = pretok)
          .orderBy("step").collect()
          .map(r => (r.getString(2), r.getString(3))).toSeq
        val tLearn = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val stats = graft.operators.Tokenizer.bpeTokenCounts(c,
            "text", "doc_id", m, byteFallback = true, pretok = pretok)
          .agg(sum(col("n_words")), sum(col("n_tokens")))
          .collect().head
        val tEnc = (System.nanoTime() - t1) / 1e9
        val fert = stats.getLong(1).toDouble / denom
        println(f"PRETOK corpus=$cname%-5s mode=$mode%-8s " +
          f"learn=$tLearn%7.1fs merges=${m.size}%5d " +
          f"encode=$tEnc%6.1fs pieces=${stats.getLong(0)} " +
          f"tokens=${stats.getLong(1)} ws_words=$denom " +
          f"fertility=$fert%.4f")
        graft.operators.Dedup.releaseIntermediates()
      }
      c.unpersist()
    }
    spark.stop()
  }
}
