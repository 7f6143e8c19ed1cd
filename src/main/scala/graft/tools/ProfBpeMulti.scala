package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multilingual BPE probe (round-16 directive #7): unicode-mode
  * learning on the ScaleGen `multidocs` corpus — the zipfdocs Zipf
  * shape with the vocabulary partitioned across Latin / Cyrillic /
  * CJK (1-2 code points per word) / digit scripts — recording the
  * learn wall and the FERTILITY PER SCRIPT under the learned list
  * (the oracle-gated sibling is q237's per-lang fertility on the
  * uniCorpus fixture; this is the 50k-word measured twin).
  *
  * Usage: runMain graft.tools.ProfBpeMulti [dir]
  * (generate first: runMain graft.tools.ScaleGen /root/testdata/sf0.1
  *  /tmp/sfx1 10 multidocs)
  */
object ProfBpeMulti {
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
    val docs = spark.read.parquet(s"$dir/multidocs.parquet")
    val nDocs = docs.count()
    val words = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
    val scriptOf = when(col("w").rlike("^[a-z]+$"), "latin")
      .when(col("w").rlike("^[\\u0400-\\u04FF]+$"), "cyrillic")
      .when(col("w").rlike("^[0-9]+$"), "digit")
      .otherwise("cjk")
    val inventory = words.groupBy(scriptOf.as("script"))
      .agg(countDistinct(col("w")).as("distinct_words"),
        count(lit(1)).as("word_occurrences"),
        avg(length(col("w"))).as("avg_chars"))
      .orderBy("script").collect()
    println(s"PROF multidocs docs=$nDocs")
    inventory.foreach(r => println(
      f"PROF inventory ${r.getString(0)}%-9s distinct=${r.getLong(1)}%6d occ=${r.getLong(2)}%8d avg_chars=${r.getDouble(3)}%.2f"))

    def learn(rounds: Int, batch: Int): Seq[(String, String)] = {
      val t0 = System.nanoTime()
      val m = graft.operators.Tokenizer.bpeMergesBatched(docs, "text",
          rounds = rounds, batch = batch, unicode = true)
        .orderBy("step").collect()
        .map(r => (r.getString(2), r.getString(3))).toSeq
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF learn rounds=$rounds%3d batch=$batch merges=${m.size}%5d wall=${s}%7.1fs  (${s / rounds}%5.2fs/round)")
      graft.operators.Dedup.releaseIntermediates()
      m
    }
    val m1 = learn(16, 64)
    val m2 = learn(48, 64)
    // fertility per script under each learned list: every word
    // encodes through the native expression (one scan; the word IS a
    // one-word document), grouped by its script class
    def fertility(m: Seq[(String, String)], label: String): Unit = {
      val shim = org.apache.spark.sql.graftshim.ColumnShim
      val t0 = System.nanoTime()
      val rows = words
        .select(scriptOf.as("script"),
          shim.column(graft.functions.BpeTokenCount(
            shim.expression(col("w")), m, unicode = true))
            .as("n_tokens"))
        .groupBy("script")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_tokens")).as("n_tokens"))
        .orderBy("script").collect()
      val s = (System.nanoTime() - t0) / 1e9
      rows.foreach { r =>
        val f = r.getLong(2).toDouble / r.getLong(1)
        println(f"PROF fertility $label%-6s ${r.getString(0)}%-9s words=${r.getLong(1)}%8d tokens=${r.getLong(2)}%9d t/w=$f%.3f")
      }
      println(f"PROF fertility $label%-6s encode_wall=${s}%.2fs merges=${m.size}")
    }
    fertility(m1, "early")
    fertility(m2, "deep")
    spark.stop()
  }
}
