package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Similarity}

/** Attribution probe for the q178 above-band drift (verdict r16 #3:
  * 2.1/1.9/2.3/2.3 → 3.6 s with no touching commit), plus the
  * co-drifting q152/q187 — the ProfQ192Q87 playbook: time each
  * composition's parts in ONE JVM so the swing is attributed to a
  * stage (or to none, i.e. machine context) with numbers.
  *
  * q178 = exact cosine all-pairs (the capped validation oracle) +
  * semDedup (codebook fit → cell assignment → keep-rule) + the
  * recall gate join; q152 = spanDuplication (5-gram df agg + span
  * coverage); q187 = exact prefix-join pairs vs StreamNearDup.batch
  * (LSH) + gate. */
object ProfQ178 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    docs.count(); emb.count() // warm scans
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        Dedup.releaseIntermediates()
        spark.catalog.clearCache()
        s
      }
      println(f"PROF $name%-24s min=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // ---- q178 parts
    time("q178_exact_pairs") {
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4)
    }
    time("q178_semdedup_op") {
      Similarity.semDedup(emb, "vec_id", "embedding",
        threshold = 0.4, nlist = 8, nassign = 3)
    }
    time("q178_full") {
      graft.SparkEntry.queries("q178_semdedup")(spark, sfDir)
    }
    // ---- q152 parts
    time("q152_full") {
      Curation.spanDuplication(docs, "text", "doc_id", n = 5,
        minDf = 2)
    }
    // ---- q187 parts
    time("q187_exact_side") {
      Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id",
        shingleLen = 3, minJaccard = 0.5, docFreqCap = 1000)
    }
    time("q187_lsh_side") {
      graft.streaming.StreamNearDup.batch(docs, "text", "doc_id",
        shingleLen = 3, bands = 8, rowsPerBand = 2,
        minEstJaccard = 0.35)
    }
    time("q187_full") {
      graft.SparkEntry.queries("q187_stream_neardup")(spark, sfDir)
    }
    spark.stop()
  }
}
