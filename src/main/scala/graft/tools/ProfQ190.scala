package graft.operators
// lives under tools/ but in the operators package so it can probe the
// package-private pieces of the q190 composition (bandedSignatures,
// crossJoinTail) in isolation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the q190 bench drift (verdict r12 #2): time
  * the composition's pieces in one JVM — the PPJoin exact gate side,
  * the plain inverted-index alternative the 2.06 s floor was set with
  * (r9, before the round-10 switch to PPJoin), the minhash cross with
  * and without its single-use `tracked` persist, and the full gate —
  * so the 3.5 s total is explained by parts, not guessed at. */
object ProfQ190 {
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
    docs.count() // warm scan
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        Dedup.releaseIntermediates()
        spark.catalog.clearCache()
        s
      }
      println(f"PROF $name%-28s min=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val odds = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val evens = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    time("exact_ppjoin") {
      Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, 0.5, 1000)
    }
    time("exact_plain") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5, 1000)
    }
    time("cross_tracked") {
      Dedup.minhashLshCross(odds, evens, "text", "doc_id", 3, 8, 2, 0.35)
    }
    time("cross_nopersist") {
      Dedup.crossJoinTail(odds,
        Dedup.bandedSignatures(evens, "text", "doc_id", 3, 8, 2,
          Some(2000)), "text", "doc_id", 3, 8, 2, 0.35)
    }
    time("q190_full") {
      graft.SparkEntry.queries("q190_cross_dedup")(spark, sfDir)
    }
    spark.stop()
  }
}
