package graft.operators
// operators package for symmetry with ProfQ190 (no package-private
// access needed here, but the probe family lives together)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the q162/q94 bench drift (verdict r13 #3):
  * time each composition's pieces in one JVM — q162's blocked fuzzy
  * pair generation vs its star connected components vs the final
  * cluster join-back, and q94's keyed chunked z-score window vs its
  * output projection — so the round-over-round swing is explained by
  * parts (sum-of-parts + fixed overhead vs a regressing stage). */
object ProfQ162Q94 {
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
    val part = graft.Tables.load(spark, sfDir, "part")
    val events = graft.Tables.load(spark, sfDir, "events")
    part.count(); events.count() // warm scans
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
    time("q162_pairs") {
      Curation.fuzzyNamePairs(part, "p_name", maxDist = 3)
    }
    time("q162_pairs_cc") {
      val pairs = Curation.fuzzyNamePairs(part, "p_name", maxDist = 3)
      Dedup.duplicateComponentsStar(pairs, "name_a", "name_b")
    }
    time("q162_full") {
      val pairs = Curation.fuzzyNamePairs(part, "p_name", maxDist = 3)
      val comp = Dedup.duplicateComponentsStar(pairs, "name_a", "name_b")
      part.select(col("p_name").as("name")).distinct()
        .join(comp.withColumnRenamed("id", "name"), Seq("name"), "left")
        .select(col("name"),
          coalesce(col("component"), col("name")).as("cluster"))
    }
    time("q94_window") {
      WindowOps.anomalyZScore(events, "value", Seq("event_type"),
        Seq("ts", "event_id"), n = 48, minPeriods = 12, z = 3.0)
    }
    time("q94_full") {
      WindowOps.anomalyZScore(events, "value", Seq("event_type"),
          Seq("ts", "event_id"), n = 48, minPeriods = 12, z = 3.0)
        .select(col("event_id"), col("value"), col("zscore"),
          col("is_anomaly"))
    }
    spark.stop()
  }
}
