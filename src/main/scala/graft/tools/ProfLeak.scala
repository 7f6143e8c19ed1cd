package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the round-12 `Lineage.free` fix (SCALE.md round
  * 12/13 note): run a 10-round PageRank, report the storage blocks the
  * iteration pinned (checkpointed round states + the cached edge
  * list), then release and report again. Before the fix,
  * `releaseIntermediates` was a plain `Dataset.unpersist`, which is a
  * NO-OP on lineage-cut frames (CacheManager never registered them) —
  * the "before release" numbers below are exactly what a session
  * leaked PER CALL, forever; "after release" must be 0/0. */
object ProfLeak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the q144 edge list: consecutive same-user events
    val ev = graft.Tables.load(spark, sfDir, "events")
    val edges = ev.select(col("user_id").as("src"),
      (col("user_id") + pmod(col("event_id"), lit(97))).as("dst"))
    def storage(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val bytes = infos.map(i => i.memSize + i.diskSize).sum
      println(f"LEAK $tag%-14s rdds=${infos.length}%3d bytes=${bytes / 1e6}%.1f MB")
    }
    storage("start")
    val pr = graft.operators.Graph.pageRankMass(edges, "src", "dst",
      iters = 10)
    println(s"LEAK pagerank rows=${pr.count()}")
    storage("after_run")
    graft.operators.Graph.releaseIntermediates()
    storage("after_release")
    spark.stop()
  }
}
