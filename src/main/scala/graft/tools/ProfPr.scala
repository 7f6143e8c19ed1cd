package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: PageRank lineage-cut cadence (materialize every round vs every
  * K rounds) — result is bit-identical by construction (integer BSP);
  * this measures the wall-time trade. */
object ProfPr extends App {
  val spark = SparkSession.builder().master("local[32]")
    .withExtensions(new graft.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val li = graft.Tables.load(spark,
    args.headOption.getOrElse("/root/testdata/sf0.1"), "lineitem")
  val edges = li.select((col("l_suppkey") * 2).as("src"),
    (col("l_partkey") * 2 + 1).as("dst"))
  for (ce <- Seq(1, 2, 1, 2, 4, 4)) {
    val t0 = System.nanoTime()
    val out = graft.operators.Graph.pageRankMass(edges, "src", "dst",
      iters = 10, cutEvery = ce)
    val chk = out.agg(sum(col("m"))).collect()(0).getDouble(0)
    println(f"cutEvery=$ce: ${(System.nanoTime() - t0) / 1e9}%.2f s (mass sum $chk%.6f)")
    graft.operators.Graph.releaseIntermediates()
    spark.catalog.clearCache()
    System.gc()
  }
  spark.stop()
}
