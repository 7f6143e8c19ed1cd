package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Proves the storage-layout claims in SCALE.md: bucketed tables join and
  * aggregate with no Exchange in the physical plan. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join and aggregate without a shuffle") {
    val a = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("va"))
    val b = spark.range(1000).select($"id".as("k"), ($"id" * 3).as("vb"))
    Layout.writeBucketed(a, "graft_bucket_a", "k", 4)
    Layout.writeBucketed(b, "graft_bucket_b", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(j.count() == 1000)
      // groupBy on the bucket key is also exchange-free
      val g = spark.table("graft_bucket_a").groupBy("k").agg(sum("va"))
      assert(!g.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("writeShards: lands the assignment shuffle-free (zero shuffle " +
      "bytes in the write job) and the layout round-trips exactly") {
    import java.util.concurrent.atomic.AtomicLong
    val docs = spark.range(0, 500).select($"id".as("doc_id"),
      (pmod($"id" * 37 + 11, lit(50)) + 1).as("w"))
    val assigned = graft.operators.Sampling.shardAssign(docs, "doc_id",
      "w", shardWeight = 600L)
    val expected = assigned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // shuffle-bytes listener over exactly the write's jobs: the
    // assignment's range sort already ran (shardAssign's construction
    // collects partition totals over the persisted sorted frame), so
    // the landing must move nothing through a shuffle
    val written = new AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    val path = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    spark.sparkContext.addSparkListener(l)
    try {
      graft.operators.Sampling.writeShards(assigned, path)
      // the listener bus drains asynchronously — wait for quiescence
      var last = -1L; var cur = written.get()
      while (cur != last) { Thread.sleep(100); last = cur; cur = written.get() }
      assert(written.get() == 0L,
        s"writeShards shuffled ${written.get()} bytes — the layout " +
          "write must stream task-locally")
    } finally spark.sparkContext.removeSparkListener(l)
    // hive-style shard=N directories, one per assigned shard
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val shards = expected.map(_._3)
    assert(dirs == shards.map(s => s"shard=$s"))
    // read-back equals the assignment exactly (sets AND offsets)
    val back = spark.read.parquet(path)
      .select($"doc_id", $"w", $"shard".cast("long"), $"offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(back == expected)
  }

  test("shardManifest: per-shard counts/sums and an order-sensitive " +
      "digest (md5 of ids in offset order)") {
    val docs = spark.range(0, 50).select($"id".as("doc_id"),
      (pmod($"id" * 13 + 5, lit(20)) + 1).as("w"))
    val assigned = graft.operators.Sampling.shardAssign(docs, "doc_id",
      "w", shardWeight = 100L)
    val rows = assigned.collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(0), r.getLong(1)))
    val man = graft.operators.Sampling.shardManifest(assigned, "doc_id", "w")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_._2)
      val expectDigest = java.security.MessageDigest.getInstance("MD5")
        .digest(inOrder.map(_._3).mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(man(shard) ==
        ((rs.size.toLong, rs.map(_._4).sum, expectDigest)))
    }
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val path = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact = spark.range(1000).select($"id",
      (col("id") % 10).cast("int").as("part_key"))
    Layout.writePartitioned(fact, path, "part_key")
    // the dim must be a file source with a surviving selective Filter,
    // otherwise the DPP rule sees no predicate to derive pruning from
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dim").toString
    spark.range(10).select($"id".cast("int").as("part_key"),
        when($"id" < 2, "keep").otherwise("drop").as("tag"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where($"tag" === "keep")
    val j = spark.read.parquet(path).join(dim, "part_key")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected dynamic partition pruning in:\n$plan")
    assert(j.count() == 200)
  }

  test("partitioned write prunes files under a partition predicate") {
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = spark.range(100).select($"id",
      (col("id") % 4).cast("int").as("bucket_day"))
    Layout.writePartitioned(df, path, "bucket_day")
    val pruned = spark.read.parquet(path).where($"bucket_day" === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 25)
    assert(scan.contains("PartitionFilters") &&
      (scan.contains("bucket_day#") || scan.contains("bucket_day =")))
  }
}
