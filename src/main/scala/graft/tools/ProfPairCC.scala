package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Diagnostic: decompose the q67/q87/q136/q137 floor exceedances —
  * capped-inverted-index vs PPJoin-prefix pair generation, then the
  * connected-components step over each pair stream, at sf0.1. */
object ProfPairCC {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
    }
    def cleanup(): Unit = {
      Dedup.releaseIntermediates(); spark.catalog.clearCache()
    }

    // bench protocol twin: two runs per query, intermediates released
    // only BETWEEN queries — the warm run-2 is the reported number
    def benchStyle(name: String)(body: => Long): Unit = {
      time(s"$name run1")(body)
      time(s"$name run2")(body)
      cleanup()
    }
    benchStyle("prefix pairs") {
      Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, 0.5, 1000)
        .count()
    }
    benchStyle("prefix + CC(hashmin)") {
      val p = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, 0.5,
        1000)
      Dedup.duplicateComponents(p, "a", "b").count()
    }
    benchStyle("prefix + CC(star)") {
      val p = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, 0.5,
        1000)
      Dedup.duplicateComponentsStar(p, "a", "b").count()
    }
    benchStyle("index + CC(hashmin)") {
      val p = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5, 1000)
      Dedup.duplicateComponents(p, "a", "b").count()
    }

    // per-step decomposition of hash-min over prefix pairs, warm run 2
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.storage.StorageLevel
    def steps(run: Int): Unit = {
      def st(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"  [$run] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$n)")
      }
      val pairs = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3,
        0.5, 1000)
      val p = pairs.select(col("a").as("src"), col("b").as("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      st("p.count")(p.count())
      val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      st("edges.count")(edges.count())
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      st("labels0 sum")(labels.agg(sum(col("component"))).head().getLong(0))
      var i = 0
      while (i < 4) {
        val prop = edges.join(labels, edges("dst") === labels("id"))
          .select(edges("src").as("id"), col("component"))
        val next = labels.union(prop).groupBy("id")
          .agg(min(col("component")).as("component"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        st(s"round $i sum")(next.agg(sum(col("component"))).head().getLong(0))
        labels = next
        i += 1
      }
    }
    steps(1); steps(2)
    cleanup()
  }
}
