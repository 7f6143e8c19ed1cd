package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Diagnostic: where does ngramJaccardPairs' wall time go at sf0.1. */
object ProfileNgram {
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
    val docsT = Tables.load(spark, sfDir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
    }

    // warm up the scan
    docsT.count()

    def shinglesSlice(text: org.apache.spark.sql.Column, n: Int) = {
      val words = split(text, " ")
      filter(
        transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => when(i + n <= size(words),
            array_join(slice(words, i + 1, lit(n)), " "))),
        x => x.isNotNull)
    }

    for (round <- 1 to 3) {
      time(s"r$round full ngramJaccardPairs") {
        val n = Dedup.ngramJaccardPairs(docsT, "text", "doc_id", 3, 0.5, 1000).count()
        Dedup.releaseIntermediates(); spark.catalog.clearCache(); n
      }
      time(s"r$round shingles concat_ws") {
        docsT.select(array_distinct(Dedup.wordShingles(col("text"), 3)).as("sh"))
          .select(sum(size(col("sh")))).head().getLong(0)
      }
      time(s"r$round shingles slice+join") {
        docsT.select(array_distinct(shinglesSlice(col("text"), 3)).as("sh"))
          .select(sum(size(col("sh")))).head().getLong(0)
      }
    }
    spark.stop()
  }
}
