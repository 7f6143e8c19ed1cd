package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: native TopKAgg vs the row_number-window idiom on the same
  * top-10-per-event-type task (sf dir from args or sf0.1). */
object TopKBenchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"), col("event_id")).cache()
    ev.count()
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min ${runs.min}%.3f s  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    time("window row_number") {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").asc)
      ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .write.mode("overwrite").format("noop").save()
    }
    time("native TopKAgg") {
      ev.groupBy("event_type")
        .agg(graft.functions.TopKAgg.topK(col("value"), col("event_id"),
          10).as("top"))
        .select(col("event_type"), explode(col("top")))
        .write.mode("overwrite").format("noop").save()
    }
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    println(ev.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10).queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("WindowGroupLimit") ||
        l.contains("Sort") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
