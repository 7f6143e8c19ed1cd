package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q19_groupby_agg", "q20_join_revenue", "q10_monthly", "q25_dedup_minhash",
      "q28_embed_neardup", "q29_sim_topk", "q38_stream_session")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
