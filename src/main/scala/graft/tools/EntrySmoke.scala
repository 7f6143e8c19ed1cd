package graft.tools
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke check: a PLAIN session (no graft confs,
  * no extensions) calling SparkEntry.entry — must return rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
