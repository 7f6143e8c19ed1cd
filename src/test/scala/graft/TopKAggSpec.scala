package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg.topK
import graft.functions.TopKBuffer

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("buffer: bounded heap keeps the best k with deterministic ties") {
    val b = new TopKBuffer(3)
    Seq((1.0, 1L), (5.0, 2L), (3.0, 3L), (5.0, 4L), (2.0, 5L))
      .foreach { case (s, i) => b.insert(s, i) }
    assert(b.size == 3)
    val rows = b.sortedRows.map(_.asInstanceOf[
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow])
    val got = rows.map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // ties on 5.0: smaller id wins rank; 5.0#4 still beats 3.0
    assert(got == Seq((5.0, 2L), (5.0, 4L), (3.0, 3L)))
  }

  test("aggregate equals the window idiom across partitionings") {
    val df = (1 to 500).map(i =>
        ((i % 7).toString, (i % 83).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val viaAgg = df.repartition(13) // force multi-partition merge +
      // partial-buffer serialization across the exchange
      .groupBy("g").agg(topK(col("v"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("g"), col("i"), col("r.score"), col("r.id"))
      .orderBy("g", "i").collect().toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).as("i"), col("v"), col("id"))
      .orderBy("g", "i").collect().toSeq
    assert(viaAgg.map(_.toString) == viaWindow.map(_.toString))
  }

  test("k larger than the group returns the whole group, nulls skipped") {
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L),
      ("a", Some(3.0), 3L)).toDF("g", "v", "id")
    val r = df.groupBy("g").agg(topK(col("v"), col("id"), 10).as("top"))
      .select(size(col("top"))).head()
    assert(r.getInt(0) == 2)
  }

  test("runs under ObjectHashAggregate with a partial stage") {
    val df = spark.range(100).select((col("id") % 5).cast("string")
      .as("g"), col("id").cast("double").as("v"), col("id").as("i"))
    val q = df.groupBy("g").agg(topK(col("v"), col("i"), 3))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"wrong aggregate impl:\n$p")
    assert(p.contains("partial_top_k") || p.contains("partial top_k")
      || countPartial(p) >= 2, s"no map-side partial stage:\n$p")
  }

  private def countPartial(p: String): Int =
    p.sliding("ObjectHashAggregate".length)
      .count(_ == "ObjectHashAggregate")

  test("NaN scores rank greatest, matching the window row_number oracle") {
    // Spark's double ordering is total with NaN greatest; the heap
    // compares via java.lang.Double.compare to match. A NaN row must
    // therefore WIN a top-k slot, exactly as the window idiom ranks it.
    val df = Seq(("g", 5.0, 1L), ("g", Double.NaN, 2L), ("g", 3.0, 3L),
      ("g", 7.0, 4L)).toDF("g", "v", "i")
    val agg = df.groupBy("g").agg(topK(col("v"), col("i"), 2).as("top"))
      .select(posexplode(col("top")).as(Seq("r", "e")))
      .select(col("e.score"), col("e.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val window = df.select(col("v"), col("i"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("v").desc, col("i"))).as("rn"))
      .filter(col("rn") <= 2).orderBy("rn")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(agg.map(t => (t._1.isNaN, if (t._1.isNaN) 0.0 else t._1, t._2))
      == window.map(t => (t._1.isNaN, if (t._1.isNaN) 0.0 else t._1, t._2)))
    assert(agg.head._1.isNaN && agg(1)._1 == 7.0)
  }

  test("streaming leaderboard equals batch aggregate after replays") {
    import graft.streaming.StreamTopK
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(StreamTopK.Scored("a", 5.0, 1), StreamTopK.Scored("a", 3.0, 2),
      StreamTopK.Scored("b", 1.0, 3))
    val b2 = Seq(StreamTopK.Scored("a", 4.0, 4), StreamTopK.Scored("a", 9.0, 5),
      StreamTopK.Scored("b", 2.0, 6))
    val stream = MemoryStream[StreamTopK.Scored]
    val q = StreamTopK.streaming(stream.toDS(), k = 2)
      .writeStream.format("memory").queryName("topkboard")
      .outputMode("update").start()
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends each batch's emissions; the
    // LAST board per key is the live leaderboard
    val streamed = spark.sql(
      """SELECT key, entries FROM (
        |  SELECT key, entries,
        |    row_number() OVER (PARTITION BY key ORDER BY mono DESC) rn
        |  FROM (SELECT key, entries,
        |        monotonically_increasing_id() AS mono FROM topkboard))
        |WHERE rn = 1""".stripMargin)
      .as[(String, Seq[(Long, Double, Long)])].collect().toMap
    val batch = StreamTopK.batch((b1 ++ b2).toDF(), "key", "score", "id",
        k = 2).collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq)
    assert(streamed("a").map(e => (e._1, e._2, e._3)) == batch("a"))
    assert(streamed("b").map(e => (e._1, e._2, e._3)) == batch("b"))
  }
}
