package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}
import graft.streaming.{StatefulSessions, StreamOps}

class AdvancedOpsSpec extends SparkTestBase {
  import spark.implicits._

  def events = Seq(
    ev(0, 1, 1L), ev(1, 2, 1L, 2.0), ev(2, 5, 1L), ev(3, 30, 1L),
    ev(4, 3, 2L), ev(5, 40, 2L, 3.0))

  def ev(id: Long, minute: Int, user: Long, value: Double = 1.0): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user,
      "click", value, "{}")

  test("stateful sessionizer (batch) matches native session_window") {
    val df = events.toDF()
    val custom = StatefulSessions.batch(df).toDF()
      .select("session_start", "session_end", "user_id", "n_events", "total")
      .orderBy("user_id", "session_start").collect()
    val native = StreamOps.sessionAgg(df, "5 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(custom.map(_.toString).toSeq == native.map(_.toString).toSeq)
  }

  test("stateful sessionizer respects the per-session event cap") {
    val sessions = StatefulSessions.batch(events.toDF(), maxEvents = 2)
      .where($"user_id" === 1L).orderBy("session_start").collect()
    // user 1 gap-sessions: {0,1,2}, {3}; cap 2 splits the first
    assert(sessions.map(_.n_events).toSeq == Seq(2L, 1L, 1L))
  }

  test("stateful sessionizer on a stream closes sessions past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StatefulSessions.streaming(
        stream.toDF().withWatermark("ts", "1 minute")).toDF()
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    stream.addData(events.filter(_.event_id <= 2): _*)
    q.processAllAvailable()
    // watermark still near minute 4 (max 5 − 1m delay): the minute-1..5
    // session stays OPEN in state — nothing may be emitted yet
    assert(spark.sql("SELECT * FROM stateful_sessions").isEmpty)
    stream.addData(ev(6, 45, 1L))
    q.processAllAvailable()
    // watermark passed last(5) + gap(5m): the open session is flushed by
    // the event-time timeout — with exact bounds and decimal-exact total
    val flushed = spark.sql(
      "SELECT * FROM stateful_sessions WHERE user_id = 1").collect()
    assert(flushed.length == 1)
    assert(flushed.head.getAs[Timestamp]("session_start") ==
      Timestamp.valueOf("2024-01-01 00:01:00"))
    assert(flushed.head.getAs[Timestamp]("session_end") ==
      Timestamp.valueOf("2024-01-01 00:10:00")) // last(00:05) + gap
    assert(flushed.head.getAs[Long]("n_events") == 3L)
    assert(flushed.head.getAs[Double]("total") == 4.0)
    stream.addData(ev(7, 59, 1L))
    q.processAllAvailable()
    q.stop()
    // watermark 58 passed 45 + gap: the minute-45 session flushed too;
    // the minute-59 one is still open and must NOT appear
    val all = spark.sql("SELECT * FROM stateful_sessions WHERE user_id = 1")
      .orderBy("session_start").collect()
    assert(all.length == 2)
    assert(all(1).getAs[Timestamp]("session_start") ==
      Timestamp.valueOf("2024-01-01 00:45:00"))
    assert(all(1).getAs[Long]("n_events") == 1L)
  }

  test("as-of join picks the latest prior right row, inclusive at ties") {
    val left = Seq((1L, ts("00:10"), "l1"), (1L, ts("00:20"), "l2"),
      (2L, ts("00:10"), "l3")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("00:10"), "r_a"), (1L, ts("00:15"), "r_b"))
      .toDF("k", "ts", "payload")
    val j = AsofJoin.backward(left, right, "k", "ts", Seq("payload"))
      .orderBy("k", "ts").collect()
    assert(j(0).getAs[String]("r_payload") == "r_a") // inclusive at equal ts
    assert(j(1).getAs[String]("r_payload") == "r_b") // latest prior
    assert(j(2).isNullAt(j(2).fieldIndex("r_payload"))) // no match -> null
  }

  test("range join finds exactly the overlapping interval pairs") {
    val a = Seq((1L, ts("00:00"), ts("01:00")), (2L, ts("02:00"), ts("03:00")))
      .toDF("id", "s", "e")
    val b = Seq((10L, ts("00:30"), ts("02:30")), (20L, ts("05:00"), ts("06:00")))
      .toDF("id", "s", "e")
    val j = RangeJoin.overlapJoin(a, b, Seq("id"), "s", "e", bucketSec = 900L)
      .select("a_id", "b_id").orderBy("a_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(j == Seq((1L, 10L), (2L, 10L))) // 10 overlaps both; 20 neither
    // boundary-touching intervals (half-open) do NOT overlap
    val c = Seq((3L, ts("01:00"), ts("02:00"))).toDF("id", "s", "e")
    assert(RangeJoin.overlapJoin(a, c, Seq("id"), "s", "e").count() == 0)
  }

  def ts(hm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hm:00")

  test("salted join equals plain join (skew mitigation is transparent)") {
    import graft.operators.SkewJoin
    // hot key: 90% of big rows share key 1
    val big = (0 until 1000).map(i => (if (i < 900) 1L else i.toLong % 7, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", saltFactor = 8)
    val plain = big.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("ReportData CSV source round-trips through toSeries") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "rd.csv")
    val w = new java.io.PrintWriter(f)
    w.println("Month,Day,Hour,Minute,Interval,Value,Units,Name,KeyValue,TimeIndex")
    w.println("1,1,1,0,60,10.5,J,meter,Z1,1")
    w.println("1,1,2,0,60,2.5,J,meter,Z1,2")
    w.close()
    val df = graft.sources.ReportData.readCsv(spark, f.getAbsolutePath)
    val series = graft.sources.ReportData.toSeries(df, baseYear = 2018)
    val rows = series.df.orderBy("ts").collect()
    assert(rows.length == 2 && rows.head.getDouble(1) == 10.5)
    assert(rows.head.getTimestamp(0).toInstant.toString
      .startsWith("2018-01-01T00:00:00")) // hour 1 minus 60-min interval
  }

  test("multimodal resize plan computes bounded dimensions") {
    import graft.operators.Multimodal
    // 700 chars -> 233 pixels, id 0 -> width 8, height 29 (> 32 needs
    // a longer doc: use 3100 chars -> 1033 px, h = 129 -> downscale)
    val docs = Seq((0L, "x" * 3100)).toDF("doc_id", "text")
    val media = Multimodal.asBmpMedia(docs, "doc_id", "text")
    val resized = Multimodal.resizePlan(
      Multimodal.extractFeatures(media, "doc_id"), maxDim = 32).head()
    val w = resized.getAs[Int]("out_width")
    val h = resized.getAs[Int]("out_height")
    assert(resized.getAs[Int]("height") == 129) // real decoded geometry
    assert(w <= 32 && h <= 32 && w > 0 && h > 0)
  }

  test("multimodal frame-sample plan explodes fps x duration indices") {
    import graft.operators.Multimodal
    val docs = Seq((0L, "clip", 4.0), (1L, "still", 0.0))
      .toDF("doc_id", "text", "duration_s")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "video/fake")
      .join(docs.select($"doc_id", $"duration_s"), Seq("doc_id"))
    val frames = Multimodal.sampleFrames(media, "doc_id", fps = 2.0,
        durationSecondsCol = "duration_s")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames(0L) == 8L) // 4 s at 2 fps -> frame_idx 0..7
    assert(frames(1L) == 1L) // zero duration floors at one frame
  }
}
