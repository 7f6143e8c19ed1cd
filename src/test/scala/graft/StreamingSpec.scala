package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** The StreamOps transforms must produce the same answers on a real
  * stream (MemoryStream + watermark) as in batch — the Structured
  * Streaming contract the engine relies on. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  def ev(id: Long, minute: Int, typ: String, user: Long = 1L,
      value: Double = 1.0): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user, typ,
      value, "{}")

  val events = Seq(
    ev(0, 1, "click"), ev(1, 2, "click", value = 2.0), ev(2, 5, "view"),
    ev(3, 30, "click"), ev(4, 59, "view", value = 3.0))

  test("tumbling window agg: stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = StreamOps.tumblingAgg(stream.toDF(), "15 minutes",
        watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.sql(
      "SELECT * FROM tumbling ORDER BY window_start, event_type").collect()
    val batch = StreamOps.tumblingAgg(events.toDF(), "15 minutes")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(batch.length == 4) // windows 0,30,45 / types split window 0
  }

  test("streaming decontamination gate: stream == batch, replays stay out") {
    implicit val sqlCtx = spark.sqlContext
    // docs: 0 is the benchmark; 10 copies a 60-char passage from it,
    // 11 is clean, 12 is too short to have any 50-char window
    val passage = "x" * 30 + "the exact shared benchmark passage body " +
      "a" * 20
    val bench = Seq((0L, s"PREFIX $passage SUFFIX")).toDF("doc_id", "text")
    val clean1 = (10L, s"unrelated $passage tail")       // contaminated
    val clean2 = (11L, ("z" * 40) + ("q" * 40))          // clean, long
    val clean3 = (12L, "short doc")                      // no windows
    val benchSet = graft.streaming.StreamDecon
      .benchWindowSet(bench, "text")
    val stream = MemoryStream[(Long, String)]
    stream.addData(clean1, clean2, clean3)
    val q = graft.streaming.StreamDecon.clean(
        stream.toDF().toDF("doc_id", "text"), benchSet, "text")
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    q.processAllAvailable()
    // replay the contaminated doc in a later micro-batch: the gate is
    // stateless, so it is dropped again on every arrival
    stream.addData(clean1)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT doc_id FROM decon ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == Seq(11L, 12L))
    // batch twin agrees
    val train = Seq(clean1, clean2, clean3).toDF("doc_id", "text")
    val batch = graft.streaming.StreamDecon.batch(train, bench, "text")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(batch == Seq(11L, 12L))
  }

  test("benchWindowSet refuses an oversized bench side, loudly") {
    val bench = Seq((0L, "a" * 200)).toDF("doc_id", "text")
    // 200 'a's with windowLen 50 -> 151 windows but only ONE distinct;
    // vary the text so the distinct count (4) exceeds the tiny cap
    val varied = Seq((0L, "abcde" * 40), (1L, "vwxyz" * 40))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamDecon.benchWindowSet(varied, "text",
        windowLen = 50, maxWindows = 3)
    }
    assert(e.getMessage.contains("maxWindows=3"))
    assert(e.getMessage.contains("cleanBloom"))
    // at-or-under the cap still works (degenerate text: 1 distinct)
    assert(graft.streaming.StreamDecon.benchWindowSet(bench, "text",
      windowLen = 50, maxWindows = 3).size == 1)
  }

  test("cleanBloom twin: contaminated docs never pass, clean docs do") {
    val passage = "x" * 30 + "the exact shared benchmark passage body " +
      "a" * 20
    val bench = Seq((0L, s"PREFIX $passage SUFFIX")).toDF("doc_id", "text")
    val train = Seq(
      (10L, s"unrelated $passage tail"),  // contaminated
      (11L, ("z" * 40) + ("q" * 40)),     // clean, long
      (12L, "short doc")                  // no windows
    ).toDF("doc_id", "text")
    val bf = graft.streaming.StreamDecon.benchBloom(bench, "text",
      expectedItems = 10000L, fpp = 0.0001)
    val kept = graft.streaming.StreamDecon.cleanBloom(train, bf, "text")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // false negatives are impossible: 10 MUST be gone; at fpp 1e-4 and
    // ~40 windows the clean docs deterministically survive this filter
    assert(kept == Seq(11L, 12L))
  }

  test("session windows merge within the gap") {
    val sessions = StreamOps.sessionAgg(events.toDF(), gap = "5 minutes")
      .orderBy("session_start").collect()
    // user 1: events at 1,2,5 chain (gaps < 5m); 30 alone; 59 alone
    assert(sessions.length == 3)
    assert(sessions.head.getAs[Long]("n_events") == 3L)
    assert(sessions.head.getAs[Double]("total") == 4.0)
  }

  test("stream-stream interval join == batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = Seq(ev(10, 20, "purchase", user = 1L),
      ev(11, 40, "purchase", user = 2L))
    val clicks = Seq(ev(0, 12, "click", user = 1L, value = 2.0),
      ev(1, 15, "click", user = 1L), ev(2, 19, "click", user = 2L),
      ev(3, 45, "click", user = 2L)) // after the purchase -> no match
    val ls = MemoryStream[Ev]; val rs = MemoryStream[Ev]
    val q = StreamOps.intervalJoin(ls.toDF(), rs.toDF(), "user_id",
        lookback = "10 minutes", watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    ls.addData(purchases: _*); rs.addData(clicks: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT * FROM ssjoin ORDER BY l_event_id, r_event_id").collect()
    val batch = StreamOps.intervalJoin(purchases.toDF(), clicks.toDF(),
      "user_id", lookback = "10 minutes")
      .orderBy("l_event_id", "r_event_id").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    // purchase@20 u1 <- clicks@12,15; u2 purchase@40 has no click in
    // [30, 40]; click@45 is after the purchase
    assert(batch.map(r => (r.getAs[Long]("l_event_id"),
      r.getAs[Long]("r_event_id"))).toSeq == Seq((10L, 0L), (10L, 1L)))
  }

  test("streaming dedup within the watermark drops cross-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamOps.dedupStream(stream.toDF(), "10 minutes",
        Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData(ev(1, 1, "click"))
    q.processAllAvailable()
    // same event_id again in a LATER micro-batch, still inside the
    // watermark horizon -> suppressed by the keyed state
    stream.addData(ev(1, 1, "click"), ev(2, 3, "view"))
    q.processAllAvailable(); q.stop()
    val ids = spark.sql("SELECT event_id FROM dedup_stream")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("streaming curation composes: fingerprint dedup then chunking") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    // reuse the Ev schema: props carries the "document text"
    def doc(id: Long, minute: Int, text: String) =
      Ev(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), id,
        "doc", 0.0, text)
    val curated = stream.toDF()
      .withColumn("fp", graft.operators.TextOps.fingerprint(col("props")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .select(col("event_id").as("doc_id"),
        explode(graft.operators.TextOps.chunkWords(col("props"), 4, 1))
          .as("c"))
      .select(col("doc_id"), col("c.start_word"), col("c.chunk_text"))
    val q = curated.writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    stream.addData(doc(0, 1, "alpha beta gamma delta epsilon zeta"))
    q.processAllAvailable()
    // same content again (different id, later micro-batch) -> deduped
    stream.addData(doc(1, 2, "alpha beta gamma delta epsilon zeta"),
      doc(2, 3, "one two three"))
    q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT DISTINCT doc_id FROM cur_stream")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(0L, 2L)) // doc 1 suppressed by the fp-keyed state
  }

  test("streaming writes to a parquet sink with checkpointing") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val q = stream.toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode("append").start()
    stream.addData(events: _*)
    q.processAllAvailable(); q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() == events.size)
    // checkpoint metadata exists -> restartable exactly-once sink
    assert(new java.io.File(ckDir, "offsets").listFiles().nonEmpty)
  }

  test("exactly-once across kill-and-resume: no loss, no duplication") {
    // file source -> parquet sink, both checkpoint-governed: the query is
    // STOPPED and RESTARTED twice against the same checkpoint. Restart 1
    // has no new input and must write NOTHING (offsets prove the replay
    // is suppressed); restart 2 sees one new file and must write exactly
    // its rows. Loss or duplication at any step changes the final multiset.
    val inDir = java.nio.file.Files.createTempDirectory("graft_eo_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_eo_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_eo_ck").toString
    def addFile(rows: Seq[Ev]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(inDir)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .parquet(inDir)
        .withColumn("doubled", col("value") * 2)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val batch1 = events.take(3)
    val batch2 = Seq(ev(10, 45, "click", value = 7.0),
      ev(11, 50, "view", value = 8.0))
    addFile(batch1)
    runOnce()
    val after1 = spark.read.parquet(outDir).select("event_id").as[Long]
      .collect().sorted.toSeq
    assert(after1 == batch1.map(_.event_id).sorted.toSeq)
    runOnce() // resume with NO new data: replay must be a no-op
    val after2 = spark.read.parquet(outDir).select("event_id").as[Long]
      .collect().sorted.toSeq
    assert(after2 == after1, "restart without new input duplicated rows")
    addFile(batch2)
    runOnce() // resume with new data: exactly the new rows appear
    val after3 = spark.read.parquet(outDir)
      .select("event_id", "doubled").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(after3.map(_._1) ==
      (batch1.map(_.event_id) ++ batch2.map(_.event_id)).sorted.toSeq)
    assert(after3.toMap.apply(10L) == 14.0) // transform survived the resume
  }

  test("streaming anomaly scores match batch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = graft.streaming.StreamAnomaly
      .streaming(stream.toDF(), minPeriods = 2, z = 1.0).toDF()
      .writeStream.format("memory").queryName("stream_anomaly")
      .outputMode("append").start()
    val evs = (1 to 8).map(i =>
      ev(i.toLong, i, "click", value = if (i == 8) 50.0 else i.toDouble))
    stream.addData(evs.take(4): _*)
    q.processAllAvailable()
    stream.addData(evs.drop(4): _*) // state must carry (n, Σv, Σv²) over
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM stream_anomaly ORDER BY event_id")
      .collect()
    val batch = graft.streaming.StreamAnomaly
      .batch(evs.toDF(), minPeriods = 2, z = 1.0)
      .toDF().orderBy("event_id").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(batch.last.getLong(3) == 1L) // the spike is flagged
  }

  test("sliding windows overlap correctly") {
    val w = StreamOps.slidingAgg(events.toDF(), "1 hour", "15 minutes")
    // event at minute 59 appears in windows starting 00,15,30,45
    val hits = w.where($"event_type" === "view" && $"mean_value" === 3.0)
      .count()
    assert(hits >= 1)
    val starts = w.select("window_start").distinct().count()
    assert(starts >= 4)
  }

  test("stream-static dim enrichment: stream == batch, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.5), ("view", 0.5)).toDF("event_type", "wgt")
    def score(df: org.apache.spark.sql.DataFrame) =
      StreamOps.enrichWithDim(df, dim, "event_type")
        .select($"event_id", ($"value" * $"wgt").as("scored"))
    val stream = MemoryStream[Ev]
    val q = score(stream.toDF())
      .writeStream.format("memory").queryName("stream_enrich")
      .outputMode("append").start()
    stream.addData(events: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT * FROM stream_enrich ORDER BY event_id").collect()
    val batch = score(events.toDF()).orderBy("event_id").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(batch.length == events.size) // every event matched the dim
  }

  test("streaming upsert view: last snapshot per key == batch compaction") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = graft.streaming.StreamLatest.streaming(stream.toDF()).toDF()
      .writeStream.format("memory").queryName("stream_latest")
      .outputMode("append").start()
    val evs = Seq(ev(0, 1, "click", user = 1L, value = 1.0),
      ev(1, 5, "view", user = 1L, value = 2.0),
      ev(2, 3, "view", user = 2L, value = 3.0))
    stream.addData(evs: _*)
    q.processAllAvailable()
    // batch 2: user 1 gets a NEWER event (state must advance), user 2 an
    // OLDER one (state must hold the batch-1 winner)
    stream.addData(ev(3, 9, "click", user = 1L, value = 9.0),
      ev(4, 2, "click", user = 2L, value = 4.0))
    q.processAllAvailable(); q.stop()
    // append-mode changelog: the final snapshot per key is the row with
    // the greatest us (snapshots are monotone under the upsert order)
    val streamed = spark.sql(
      """SELECT user_id, us, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY us DESC, event_id DESC) AS rn FROM stream_latest)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin).collect()
    val batch = graft.streaming.StreamLatest
      .batch((evs :+ ev(3, 9, "click", user = 1L, value = 9.0)
        :+ ev(4, 2, "click", user = 2L, value = 4.0)).toDF())
      .toDF().orderBy("user_id").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(batch.map(_.getLong(2)).toSeq == Seq(3L, 2L)) // winning events
  }

  test("streaming funnel: stage machine advances across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val lim = 600000000L // 10 min deadline in µs
    val stream = MemoryStream[Ev]
    val q = graft.streaming.StreamFunnel
      .streaming(stream.toDF(), deadlineUs = lim).toDF()
      .writeStream.format("memory").queryName("stream_funnel")
      .outputMode("append").start()
    val evs = Seq(
      ev(0, 1, "view", user = 1L), ev(1, 5, "click", user = 1L),
      ev(2, 2, "view", user = 2L),
      ev(3, 30, "click", user = 2L)) // past user 2's deadline
    stream.addData(evs.take(3): _*)
    q.processAllAvailable()
    // batch 2: user 1 purchases within deadline (state must chain
    // t1 -> t2 -> t3 across the batch boundary); user 2's late click
    // must NOT advance
    stream.addData(ev(4, 9, "purchase", user = 1L), evs(3))
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      """SELECT user_id, t1, t2, t3 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY coalesce(t3, t2, t1, 0) DESC) AS rn
        |  FROM stream_funnel) WHERE rn = 1
        |ORDER BY user_id""".stripMargin).collect()
    val batch = graft.streaming.StreamFunnel
      .batch((evs :+ ev(4, 9, "purchase", user = 1L)).toDF(),
        deadlineUs = lim)
      .toDF().select("user_id", "t1", "t2", "t3")
      .orderBy("user_id").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(!batch(0).isNullAt(3)) // user 1 completed the funnel
    assert(batch(1).isNullAt(2))  // user 2 never converted
  }

  test("streaming curation pipeline: stream == batch") {
    // the q61/q87 shape on a live stream: fingerprint-dedup (bounded
    // watermark state) -> quality filter -> chunk. Only the dedup stage
    // is stateful; the rest must be identical stream/batch by
    // construction, and this pins it across micro-batch boundaries.
    import graft.operators.TextOps
    implicit val sqlCtx = spark.sqlContext
    def curate(df: org.apache.spark.sql.DataFrame, streaming: Boolean) = {
      val fp = df.withColumn("fp", TextOps.fingerprint(col("text")))
      val deduped =
        if (streaming) StreamOps.dedupStream(fp, "10 minutes", Seq("fp"))
        else fp.dropDuplicates("fp")
      deduped.where(TextOps.wordCount(col("text")) >= 3)
        .select(explode(TextOps.chunkWords(col("text"), 3, 1)).as("c"))
        .select(col("c.chunk_text").as("chunk"))
    }
    val docs = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), "alpha beta gamma delta"),
      (2L, Timestamp.valueOf("2024-01-01 00:02:00"), "alpha beta gamma delta"),
      (3L, Timestamp.valueOf("2024-01-01 00:03:00"), "tiny doc"),
      (4L, Timestamp.valueOf("2024-01-01 00:04:00"), "epsilon zeta eta theta iota"))
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = curate(stream.toDF().toDF("doc_id", "ts", "text"),
        streaming = true)
      .writeStream.format("memory").queryName("stream_curation")
      .outputMode("append").start()
    stream.addData(docs.take(2): _*) // dup arrives in the FIRST batch
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*) // state must drop nothing new
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT chunk FROM stream_curation")
      .as[String].collect().sorted.toSeq
    val batch = curate(docs.toDF("doc_id", "ts", "text"),
        streaming = false)
      .as[String].collect().sorted.toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.count(_.startsWith("alpha")) == 1)
  }

  test("StreamNearDup signature math is bit-identical to the batch SQL") {
    import graft.operators.Dedup
    import graft.streaming.StreamNearDup
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "one two  three", // double space: split keeps the empty token
      "too short")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sqlSigs = df.select(col("doc_id"),
        explode(array_distinct(
          Dedup.wordShingles(col("text"), 3))).as("shingle"))
      .groupBy("doc_id").agg(
        array((0 until 16).map(i =>
          min(xxhash64(col("shingle"), lit(i)))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val typed = StreamNearDup.signature(t, 3, 16)
      assert(typed.map(_.toSeq) == sqlSigs.get(i.toLong).map(_.toSeq),
        s"doc $i")
    }
    // band bucket matches xxhash64(array_join(slice(sig, ...), ","))
    val sig = StreamNearDup.signature(texts.head, 3, 16).get
    val sqlBucket = spark.sql(
      s"SELECT xxhash64(array_join(slice(array(${sig.mkString("L,")}L)" +
        s", 3, 2), ','))").head().getLong(0)
    assert(StreamNearDup.bandBucket(sig, 1, 2) == sqlBucket)
  }

  test("StreamNearDup: cross-batch near-dup caught; stream == batch") {
    import graft.streaming.StreamNearDup
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      StreamNearDup.Doc(1L, base),
      StreamNearDup.Doc(2L, "completely different words in this one " +
        "nothing shared with the template at all whatsoever here"),
      StreamNearDup.Doc(3L, base + " edited"), // near-dup of 1, batch 2
      StreamNearDup.Doc(4L, "short"))
    val stream = MemoryStream[StreamNearDup.Doc]
    val q = StreamNearDup.streaming(stream.toDS(), minEstJaccard = 0.5)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    stream.addData(docs.take(2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*) // near-dup arrives a batch LATER
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT a, b, est_jaccard FROM neardup")
      .collect().map(_.toString).sorted.toSeq
    val batch = StreamNearDup.batch(docs.toDS().toDF(), "text", "doc_id",
        minEstJaccard = 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    // the state from batch 1 caught the batch-2 near-dup, exactly once
    assert(streamed.length == 1 && streamed.head.startsWith("[1,3,"))
  }

  test("gate saturation metrics ride the progress listener: rejected " +
      "enrollments and at-cap keys rise under a hot clique, stay 0 on " +
      "a uniform stream") {
    import scala.jdk.CollectionConverters._
    import graft.streaming.{StreamNearDup, StreamSemDedup}
    implicit val sqlCtx = spark.sqlContext
    def metrics(qname: String, mk: () =>
        org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
      val q = mk()
      q.processAllAvailable(); q.stop()
      val rows = q.recentProgress.toSeq
        .flatMap(_.observedMetrics.asScala.get(qname))
      (rows.map(_.getLong(0)).sum, rows.map(_.getLong(1)).sum)
    }
    // ---- lexical gate: 5 identical docs through bucketCap=2 —
    // every one of the 8 band buckets fills and rejects 3 novels
    val clique = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val hotIn = MemoryStream[StreamNearDup.Doc]
    hotIn.addData((1L to 5L).map(StreamNearDup.Doc(_, clique)): _*)
    val (hotRej, hotCap) = metrics("nd_hot", () =>
      StreamNearDup.streamingObserved(hotIn.toDS(), "nd_hot",
          bucketCap = 2)
        .writeStream.format("memory").queryName("ndhot")
        .outputMode("append").start())
    assert(hotRej == 24L, s"3 rejected x 8 buckets, got $hotRej")
    assert(hotCap == 8L, s"all 8 band buckets at cap, got $hotCap")
    // the observed variant's OUTPUT is the plain gate's: (1,2) within
    // the stored prefix + each rejected doc 3..5 still PROBES both
    // stored entries = 1 + 3x2 = 7 pairs, once each (band-0 bucket)
    assert(spark.sql("SELECT count(*) FROM ndhot").collect()(0)
      .getLong(0) == 7L)
    // ---- lexical gate, uniform stream: disjoint vocab, zero pressure
    val uniIn = MemoryStream[StreamNearDup.Doc]
    uniIn.addData(
      StreamNearDup.Doc(1L, "one two three four five six seven"),
      StreamNearDup.Doc(2L, "eight nine ten eleven twelve thirteen"),
      StreamNearDup.Doc(3L, "fourteen fifteen sixteen seventeen nope"))
    val (uniRej, uniCap) = metrics("nd_uni", () =>
      StreamNearDup.streamingObserved(uniIn.toDS(), "nd_uni",
          bucketCap = 2)
        .writeStream.format("memory").queryName("nduni")
        .outputMode("append").start())
    assert(uniRej == 0L && uniCap == 0L, s"uniform: $uniRej/$uniCap")
    // ---- semantic gate: 5-vector clique into one cell, cellCap=2
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val semHot = MemoryStream[StreamSemDedup.EmbDoc]
    semHot.addData((1L to 5L).map(i =>
      StreamSemDedup.EmbDoc(i, Array(1.0f, i * 1e-4f))): _*)
    val (shRej, shCap) = metrics("sem_hot", () =>
      StreamSemDedup.streamingObserved(semHot.toDS(), cents,
          threshold = 0.9, "sem_hot", nassign = 1, cellCap = 2)
        .writeStream.format("memory").queryName("semhot")
        .outputMode("append").start())
    assert(shRej == 3L, s"3 novel arrivals denied, got $shRej")
    assert(shCap == 1L, s"one hot cell at cap, got $shCap")
    val semUni = MemoryStream[StreamSemDedup.EmbDoc]
    semUni.addData(
      StreamSemDedup.EmbDoc(1L, Array(1.0f, 0.0f)),
      StreamSemDedup.EmbDoc(2L, Array(0.0f, 1.0f)))
    val (suRej, suCap) = metrics("sem_uni", () =>
      StreamSemDedup.streamingObserved(semUni.toDS(), cents,
          threshold = 0.9, "sem_uni", nassign = 1, cellCap = 2)
        .writeStream.format("memory").queryName("semuni")
        .outputMode("append").start())
    assert(suRej == 0L && suCap == 0L, s"uniform: $suRej/$suCap")
  }

  test("lake-seeded streaming gate: micro-batch ONE dedups against the " +
      "artifact, stream equals the batch twin, unseeded gate misses") {
    import graft.streaming.StreamNearDup
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val tmp = java.nio.file.Files.createTempDirectory("graft_seed").toString
    val lakeDocs = Seq((2L, base),
      (4L, "completely different words in this one nothing shared " +
        "with the template at all whatsoever here"))
      .toDF("doc_id", "text")
    Dedup.writeBandedSignatures(lakeDocs, "text", "doc_id", s"$tmp/sigs")
    val arrivals = Seq(
      StreamNearDup.Doc(11L, base + " edited"), // near-dup of LAKE doc 2
      StreamNearDup.Doc(13L, "short unrelated thing"))
    val stream = MemoryStream[StreamNearDup.Doc]
    val q = StreamNearDup.streamingFromLake(stream.toDS(),
        spark.read.parquet(s"$tmp/sigs"), minEstJaccard = 0.5)
      .writeStream.format("memory").queryName("seeded")
      .outputMode("append").start()
    stream.addData(arrivals: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT a, b, est_jaccard FROM seeded")
      .collect().map(_.toString).sorted.toSeq
    // the FIRST micro-batch caught the lake near-dup
    assert(streamed.length == 1 && streamed.head.startsWith("[2,11,"),
      s"lake pair not caught: $streamed")
    // batch twin is bit-identical
    val arrivalsDf = arrivals.toDS().toDF()
    val bt = StreamNearDup.batchFromLake(arrivalsDf,
        spark.read.parquet(s"$tmp/sigs"), "text", "doc_id",
        minEstJaccard = 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(bt == streamed)
    // without the seed the same arrivals produce NOTHING — the lake
    // history is what the initial state buys
    assert(StreamNearDup.batch(arrivalsDf, "text", "doc_id",
      minEstJaccard = 0.5).collect().isEmpty)
    // seeding respects the enroll cap: with bucketCap 1 only lake doc
    // 2 (lowest id) is stored per bucket, and it still pairs
    val capped = StreamNearDup.batchFromLake(arrivalsDf,
        spark.read.parquet(s"$tmp/sigs"), "text", "doc_id",
        minEstJaccard = 0.5, bucketCap = 1)
      .collect().map(_.toString).sorted.toSeq
    assert(capped == streamed)
  }

  test("semantic lake-seeded gate: keeper state from the artifact " +
      "removes in batch one; stream equals batch twin; unseeded misses") {
    import graft.streaming.StreamSemDedup
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_semseed").toString
    val lake = Seq((0L, Array(1.00f, 0.00f)), (2L, Array(0.00f, 1.00f)))
      .toDF("vec_id", "embedding")
    Similarity.writeSemDedupArtifacts(lake, "vec_id", "embedding",
      s"$tmp/sem", nlist = 2, nassign = 2, seed = 7L)
    val cb = Similarity.readSemCodebook(spark, s"$tmp/sem")
      .map(_.toArray).toArray
    val keepers = spark.read.parquet(s"$tmp/sem/keepers")
    val arrivals = Seq(
      StreamSemDedup.EmbDoc(11L, Array(0.99f, 0.01f)), // ~ lake doc 0
      StreamSemDedup.EmbDoc(13L, Array(-1.0f, -0.3f)))
    val stream = MemoryStream[StreamSemDedup.EmbDoc]
    val q = StreamSemDedup.streamingFromLake(stream.toDS(), cb, keepers,
        threshold = 0.9, nassign = 2)
      .writeStream.format("memory").queryName("semseeded")
      .outputMode("append").start()
    stream.addData(arrivals: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
        "SELECT vec_id, keeper, cos_sim FROM semseeded")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.length == 1 && streamed.head.startsWith("[11,0,"),
      s"lake keeper did not remove its near-dup: $streamed")
    val bt = StreamSemDedup.batchFromLake(arrivals.toDS().toDF(), cb,
        keepers, "vec_id", "embedding", threshold = 0.9, nassign = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(bt == streamed)
    // no seed -> no history -> nothing removed
    assert(StreamSemDedup.batch(arrivals.toDS().toDF(), "vec_id",
      "embedding", threshold = 0.9, nlist = 2, nassign = 2,
      seed = 7L).collect().isEmpty)
  }

  test("StreamNearDup bucketCap bounds state: later arrivals compare, " +
      "don't enroll") {
    import graft.streaming.StreamNearDup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(1L, 2L, 3L).map(i => StreamNearDup.Doc(i, base))
      .toDS().toDF()
    val pairs = StreamNearDup.batch(docs, "text", "doc_id",
        minEstJaccard = 0.5, bucketCap = 1)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    // only doc 1 is enrolled; 2 and 3 each match it but never each other
    assert(pairs == Seq((1L, 2L), (1L, 3L)))
  }

  test("StreamSemDedup cosine matches the batch Column pipeline " +
      "bit-for-bit") {
    import graft.streaming.StreamSemDedup
    import graft.operators.Similarity
    // cross-check the typed kernel's round6(dot/(|a||b|)) against the
    // batch operators' round(VectorDot/(l2Norm*l2Norm), 6) on vectors
    // with non-trivial float->double rounding
    val vs = Seq(
      (Array(0.31f, -0.47f, 0.92f), Array(0.29f, -0.55f, 0.88f)),
      (Array(1e-3f, 2e-3f, 3e-3f), Array(0.9f, 0.1f, -0.2f)))
    val df = vs.toDF("a", "b")
    val sqlCos = df.select(org.apache.spark.sql.functions.round(
        Similarity.dot(col("a"), col("b")) /
          (Similarity.l2Norm(col("a")) * Similarity.l2Norm(col("b"))), 6))
      .collect().map(_.getDouble(0)).toSeq
    val typedCos = vs.map { case (a, b) =>
      def d(x: Array[Float], y: Array[Float]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        s
      }
      java.math.BigDecimal.valueOf(d(a, b) /
          (math.sqrt(d(a, a)) * math.sqrt(d(b, b))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(typedCos == sqlCos)
    // cell assignment agrees with the batch quantizer's (d, cell)
    // ordering on an exact-tie: both centroids equidistant -> lower id
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val tied = StreamSemDedup.cellsOf(Array(0f, 1f), cents,
      cents.map(_.map(x => x * x).sum), nassign = 2)
    assert(tied.toSeq == Seq(0, 1))
  }

  test("StreamSemDedup: cross-batch paraphrase dropped; stream == batch") {
    import graft.streaming.StreamSemDedup
    implicit val sqlCtx = spark.sqlContext
    // two tight balls far apart; doc 3 is a near-dup of 1 arriving a
    // batch later, doc 11 a near-dup of 10 in the same batch
    val docs = Seq(
      StreamSemDedup.EmbDoc(1L, Array(1.00f, 0.00f)),
      StreamSemDedup.EmbDoc(10L, Array(0.00f, 1.00f)),
      StreamSemDedup.EmbDoc(3L, Array(0.99f, 0.01f)),
      StreamSemDedup.EmbDoc(11L, Array(0.01f, 0.99f)))
    val batchDf = docs.toDS().toDF()
    val (cents, _) = StreamSemDedup.fitCodebook(batchDf, "vec_id",
      "embedding", nlist = 2, seed = 7L)
    val stream = MemoryStream[StreamSemDedup.EmbDoc]
    val q = StreamSemDedup.streaming(stream.toDS(), cents,
        threshold = 0.9, nassign = 2)
      .writeStream.format("memory").queryName("semdedup")
      .outputMode("append").start()
    stream.addData(docs.take(2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*)
    q.processAllAvailable(); q.stop()
    // collapse the streamed rows the way the batch twin does
    val streamed = spark.sql(
      """SELECT vec_id, min(struct(keeper, cos_sim)).keeper AS keeper,
        |  min(struct(keeper, cos_sim)).cos_sim AS cos_sim
        |FROM semdedup GROUP BY vec_id""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    val batch = StreamSemDedup.batch(batchDf, "vec_id", "embedding",
        threshold = 0.9, nlist = 2, nassign = 2, seed = 7L)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    // exactly the two later arrivals are dropped, against the first
    // arrival of their ball (keep rule: first seen wins)
    assert(streamed.length == 2)
    assert(streamed.exists(_.startsWith("[3,1,")))
    assert(streamed.exists(_.startsWith("[11,10,")))
    // a replayed duplicate is re-dropped on every arrival
    val stream2 = MemoryStream[StreamSemDedup.EmbDoc]
    val q2 = StreamSemDedup.streaming(stream2.toDS(), cents,
        threshold = 0.9, nassign = 2)
      .writeStream.format("memory").queryName("semdedup_replay")
      .outputMode("append").start()
    stream2.addData(docs(0))
    q2.processAllAvailable()
    stream2.addData(docs(2))
    q2.processAllAvailable()
    stream2.addData(docs(2)) // the same near-dup arrives again
    q2.processAllAvailable(); q2.stop()
    assert(spark.sql(
      "SELECT * FROM semdedup_replay WHERE vec_id = 3").count() == 2)
  }

  test("StreamTokenBudget: crossing doc admitted then gate closes, " +
      "state persists across batches, stream == batch") {
    import graft.streaming.StreamTokenBudget
    import graft.streaming.StreamTokenBudget.Doc
    implicit val sqlCtx = spark.sqlContext
    // src a: 60+50 crosses the 100 budget at doc 2 (admitted), doc 3
    // in a LATER batch must be rejected from carried state; src b
    // stays under budget throughout
    val b1 = Seq(Doc(1L, "a", 60L), Doc(2L, "a", 50L), Doc(10L, "b", 30L))
    val b2 = Seq(Doc(3L, "a", 10L), Doc(11L, "b", 40L))
    val stream = MemoryStream[Doc]
    val q = StreamTokenBudget.streaming(stream.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("tokbudget")
      .outputMode("append").start()
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT doc_id FROM tokbudget")
      .as[Long].collect().sorted.toSeq
    assert(streamed == Seq(1L, 2L, 10L, 11L))
    val batch = StreamTokenBudget.batch((b1 ++ b2).toDS().toDF(), 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(batch == streamed)
  }

  test("StreamDsirGate: the stateless scorer admits identically on " +
      "stream and batch") {
    import graft.streaming.StreamDsirGate
    import graft.streaming.StreamDsirGate.Doc
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((1L, "a a", true), (2L, "b b", false),
      (3L, "a b", false)).toDF("doc_id", "text", "t")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsirgate")
      .toString + "/model"
    graft.operators.Curation.writeDsirModel(train, "text", col("t"),
      buckets = 1024, salt = "graft", tmp)
    val lr = spark.read.parquet(tmp)
      .select(col("b"), col("lr_micro")).orderBy("b").collect()
      .map(_.getLong(1))
    val arrivals = Seq(Doc(10L, "a a"), Doc(11L, "b b"), Doc(12L, "a b"))
    // threshold at the max score -> the gate must split the arrivals
    val thr = StreamDsirGate.batch(arrivals.toDS().toDF(), "text",
        "doc_id", lr, minMicro = Long.MinValue)
      .select("iw_micro").as[Long].collect().max
    val batchIds = StreamDsirGate.batch(arrivals.toDS().toDF(), "text",
        "doc_id", lr, minMicro = thr)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val stream = MemoryStream[Doc]
    val q = StreamDsirGate.streaming(stream.toDS(), lr, minMicro = thr)
      .writeStream.format("memory").queryName("dsirgate")
      .outputMode("append").start()
    stream.addData(arrivals: _*); q.processAllAvailable(); q.stop()
    val streamIds = spark.sql("SELECT doc_id FROM dsirgate")
      .as[Long].collect().sorted.toSeq
    assert(streamIds == batchIds)
    // the gate split the arrivals (some admitted, some rejected)
    assert(batchIds.nonEmpty && batchIds.size < arrivals.size)
  }

  test("StreamSemDedup cellCap bounds state: later arrivals compare, " +
      "don't enroll") {
    import graft.streaming.StreamSemDedup
    val docs = Seq(1L, 2L, 3L)
      .map(i => StreamSemDedup.EmbDoc(i, Array(1.0f, 0.0f))).toDS().toDF()
    val removed = StreamSemDedup.batch(docs, "vec_id", "embedding",
        threshold = 0.9, nlist = 1, nassign = 1, cellCap = 1)
      .select("vec_id", "keeper").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // only doc 1 is enrolled; 2 and 3 are each dropped against it
    assert(removed == Seq((2L, 1L), (3L, 1L)))
  }
}
