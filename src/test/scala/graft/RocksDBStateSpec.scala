package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{StatefulSessions, StreamAnomaly, StreamDedup,
  StreamFunnel, StreamLatest, StreamTopK}

/** The keyed streaming state must run unchanged on the disk-backed
  * RocksDB state store — the provider a 100 TB cluster uses when state
  * (dedup keys, open sessions, leaderboards) outgrows executor heap.
  * HDFSBackedStateStoreProvider keeps every version's map on-heap;
  * RocksDB keeps working set in native memory + SST files on disk, so
  * per-key state size stops being bounded by the JVM. Same operator
  * code, one config — each stateful operator gets a spec here pinning
  * that the swap is really exercised (rocksdb metrics present in the
  * query progress) and changes nothing about the answers vs its batch
  * twin.
  */
class RocksDBStateSpec extends SparkTestBase {
  import spark.implicits._

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Key = "spark.sql.streaming.stateStore.providerClass"

  /** Run `f` with the RocksDB provider set, restoring the previous
    * provider afterwards (the shared session serves other suites). */
  private def withRocksDB[A](f: => A): A = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, Provider)
    try f finally prev match {
      case Some(p) => spark.conf.set(Key, p)
      case None    => spark.conf.unset(Key)
    }
  }

  /** The state operator must actually be RocksDB-backed — a provider
    * typo would silently fall back to config default otherwise. */
  private def assertRocksDB(q: StreamingQuery): Unit = {
    val metrics = q.lastProgress.stateOperators.head.customMetrics
    assert(metrics.keySet.stream.anyMatch(_.startsWith("rocksdb")),
      s"expected rocksdb state metrics, got ${metrics.keySet}")
  }

  private def dev(user: Long, typ: String, id: Long, minute: Int,
      value: Double): StreamDedup.Ev =
    StreamDedup.Ev(user, typ, id,
      Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), value)

  private def ev(id: Long, minute: Int, typ: String, user: Long = 1L,
      value: Double = 1.0): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user, typ,
      value, "{}")

  test("first-seen dedup state on RocksDB: stream == batch, dups dropped") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[StreamDedup.Ev]
      val q = StreamDedup.streaming(stream.toDS())
        .writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode("append").start()
      // batch 1: two keys; batch 2: replays of both + one new key —
      // the replays must be dropped by state persisted in RocksDB
      // across micro-batches, not by in-batch dedup
      stream.addData(dev(1, "click", 10, 1, 1.0), dev(2, "view", 11, 2, 2.0))
      q.processAllAvailable()
      stream.addData(dev(1, "click", 12, 3, 9.0), dev(2, "view", 13, 4, 9.0),
        dev(3, "click", 14, 5, 3.0))
      q.processAllAvailable()
      assertRocksDB(q)
      q.stop()

      val got = spark.table("rocksdb_dedup")
        .orderBy("user_id", "event_type").as[StreamDedup.Ev].collect().toSeq
      assert(got.map(_.event_id) == Seq(10L, 11L, 14L))
      val all = Seq(dev(1, "click", 10, 1, 1.0), dev(2, "view", 11, 2, 2.0),
        dev(1, "click", 12, 3, 9.0), dev(2, "view", 13, 4, 9.0),
        dev(3, "click", 14, 5, 3.0))
      val batch = StreamDedup.batch(all.toDF())
        .orderBy("user_id", "event_type").as[StreamDedup.Ev].collect().toSeq
      assert(got == batch)
    }
  }

  test("sessionizer state on RocksDB: watermark flush matches batch") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Ev]
      val q = StatefulSessions.streaming(
          stream.toDF().withWatermark("ts", "1 minute")).toDF()
        .writeStream.format("memory").queryName("rocksdb_sessions")
        .outputMode("append").start()
      // session events land in batch 1; the open session must survive
      // IN ROCKSDB across the batch boundary until the watermark event
      stream.addData(ev(0, 1, "click"), ev(1, 2, "click", value = 2.0),
        ev(2, 5, "view"))
      q.processAllAvailable()
      assert(spark.table("rocksdb_sessions").isEmpty) // still open
      stream.addData(ev(6, 45, "click"))
      q.processAllAvailable()
      assertRocksDB(q)
      q.stop()
      val flushed = spark.sql(
        "SELECT * FROM rocksdb_sessions WHERE user_id = 1").collect()
      assert(flushed.length == 1)
      assert(flushed.head.getAs[Timestamp]("session_start") ==
        Timestamp.valueOf("2024-01-01 00:01:00"))
      assert(flushed.head.getAs[Long]("n_events") == 3L)
      assert(flushed.head.getAs[Double]("total") == 4.0)
    }
  }

  test("top-k leaderboard state on RocksDB equals batch aggregate") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val b1 = Seq(StreamTopK.Scored("a", 5.0, 1),
        StreamTopK.Scored("a", 3.0, 2), StreamTopK.Scored("b", 1.0, 3))
      val b2 = Seq(StreamTopK.Scored("a", 4.0, 4),
        StreamTopK.Scored("a", 9.0, 5), StreamTopK.Scored("b", 2.0, 6))
      val stream = MemoryStream[StreamTopK.Scored]
      val q = StreamTopK.streaming(stream.toDS(), k = 2)
        .writeStream.format("memory").queryName("rocksdb_topk")
        .outputMode("update").start()
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      assertRocksDB(q)
      q.stop()
      // update-mode memory sink appends each batch's emissions; the
      // LAST board per key is the live leaderboard
      val streamed = spark.sql(
        """SELECT key, entries FROM (
          |  SELECT key, entries,
          |    row_number() OVER (PARTITION BY key ORDER BY mono DESC) rn
          |  FROM (SELECT key, entries,
          |        monotonically_increasing_id() AS mono FROM rocksdb_topk))
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

  test("funnel stage machine on RocksDB: chains across micro-batches") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val lim = 600000000L // 10 min deadline in µs
      val stream = MemoryStream[Ev]
      val q = StreamFunnel.streaming(stream.toDF(), deadlineUs = lim).toDF()
        .writeStream.format("memory").queryName("rocksdb_funnel")
        .outputMode("append").start()
      stream.addData(ev(0, 1, "view"), ev(1, 5, "click"),
        ev(2, 2, "view", user = 2L))
      q.processAllAvailable()
      // user 1's t1->t2 state must persist in RocksDB for the purchase
      stream.addData(ev(4, 9, "purchase"), ev(3, 30, "click", user = 2L))
      q.processAllAvailable()
      assertRocksDB(q)
      q.stop()
      val streamed = spark.sql(
        """SELECT user_id, t1, t2, t3 FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id
          |    ORDER BY coalesce(t3, t2, t1, 0) DESC) AS rn
          |  FROM rocksdb_funnel) WHERE rn = 1
          |ORDER BY user_id""".stripMargin).collect()
      val batch = StreamFunnel.batch(Seq(ev(0, 1, "view"), ev(1, 5, "click"),
          ev(2, 2, "view", user = 2L), ev(4, 9, "purchase"),
          ev(3, 30, "click", user = 2L)).toDF(), deadlineUs = lim)
        .toDF().select("user_id", "t1", "t2", "t3")
        .orderBy("user_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(!batch(0).isNullAt(3)) // user 1 completed within deadline
      assert(batch(1).isNullAt(2))  // user 2's late click didn't advance
    }
  }

  test("anomaly running stats on RocksDB: stream == batch") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Ev]
      val q = StreamAnomaly
        .streaming(stream.toDF(), minPeriods = 2, z = 1.0).toDF()
        .writeStream.format("memory").queryName("rocksdb_anomaly")
        .outputMode("append").start()
      val evs = (1 to 8).map(i =>
        ev(i.toLong, i, "click", value = if (i == 8) 50.0 else i.toDouble))
      stream.addData(evs.take(4): _*)
      q.processAllAvailable()
      stream.addData(evs.drop(4): _*) // (n, Σv, Σv²) carries over
      q.processAllAvailable()
      assertRocksDB(q)
      q.stop()
      val streamed = spark.sql(
        "SELECT * FROM rocksdb_anomaly ORDER BY event_id").collect()
      val batch = StreamAnomaly.batch(evs.toDF(), minPeriods = 2, z = 1.0)
        .toDF().orderBy("event_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(batch.last.getLong(3) == 1L) // the spike is flagged
    }
  }

  test("latest-snapshot upsert state on RocksDB == batch compaction") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Ev]
      val q = StreamLatest.streaming(stream.toDF()).toDF()
        .writeStream.format("memory").queryName("rocksdb_latest")
        .outputMode("append").start()
      val evs = Seq(ev(0, 1, "click", user = 1L, value = 1.0),
        ev(1, 5, "view", user = 1L, value = 2.0),
        ev(2, 3, "view", user = 2L, value = 3.0))
      stream.addData(evs: _*)
      q.processAllAvailable()
      // user 1 advances; user 2's OLDER event must lose to RocksDB state
      stream.addData(ev(3, 9, "click", user = 1L, value = 9.0),
        ev(4, 2, "click", user = 2L, value = 4.0))
      q.processAllAvailable()
      assertRocksDB(q)
      q.stop()
      val streamed = spark.sql(
        """SELECT user_id, us, event_id, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id
          |    ORDER BY us DESC, event_id DESC) AS rn FROM rocksdb_latest)
          |WHERE rn = 1 ORDER BY user_id""".stripMargin).collect()
      val batch = StreamLatest
        .batch((evs :+ ev(3, 9, "click", user = 1L, value = 9.0)
          :+ ev(4, 2, "click", user = 2L, value = 4.0)).toDF())
        .toDF().orderBy("user_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(batch.map(_.getLong(2)).toSeq == Seq(3L, 2L)) // winners held
    }
  }

  test("semantic near-dup gate state on RocksDB: cross-batch drop") {
    import graft.streaming.StreamSemDedup
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val docs = Seq(
        StreamSemDedup.EmbDoc(1L, Array(1.00f, 0.00f)),
        StreamSemDedup.EmbDoc(10L, Array(0.00f, 1.00f)),
        StreamSemDedup.EmbDoc(3L, Array(0.99f, 0.01f)))
      val (cents, _) = StreamSemDedup.fitCodebook(docs.toDS().toDF(),
        "vec_id", "embedding", nlist = 2, seed = 7L)
      val stream = MemoryStream[StreamSemDedup.EmbDoc]
      val q = StreamSemDedup.streaming(stream.toDS(), cents,
          threshold = 0.9, nassign = 2)
        .writeStream.format("memory").queryName("rocksdb_semdedup")
        .outputMode("append").start()
      stream.addData(docs.take(2): _*)
      q.processAllAvailable()
      // the paraphrase arrives a batch later: its ball's first arrival
      // must be held in RocksDB state to catch it
      stream.addData(docs(2))
      q.processAllAvailable()
      assertRocksDB(q)
      q.stop()
      val rows = spark.sql(
        "SELECT vec_id, keeper FROM rocksdb_semdedup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((3L, 1L)))
    }
  }
}
