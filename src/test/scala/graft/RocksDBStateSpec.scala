package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamDedup

/** The keyed streaming state must run unchanged on the disk-backed
  * RocksDB state store — the provider a 100 TB cluster uses when state
  * (dedup keys, open sessions, leaderboards) outgrows executor heap.
  * HDFSBackedStateStoreProvider keeps every version's map on-heap;
  * RocksDB keeps working set in native memory + SST files on disk, so
  * per-key state size stops being bounded by the JVM. Same operator
  * code, one config — this spec pins that the swap is really exercised
  * (rocksdb metrics present in the query progress) and changes nothing
  * about the answers.
  */
class RocksDBStateSpec extends SparkTestBase {
  import spark.implicits._

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ev(user: Long, typ: String, id: Long, minute: Int,
      value: Double): StreamDedup.Ev =
    StreamDedup.Ev(user, typ, id,
      Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), value)

  test("first-seen dedup state on RocksDB: stream == batch, dups dropped") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[StreamDedup.Ev]
      val q = StreamDedup.streaming(stream.toDS())
        .writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode("append").start()
      // batch 1: two keys; batch 2: replays of both + one new key —
      // the replays must be dropped by state persisted in RocksDB
      // across micro-batches, not by in-batch dedup
      stream.addData(ev(1, "click", 10, 1, 1.0), ev(2, "view", 11, 2, 2.0))
      q.processAllAvailable()
      stream.addData(ev(1, "click", 12, 3, 9.0), ev(2, "view", 13, 4, 9.0),
        ev(3, "click", 14, 5, 3.0))
      q.processAllAvailable()
      // the state operator must actually be RocksDB-backed
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.stream.anyMatch(_.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got ${metrics.keySet}")
      q.stop()

      val got = spark.table("rocksdb_dedup")
        .orderBy("user_id", "event_type").as[StreamDedup.Ev].collect().toSeq
      assert(got.map(_.event_id) == Seq(10L, 11L, 14L))
      val all = Seq(ev(1, "click", 10, 1, 1.0), ev(2, "view", 11, 2, 2.0),
        ev(1, "click", 12, 3, 9.0), ev(2, "view", 13, 4, 9.0),
        ev(3, "click", 14, 5, 3.0))
      val batch = StreamDedup.batch(all.toDF())
        .orderBy("user_id", "event_type").as[StreamDedup.Ev].collect().toSeq
      assert(got == batch)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
