package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Lineage, Sampling}

/** STREAMING SHARD LAYOUT — the incremental twin of the batch
  * corpus→shards arc ([[graft.operators.Sampling.shardAssign]] +
  * `writeShards`): each micro-batch of admitted documents APPENDS to
  * the training-shard layout instead of re-laying the corpus out.
  *
  * The only state is a RUNNING-WEIGHT CURSOR, one long versioned per
  * batch in the lake (`cursor/cursor_b<k>`, init `cursor/cursor_init`
  * — the [[StreamLakeIngest]] versioned-snapshot discipline, same
  * newest-older-than-this-batch selection and pruning rule). A batch
  * lays its rows out in the deterministic within-batch order
  * (md5-of-id, then id — the shardAssign order), continues the
  * running weight FROM the cursor, and lands them under its own
  * `layout/inc_b<batchId>/shard=N/` directories:
  *
  *  - NEW SHARDS ONLY: a batch's first shard index is
  *    ⌊cursor / shardWeight⌋ — it may APPEND files to the one shard
  *    left open by the previous batch (a second file in that shard's
  *    directory set, ordered by `offset`, never a rewrite) and
  *    otherwise creates strictly newer shard directories. Closed
  *    shards' files are never touched, so a trainer can stream shard
  *    k the moment shard k+1 exists.
  *  - EXACTLY-ONCE on replay: the cursor read excludes the batch's
  *    own version, and both writes (the inc layout dir and the new
  *    cursor) are batch-id-derived Overwrite — a replayed batch sees
  *    exactly what its first attempt saw and rewrites exactly what it
  *    wrote.
  *  - The global layout order is (batch, md5(id), id): readers union
  *    the `inc_b*` roots; a shard spanning a batch boundary holds
  *    files from two inc dirs with `offset` carrying the intra-shard
  *    order, so file order never matters (the writeShards contract).
  *
  * At 100 TB the per-batch cost is the increment's metadata-only sort
  * plus task-local directory fan-out — the corpus never re-shuffles,
  * and the layout grows by O(increment) files per batch (compactable
  * per closed shard, offline, without moving open ones).
  */
object StreamShardLayout {

  /** Create an empty layout: the zero cursor snapshot. */
  def initLayout(spark: SparkSession, layoutRoot: String): Unit =
    writeCursor(spark, s"$layoutRoot/cursor/cursor_init", 0L)

  private def writeCursor(spark: SparkSession, path: String,
      total: Long): Unit = {
    import spark.implicits._
    Seq(total).toDF("total_weight").repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  private def readCursor(spark: SparkSession, path: String): Long = {
    val rows = spark.read.parquet(path).select(col("total_weight"))
      .collect()
    require(rows.length == 1,
      s"$path is not a one-row cursor snapshot (${rows.length} rows)")
    rows.head.getLong(0)
  }

  /** One micro-batch appended to the layout. Pure function of (batch
    * rows, the cursor visible to `batchId`); writes
    * `layout/inc_b<batchId>/shard=N/` and `cursor/cursor_b<batchId>`,
    * both Overwrite — replay-idempotent. Returns the batch's
    * assignment (idCol, weightCol, shard, offset), already landed. */
  def appendIncrement(batch: DataFrame, layoutRoot: String,
      idCol: String, weightCol: String, shardWeight: Long,
      batchId: Long, salt: String = "graft"): DataFrame = {
    val spark = batch.sparkSession
    val cursorPath = StreamLakeIngest.versionBefore(spark,
      s"$layoutRoot/cursor", "cursor", batchId)
    val start = readCursor(spark, cursorPath)
    val assigned = Lineage.cut(Sampling.shardAssign(batch, idCol,
      weightCol, shardWeight, salt, startWeight = start))
    // the assignment is range-ordered by the layout key, so this write
    // fans out task-locally with ZERO shuffle (the writeShards shape)
    assigned.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$layoutRoot/layout/inc_b$batchId")
    val batchWeight = assigned.agg(
      coalesce(sum(col(weightCol)), lit(0L))).collect().head.getLong(0)
    writeCursor(spark, s"$layoutRoot/cursor/cursor_b$batchId",
      start + batchWeight)
    assigned
  }

  /** Periodic maintenance: fold every CLOSED increment into one
    * `base` directory — the listing-cost remedy for a long-lived
    * stream (readLayout otherwise unions one scan per batch), exactly
    * like the hash/sig lakes' [[StreamLakeIngest.compact]] and
    * through the SAME crash-resume manifest protocol (shared code).
    * The newest increment always stays out (it may belong to a
    * replayable batch); the open shard's rows may split between
    * `base` and that increment — `offset` carries the order, so
    * readers never notice. Run BETWEEN batches under the
    * single-maintainer contract (no concurrent reader during the
    * promote window; the `_live` pointer option is a lake-column
    * protocol and does not apply to the partitioned layout). */
  def compactLayout(spark: SparkSession, layoutRoot: String): Unit =
    StreamLakeIngest.compactDirWith(spark, s"$layoutRoot/layout",
      dirs => dirs.map(spark.read.parquet(_))
        .reduce(_.unionByName(_)),
      (df, path) => df.write.mode("overwrite").partitionBy("shard")
        .parquet(path))

  /** The cumulative layout: every batch's landed assignment, with the
    * partition-discovered `shard` column. A shard spanning batches
    * reads back from several inc roots; (shard, offset) is the total
    * order. */
  def readLayout(spark: SparkSession, layoutRoot: String): DataFrame = {
    val root = new Path(s"$layoutRoot/layout")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("inc_b") || n == "base") && !n.startsWith("_")
      }
      .map(_.toString).sorted
    require(incs.nonEmpty,
      s"$layoutRoot/layout holds no increments — run appendIncrement")
    // one read per increment root, unioned: partition discovery needs
    // each root's shard=N layout on its own (a multi-root read can't
    // see through the non-partition inc_b<k> segment). The plan grows
    // by one scan per batch — the same listing cost curve as the
    // hash/sig lakes, and the same remedy: periodic compaction of
    // CLOSED shards into a base increment, offline, never moving the
    // open one.
    incs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** Drive a stream of (idCol, weightCol) rows through the append
    * loop — the landing half of the streamed corpus→trainer arc
    * (compose after [[StreamLakeIngest.ingestFull]], whose admitted
    * increments carry `n_tokens`). Checkpoint holds only source
    * offsets; all layout state is the lake cursor. */
  def ingest(stream: DataFrame, layoutRoot: String,
      checkpointDir: String, idCol: String, weightCol: String,
      shardWeight: Long, salt: String = "graft"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val assigned = appendIncrement(batch, layoutRoot, idCol,
          weightCol, shardWeight, batchId, salt)
        Lineage.free(assigned)
        graft.operators.Dedup.releaseIntermediates()
      }
      .start()
}
