package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative (BSP) operators — connected
  * components and PageRank re-derive their state every round, so without
  * truncation the logical plan grows ~3x per round (exponential
  * treeString, driver OOM by round ~15).
  *
  * Two modes, switched by `spark.graft.checkpoint.reliable`:
  *  - false (default): `localCheckpoint` — executor-local blocks, no
  *    distributed filesystem needed. Right for local[] runs and specs;
  *    on a real cluster a lost executor loses the blocks and fails the
  *    job (Spark cannot recompute past a truncated lineage).
  *  - true: reliable `checkpoint` to the directory named by
  *    `spark.graft.checkpoint.dir` (set this to HDFS/S3 on a cluster —
  *    the local-tmp fallback only makes specs self-contained). Survives
  *    executor loss: the 100 TB setting for any loop whose rounds are
  *    expensive enough that a restart-from-zero is unacceptable.
  *
  * Both are eager, so call sites keep their materialize-now semantics
  * (convergence checksums read the materialized state).
  */
object Lineage {
  val ReliableConf = "spark.graft.checkpoint.reliable"
  val DirConf = "spark.graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableConf).exists(_.toBoolean)
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(spark.conf.getOption(DirConf).getOrElse(
          sys.props("java.io.tmpdir") + "/graft-checkpoints"))
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** Release the storage behind a frame returned by [[cut]] (plus any
    * plain cache on it). `Dataset.unpersist` alone is a NO-OP on cut
    * frames — CacheManager never registered them; the blocks belong to
    * the checkpointed RDD inside the plan's `LogicalRDD` leaf, and in
    * reliable mode each cut also leaves checkpoint FILES that Spark
    * never deletes (`spark.cleaner.referenceTracking.cleanCheckpoints`
    * is off by default). Without this, iterative operators leak one
    * round's blocks/files per round across a long session. Only call on
    * a SUPERSEDED frame whose consumers have already materialized: a
    * freed cut frame cannot be recomputed (lineage is truncated by
    * design). Safe on non-cut frames — they fall through to the plain
    * unpersist: the checkpoint reclaim fires ONLY when the analyzed
    * plan IS the LogicalRDD leaf (i.e. the exact frame [[cut]]
    * returned). A derived frame is never walked for upstream leaves —
    * an input built over a caller-owned live checkpoint must not have
    * that checkpoint destroyed out from under the caller. */
  def free(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        lr.rdd.getCheckpointFile.foreach { dir =>
          try {
            val p = new org.apache.hadoop.fs.Path(dir)
            p.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch {
            // NonFatal only: an interrupt or OOM must propagate; a
            // failed delete is a discoverable leak, so name the path.
            case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"graft.Lineage.free: leaked checkpoint dir $dir " +
                  s"(${e.getClass.getSimpleName}: ${e.getMessage})")
          }
        }
      case _ => ()
    }
  }
}
