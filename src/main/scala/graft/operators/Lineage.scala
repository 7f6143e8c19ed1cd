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
}
