package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Scale probe for the lake fold-in contracts (round-13): drive the
  * steady-state increment loop — dedup increment k against the lake,
  * fold its survivors in, repeat — at the 100× corpus, and measure
  * what a 100 TB operator cares about:
  *  - per-increment wall stays O(increment) as the lake grows
  *    (the contract's whole point: never O(history));
  *  - the fold-in append is a small fraction of the increment's dedup
  *    cost (near-dup column), and the semantic rank-merge rewrite
  *    stays O(keeper table) regardless of corpus;
  *  - versus the naive alternative (re-BUILD the lake from the
  *    accumulated corpus each increment), measured on the last round.
  *
  * Usage: runMain graft.tools.ProfLakeCycle <dir> [nIncrements]
  * Output: LAKECYCLE <json> lines (one per increment per column) +
  * LAKEREBUILD comparison lines.
  */
object ProfLakeCycle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    val nInc = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    docs.count(); emb.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_lakecycle_").toString
    def sec[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // slices: 0 = initial lake (half the corpus), 1..nInc = increments
    // of equal size (the remaining half split evenly)
    val slice = pmod(col("doc_id"), lit(2 * nInc))
    val vslice = pmod(col("vec_id"), lit(2 * nInc))
    def docInc(k: Int) = docs.where(slice === (nInc + k - 1))
    def embInc(k: Int) = emb.where(vslice === (nInc + k - 1))

    // ---- near-dup column ------------------------------------------------
    val (_, tBuild) = sec {
      Dedup.writeBandedSignatures(docs.where(slice < nInc), "text",
        "doc_id", s"$root/sigs")
    }
    println(f"""LAKECYCLE {"col":"neardup","step":"build","sec":$tBuild%.1f}""")
    (1 to nInc).foreach { k =>
      val inc = docInc(k)
      val (survivors, tDedup) = sec {
        val pairs = Dedup.minhashLshCrossFromArtifacts(inc,
          spark.read.parquet(s"$root/sigs"), "text", "doc_id",
          shingleLen = 3, bands = 8, rowsPerBand = 2,
          minEstJaccard = 0.35)
        val removed = pairs.select(
          when(pmod(col("a"), lit(2 * nInc)) >= nInc, col("a"))
            .otherwise(col("b")).as("doc_id")).distinct()
        graft.operators.Lineage.cut(
          inc.join(removed, Seq("doc_id"), "left_anti"))
      }
      val (_, tAppend) = sec {
        Dedup.appendBandedSignatures(survivors, "text", "doc_id",
          s"$root/sigs")
      }
      val lakeRows = spark.read.parquet(s"$root/sigs").count()
      println(f"""LAKECYCLE {"col":"neardup","step":"inc$k","dedup_sec":$tDedup%.1f,"append_sec":$tAppend%.1f,"lake_rows":$lakeRows}""")
      graft.operators.Lineage.free(survivors)
      Dedup.releaseIntermediates()
      spark.catalog.clearCache()
    }
    // naive alternative on the LAST increment: rebuild the whole lake
    // from the accumulated corpus instead of appending
    val (_, tRebuild) = sec {
      Dedup.writeBandedSignatures(docs.where(slice < (2 * nInc - 1)),
        "text", "doc_id", s"$root/sigs_rebuild")
    }
    println(f"""LAKEREBUILD {"col":"neardup","sec":$tRebuild%.1f}""")
    // FUSED step (jobs 2+3, one signing pass) over an identical lake
    Dedup.writeBandedSignatures(docs.where(slice < nInc), "text",
      "doc_id", s"$root/sigs_f")
    (1 to nInc).foreach { k =>
      val (surv, t) = sec {
        Dedup.minhashLshLakeStep(docInc(k), "text", "doc_id",
          s"$root/sigs_f", shingleLen = 3, bands = 8, rowsPerBand = 2,
          minEstJaccard = 0.35)
      }
      println(f"""LAKECYCLE {"col":"neardup","step":"fused$k","sec":$t%.1f}""")
      graft.operators.Lineage.free(surv)
      Dedup.releaseIntermediates()
      spark.catalog.clearCache()
    }

    // ---- semantic column ------------------------------------------------
    val nlist = math.max(8, (3 * emb.count() / 1000).toInt)
    val (_, tSemBuild) = sec {
      Similarity.writeSemDedupArtifacts(emb.where(vslice < nInc),
        "vec_id", "embedding", s"$root/sem", nlist = nlist,
        nassign = 3, keeperCap = 250,
        sampleRows = math.max(4096, 8 * nlist))
    }
    println(f"""LAKECYCLE {"col":"sem","step":"build","sec":$tSemBuild%.1f,"nlist":$nlist}""")
    val cb = Similarity.readSemCodebook(spark, s"$root/sem")
    (1 to nInc).foreach { k =>
      val inc = embInc(k)
      val (survivors, tDedup) = sec {
        val removed = Similarity.semDedupCrossFromArtifacts(inc,
          spark.read.parquet(s"$root/sem/keepers"), cb, "vec_id",
          "embedding", threshold = 0.4, nassign = 3)
        graft.operators.Lineage.cut(
          inc.join(removed.select(col("id").as("vec_id")),
            Seq("vec_id"), "left_anti"))
      }
      val (_, tAppend) = sec {
        Similarity.appendSemKeepers(survivors, "vec_id", "embedding",
          s"$root/sem", keeperCap = 250, nassign = 3)
      }
      val keeperRows = spark.read.parquet(s"$root/sem/keepers").count()
      println(f"""LAKECYCLE {"col":"sem","step":"inc$k","dedup_sec":$tDedup%.1f,"append_sec":$tAppend%.1f,"keeper_rows":$keeperRows}""")
      graft.operators.Lineage.free(survivors)
      Dedup.releaseIntermediates()
      spark.catalog.clearCache()
    }
    // FUSED semantic step over an identical lake
    Similarity.writeSemDedupArtifacts(emb.where(vslice < nInc),
      "vec_id", "embedding", s"$root/sem_f", nlist = nlist,
      nassign = 3, keeperCap = 250,
      sampleRows = math.max(4096, 8 * nlist))
    (1 to nInc).foreach { k =>
      val (surv, t) = sec {
        Similarity.semDedupLakeStep(embInc(k), "vec_id", "embedding",
          s"$root/sem_f", threshold = 0.4, keeperCap = 250, nassign = 3)
      }
      println(f"""LAKECYCLE {"col":"sem","step":"fused$k","sec":$t%.1f}""")
      graft.operators.Lineage.free(surv)
      Dedup.releaseIntermediates()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
