package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Attribution probe for the q192/q87 above-band drifts (verdict r15
  * #3): time each composition's stages in one JVM — q192's signature-
  * artifact write vs the LSH cross vs the exact-pair oracle side, and
  * q87's decontamination scan vs pair build vs CC vs the filter+chunk
  * tail — so the round-over-round swing is attributed to a stage (or
  * to none, i.e. machine context) with numbers. Same playbook as
  * ProfQ162Q94. */
object ProfQ192Q87 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan
    val lakeRoot = java.nio.file.Files
      .createTempDirectory("graft_prof_lake").toString
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        Dedup.releaseIntermediates()
        spark.catalog.clearCache()
        s
      }
      println(f"PROF $name%-24s min=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def timeU(name: String)(run: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run
        val s = (System.nanoTime() - t0) / 1e9
        Dedup.releaseIntermediates()
        spark.catalog.clearCache()
        s
      }
      println(f"PROF $name%-24s min=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // ---- q192 stages
    val even = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val odd = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    timeU("q192_sig_write") {
      Dedup.writeBandedSignatures(even, "text", "doc_id",
        s"$lakeRoot/sigs_${System.nanoTime()}")
    }
    val sigPath = s"$lakeRoot/sigs_fixed"
    Dedup.writeBandedSignatures(even, "text", "doc_id", sigPath)
    time("q192_lsh_cross") {
      Dedup.minhashLshCrossFromArtifacts(odd,
        spark.read.parquet(sigPath), "text", "doc_id",
        shingleLen = 3, bands = 8, rowsPerBand = 2, minEstJaccard = 0.35)
    }
    time("q192_exact_side") {
      Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id",
          shingleLen = 3, minJaccard = 0.5, docFreqCap = 1000)
        .where(pmod(col("a"), lit(2)) =!= pmod(col("b"), lit(2)))
    }
    time("q192_full") {
      graft.SparkEntry.queries("q192_lake_artifacts")(spark, sfDir)
    }
    // ---- q87 stages
    val bench = docs.where(col("doc_id") < 10)
    val train = docs.where(col("doc_id") >= 10)
    time("q87_decon") {
      Dedup.contaminatedDocs(train, bench, "text", "doc_id",
        windowLen = 50)
    }
    time("q87_pairs") {
      val contaminated = Dedup.contaminatedDocs(train, bench, "text",
        "doc_id", windowLen = 50).select(col("id").as("doc_id"))
      val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      Dedup.ngramJaccardPairsPrefix(clean, "text", "doc_id",
        shingleLen = 3, minJaccard = 0.5, docFreqCap = 1000)
    }
    time("q87_pairs_cc") {
      val contaminated = Dedup.contaminatedDocs(train, bench, "text",
        "doc_id", windowLen = 50).select(col("id").as("doc_id"))
      val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      val pairs = Dedup.ngramJaccardPairsPrefix(clean, "text", "doc_id",
        shingleLen = 3, minJaccard = 0.5, docFreqCap = 1000)
      Dedup.duplicateComponents(pairs, "a", "b")
    }
    time("q87_full") {
      graft.SparkEntry.queries("q87_curation_v2")(spark, sfDir)
    }
    spark.stop()
  }
}
