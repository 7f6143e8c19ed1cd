package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Operator-only LSH scale probe (the q51 GATE is quadratic by
  * construction — its exact oracle side scores all pairs; this isolates
  * the production operator and shows how the planes/tables dials keep
  * it sub-quadratic as the corpus grows).
  *
  * Usage: runMain graft.tools.ProfLshScale <dir> [threshold]
  * Prints, per parameterization: wall sec (min of 2), output pairs,
  * recall vs the exact ground truth (computed once, cached).
  */
object ProfLshScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx1")
    val thr = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    println(s"corpus: $n vectors from $dir, threshold $thr")

    val t0 = System.nanoTime()
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = thr, maxRows = 1000000)
      .select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    println(f"exact ground truth: $nExact pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    for ((nl, na) <- Seq((16, 4), (32, 4), (48, 5))) {
      def run(): (Double, Long) = {
        val s = System.nanoTime()
        val out = Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
          threshold = thr, nlist = nl, nassign = na)
        val c = out.count()
        val sec = (System.nanoTime() - s) / 1e9
        Dedup.releaseIntermediates()
        (sec, c)
      }
      val (sec1, c1) = run()
      val (sec2, _) = run()
      val hits = exact.join(
        Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
          threshold = thr, nlist = nl, nassign = na)
          .select(col("a"), col("b")),
        Seq("a", "b"), "left_semi").count()
      Dedup.releaseIntermediates()
      val rec = if (nExact == 0) Double.NaN else hits.toDouble / nExact
      println(f"ivf nlist=$nl%2d nassign=$na%d  sec=${math.min(sec1, sec2)}%6.2f  " +
        f"pairs=$c1%8d  recall=$rec%.3f")
    }

    for ((p, t) <- Seq((4, 8), (8, 16), (12, 24))) {
      def run(): (Double, Long) = {
        val s = System.nanoTime()
        val out = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          threshold = thr, numPlanes = p, numTables = t, multiProbe = true)
        val c = out.count()
        val sec = (System.nanoTime() - s) / 1e9
        Dedup.releaseIntermediates()
        (sec, c)
      }
      val (sec1, c1) = run()
      val (sec2, _) = run()
      val hits = exact.join(
        Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          threshold = thr, numPlanes = p, numTables = t, multiProbe = true)
          .select(col("a"), col("b")),
        Seq("a", "b"), "left_semi").count()
      Dedup.releaseIntermediates()
      val rec = if (nExact == 0) Double.NaN else hits.toDouble / nExact
      println(f"planes=$p%2d tables=$t%2d  sec=${math.min(sec1, sec2)}%6.2f  " +
        f"pairs=$c1%8d  recall=$rec%.3f")
    }
    spark.stop()
  }
}
