package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

object ProfQ51 extends App {
  val spark = SparkSession.builder().master("local[32]")
    .withExtensions(new graft.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val emb = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
  emb.count()

  def time(label: String)(act: => Long): Unit = {
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = act
      println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
  }

  // piece 1: index build (explode tableKeys) -- via the public pairs API
  // with an impossible threshold and counting subplans through SQL
  import Similarity._
  val np = 4; val nt = 8; val dim = 64; val seed = 42L
  val planesCol = (t: Int) => randomPlanes(np, dim, seed + t)
  def tk(vec: org.apache.spark.sql.Column) =
    explode(array((0 until nt).map { t =>
      struct(lit(t).as("t"), hyperplaneBucket(vec, planesCol(t)).as("bkt"))
    }: _*))
  def mpk(vec: org.apache.spark.sql.Column) =
    explode(flatten(array((0 until nt).map { t =>
      val bkt = hyperplaneBucket(vec, planesCol(t))
      array((-1 until np).map { i =>
        val probed = if (i < 0) bkt else bkt.bitwiseXOR(lit(1L << i))
        struct(lit(t).as("t"), probed.as("bkt"))
      }: _*)
    }: _*)))

  val bucketed = emb.select(col("vec_id").as("id"), tk(col("embedding")).as("tb"))
  val left = emb.select(col("vec_id").as("id"), mpk(col("embedding")).as("tb"))
  time("index")(bucketed.count())
  time("probes")(left.count())
  val raw = left.select(col("tb"), col("id").as("a"))
    .join(bucketed.select(col("tb"), col("id").as("b")), Seq("tb"))
    .where(col("a") < col("b"))
  time("rawjoin")(raw.count())
  val cand = raw.select(col("a"), col("b")).distinct()
  time("distinct")(cand.count())
  val va = emb.select(col("vec_id").as("a"), col("embedding").as("va"),
    l2Norm(col("embedding")).as("na"))
  val vb = emb.select(col("vec_id").as("b"), col("embedding").as("vb"),
    l2Norm(col("embedding")).as("nb"))
  val full = cand.join(va, Seq("a")).join(vb, Seq("b"))
    .select(col("a"), col("b"),
      round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_sim"))
    .where(col("cos_sim") >= 0.3)
  time("full")(full.count())
  spark.stop()
}
