package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Diagnostic: quantifies what the round-9 codebook-sample bias fix is
  * worth on an id-clustered corpus (ids correlated with a dominant
  * embedding direction — the crawl-time/shard layout real corpora
  * have). Fits two k-means codebooks on the SAME corpus:
  *
  *   biased   — the pre-fix draw: first `sampleN` rows BY ID
  *   unbiased — the production draw ([[graft.operators.Similarity
  *              .codebookSample]]): first `sampleN` by xxhash64(id)
  *
  * and reports, for each: quantization distortion (mean nearest-
  * centroid distance over the full corpus), cell-occupancy skew (share
  * of the corpus in the largest cell — cap pressure), empty-cell count
  * (wasted codebook capacity), and IVF top-k recall@5 against exact
  * brute force for hash-picked queries at ~10% nprobe. Driver-side on
  * purpose: the probe needs codebooks the public operators no longer
  * expose (the biased one), and 200k × 64 floats is driver-trivial.
  *
  * Usage: CodebookBiasProbe <dir> [embTable] [nlist] [sampleN]
  */
object CodebookBiasProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/e100c")
    val embTable = args.lift(1).getOrElse("embeddings_clustered")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, dir, embTable)
    val n = emb.count()
    val nlist = args.lift(2).map(_.toInt)
      .getOrElse(math.max(16, (3 * n / 1000).toInt))
    val sampleN = args.lift(3).map(_.toInt)
      .getOrElse(math.max(4096, 8 * nlist))
    println(s"corpus=$n nlist=$nlist sampleN=$sampleN table=$embTable")

    val biased = emb.orderBy(col("vec_id")).limit(sampleN)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().map(_.getSeq[Double](0).toArray)
    val unbiased = graft.operators.Similarity.codebookSample(
      emb, "vec_id", "embedding", sampleN)
    val corpus = emb.orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val vecs = corpus.map(_._2)

    def dist2(a: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
      s
    }
    def nearest(v: Array[Double], cents: Array[Array[Double]]): (Int, Double) = {
      var bi = 0; var bd = Double.MaxValue; var i = 0
      while (i < cents.length) {
        val d = dist2(v, cents(i)); if (d < bd) { bd = d; bi = i }; i += 1
      }
      (bi, bd)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      ab / math.sqrt(aa * bb)
    }

    // hash-picked query set, same for both codebooks
    val queries = corpus.sortBy { case (id, _) =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 7L)
    }.take(20)
    val exactTop = queries.map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }.toMap

    for ((label, sample) <- Seq("biased" -> biased, "unbiased" -> unbiased)) {
      val cents = graft.operators.LocalKMeans.fit(sample, nlist, 42L)._2
      // parallel full-corpus assignment
      val cells = new Array[Int](vecs.length)
      val dists = new Array[Double](vecs.length)
      java.util.stream.IntStream.range(0, vecs.length).parallel().forEach { i =>
        val (c, d) = nearest(vecs(i), cents); cells(i) = c; dists(i) = d
      }
      val occ = cells.groupBy(identity).map { case (c, xs) => c -> xs.length }
      val maxOcc = occ.values.max
      val empty = nlist - occ.size
      val distortion = dists.sum / dists.length
      // IVF recall@5 at ~10% and ~2% nprobe (the tight-probe regime is
      // where codebook quality shows up as recall, not just distortion)
      val byCell = corpus.indices.groupBy(cells)
      def recallAt(np: Int): Double = queries.map { case (qid, qv) =>
        val order = cents.indices
          .map(c => (dist2(qv, cents(c)), c)).sorted.take(np).map(_._2)
        val cand = order.flatMap(c => byCell.getOrElse(c, Nil))
        val top = cand.map(i => corpus(i))
          .filter(_._1 != qid)
          .map { case (id, v) => (id, cos(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
        (top & exactTop(qid)).size / 5.0
      }.sum / queries.length
      val np10 = math.max(1, nlist / 10)
      val np2 = math.max(1, nlist / 50)
      println(f"$label%-9s distortion=$distortion%.5f " +
        f"max_cell_frac=${maxOcc.toDouble / vecs.length}%.4f " +
        f"empty_cells=$empty%4d recall@5(np=$np10)=${recallAt(np10)}%.3f " +
        f"recall@5(np=$np2)=${recallAt(np2)}%.3f")
    }
    spark.stop()
  }
}
