package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Similarity, WindowOps}

/** Golden-value specs for the statistical / diagnostic operators — each
  * case is small enough to hand-compute, so the assertions pin exact
  * semantics (the sf0.01 oracle gate covers the at-scale behavior). */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  test("autocorrelation: alternating series has acf_1 = -1, acf_2 = +1") {
    val df = (1 to 12).map(i => ("g", i, (i % 2).toDouble))
      .toDF("grp", "t", "value")
    val row = Analytics.autocorrelation(df, "value", Seq("grp"), Seq("t"),
      Seq(1, 2)).collect().head
    assert(row.getAs[Double]("acf_1") == -1.0)
    assert(row.getAs[Double]("acf_2") == 1.0)
  }

  test("autocorrelation: groups too small for the lag yield null") {
    val df = Seq(("g", 1, 1.0)).toDF("grp", "t", "value")
    val row = Analytics.autocorrelation(df, "value", Seq("grp"), Seq("t"),
      Seq(1)).collect().head
    assert(row.isNullAt(row.fieldIndex("acf_1")))
  }

  test("docEntropy: two equiprobable words give ln 2 nats") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val row = Analytics.docEntropy(df, "doc_id", "text").collect().head
    assert(row.getAs[Long]("n_words") == 4L)
    assert(math.abs(row.getAs[Double]("entropy") - math.log(2)) < 1e-5)
  }

  test("zipfSlope: an exact 1/rank corpus fits slope -1") {
    // word_i appears 2520/i times (2520 divisible by 1..10) -> ln(cnt)
    // is EXACTLY linear in ln(rank) with slope -1
    val text = (1 to 10).flatMap(i => Seq.fill(2520 / i)(s"w$i"))
      .mkString(" ")
    val row = Analytics.zipfSlope(Seq((1L, text)).toDF("doc_id", "text"),
      "text").collect().head
    assert(row.getAs[Long]("n_vocab") == 10L)
    assert(math.abs(row.getAs[Double]("slope") + 1.0) < 1e-3)
  }

  test("quantileNormalize: mid-rank quantiles of a 4-group") {
    val df = Seq(("g", 1, 40.0), ("g", 2, 10.0), ("g", 3, 30.0),
      ("g", 4, 20.0)).toDF("grp", "id", "v")
    val got = Analytics.quantileNormalize(df, "v", Seq("grp"), Seq("id"))
      .orderBy("v").select("quantile").as[Double].collect().toSeq
    assert(got == Seq(0.125, 0.375, 0.625, 0.875))
  }

  test("gapDetect flags exactly the hole in a regular feed") {
    // 60 s cadence with one 600 s hole: mean gap = (9*60+600)/10 = 114 s,
    // threshold 228 s -> only the hole qualifies
    val ts = (0 to 9).scanLeft(0L)((acc, i) =>
      acc + (if (i == 5) 600L else 60L)).tail
    val df = ts.zipWithIndex.map { case (sec, i) =>
      ("g", i.toLong, new java.sql.Timestamp(sec * 1000L))
    }.toDF("grp", "id", "ts")
    val gaps = Analytics.gapDetect(df, "ts", Seq("grp"), Seq("id"))
      .collect()
    assert(gaps.length == 1)
    assert(gaps.head.getAs[Long]("gap_us") == 600L * 1000000L)
  }

  test("madOutliers: one gross spike against 1..9") {
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _))
      .toDF("grp", "v")
    val row = Analytics.madOutliers(df, "v", Seq("grp")).collect().head
    assert(row.getAs[Double]("median") == 5.5)
    assert(row.getAs[Double]("mad") == 2.5)
    assert(row.getAs[Long]("n_outliers") == 1L)
  }

  test("keySkewReport: 9-vs-1 split has gini 0.4") {
    val df = (Seq.fill(9)("A") :+ "B").toDF("k")
    val row = Analytics.keySkewReport(df, "k").collect().head
    assert(row.getAs[Long]("n_keys") == 2L)
    assert(row.getAs[Long]("n_rows") == 10L)
    assert(row.getAs[Double]("max_share") == 0.9)
    assert(row.getAs[Double]("gini") == 0.4)
  }

  test("distributedRank is dense, 1-based, and order-faithful") {
    val df = Seq(("c", 3L), ("a", 1L), ("b", 2L)).toDF("k", "v")
    val got = Analytics.distributedRank(df, Seq(col("v").desc))
      .orderBy("rank").select("k").as[String].collect().toSeq
    assert(got == Seq("c", "b", "a"))
  }

  test("editDistancePairs finds the near-copy and skips the stranger") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("jumps", "leaps") // same head, few edits
    val far = "zebra " * 10
    val df = Seq((1L, base), (2L, near), (3L, far.trim))
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(df, "text", "doc_id",
      maxDist = 10, prefixLen = 64, bandWidth = 8, anchorLen = 8)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    assert(pairs.head.getAs[Long]("dist") == 3L) // jumps -> leaps
  }

  test("pmiPairs: hand-computed PMI over a 4-doc corpus") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b d"))
      .toDF("doc_id", "text")
    val got = Analytics.pmiPairs(df, "text", "doc_id", minCount = 2)
      .collect()
    assert(got.length == 1) // only (a,b) co-occurs twice
    val r = got.head
    assert((r.getAs[String]("wa"), r.getAs[String]("wb")) == ("a", "b"))
    assert(r.getAs[Long]("c_ab") == 2L && r.getAs[Long]("c_a") == 3L)
    // PMI = ln(2*4 / (3*3))
    assert(math.abs(r.getAs[Double]("pmi") - math.log(8.0 / 9.0)) < 1e-5)
  }

  test("duplicateSentenceStats: verbatim sentence shared across docs") {
    val df = Seq((1L, "Hello world. Unique alpha."),
      (2L, "Hello world. Different beta.")).toDF("doc_id", "text")
    val got = Dedup.duplicateSentenceStats(df, "text", "doc_id")
      .orderBy("id").collect()
    assert(got.map(_.getAs[Long]("n_sentences")).toSeq == Seq(2L, 2L))
    assert(got.map(_.getAs[Long]("n_shared")).toSeq == Seq(1L, 1L))
    assert(got.head.getAs[Double]("shared_frac") == 0.5)
  }

  test("sortedNeighborhoodPairs: in-window near-copy found, stranger cut") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("jumps", "leaps")
    val far = ("zebra " * 12).trim
    val df = Seq((1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
    // n=3 < window, so ALL ordered pairs are candidates; only the
    // edit-distance kernel separates the near-copy from the stranger
    val pairs = Dedup.sortedNeighborhoodPairs(df, "text", "doc_id",
      window = 10, maxDist = 10).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("dist") == 3L)
    assert(pairs.head.getAs[Long]("rank_dist") >= 1L)
  }

  test("crossCorrelation: identical series at lead 0, inverted at lead 1") {
    val df = (1 to 12).map(i => (i, (i % 2).toDouble, (i % 2).toDouble))
      .toDF("t", "x", "y")
    val row = Analytics.crossCorrelation(df, "x", "y", Seq(), Seq("t"),
      Seq(0, 1)).collect().head
    assert(row.getAs[Double]("xcorr_0") == 1.0)
    assert(row.getAs[Double]("xcorr_1") == -1.0)
  }

  test("rollingCorrelation: co-linear columns give 1 once n >= 2") {
    val df = (1 to 6).map(i => (i, i.toDouble, 2.0 * i + 3.0))
      .toDF("t", "x", "y")
    val got = WindowOps.rollingCorrelation(df, "x", "y", n = 3,
        Seq(), Seq("t"))
      .orderBy("t").select("roll_corr").collect()
    assert(got.head.isNullAt(0)) // single point: undefined
    assert(got.tail.forall(_.getDouble(0) == 1.0))
  }

  test("rollingQuantile: trailing-3 medians over 1..5") {
    val df = (1 to 5).map(i => ("g", i, i.toDouble)).toDF("grp", "t", "v")
    val got = WindowOps.rollingQuantile(df, "v", q = 0.5, n = 3,
        Seq("grp"), Seq("t"))
      .orderBy("t").select("roll_q").as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.5, 2.0, 3.0, 4.0))
  }

  test("pqTopK with full-width re-rank equals the exact top-k") {
    // shortlist >= corpus means the ADC stage only PRUNES NOTHING and
    // the exact re-rank decides everything — so the result must match
    // cosineTopK exactly, whatever the codebooks did
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 20L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val exact = Similarity.cosineTopK(df, q, "vec_id", "embedding", 4)
      .orderBy("query_id", "rank").collect()
    val pq = Similarity.pqTopK(df, q, "vec_id", "embedding", 4,
        m = 2, nbits = 2, shortlist = 20, sampleRows = 20)
      .orderBy("query_id", "rank").collect()
    assert(pq.map(_.toString).toSeq == exact.map(_.toString).toSeq)
  }

  test("interpolateLinear fills interior gaps linearly, edges flat") {
    val df = Seq(("g", 1, Some(1.0)), ("g", 2, None), ("g", 3, None),
      ("g", 4, Some(4.0)), ("g", 5, None)).toDF("grp", "t", "v")
    val got = WindowOps.interpolateLinear(df, "v", Seq("grp"), Seq("t"))
      .orderBy("t").select("interp").as[Double].collect().toSeq
    assert(got == Seq(1.0, 2.0, 3.0, 4.0, 4.0))
  }
}
