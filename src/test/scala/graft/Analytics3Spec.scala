package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Round-6 batch 3: winsorize, Markov transitions, changepoint,
  * weighted median. */
class Analytics3Spec extends SparkTestBase {
  import spark.implicits._

  test("winsorize clips to the group's percentile band") {
    val df = (Seq.tabulate(99)(i => ("a", i + 1.0)) :+ ("a", 1000.0))
      .toDF("g", "v")
    val r = Analytics.winsorize(df, "v", Seq("g"), lo = 0.05, hi = 0.95)
    val clipped = r.agg(max("clipped"), min("clipped")).head()
    // p95 of 1..99,1000 ≈ 95.05 — the 1000 outlier is pulled in
    assert(clipped.getDouble(0) < 100.0)
    assert(clipped.getDouble(1) > 1.0) // low tail clipped up to ~p5
    assert(r.count() == 100) // row-preserving
  }

  test("transitionMatrix counts bigrams and row-normalizes") {
    def e(id: Long, u: Long, m: Int, typ: String) =
      (id, u, Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"), typ)
    val df = Seq(
      e(1, 1, 1, "view"), e(2, 1, 2, "click"), e(3, 1, 3, "view"),
      e(4, 1, 4, "click"), e(5, 2, 1, "view"), e(6, 2, 2, "buy")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val m = Analytics.transitionMatrix(df, "event_type", Seq("user_id"),
        Seq("ts", "event_id"))
      .orderBy("from_state", "to_state").collect()
    // view->click x2, click->view x1, view->buy x1
    assert(m.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq(("click", "view", 1L), ("view", "buy", 1L),
        ("view", "click", 2L)))
    val vc = m.find(r => r.getString(0) == "view" &&
      r.getString(1) == "click").get
    assert(vc.getDouble(3) == 666667d / 1e6) // q6(2/3)
  }

  test("changepointTop finds the mean-shift split") {
    // 10 points at 0, then 10 at 100 -> split at t=10, gap 100
    val rows = Seq.tabulate(20)(i =>
      ("a", i, if (i < 10) 0.0 else 100.0))
    val df = rows.toDF("k", "i", "v")
    val r = Analytics.changepointTop(df, "v", Seq("k"), Seq("i"))
      .head()
    assert(r.getLong(2) == 10L)
    assert(r.getDouble(1) == 100.0)
    assert(r.getLong(3) == 20L)
  }

  test("changepointTop ties take the earliest split") {
    val df = Seq(("a", 1, 0.0), ("a", 2, 10.0), ("a", 3, 0.0),
      ("a", 4, 10.0)).toDF("k", "i", "v")
    val r = Analytics.changepointTop(df, "v", Seq("k"), Seq("i")).head()
    assert(r.getLong(2) >= 1L && r.getLong(2) <= 3L)
    val again = Analytics.changepointTop(df, "v", Seq("k"), Seq("i"))
      .head()
    assert(r.getLong(2) == again.getLong(2)) // deterministic
  }

  test("weightedMedian: lower median by cumulative weight") {
    val df = Seq(("a", 1.0, 1L, 1L), ("a", 2.0, 1L, 2L),
      ("a", 3.0, 10L, 3L), ("b", 5.0, 1L, 4L))
      .toDF("g", "v", "w", "id")
    val r = Analytics.weightedMedian(df, "v", "w", Seq("g"), Seq("id"))
      .orderBy("g").collect()
    // a: total weight 12, half 6 -> first value whose cum >= 6 is 3.0
    assert(r(0).getDouble(1) == 3.0)
    assert(r(1).getDouble(1) == 5.0) // singleton
  }

  test("pca: dominant axis carries the variance, trace preserved") {
    import graft.operators.Similarity
    // variance 100 along dim 0, 1 along dim 1, 0 along dim 2
    val rows = Seq.tabulate(40) { i =>
      (i.toLong, Seq((i % 2 * 20 - 10).toFloat,
        (i % 4 / 2 * 2 - 1).toFloat, 3.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (n, ev, trace) = Similarity.pca(df, "embedding")
    assert(n == 40)
    assert(ev.length == 3)
    assert(math.abs(ev.sum - trace) < 1e-9 * math.max(1.0, trace))
    assert(math.abs(ev(0) - 100.0) < 1e-6) // dominant axis
    assert(math.abs(ev(1) - 1.0) < 1e-6)
    assert(math.abs(ev(2)) < 1e-9) // constant dim -> zero variance
    val gate = Similarity.pcaGate(df, "embedding").head()
    assert(gate.getLong(2) == 1L && gate.getLong(3) == 1L)
  }

  test("pca: empty and all-null input yields an n=0 gate, no crash") {
    import graft.operators.Similarity
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val (n0, ev0, tr0) = Similarity.pca(empty, "embedding")
    assert(n0 == 0L && ev0.isEmpty && tr0 == 0.0)
    val gate = Similarity.pcaGate(empty, "embedding").head()
    assert(gate.getLong(0) == 0L && gate.getLong(2) == 1L
      && gate.getLong(3) == 1L)
    val allNull = Seq((1L, null: Seq[Float]), (2L, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    assert(Similarity.pca(allNull, "embedding")._1 == 0L)
  }

  test("weightedMedian equal-weight reduces to lower median") {
    val df = Seq.tabulate(4)(i => ("a", (i + 1).toDouble, 1L, i.toLong))
      .toDF("g", "v", "w", "id")
    val r = Analytics.weightedMedian(df, "v", "w", Seq("g"), Seq("id"))
      .head()
    assert(r.getDouble(1) == 2.0) // cum 2 of 4 reaches half at v=2
  }
}
