package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Curation, Similarity}

/** Round-6 analytics: snapshot diff, budgeted selection, hard
  * negatives, column profiling, classical decomposition. */
class Analytics2Spec extends SparkTestBase {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    val old = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val neu = Seq((2L, 20.0), (3L, 31.0), (4L, 40.0)).toDF("k", "v")
    val d = Analytics.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    assert(d.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
    val changed = d(1)
    assert(changed.getDouble(2) == 30.0 && changed.getDouble(3) == 31.0)
  }

  test("snapshotDiff null-safe value compare") {
    val old = Seq((1L, Some(1.0)), (2L, None)).toDF("k", "v")
    val neu = Seq((1L, None), (2L, None): (Long, Option[Double]))
      .toDF("k", "v")
    val d = Analytics.snapshotDiff(old, neu, Seq("k"), Seq("v")).collect()
    // 1: value->null is a change; 2: null==null is unchanged
    assert(d.map(_.getLong(0)).toSeq == Seq(1L))
    assert(d.head.getString(1) == "changed")
  }

  test("budgetedSelect keeps top rows within the share, never empties") {
    val docs = Seq(
      ("a", 1L, 60L), ("a", 2L, 30L), ("a", 3L, 10L),
      ("b", 4L, 5L) // singleton group: kept via the rank-1 guard
    ).toDF("source", "doc_id", "n_chars")
    val r = Curation.budgetedSelect(docs, "source", "doc_id",
      "n_chars", "n_chars", share = 0.5).orderBy("doc_id").collect()
    // a: total 100, budget 50 -> 60 exceeds but rank 1 keeps it; 30
    // would push cum to 90 -> out; b: 5 <= 2.5 fails but rank 1 keeps
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 4L))
  }

  test("budgetedSelect fills up to the boundary inclusively") {
    val docs = Seq(("a", 1L, 50L), ("a", 2L, 50L), ("a", 3L, 1L))
      .toDF("source", "doc_id", "n_chars")
    val r = Curation.budgetedSelect(docs, "source", "doc_id",
      "n_chars", "n_chars", share = 0.5).collect()
    // total 101, budget 50.5: first 50 fits, second hits 100 > 50.5
    assert(r.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("hardNegatives excludes same-label neighbors") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.01f), 0),  // same label: excluded
      (2L, Seq(1.0f, 0.1f), 1),   // closest different-label
      (3L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(emb, emb.where(col("vec_id") === 0),
      "vec_id", "embedding", "label", k = 2).orderBy("rank").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 3L))
  }

  test("profileColumns: one row per column with exact stats") {
    val df = Seq((1.0, Some(2.0)), (1.0, None), (3.0, Some(4.0)))
      .toDF("x", "y")
    val p = Analytics.profileColumns(df, Seq("x", "y"))
      .orderBy("col_name").collect()
    val x = p(0); val y = p(1)
    assert(x.getString(0) == "x" && x.getLong(1) == 3 &&
      x.getLong(2) == 0 && x.getLong(3) == 2 &&
      x.getDouble(4) == 1.0 && x.getDouble(5) == 3.0)
    assert(y.getString(0) == "y" && y.getLong(2) == 1 &&
      y.getLong(3) == 2 && y.getDouble(5) == 4.0)
  }

  test("classicalDecompose: v = trend + seasonal + resid on full windows") {
    // 3 days of hourly data: base 100 + hour-of-day wave + tiny noise
    val rows = for (d <- 0 until 3; h <- 0 until 24) yield
      ("a", Timestamp.valueOf(f"2024-01-0${d + 1} $h%02d:00:00"),
        100.0 + (h % 12) + d * 0.1)
    val df = rows.toDF("k", "hr", "v")
    val r = Analytics.classicalDecompose(df, "hr", "v", Seq("k"), 24)
    val full = r.where(col("trend").isNotNull).collect()
    assert(full.nonEmpty)
    // additive identity holds exactly at the quantization grid
    full.foreach { row =>
      val v = row.getDouble(2); val t = row.getDouble(3)
      val s = row.getDouble(4); val e = row.getDouble(5)
      assert(math.abs(v - t - s - e) < 1e-9,
        s"decomposition must reassemble: $v vs ${t + s + e}")
    }
    // edge rows (first/last half-day) have no full window
    val edges = r.where(col("trend").isNull).count()
    assert(edges == 23) // 12 leading + 11 trailing
  }

  test("classicalDecompose seasonal sums to ~0 over one period") {
    val rows = for (d <- 0 until 4; h <- 0 until 24) yield
      ("a", Timestamp.valueOf(f"2024-01-0${d + 1} $h%02d:00:00"),
        50.0 + (if (h < 12) 5.0 else -5.0))
    val df = rows.toDF("k", "hr", "v")
    val season = Analytics.classicalDecompose(df, "hr", "v", Seq("k"), 24)
      .where(col("seasonal").isNotNull)
      .select(col("hr"), col("seasonal")).collect()
      .groupBy(_.getTimestamp(0).toLocalDateTime.getHour)
      .map(_._2.head.getDouble(1))
    assert(math.abs(season.sum) < 1e-4)
  }
}
