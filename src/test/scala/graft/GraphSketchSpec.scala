package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Graph, Retrieval, Sampling, Sketches}
import graft.streaming.StreamCusum

/** Round-6 operators: BM25 retrieval, integer-fixed-point PageRank,
  * weighted sampling, sketch gates, CUSUM (batch fold + streaming twin).
  */
class GraphSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark hash merge spark spark", "a", 28L),
    (2L, "spark table scan row batch", "a", 26L),
    (3L, "sort window line value key", "a", 26L),
    (4L, "hash merge hash merge hash", "b", 26L),
    (5L, "the a an of to in for", "b", 21L)
  ).toDF("doc_id", "text", "source", "n_chars")

  test("bm25: docs containing query terms outrank docs without, k respected") {
    val top = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "hash"), k = 3).collect()
    assert(top.length == 3)
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L)) // rank column
    val byRank = top.sortBy(_.getLong(2)).map(_.getLong(0)).toSeq
    // doc 3 and 5 contain neither term -> never retrieved
    assert(!byRank.contains(3L) && !byRank.contains(5L))
    // doc 1 (3×spark + 1×hash) beats doc 2 (1×spark)
    assert(byRank.head == 1L)
    assert(top.forall(_.getDouble(1) > 0.0))
  }

  test("rrf fusion: rank-sum semantics, missing-list docs score lower, " +
      "per-query variant partitions") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((11L, 1L), (13L, 2L)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 11 is in both lists -> 1/62 + 1/61 beats every single-list doc
    assert(fused.head._1 == 11L && fused.head._3 == 1L)
    val byDoc = fused.map(t => t._1 -> t._2).toMap
    assert(math.abs(byDoc(11L) - (1.0 / 62 + 1.0 / 61)) < 1e-9)
    assert(math.abs(byDoc(10L) - 1.0 / 61) < 1e-9)
    // 10 (rank 1 lexical) vs 13 (rank 2 semantic): 1/61 > 1/62
    assert(byDoc(10L) > byDoc(13L))
    assert(fused.map(_._3).toSeq == (1L to fused.length))
    // per-query: fusion and ranking stay within each query_id
    val lexQ = Seq((1L, 10L, 1L), (2L, 11L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val semQ = Seq((1L, 11L, 1L), (2L, 11L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val perQ = Retrieval.rrfFuse(Seq(lexQ, semQ), "doc_id", k = 1,
        queryCols = Seq("query_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // query 1: docs 10/11 tie at 1/61 -> doc-id tie-break picks 10
    assert(perQ == Map(1L -> 10L, 2L -> 11L))
  }

  test("rankingMetrics: hand-computed recall@k and nDCG@k, empty " +
      "intersection scores 0.0") {
    val ranked = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val gold = Seq((2L, 1L), (3L, 2L), (9L, 3L)).toDF("doc_id", "rank")
    val r = Retrieval.rankingMetrics(ranked, gold, "doc_id", k = 3)
      .collect().head
    def t(pos: Long): BigDecimal =
      BigDecimal(math.log(2.0) / math.log(pos + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(r.getDouble(2) == r6(2.0 / 3.0)) // recall
    // hits at ranked positions 2,3; ideal over gold positions 1,2,3
    val dcg = (t(2) + t(3)).toDouble
    val idcg = (t(1) + t(2) + t(3)).toDouble
    assert(r.getDouble(3) == r6(dcg / idcg))
    val none = Retrieval.rankingMetrics(ranked,
      Seq((7L, 1L)).toDF("doc_id", "rank"), "doc_id", k = 3)
      .collect().head
    assert(none.getLong(1) == 0L && none.getDouble(2) == 0.0 &&
      none.getDouble(3) == 0.0)
    // per-query: a hitless query still reports a 0.0 row
    val rq = Seq((1L, 10L, 1L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val gq = Seq((1L, 10L, 1L), (2L, 99L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val pm = Retrieval.rankingMetrics(rq, gq, "doc_id", k = 3,
        queryCols = Seq("query_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    assert(pm == Seq((1L, 1L, 1.0, 1.0), (2L, 0L, 0.0, 0.0)))
  }

  test("labelPropagation: two triangles joined by a bridge settle " +
      "into two communities (hand-traced 4 rounds)") {
    // triangles {1,2,3} and {10,11,12}, bridge 3-10. Deterministic
    // sync LPA with smallest-label ties, traced by hand:
    // r1: 1->2 2->1 3->1 10->3 11->10 12->10
    // r2: 1->1 2->1 3->1 10->10 11->3 12->3
    // r3: 1->1 2->1 3->1 10->3 11->3 12->3   r4: stable
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
      .toDF("src", "dst")
    val r = Graph.labelPropagation(edges, "src", "dst", iters = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 3L), (11L, 3L), (12L, 3L)))
    Graph.releaseIntermediates()
  }

  test("labelPropagationConvergence: per-round churn reaches 0 once " +
      "the labels settle (hand-traced triangle)") {
    // K3 on {1,2,3}: r1 relabels all three (1->2, 2->1, 3->1),
    // r2 only node 1 (2->1), r3/r4 are stable
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.labelPropagationConvergence(edges, "src", "dst",
        iters = 4)
      .orderBy("round").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1L, 3L), (2L, 1L), (3L, 0L), (4L, 0L)))
    Graph.releaseIntermediates()
  }

  test("pagerank: regular graph is an exact fixed point at mass 1.0") {
    // triangle: every node deg 2 — gather is exactly one unit, so the
    // integer update returns unit/8 + 7·unit/8 = unit every round
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val m = Graph.pageRankMass(tri, "a", "b", iters = 5).collect()
    assert(m.length == 3 && m.forall(_.getDouble(1) == 1.0))
    Graph.releaseIntermediates()
  }

  test("pagerank: hub outranks leaves and mass is conserved") {
    val star = (2L to 9L).map(i => (1L, i)).toDF("a", "b")
    val m = Graph.pageRankMass(star, "a", "b", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) > m(2L) * 3)            // hub dominates
    assert((2L to 9L).map(m).distinct.size == 1) // leaves symmetric
    val total = m.values.sum
    assert(math.abs(total - 9.0) < 1e-6) // truncation loses < 1e-12/term
    Graph.releaseIntermediates()
  }

  test("weighted sampling: k per group, deterministic, weight-sensitive") {
    val heavy = docs.withColumn("n_chars",
      when($"doc_id" === 3L, lit(1000000L)).otherwise($"n_chars"))
    val s1 = Sampling.weightedSamplePerGroup(heavy, "source", "doc_id",
      "n_chars", k = 2).select("doc_id").as[Long].collect().sorted
    val s2 = Sampling.weightedSamplePerGroup(heavy, "source", "doc_id",
      "n_chars", k = 2).select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == s2.toSeq)          // reproducible
    assert(s1.length == 4)                // 2 per source
    assert(s1.contains(3L))               // ~sure thing at weight 1e6
  }

  test("cms heavy-hitter gate: estimates within bounds, exact counts") {
    val ev = (1 to 400).map(i => (i.toLong % 4, "x"))
      .toDF("user_id", "pad")
    val gate = Sketches.cmsHeavyHitterGate(ev, "user_id", topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(gate.length == 4)
    assert(gate.forall(_._2 == 100L))
    assert(gate.forall(_._3))
  }

  test("bloom decontamination: never misses an exactly-contaminated doc") {
    val bench = Seq((0L, "A" * 30 + "BENCHMARK-CANARY-SEQUENCE-" + "B" * 30))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "x" * 20 + "BENCHMARK-CANARY-SEQUENCE-" + "B" * 30), // copies 50+ chars
      (11L, "clean text " * 20),
      (12L, "A" * 30 + "BENCHMARK-CANARY-SEQUENCE-" + "B" * 10) // copies a window too
    ).toDF("doc_id", "text")
    val exact = Dedup.contaminatedDocs(train, bench, "text", "doc_id")
      .select("id").as[Long].collect().toSet
    val flagged = Sketches.bloomContaminatedDocs(train, bench, "text",
      "doc_id").select("id").as[Long].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(flagged)) // zero false negatives, by construction
  }

  test("cusum fold: hand-computed alarms and running maximum") {
    val pts = Seq(("a", 1, 5.0), ("a", 2, 10.0), ("a", 3, 3.0))
      .toDF("k", "o", "v")
    val r = Analytics.cusumReport(pts, "v", Seq("k"), "o",
      target = 4.0, threshold = 5.0).collect().head
    // s: 1 -> 7 (alarm) -> 6 (alarm); max 7
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L && r.getDouble(3) == 7.0)
  }

  test("streaming cusum equals the batch fold across micro-batches") {
    // unique minutes so both folds see a strictly-ordered sequence
    val pts = (1 to 40).map(i => StreamCusum.Point(
      if (i % 2 == 0) "x" else "y",
      Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"),
      (i * 7 % 13).toDouble))
    val batchIn = pts.map(p => (p.key, p.hr, p.v)).toDF("k", "hr", "v")
    val expected = Analytics.cusumReport(batchIn, "v", Seq("k"), "hr",
      target = 5.0, threshold = 8.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamCusum.Point]
    val q = StreamCusum.streaming(stream.toDS(), target = 5.0,
        threshold = 8.0)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("update").start()
    // batch fold sorts by hr; feed the stream in the SAME event order so
    // the two folds see identical sequences
    val ordered = pts.sortBy(p => (p.key, p.hr.getTime))
    stream.addData(ordered.take(20): _*)
    q.processAllAvailable()
    stream.addData(ordered.drop(20): _*)
    q.processAllAvailable()
    val last = spark.sql(
      """SELECT key, n_points, n_alarms, max_cusum FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |    ORDER BY n_points DESC) AS rn FROM cusum_stream) WHERE rn = 1
        |""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    q.stop()
    assert(last == expected)
  }

  test("reliable-checkpoint mode: identical results, files actually on disk") {
    import graft.operators.Lineage
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (5L, 6L)).toDF("s", "d")
    val ccBase = Dedup.duplicateComponentsStar(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prBase = Graph.pageRankMass(edges, "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set(Lineage.ReliableConf, "true")
    spark.conf.set(Lineage.DirConf, ckptDir.toString)
    try {
      val ccRel = Dedup.duplicateComponentsStar(chain, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prRel = Graph.pageRankMass(edges, "s", "d", iters = 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(ccRel == ccBase) // same fixpoint either mode
      assert(prRel == prBase) // integer BSP: bit-identical either mode
      // and the reliable path really wrote checkpoint data to the dir
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(ckptDir.toFile).nonEmpty,
        "reliable mode produced no checkpoint files")
    } finally {
      spark.conf.set(Lineage.ReliableConf, "false")
      Dedup.releaseIntermediates()
      Graph.releaseIntermediates()
    }
  }
}
