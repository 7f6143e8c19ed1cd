package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.core.EnergySeries
import graft.units.UnitRegistry

/** Property-based checks (raw ScalaCheck driven from ScalaTest): unit
  * conversion algebra and align-arithmetic against a local model. */
class PropertiesSpec extends SparkTestBase {

  private def check(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  val tempUnits = Seq("degC", "degF", "K", "R")
  val powerUnits = Seq("W", "kW", "Btu/h", "ton")
  val energyUnits = Seq("J", "kJ", "Wh", "kWh", "Btu", "MJ")
  val families = Seq(tempUnits, powerUnits, energyUnits)

  private def conv(from: String, to: String, v: Double): Double = {
    val (k, o) = UnitRegistry.conversion(UnitRegistry.parse(from),
      UnitRegistry.parse(to))
    v * k + o
  }

  test("property: conversion round-trip is identity within 1e-9 relative") {
    check(Prop.forAll(Gen.choose(0, families.size - 1), Gen.choose(0, 5),
      Gen.choose(0, 5), Gen.choose(-1e6, 1e6)) { (f, i, j, x) =>
      val fam = families(f)
      val (a, b) = (fam(i % fam.size), fam(j % fam.size))
      val rt = conv(b, a, conv(a, b, x))
      math.abs(rt - x) <= 1e-9 * math.max(1.0, math.abs(x))
    })
  }

  test("property: conversion composes (a->b->c == a->c)") {
    check(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 3), Gen.choose(0, 3),
      Gen.choose(-500.0, 500.0)) { (i, j, l, x) =>
      val (a, b, c) = (tempUnits(i), tempUnits(j), tempUnits(l))
      val direct = conv(a, c, x)
      val via = conv(b, c, conv(a, b, x))
      math.abs(direct - via) <= 1e-9 * math.max(1.0, math.abs(x))
    })
  }

  test("property: align-arithmetic matches a local sorted-union model") {
    import spark.implicits._
    val idxGen = Gen.listOfN(10, Gen.choose(0L, 15L)).map(_.distinct)
    check(Prop.forAll(idxGen, idxGen) { (ia, ib) =>
      (ia.nonEmpty && ib.nonEmpty) ==> {
        def series(ids: List[Long]) = EnergySeries(
          ids.map(i => (i, i * 2.0)).toDF("idx", "value"), Seq("idx"), "value")
        val got = (series(ia) + series(ib)).df.collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        val expect = (ia ++ ib).distinct.map { i =>
          i -> (if (ia.contains(i) && ib.contains(i)) Some(i * 4.0) else None)
        }.toMap
        got == expect
      }
    }, n = 20)
  }

  // ---- clustering algorithm properties (pure driver code, no Spark) ----

  private val pointsGen: Gen[Array[Array[Double]]] = for {
    n <- Gen.choose(2, 12)
    dim <- Gen.choose(1, 3)
    pts <- Gen.listOfN(n,
      Gen.listOfN(dim, Gen.choose(-100.0, 100.0)).map(_.toArray))
  } yield pts.toArray

  /** Naive Ward reference: recompute every merge cost from cluster
    * members (ΔSSE = n₁n₂/(n₁+n₂)·‖c₁−c₂‖²), lowest (i, j) on ties —
    * the textbook definition, O(n⁴)-ish but fine at property sizes. */
  private def naiveWard(points: Array[Array[Double]], k: Int): Array[Int] = {
    val dim = points(0).length
    var clusters = points.indices.map(i => List(i)).toList
    while (clusters.size > math.min(k, points.length)) {
      def centroid(c: List[Int]) = {
        val s = new Array[Double](dim)
        c.foreach(i => (0 until dim).foreach(d => s(d) += points(i)(d)))
        s.map(_ / c.size)
      }
      var best = Double.MaxValue; var bi = -1; var bj = -1
      for (i <- clusters.indices; j <- i + 1 until clusters.size) {
        val (a, b) = (clusters(i), clusters(j))
        val (ca, cb) = (centroid(a), centroid(b))
        val d2 = (0 until dim).map(d => (ca(d) - cb(d)) * (ca(d) - cb(d))).sum
        val cost = a.size.toDouble * b.size / (a.size + b.size) * d2 / 2.0
        if (cost < best) { best = cost; bi = i; bj = j }
      }
      val merged = clusters(bi) ++ clusters(bj)
      clusters = clusters.zipWithIndex
        .collect { case (c, x) if x != bi && x != bj => c } :+ merged
      // keep deterministic ordering: sort clusters by min member
      clusters = clusters.sortBy(_.min)
    }
    val label = new Array[Int](points.length)
    clusters.sortBy(_.min).zipWithIndex.foreach { case (c, x) =>
      c.foreach(i => label(i) = x)
    }
    // renumber by first appearance to match LocalWard's convention
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    label.map(l => seen.getOrElseUpdate(l, seen.size))
  }

  test("property: LocalWard (Lance-Williams) matches naive Ward merges") {
    check(Prop.forAll(pointsGen, Gen.choose(1, 4)) { (pts, k) =>
      graft.operators.LocalWard.fit(pts, k).toSeq == naiveWard(pts, k).toSeq
    }, n = 60)
  }

  test("property: LocalKMeans converges with each point at its nearest center") {
    check(Prop.forAll(pointsGen, Gen.choose(1, 4),
        Gen.choose(0L, 1000L)) { (pts, k, seed) =>
      val (assign, centers) = graft.operators.LocalKMeans.fit(pts, k, seed)
      def d2(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      pts.indices.forall { i =>
        val mine = d2(pts(i), centers(assign(i)))
        centers.indices.forall(c => mine <= d2(pts(i), centers(c)) + 1e-9)
      }
    }, n = 60)
  }

  // ---- DataFrame-operator properties: each trial runs Spark jobs, so
  // trials are few and inputs small (the oracle gate covers scale).

  test("property: interpolateLinear is the identity on null-free input") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", i, v) }
        .toDF("grp", "t", "v")
      val got = graft.operators.WindowOps
        .interpolateLinear(df, "v", Seq("grp"), Seq("t"))
        .orderBy("t").select("interp").as[Double].collect().toSeq
      got == vs
    }, n = 8)
  }

  test("property: quantileNormalize lands in (0,1) and preserves order") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", i, v) }
        .toDF("grp", "id", "v")
      val got = graft.operators.Analytics
        .quantileNormalize(df, "v", Seq("grp"), Seq("id"))
        .orderBy("v", "id").select("quantile").as[Double].collect().toSeq
      got.forall(q => q > 0.0 && q < 1.0) && got == got.sorted &&
        got.distinct.size == got.size // ranks unique under the tie-break
    }, n = 8)
  }

  test("property: keySkewReport gini is 0 for uniform keys, in [0,1)") {
    import spark.implicits._
    val countsGen = Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1, 20)))
    check(Prop.forAll(countsGen, Gen.oneOf(true, false)) { (counts, unif) =>
      val cs = if (unif) counts.map(_ => counts.head) else counts
      val rows = cs.zipWithIndex.flatMap { case (c, k) =>
        Seq.fill(c)(s"k$k")
      }
      val row = graft.operators.Analytics
        .keySkewReport(rows.toDF("k"), "k").collect().head
      val gini = row.getAs[Double]("gini")
      val uniformOk = !unif || cs.isEmpty || math.abs(gini) < 1e-9
      gini >= -1e-9 && gini < 1.0 && uniformOk &&
        row.getAs[Long]("n_rows") == rows.size.toLong
    }, n = 8)
  }

  // ---- differential properties: the distributed implementations vs
  // naive single-threaded reference models on random corpora ----

  /** Reference BPE: weighted word vocab, overlapping-adjacent pair
    * counts, (count desc, lhs, rhs) argmax, left-to-right merge. */
  private def naiveBpe(words: Seq[String],
      k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to k if !done) {
      val pc = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc(p) += c)
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += l + r; i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("property: bpeMerges equals the naive weighted-vocab BPE " +
      "reference on random corpora") {
    import spark.implicits._
    import graft.operators.{Dedup, Tokenizer}
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    check(Prop.forAll(corpus) { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = Tokenizer.bpeMerges(docs, "text", merges = 4)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      Dedup.releaseIntermediates()
      got == naiveBpe(words, 4)
    }, n = 10)
  }

  test("property: bpeTokenCounts equals naive merge application on " +
      "random corpora") {
    import spark.implicits._
    import graft.operators.{Dedup, Tokenizer}
    def applyMerges(word: String,
        merges: Seq[(String, String)]): Int = {
      var syms = word.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += l + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms.length
    }
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word))
    val corpus = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(corpus) { ds =>
      val rows = ds.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val df = rows.toDF("doc_id", "text")
      val m = Tokenizer.bpeMerges(df, "text", merges = 3)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val ok = if (m.isEmpty) true else {
        val got = Tokenizer.bpeTokenCounts(df, "text", "doc_id", m)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        rows.forall { case (id, text) =>
          val ws = text.split(" ").toSeq
          got(id) == ((ws.size.toLong,
            ws.map(w => applyMerges(w, m).toLong).sum))
        }
      }
      Dedup.releaseIntermediates()
      ok
    }, n = 10)
  }

  test("property: native bpe_token_count equals the chained-regex " +
      "encoder under learned merge lists on random corpora") {
    import spark.implicits._
    import graft.operators.{Dedup, Tokenizer}
    val word = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word))
    val corpus = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(corpus) { ds =>
      val rows = ds.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val df = rows.toDF("doc_id", "text")
      val m = Tokenizer.bpeMerges(df, "text", merges = 5)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val ok = m.isEmpty || {
        val native = Tokenizer.bpeTokenCounts(df, "text", "doc_id", m)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val chained = Tokenizer
          .bpeTokenCountsChained(df, "text", "doc_id", m)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        native == chained
      }
      Dedup.releaseIntermediates()
      ok
    }, n = 10)
  }

  /** Reference batched BPE: same pair counting as [[naiveBpe]], but
    * per round the top-`batch` symbol-disjoint pairs by
    * (count desc, lhs, rhs) greedy, all applied before recounting. */
  private def naiveBpeBatched(words: Seq[String], rounds: Int,
      batch: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val pc = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc(p) += c)
      }
      val used = scala.collection.mutable.HashSet.empty[String]
      val picks = pc.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
        .iterator.filter { case ((l, r), _) =>
          if (used(l) || used(r)) false
          else { used += l; used += r; true }
        }.take(batch).toSeq
      if (picks.isEmpty) done = true
      else picks.foreach { case ((l, r), c) =>
        out += ((l, r, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l &&
                syms(i + 1) == r) { b += l + r; i += 2 }
            else { b += syms(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("property: bpeMergesBatched equals the naive batched greedy " +
      "reference on random corpora") {
    import spark.implicits._
    import graft.operators.{Dedup, Tokenizer}
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    check(Prop.forAll(corpus) { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = Tokenizer.bpeMergesBatched(docs, "text", rounds = 2,
          batch = 3).orderBy("step").collect()
        .map(r => (r.getString(2), r.getString(3), r.getLong(5))).toSeq
      Dedup.releaseIntermediates()
      got == naiveBpeBatched(words, 2, 3)
    }, n = 10)
  }

  test("property: labelPropagation equals a naive synchronous LPA on " +
      "random graphs") {
    import spark.implicits._
    import graft.operators.Graph
    def naiveLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap)).distinct
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
      var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        lab = adj.map { case (n, nbrs) =>
          val counts = nbrs.map(lab).groupBy(identity)
            .map { case (l, g) => l -> g.size }
          n -> counts.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lab
    }
    val edge = Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L))
      .suchThat { case (a, b) => a != b }
    val graph = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, edge))
    check(Prop.forAll(graph) { edges =>
      val got = Graph.labelPropagation(edges.toDF("src", "dst"),
          "src", "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Graph.releaseIntermediates()
      got == naiveLpa(edges, 3)
    }, n = 10)
  }

  test("property: dsirSelect equals the naive importance-ratio model, " +
      "collisions included (B=64)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val B = 64
    def bucket(w: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((w + "graft").getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
    val word = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val doc = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word))
    val corpus = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(doc, Gen.oneOf(true, false))))
    check(Prop.forAll(corpus) { ds =>
      val rows = ds.zipWithIndex.map { case ((ws, t), i) =>
        (i.toLong, ws.mkString(" "), t)
      }
      val got = graft.operators.Curation.dsirSelect(
          rows.toDF("doc_id", "text", "t"), "text", "doc_id",
          col("t"), buckets = B, k = 99)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // naive model: per-bucket occurrence counts over uni+bigrams
      def feats(ws: Seq[String]): Seq[Int] =
        (ws ++ ws.zip(ws.tail).map { case (a, b) => s"$a $b" })
          .map(bucket)
      val all = rows.map { case (id, text, t) =>
        (id, feats(text.split(" ").toSeq), t)
      }
      val rc = all.flatMap(_._2).groupBy(identity).map {
        case (b, g) => b -> g.size.toLong
      }
      val tc = all.filter(_._3).flatMap(_._2).groupBy(identity).map {
        case (b, g) => b -> g.size.toLong
      }
      val (rt, tt) = (rc.values.sum.toDouble,
        tc.values.sum.toDouble)
      def term(b: Int): BigDecimal = BigDecimal(
        math.log((tc.getOrElse(b, 0L) + 1.0) / (tt + B)) -
          math.log((rc(b) + 1.0) / (rt + B)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val expect = all.map { case (id, fs, _) =>
        val iw = fs.map(term).sum.toDouble
        (id, fs.size.toLong, math.round(iw * 1e6) / 1e6)
      }.sortBy { case (id, _, iw) => (-iw, id) }
      got == expect
    }, n = 10)
  }

  test("property: packTokens is the exact concat-and-split — counts " +
      "preserved, every sequence but the last exactly full, per-doc " +
      "order intact, global offsets consecutive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(Gen.choose(1, 9))
      .map(_.take(12).zipWithIndex.map { case (n, i) => (i.toLong, n) })
    check(Prop.forAll(docsGen, Gen.choose(2L, 7L)) { (docs, seqLen) =>
      val toks = docs.flatMap { case (d, n) =>
        (1 to n).map(p => (d, p.toLong, s"t${d}_$p")) }
        .toDF("doc_id", "pos", "token")
      val out = graft.operators.Sampling.packTokens(toks, seqLen)
        .select($"doc_id", $"pos", $"seq", $"seq_off")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      graft.operators.Dedup.releaseIntermediates()
      val total = docs.map(_._2).sum
      // the global stream in (doc, pos) order gets gi = rank
      val expected = docs.sortBy(_._1).flatMap { case (d, n) =>
        (1 to n).map(p => (d, p.toLong)) }
        .zipWithIndex.map { case ((d, p), gi) =>
          (d, p, gi / seqLen, gi % seqLen) }.toSet
      (out.length == total) :| "row count preserved" &&
        (out.toSet == expected) :| "exact concat-and-split" &&
        {
          val bySeq = out.groupBy(_._3).view.mapValues(_.length).toMap
          val last = bySeq.keys.max
          bySeq.forall { case (s, n) =>
            if (s == last) n >= 1 else n == seqLen }
        } :| "every sequence but the last exactly full"
    }, n = 30)
  }
}
