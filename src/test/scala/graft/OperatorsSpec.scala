package graft

import org.apache.spark.sql.functions._
import graft.core.EnergySeries
import graft.operators._

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words appear in this one here"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("discretize k=1 is the slot-mean profile and preserves the total") {
    val es = EnergySeries.rangeSeries(spark, 100, 2018, Some("degC"))
    val d = Discretize.discretize(es, noTypicalPeriods = 1, periodLength = 24)
    // complete periods: slot s of periods {0..3} -> mean 36+s; slots 0..3
    // also include the tail period 4 -> mean 48+s. Total is preserved.
    assert(math.abs(d.sum() - 4950.0) < 1e-6)
    val bySlot = d.df.orderBy("ts").collect().map(_.getDouble(1))
    assert(bySlot(4) == 40.0) // slot 4: mean(4,28,52,76) = 40
    assert(bySlot(0) == 48.0) // slot 0: mean(0,24,48,72,96) = 48
  }

  test("discretize k>1 clusters periods deterministically") {
    val es = EnergySeries.rangeSeries(spark, 96, 2018, Some("degC"))
    val d = Discretize.discretize(es, noTypicalPeriods = 2, periodLength = 24,
      seed = 42L)
    assert(d.df.count() == 96)
    // deterministic under a fixed seed
    val again = Discretize.discretize(es, 2, 24, seed = 42L)
    assert(d.df.except(again.df).count() == 0)
  }

  test("discretize hierarchical (Ward) separates period types exactly") {
    // 4 days, alternating low/high profiles: each cluster holds two
    // IDENTICAL periods, so the cluster-mean profile must reproduce the
    // original series bit-for-bit — this pins the assignment itself, the
    // part tsam's default clusterMethod='hierarchical' contributes
    // (energypandas.py:384-412; DEVIATIONS §1 covers the golden value).
    val vals = (0 until 96).map { i =>
      val day = i / 24; val slot = i % 24
      (i.toLong, if (day % 2 == 0) slot.toDouble else 100.0 + slot)
    }
    val es = EnergySeries.withTimeIndex(spark, vals.toDF("id", "value"),
      "value", baseYear = 2018, stepSeconds = 3600)
    val d = Discretize.discretize(es, noTypicalPeriods = 2,
      periodLength = 24, method = ClusterMethod.Hierarchical)
    val orig = es.df.orderBy("ts").collect().map(_.getDouble(1))
    val pred = d.df.orderBy("ts").collect().map(_.getDouble(1))
    assert(pred.toSeq == orig.toSeq)
    // and it is deterministic (no seed involved at all)
    val again = Discretize.discretize(es, 2, 24,
      method = ClusterMethod.Hierarchical)
    assert(d.df.except(again.df).count() == 0)
  }

  test("LocalWard merges nearest clusters first, labels by appearance") {
    val pts = Array(Array(0.0, 0.0), Array(0.1, 0.0), Array(10.0, 0.0),
      Array(10.1, 0.0), Array(5.0, 8.0))
    assert(LocalWard.fit(pts, 3).toSeq == Seq(0, 0, 1, 1, 2))
    assert(LocalWard.fit(pts, 5).toSeq == Seq(0, 1, 2, 3, 4)) // k = n
    assert(LocalWard.fit(pts, 1).toSeq == Seq(0, 0, 0, 0, 0))
  }

  test("exact dedup groups identical texts, keeps lowest id") {
    val out = Dedup.exact(docs, "text", "doc_id").collect()
    assert(out.length == 4)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 0L) // keep_id = min(0, 3)
  }

  test("per-row minhash signature: identical docs agree on every hash") {
    val sigs = docs.select($"doc_id",
        Dedup.minhashSignature(Dedup.wordShingles($"text", 3), 16)
          .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(3L)) // exact duplicates
    val agree01 = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree01 > agree02) // near-dup agrees on more hashes
  }

  test("minhash LSH finds exact and near duplicates") {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id", minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L)
    assert(exact.exists(_._3 == 1.0)) // identical docs agree on every hash
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L)) // near-dup found
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L)) // unrelated not paired
  }

  test("LSH bucket/block caps drop oversized groups, defaults keep them") {
    // 12 identical docs: every band bucket (and simhash block) holds all
    // 12 members, so a cap of 11 suppresses every candidate pair while
    // the default caps (sized for degenerate boilerplate buckets, not
    // small cliques) keep all 66
    val clique = (0L until 12L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashLsh(clique, "text", "doc_id",
      bucketCap = 11).count() == 0)
    assert(Dedup.minhashLsh(clique, "text", "doc_id").count() == 66)
    assert(Dedup.simhashPairs(clique, "text", "doc_id",
      blockCap = 11).count() == 0)
    assert(Dedup.simhashPairs(clique, "text", "doc_id").count() == 66)
  }

  test("minhashLshCross emits only cross-side pairs, equal to the " +
      "self-join filtered") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base),               // new side (odd)
      (2L, base + " edited"),   // ref side (even): cross near-dup of 1
      (3L, "some wholly unrelated words live here in this document"),
      (5L, "some wholly unrelated words live here in this document"),
      // 3 and 5 are identical but BOTH on the new side -> not reported
      (4L, "another completely distinct reference document text body")
    ).toDF("doc_id", "text")
    val newSide = docs.where($"doc_id" % 2 === 1)
    val refSide = docs.where($"doc_id" % 2 === 0)
    val cross = Dedup.minhashLshCross(newSide, refSide, "text", "doc_id",
        minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(cross.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    // identical to the self-join operator restricted to cross pairs.
    // Cap-regime caveat: this equality only holds while bucketCap is
    // inert (as here — 5 docs vs cap 2000). Under a binding cap the two
    // diverge BY DESIGN: cross caps the reference side only (new-side
    // docs always probe), while the self-join drops oversized buckets
    // whole on both sides — on boilerplate-heavy corpora cross reports
    // strictly more cross-side pairs than the capped self-join.
    val self = Dedup.minhashLsh(docs, "text", "doc_id",
        minEstJaccard = 0.5)
      .where($"a" % 2 =!= $"b" % 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(cross == self)
    Dedup.releaseIntermediates()
  }

  test("simhash: identical docs distance 0, near-dups closer than unrelated") {
    // blocked pair join: exact dups share every bit and every block
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 3L)) == 0)
    // signature quality (pre-blocking): one changed word in a 50-word doc
    // stays measurably closer than an unrelated doc
    val long0 = (0 until 50).map(i => s"tok$i").mkString(" ")
    val sigDf = Seq((0L, long0), (1L, long0.replace("tok25", "changed")),
      (2L, (100 until 150).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = sigDf.select($"doc_id",
        Dedup.simhash(Dedup.wordShingles($"text", 3)).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(0L, 1L) < ham(0L, 2L) && ham(0L, 1L) < ham(1L, 2L))
  }

  test("ngram Jaccard computes exact overlap") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      minJaccard = 0.1, docFreqCap = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 3L)) == 1.0)
    // docs 0/1: 9 words -> 7 distinct 3-grams each (6 shared), J = 6/8
    assert(math.abs(pairs((0L, 1L)) - 0.75) < 1e-12)
  }

  test("repetition scores match a naive local model on random texts") {
    val rng = new scala.util.Random(7)
    val texts = (0 until 200).map { i =>
      val n = 1 + rng.nextInt(12)
      (i.toLong, Seq.fill(n)("abc".charAt(rng.nextInt(3)).toString)
        .mkString(" "))
    }
    def naive(t: String): (Double, Double) = {
      val ws = t.split("\\s+").toSeq
      val dup = BigDecimal(1.0 - ws.distinct.size.toDouble / ws.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val bg = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val top =
        if (bg.isEmpty) 0.0
        else BigDecimal(bg.groupBy(identity).values.map(_.size).max.toDouble
          / bg.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (dup, top)
    }
    val got = texts.toDF("id", "text")
      .select($"id", TextOps.repetitionScores($"text").as("r"),
        TextOps.dupWordFrac($"text").as("d"))
      .collect().map { r =>
        // the standalone metric must agree with the combined struct
        assert(r.getStruct(1).getDouble(0) == r.getDouble(2))
        r.getLong(0) -> (r.getStruct(1).getDouble(0),
          r.getStruct(1).getDouble(1))
      }.toMap
    texts.foreach { case (id, t) =>
      val (ed, et) = naive(t)
      val (gd, gt) = got(id)
      assert(math.abs(gd - ed) < 1e-9 && math.abs(gt - et) < 1e-9,
        s"id=$id text='$t' expected=($ed,$et) got=($gd,$gt)")
    }
  }

  test("ngram Jaccard matches a naive local model on random docs") {
    val rng = new scala.util.Random(11)
    val corpus = (0 until 40).map { i =>
      val n = 3 + rng.nextInt(10)
      (i.toLong, Seq.fill(n)(s"w${rng.nextInt(6)}").mkString(" "))
    }
    def grams(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val expected = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      ga = grams(ta); gb = grams(tb)
      inter = (ga & gb).size if ga.nonEmpty || gb.nonEmpty
      uni = (ga | gb).size if uni > 0
      j = inter.toDouble / uni if j >= 0.3
    } yield (a, b) -> j).toMap
    val got = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"),
        "text", "doc_id", shingleLen = 3, minJaccard = 0.3,
        docFreqCap = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    Dedup.releaseIntermediates()
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-12) }
  }

  test("contaminatedDocs flags training docs overlapping the benchmark") {
    val bench = docs.where($"doc_id" === 0L) // "benchmark" = doc 0's text
    val train = docs.where($"doc_id" > 0L)
    val hits = Dedup.contaminatedDocs(train, bench, "text", "doc_id",
        windowLen = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(3L) == 24L) // exact copy: all 24 windows contaminated
    assert(hits.contains(1L) && hits(1L) == 21L) // shared 40-char prefix
    assert(!hits.contains(2L) && !hits.contains(4L))
  }

  test("weightedMix draws floor(weight*total) per group, deterministically") {
    val rows = (0 until 40).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "g")
    val mix = Sampling.weightedMix(rows, "g", "id",
      Map("g0" -> 0.5, "g1" -> 0.3, "g2" -> 0.2), total = 10)
    val counts = mix.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 5L, "g1" -> 3L, "g2" -> 2L)) // g3 absent
    val again = Sampling.weightedMix(rows, "g", "id",
      Map("g0" -> 0.5, "g1" -> 0.3, "g2" -> 0.2), total = 10)
    assert(mix.except(again).count() == 0)
  }

  test("temperatureMix allocates total * n^tau / sum, integer-exact") {
    // sizes 100/25/4 -> sqrt weights 10/5/2, total 17 -> exactly 10/5/2
    val rows = ((0 until 100).map(i => (i.toLong, "ga")) ++
      (100 until 125).map(i => (i.toLong, "gb")) ++
      (125 until 129).map(i => (i.toLong, "gc"))).toDF("id", "g")
    val mix = Sampling.temperatureMix(rows, "g", "id", tau = 0.5, total = 17)
    val counts = mix.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ga" -> 10L, "gb" -> 5L, "gc" -> 2L))
    // tau smooths: at tau=1 the same total splits proportionally (13/3/0)
    val prop = Sampling.temperatureMix(rows, "g", "id", tau = 1.0, total = 17)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop == Map("ga" -> 13L, "gb" -> 3L))
    // deterministic
    val again = Sampling.temperatureMix(rows, "g", "id", tau = 0.5, total = 17)
    assert(mix.except(again).count() == 0)
  }

  test("shared-substring pairs catch copied passages, skip short docs") {
    val pairs = Dedup.sharedSubstringPairs(docs, "text", "doc_id",
        windowLen = 20, minShared = 1, docFreqCap = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // 0 and 3 are identical: every one of the 24 20-char windows shared
    assert(pairs((0L, 3L)) == 24L)
    // 0 and 1 share the 40-char prefix -> its 21 interior windows
    assert(pairs((0L, 1L)) == 21L)
    // unrelated doc 2 pairs with nobody; doc 4 is shorter than the window
    assert(!pairs.keys.exists(k => k._1 == 2L || k._2 == 2L))
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L))
    Dedup.releaseIntermediates()
  }

  test("duplicateComponents on an empty pair set returns no rows") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.duplicateComponents(empty, "a", "b").count() == 0)
    Dedup.releaseIntermediates()
  }

  test("duplicateComponents labels transitive groups with the min id") {
    // chain 1-2, 2-3 plus separate pair 7-9: hash-min needs >1 round for
    // the chain, so this exercises the iteration + convergence check
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("a", "b")
    val comp = Dedup.duplicateComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    Dedup.releaseIntermediates()
  }

  test("cosineNearDupPairs enforces its validation-scale row guard") {
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.5,
        maxRows = 2)
    }
    val ok = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.5,
      maxRows = 10)
    assert(ok.collect().exists(r =>
      r.getLong(0) == 0L && r.getLong(1) == 1L)) // near-identical pair
  }

  test("semDedup removes epsilon-ball members, keeps component heads") {
    // three tight balls far apart + one isolated vector; 2 clusters
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)), (1L, Array(0.99f, 0.01f)), // ball A
      (2L, Array(0.98f, 0.02f)),
      (10L, Array(0.00f, 1.00f)), (11L, Array(0.01f, 0.99f)), // ball B
      (20L, Array(-1.00f, -0.3f)) // isolated (negative cos vs others)
    ).toDF("vec_id", "embedding")
    val sd = Similarity.semDedup(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 2, nassign = 2, seed = 7L)
    val rows = sd.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val removed = rows.map(_._1).toSet
    // every ball loses all but one member; the isolated vector survives
    assert(removed.intersect(Set(0L, 1L, 2L)).size == 2)
    assert(removed.intersect(Set(10L, 11L)).size == 1)
    assert(!removed.contains(20L))
    // precision: recorded cosine is the exact pair cosine, >= threshold
    assert(rows.forall(_._3 >= 0.9))
    // keeper of every removal is a surviving member of the same ball
    rows.foreach { case (id, keeper, _) =>
      assert(!removed.contains(keeper))
      assert((id < 10 && keeper < 10) ||
        (id >= 10 && id < 20 && keeper >= 10 && keeper < 20))
    }
    // deterministic: a second run returns the identical rows
    val again = Similarity.semDedup(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 2, nassign = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(again.toSeq == rows.toSeq)
  }

  test("ivfNearDupPairs finds intra-cluster pairs via cell co-membership") {
    // two tight balls far apart: every intra-ball pair is above the
    // threshold, every cross-ball pair far below; with nassign=2 over
    // nlist=2 cells all true pairs share a cell by construction
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.98f, 0.02f)),
      (10L, Array(0.00f, 1.00f)), (11L, Array(0.01f, 0.99f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.ivfNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 2, nassign = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L)))
    // scored pairs match the exact tool on the same input (candidates
    // are a superset filtered by the same rounded cosine)
    val exact = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("ivfNearDupPairs cellCap bounds a hot cell one-sided") {
    // a 10-member near-identical clump (the degenerate-cell regime the
    // cap guards against) plus a 2-member ball in its own cell
    val clump = (0 until 10).map(i => (i.toLong,
      Array(1.0f, 0.001f * i)))
    val ball = Seq((20L, Array(0.0f, 1.0f)), (21L, Array(0.01f, 0.99f)))
    val vecs = (clump ++ ball).toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap semantics: a pair survives iff its LOWER id is cap-ranked
    // (id asc) in a shared cell — with cellCap=3 the clump cell's
    // in-cap set is {0,1,2}, the ball cell's is {20,21}
    val capped = Similarity.ivfNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 2, nassign = 1, seed = 7L, cellCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == exact.filter { case (a, _) => a <= 2 || a >= 20 })
    // dedup connectivity survives the cap: every beyond-cap clump
    // member still pairs with an in-cap member
    (3L to 9L).foreach(i => assert(capped.exists(_._2 == i)))
    // an un-binding cap is exact
    val uncapped = Similarity.ivfNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 2, nassign = 1, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == exact)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("semDedupCross removes only new docs near a ref keeper") {
    // ref lake: one member per ball; new increment: near-dups of ball A
    // plus a genuinely novel vector
    val ref = Seq(
      (0L, Array(1.00f, 0.00f)), (10L, Array(0.00f, 1.00f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (1L, Array(0.99f, 0.01f)),  // dup of ref 0 -> removed
      (11L, Array(0.01f, 0.99f)), // dup of ref 10 -> removed
      (20L, Array(-1.0f, -0.3f))  // novel -> survives
    ).toDF("vec_id", "embedding")
    val r = Similarity.semDedupCross(fresh, ref, "vec_id", "embedding",
        threshold = 0.9, nlist = 2, nassign = 2, seed = 7L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r == Seq((1L, 0L), (11L, 10L)))
    // new-side near-dups of EACH OTHER are out of scope by contract:
    // two fresh twins with no lake neighbor both survive
    val twins = Seq((5L, Array(0.5f, 0.5f)), (7L, Array(0.51f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.semDedupCross(twins, ref, "vec_id", "embedding",
        threshold = 0.99, nlist = 2, nassign = 2, seed = 7L).count()
    assert(r2 == 0L)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("semDedup keepFarthest=false keeps the centroid-nearest member") {
    // one ball, one cluster: priority flips to distance ASC, so the
    // member closest to the centroid becomes the keeper
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.90f, 0.10f))
    ).toDF("vec_id", "embedding")
    val sd = Similarity.semDedup(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 1, keepFarthest = false)
    val keepers = sd.collect().map(_.getLong(1)).toSet
    val removed = sd.collect().map(_.getLong(0)).toSet
    assert(keepers.size == 1 && !removed.contains(keepers.head))
  }

  test("cosine top-k ranks by similarity with deterministic ties") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs, vecs.where($"vec_id" === 0),
      "vec_id", "embedding", k = 3).orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(3L, 1L, 2L))
  }

  test("mmr rerank trades relevance for diversity and bounds the list") {
    // query axis x: docs 1/3 nearly parallel to each other, doc 2 less
    // relevant but orthogonal to everything — plain top-2 is (3, 1);
    // MMR at λ=0.5 swaps the redundant 1 for the diverse 2
    val cand = Seq(
      (1L, Array(0.9f, 0.1f), 0.993884),
      (2L, Array(0.0f, 1.0f), 0.5),
      (3L, Array(1.0f, 0.05f), 0.99875)
    ).toDF("vec_id", "embedding", "rel")
    val mmr = Similarity.mmrRerank(cand, "vec_id", "embedding", "rel",
      k = 2, lambda = 0.5).orderBy("rank").collect()
    assert(mmr.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    // first pick's score is λ·rel (empty selected set): 0.499375
    assert(mmr.head.getDouble(2) == 0.499375)
    // greedy is k-bounded and ranks are 1..k
    assert(mmr.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cand, "vec_id", "embedding", "rel", k = 2,
        lambda = 0.5, maxCandidates = 2)
    }
    assert(e.getMessage.contains("bounded candidate list"))
    // a zero-norm candidate scores similarity 0.0 (never NaN — a NaN
    // would poison every later max and make the greedy order-dependent)
    val withZero = Seq(
      (1L, Array(1.0f, 0.0f), 0.9),
      (2L, Array(0.0f, 0.0f), 0.8),
      (3L, Array(0.9f, 0.1f), 0.85)
    ).toDF("vec_id", "embedding", "rel")
    val z = Similarity.mmrRerank(withZero, "vec_id", "embedding",
      "rel", k = 3, lambda = 0.5).orderBy("rank").collect()
    // pick 1: doc 1 (max rel). doc 2's maxSim stays 0.0, so its MMR
    // score is a clean 0.4 and it outranks the redundant doc 3
    assert(z.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(!z.exists(r => r.getDouble(2).isNaN))
    // unsupported id types are rejected loudly at entry, not by a
    // silent toString tie-order
    val badId = Seq((1.5, Array(1.0f, 0.0f), 0.9))
      .toDF("vec_id", "embedding", "rel")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(badId, "vec_id", "embedding", "rel", k = 1)
    }
    assert(e2.getMessage.contains("unsupported id type"))
  }

  test("mmr per-query rerank equals the single-query greedy per group " +
      "and caps group size loudly") {
    // two queries sharing the single-query test geometry (shifted ids
    // for query 1) — the distributed per-group fold must reproduce
    // mmrRerank on each group independently
    val rows = Seq(
      (0L, 1L, Array(0.9f, 0.1f), 0.993884),
      (0L, 2L, Array(0.0f, 1.0f), 0.5),
      (0L, 3L, Array(1.0f, 0.05f), 0.99875),
      (1L, 11L, Array(0.9f, 0.1f), 0.993884),
      (1L, 12L, Array(0.0f, 1.0f), 0.5),
      (1L, 13L, Array(1.0f, 0.05f), 0.99875))
    val cand = rows.toDF("query_id", "vec_id", "embedding", "rel")
    val per = Similarity.mmrRerankPerQuery(cand, Seq("query_id"),
        "vec_id", "embedding", "rel", k = 2, lambda = 0.5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val single = (0L to 1L).flatMap { q =>
      Similarity.mmrRerank(cand.where($"query_id" === q), "vec_id",
          "embedding", "rel", k = 2, lambda = 0.5)
        .orderBy("rank").collect()
        .map(r => (q, r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    assert(per == single)
    assert(per.map(x => (x._1, x._3)) ==
      Seq((0L, 3L), (0L, 2L), (1L, 13L), (1L, 12L)))
    // per-group candidate cap is enforced inside the fold
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerankPerQuery(cand, Seq("query_id"), "vec_id",
        "embedding", "rel", k = 2, lambda = 0.5, maxCandidates = 2)
        .collect()
    }
    assert(e.getMessage.contains("top-N retriever") ||
      Option(e.getCause).exists(_.getMessage.contains("top-N retriever")))
    // non-atomic query-key types are rejected at entry (Seq-equality
    // group detection would silently split every array-keyed group)
    val badKey = rows.map { case (q, id, v, r) => (Array(q), id, v, r) }
      .toDF("query_id", "vec_id", "embedding", "rel")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.mmrRerankPerQuery(badKey, Seq("query_id"), "vec_id",
        "embedding", "rel", k = 2)
    }
    assert(e2.getMessage.contains("non-atomic"))
  }

  test("vec_dot is SQL-callable via GraftExtensions and codegen-exact") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       vec_dot(CAST(array(1.5, 2.5) AS ARRAY<FLOAT>),
        |               CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)) AS f""".stripMargin)
      .head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 13.0)
  }

  test("semDedup on an empty corpus fails loud, not inside KMeans") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedup(empty, "vec_id", "embedding", threshold = 0.9)
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("extension functions reject bad arity / windowLen as usage errors") {
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString(" | ")
    val e1 = intercept[Throwable] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(chain(e1).contains("expects 2 arguments"))
    val e2 = intercept[Throwable] {
      spark.sql("SELECT rolling_window_hashes('abc', 2.5)").collect()
    }
    assert(chain(e2).contains("integer literal"))
    val e3 = intercept[Throwable] {
      spark.sql("SELECT jaro_winkler('a')").collect()
    }
    assert(chain(e3).contains("expects 2 arguments"))
  }

  test("optimizer rewrites the HOF dot idiom into VectorDot") {
    // non-foldable input (from range) so earlier optimizer batches can't
    // constant-fold the whole expression away before the rewrite runs
    val vecs = spark.range(1).select(
      array((col("id") + 1).cast("float"), (col("id") + 2).cast("float")).as("a"),
      array((col("id") + 3).cast("float"), (col("id") + 4).cast("float")).as("b"))
    val q = vecs.select(Similarity.dotHof($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.VectorDot])))
    assert(q.head().getDouble(0) == 11.0)
  }

  test("HOF dot over int arrays is NOT rewritten and still evaluates") {
    // VectorDot only handles float/double elements; the rewrite must
    // leave the legal int-array HOF form alone (ADVICE r3)
    val vecs = spark.range(1).select(
      array((col("id") + 1).cast("int"), (col("id") + 2).cast("int")).as("a"),
      array((col("id") + 3).cast("int"), (col("id") + 4).cast("int")).as("b"))
    val q = vecs.select(Similarity.dotHof($"a", $"b").as("d"))
    assert(!q.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.VectorDot])))
    assert(q.head().getDouble(0) == 11.0)
  }

  test("IVF top-k finds in-cluster neighbors") {
    // three well-separated clusters along different axes
    def v(axis: Int, jitter: Float): Array[Float] =
      Array.tabulate(8)(i => if (i == axis) 10.0f + jitter else jitter * 0.1f)
    val vecs = (0 until 12).map(i => (i.toLong, v(i % 3, (i / 3).toFloat)))
      .toDF("vec_id", "embedding")
    val top = Similarity.ivfTopK(vecs, vecs.where($"vec_id" === 0),
      "vec_id", "embedding", k = 3, nlist = 3, nprobe = 1, seed = 7L)
      .orderBy("rank").collect()
    // neighbors of vec 0 (axis 0) are exactly the other axis-0 vectors
    assert(top.map(_.getLong(2)).toSet == Set(3L, 6L, 9L))
  }

  test("hyperplane LSH buckets identical vectors together") {
    val vecs = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val planes = Similarity.randomPlanes(6, 8)
    val b = vecs.select($"vec_id",
      Similarity.hyperplaneBucket($"embedding", planes).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
  }

  test("nfcNormalize + normalizeText: NFC composes, controls and " +
      "zero-widths collapse, SQL function registered") {
    // decomposed e + COMBINING ACUTE (U+0301) -> precomposed U+00E9
    val row = docs.limit(1).select(
      TextOps.nfcNormalize(lit("e\u0301cole")).as("nfc"),
      TextOps.nfcNormalize(lit("plain ascii")).as("id"),
      TextOps.normalizeText(
        lit(" a\u0007b\t\tc \u200bd ")).as("clean")).head()
    assert(row.getAs[String]("nfc") == "\u00e9cole")
    assert(row.getAs[String]("id") == "plain ascii")
    assert(row.getAs[String]("clean") == "a b c d")
    // the SQL-side registration (GraftExtensions)
    assert(spark.sql("SELECT nfc_normalize('e\u0301') AS x")
      .head().getString(0) == "\u00e9")
    // dedup motivation: decomposed and precomposed spellings
    // fingerprint identically after normalization
    val fp = docs.limit(1).select(
      TextOps.fingerprint(TextOps.normalizeText(
        lit("e\u0301cole test"))).as("a"),
      TextOps.fingerprint(TextOps.normalizeText(
        lit("\u00e9cole  test"))).as("b")).head()
    assert(fp.getString(0) == fp.getString(1))
  }

  test("shardAssign: greedy crossing cuts in md5 order; the two-pass " +
      "cumulative sum matches the naive scan") {
    val rows = (1L to 20L).map(i => (i, i * 3L))
    val got = Sampling.shardAssign(rows.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", shardWeight = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    def key(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"${id}graft".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var cum = 0L
    val expect = rows.sortBy { case (id, _) => (key(id), id) }
      .map { case (id, w) =>
        val before = cum; cum += w
        (id, w, before / 50L, before % 50L)
      }.toSet
    assert(got == expect)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("text ops: counts, quality bounds, langid, fingerprint") {
    val t = lit("The quick brown fox! It runs 42 km.")
    val row = docs.limit(1).select(
      TextOps.wordCount(t).as("w"), TextOps.tokenCount(t).as("t"),
      TextOps.qualityScore(t).as("q"), TextOps.langId(t).as("l"),
      TextOps.fingerprint(lit("b a a b")).as("f1"),
      TextOps.fingerprint(lit("a b")).as("f2")).head()
    assert(row.getAs[Int]("w") == 8)
    assert(row.getAs[Int]("t") == 10) // 7 letter runs + "42" + "!" + "."
    assert(row.getAs[Double]("q") >= 0.0 && row.getAs[Double]("q") <= 1.0)
    assert(row.getAs[String]("l") == "en")
    assert(row.getAs[String]("f1") == row.getAs[String]("f2")) // order/dup-proof
    // rolling hash IS order-sensitive, unlike the canonical fingerprint
    val rh = docs.limit(1).select(
      TextOps.rollingHash(lit("a b")).as("h1"),
      TextOps.rollingHash(lit("b a")).as("h2"),
      TextOps.rollingHash(lit("a b")).as("h3")).head()
    assert(rh.getLong(0) != rh.getLong(1) && rh.getLong(0) == rh.getLong(2))
  }

  test("mixed-unit ReportData raises MultipleUnitsError") {
    val tidy = Seq((1, 1, 1, 0, 60, 1.0, "J", "a"), (1, 1, 2, 0, 60, 2.0, "W", "a"))
      .toDF("Month", "Day", "Hour", "Minute", "Interval", "Value", "Units", "Name")
    intercept[graft.units.MultipleUnitsError] {
      graft.sources.ReportData.toSeries(tidy)
    }
    // an explicit override skips the guard
    assert(graft.sources.ReportData.toSeries(tidy, units = Some("J"))
      .df.count() == 2)
  }

  test("multimodal: real BMP payloads decode to exact text-derived features") {
    val media = Multimodal.asBmpMedia(docs, "doc_id", "text")
    assert(media.columns.toSeq == Seq("doc_id", "payload", "media_meta"))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val f = Multimodal.extractFeatures(media, "doc_id")
      .collect().map(m => m.doc_id -> m).toMap
    f.foreach { case (id, m) =>
      // expected geometry/luma from the text by the documented arithmetic
      val bytes = texts(id).getBytes("UTF-8")
      val npix = bytes.length / 3
      val w = math.min(8 + (id % 8).toInt, npix)
      val h = npix / w
      val stride = ((3 * w + 3) / 4) * 4
      assert(m.media_type == "image/bmp")
      assert(m.width == w && m.height == h, s"geometry for doc $id")
      assert(m.n_bytes == 54L + h.toLong * stride, s"file size for doc $id")
      val lumaSum = (0 until 3 * w * h).map { j =>
        val wt = (j % 3) match { case 0 => 114L; case 1 => 587L; case _ => 299L }
        wt * (bytes(j) & 0xff)
      }.sum
      val mean = lumaSum.toDouble / (255000.0 * w * h)
      assert(m.mean_luma == math.floor(mean * 1e6 + 0.5) / 1e6,
        s"luma for doc $id")
    }
  }

  test("BMP codec round-trips exactly and agrees with the JDK ImageIO codec") {
    import javax.imageio.ImageIO
    // width 3 -> row stride 12 (3 padding bytes/row): the case where a
    // decoder that ignores padding or row order reads garbage
    val pixels = Array.tabulate(3 * 3 * 2)(i => ((i * 37 + 11) % 251).toByte)
    val bmp = Multimodal.encodeBmp(pixels, width = 3)
    val (w, h, lumaSum) = Multimodal.decodeBmp(bmp)
    assert(w == 3 && h == 2)
    val expected = pixels.grouped(3).map { p =>
      299L * (p(2) & 0xff) + 587L * (p(1) & 0xff) + 114L * (p(0) & 0xff)
    }.sum
    assert(lumaSum == expected)
    // independent decoder: the JDK's own BMP reader must see the same
    // image, pixel for pixel, in the same top-down logical order
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth == 3 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3) {
      val i = (y * 3 + x) * 3
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == (pixels(i + 2) & 0xff), s"R@($x,$y)")
      assert(((rgb >> 8) & 0xff) == (pixels(i + 1) & 0xff), s"G@($x,$y)")
      assert((rgb & 0xff) == (pixels(i) & 0xff), s"B@($x,$y)")
    }
    // and the reverse: a BMP written by ImageIO decodes identically here
    val bi = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5)
      bi.setRGB(x, y, ((x * 50 + y) << 16) | ((y * 60) << 8) | (x * 40 + 3))
    val baos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "bmp", baos))
    val (w2, h2, luma2) = Multimodal.decodeBmp(baos.toByteArray)
    val expected2 = (for (y <- 0 until 4; x <- 0 until 5) yield {
      val rgb = bi.getRGB(x, y)
      299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
    }).sum
    assert(w2 == 5 && h2 == 4 && luma2 == expected2)
  }

  test("star-contraction CC handles deep chains and matches hash-min") {
    // 41-node path, diameter 40: the shape where per-round hash-min
    // propagation is slowest and star contraction's log² bound matters
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Dedup.duplicateComponentsStar(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 41 && star.values.forall(_ == 0L))
    // seeded random graph: labeling equivalence with hash-min
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).toDF("a", "b")
    val viaStar = Dedup.duplicateComponentsStar(pairs, "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaMin = Dedup.duplicateComponents(pairs, "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaStar == viaMin)
    // empty graph converges immediately
    assert(Dedup.duplicateComponentsStar(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() == 0)
    Dedup.releaseIntermediates()
  }

  test("prefix-filtered Jaccard equals the uncapped inverted-index pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val px = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id",
      shingleLen = 3, minJaccard = 0.5).orderBy("a", "b").collect().map(key).toSeq
    val ref = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleLen = 3, minJaccard = 0.5, docFreqCap = Int.MaxValue)
      .orderBy("a", "b").collect().map(key).toSeq
    assert(px == ref && px.nonEmpty)
    Dedup.releaseIntermediates()
  }

  test("prefix-filtered Jaccard under docFreqCap equals the capped " +
      "inverted index (binding cap)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    // random corpus over a tiny vocabulary so many shingles exceed a
    // low cap — the capped-semantics regime, not the inert-cap one
    val rng = new scala.util.Random(13)
    val corpus = (0 until 60).map { i =>
      val n = 4 + rng.nextInt(10)
      (i.toLong, Seq.fill(n)(s"w${rng.nextInt(5)}").mkString(" "))
    }.toDF("doc_id", "text")
    for (cap <- Seq(3, 8, 20)) {
      val px = Dedup.ngramJaccardPairsPrefix(corpus, "text", "doc_id",
          shingleLen = 3, minJaccard = 0.3, docFreqCap = cap)
        .orderBy("a", "b").collect().map(key).toSeq
      val ref = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
          shingleLen = 3, minJaccard = 0.3, docFreqCap = cap)
        .orderBy("a", "b").collect().map(key).toSeq
      Dedup.releaseIntermediates()
      assert(px == ref, s"cap=$cap: ${px.size} vs ${ref.size}")
    }
  }

  test("lake artifacts: increment jobs scan the artifacts, never the " +
      "reference corpus; results equal the in-job operators") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      }.flatten
    val tmp = java.nio.file.Files.createTempDirectory("graft_lake").toString
    // lexical: ref docs live in parquet, so any re-shingle of the lake
    // would surface as a file scan of /refdocs
    docs.where($"doc_id" % 2 === 0).write.parquet(s"$tmp/refdocs")
    val refDocs = spark.read.parquet(s"$tmp/refdocs")
    val newDocs = docs.where($"doc_id" % 2 === 1)
    Dedup.writeBandedSignatures(refDocs, "text", "doc_id", s"$tmp/sigs")
    val cross = Dedup.minhashLshCrossFromArtifacts(newDocs,
      spark.read.parquet(s"$tmp/sigs"), "text", "doc_id",
      minEstJaccard = 0.5)
    val sp = scanPaths(cross)
    assert(sp.exists(_.contains("/sigs")), s"artifact not scanned: $sp")
    assert(!sp.exists(_.contains("/refdocs")), s"lake re-scanned: $sp")
    def pk(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val inJob = Dedup.minhashLshCross(newDocs, refDocs, "text", "doc_id",
      minEstJaccard = 0.5)
    assert(cross.collect().map(pk).sorted.toSeq ==
      inJob.collect().map(pk).sorted.toSeq)
    Dedup.releaseIntermediates()
    // semantic: same discipline for the codebook + keeper artifacts
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.00f, 1.00f)),
      (4L, Array(0.01f, 0.99f)), (5L, Array(-1.00f, -0.3f))
    ).toDF("vec_id", "embedding")
    vecs.where($"vec_id" % 2 === 0).write.parquet(s"$tmp/refemb")
    val refEmb = spark.read.parquet(s"$tmp/refemb")
    val newEmb = vecs.where($"vec_id" % 2 === 1)
    Similarity.writeSemDedupArtifacts(refEmb, "vec_id", "embedding",
      s"$tmp/sem", nlist = 2, nassign = 2, seed = 7L)
    val removed = Similarity.semDedupCrossFromArtifacts(newEmb,
      spark.read.parquet(s"$tmp/sem/keepers"),
      Similarity.readSemCodebook(spark, s"$tmp/sem"),
      "vec_id", "embedding", threshold = 0.9, nassign = 2)
    val sp2 = scanPaths(removed)
    assert(sp2.exists(_.contains("/sem/keepers")), s"keepers not scanned: $sp2")
    assert(!sp2.exists(_.contains("/refemb")), s"sem lake re-scanned: $sp2")
    def rk(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val semInJob = Similarity.semDedupCross(newEmb, refEmb, "vec_id",
      "embedding", threshold = 0.9, nlist = 2, nassign = 2, seed = 7L)
    assert(removed.collect().map(rk).sorted.toSeq ==
      semInJob.collect().map(rk).sorted.toSeq)
    Dedup.releaseIntermediates()
  }

  test("appendBandedSignatures enforces the LIFETIME bucketCap: a full " +
      "bucket admits nothing, a part-full bucket admits first-by-id up " +
      "to the remainder") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fold").toString
    val dup = "the quick brown fox jumps over the lazy dog again today"
    val uniq = "completely different words appear in this document here now"
    // ref: two copies of `dup` (every bucket at cap 2), one `uniq`
    val ref = Seq((0L, dup), (2L, dup), (4L, uniq)).toDF("doc_id", "text")
    Dedup.writeBandedSignatures(ref, "text", "doc_id", s"$tmp/sigs",
      bucketCap = 2)
    val before = spark.read.parquet(s"$tmp/sigs")
      .groupBy("band", "bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // survivors: one more `dup` (bucket full -> rejected everywhere) and
    // two more `uniq` (1 slot left -> only the lower id enrolls)
    val surv = Seq((5L, dup), (7L, uniq), (9L, uniq)).toDF("doc_id", "text")
    Dedup.appendBandedSignatures(surv, "text", "doc_id", s"$tmp/sigs",
      bucketCap = 2)
    val after = spark.read.parquet(s"$tmp/sigs")
    val counts = after.groupBy("band", "bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(counts.values.forall(_ <= 2L),
      s"cap violated across appends: $counts")
    val ids = after.select("id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L, 4L, 7L),
      s"expected dup-5 capped out, uniq-7 enrolled, uniq-9 capped: $ids")
    // the dup buckets were already full, so the append added only
    // uniq-7's rows to uniq's buckets
    assert(before.values.sum + 8 == counts.values.sum)
    // a later increment still FINDS the enrolled survivor
    val probe = Seq((11L, uniq)).toDF("doc_id", "text")
    val found = Dedup.minhashLshCrossFromArtifacts(probe,
      spark.read.parquet(s"$tmp/sigs"), "text", "doc_id",
      minEstJaccard = 0.9).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((7L, 11L)), s"appended sig not probed: $found")
    // plan guard: the append's lake read is column-pruned to the
    // (band, bucket) occupancy columns — never id/sig (the count is
    // strictly cheaper than the probe join every job 2 already pays)
    val appendPlan = Dedup.cappedAppendSignatures(surv, "text",
      "doc_id", spark.read.parquet(s"$tmp/sigs"), 3, 8, 2, 2)
    // sparkPlan, not executedPlan: AQE wraps the adaptive root with no
    // children, hiding leaf scans from collect
    val lakeScans = appendPlan.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("/sigs")) =>
        f.requiredSchema.fieldNames.toSet
    }
    assert(lakeScans.nonEmpty)
    assert(lakeScans.forall(_ == Set("band", "bucket")),
      s"append reads more than occupancy columns: $lakeScans")
  }

  test("appendSemKeepers rank-merges by the global priority under " +
      "keeperCap (displacing stored keepers) and re-appends are " +
      "idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fold2").toString
    // single cell (nlist=1): centroid = mean of ref = (0.5, 0.5);
    // keepFarthest -> farthest-from-centroid outranks, id ASC ties
    val ref = Seq((0L, Array(0f, 1f)), (2L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    Similarity.writeSemDedupArtifacts(ref, "vec_id", "embedding",
      s"$tmp/sem", nlist = 1, keeperCap = 2, seed = 7L)
    // survivor (-1, 0) is FARTHER from the centroid than either stored
    // keeper: it must displace the lower-priority one (the id-ASC
    // tie-break keeps 0 and evicts 2)
    val surv = Seq((5L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    Similarity.appendSemKeepers(surv, "vec_id", "embedding", s"$tmp/sem",
      keeperCap = 2)
    def keeperIds() = spark.read.parquet(s"$tmp/sem/keepers")
      .select("keeper").collect().map(_.getLong(0)).toSet
    assert(keeperIds() == Set(5L, 0L), s"rank-merge wrong: ${keeperIds()}")
    // idempotent: folding the same survivors in again changes nothing
    Similarity.appendSemKeepers(surv, "vec_id", "embedding", s"$tmp/sem",
      keeperCap = 2)
    assert(keeperIds() == Set(5L, 0L))
    assert(spark.read.parquet(s"$tmp/sem/keepers").count() == 2L)
    // a later increment near the folded-in survivor is removed BY it
    val inc = Seq((9L, Array(-0.99f, -0.01f))).toDF("vec_id", "embedding")
    val removed = Similarity.semDedupCrossFromArtifacts(inc,
      spark.read.parquet(s"$tmp/sem/keepers"),
      Similarity.readSemCodebook(spark, s"$tmp/sem"),
      "vec_id", "embedding", threshold = 0.9).collect()
    assert(removed.length == 1 && removed(0).getLong(0) == 9L &&
      removed(0).getLong(1) == 5L,
      s"folded keeper did not remove its near-dup: ${removed.toSeq}")
    Dedup.releaseIntermediates()
  }

  test("fused lake steps equal the two-job path: same survivors, same " +
      "lake contents, one signing/assignment pass") {
    import org.apache.spark.sql.DataFrame
    val tmp = java.nio.file.Files.createTempDirectory("graft_fuse").toString
    val ref = docs.where($"doc_id" % 2 === 0)
    val inc = docs.where($"doc_id" % 2 === 1)
    def ids(df: DataFrame, c: String = "doc_id") =
      df.select(c).collect().map(_.getLong(0)).toSet
    // ---- near-dup column
    Dedup.writeBandedSignatures(ref, "text", "doc_id", s"$tmp/a")
    Dedup.writeBandedSignatures(ref, "text", "doc_id", s"$tmp/b")
    val pairs = Dedup.minhashLshCrossFromArtifacts(inc,
      spark.read.parquet(s"$tmp/a"), "text", "doc_id",
      minEstJaccard = 0.35)
    val removed = pairs.select(
      when($"a" % 2 === 1, $"a").otherwise($"b").as("doc_id")).distinct()
    val survA = inc.join(removed, Seq("doc_id"), "left_anti")
    // materialize BEFORE the append — the two-job caller's ordering
    // duty (the fused step does its own eager cut internally)
    val survAIds = ids(survA)
    Dedup.appendBandedSignatures(survA, "text", "doc_id", s"$tmp/a")
    val survB = Dedup.minhashLshLakeStep(inc, "text", "doc_id",
      s"$tmp/b", minEstJaccard = 0.35)
    assert(survAIds == ids(survB),
      s"survivors differ: $survAIds vs ${ids(survB)}")
    def sigRows(p: String) = spark.read.parquet(p)
      .select("id", "band", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(sigRows(s"$tmp/a") == sigRows(s"$tmp/b"))
    Dedup.releaseIntermediates()
    // ---- semantic column
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)), (2L, Array(0.00f, 1.00f)),
      (1L, Array(0.99f, 0.01f)), // near-dup of 0 -> removed
      (3L, Array(-1.00f, 0.00f)), (5L, Array(0.02f, 0.98f))
    ).toDF("vec_id", "embedding")
    val vRef = vecs.where($"vec_id" % 2 === 0)
    val vInc = vecs.where($"vec_id" % 2 === 1)
    Similarity.writeSemDedupArtifacts(vRef, "vec_id", "embedding",
      s"$tmp/sa", nlist = 2, nassign = 2, seed = 7L)
    Similarity.writeSemDedupArtifacts(vRef, "vec_id", "embedding",
      s"$tmp/sb", nlist = 2, nassign = 2, seed = 7L)
    val vRemoved = Similarity.semDedupCrossFromArtifacts(vInc,
      spark.read.parquet(s"$tmp/sa/keepers"),
      Similarity.readSemCodebook(spark, s"$tmp/sa"),
      "vec_id", "embedding", threshold = 0.9, nassign = 2)
    val vSurvA = vInc.join(vRemoved.select($"id".as("vec_id")),
      Seq("vec_id"), "left_anti")
    // materialize before the keeper-table rewrite: this plan reads the
    // table the append replaces
    val vSurvAIds = ids(vSurvA, "vec_id")
    Similarity.appendSemKeepers(vSurvA, "vec_id", "embedding",
      s"$tmp/sa", nassign = 2)
    val vSurvB = Similarity.semDedupLakeStep(vInc, "vec_id",
      "embedding", s"$tmp/sb", threshold = 0.9, nassign = 2)
    assert(vSurvAIds == ids(vSurvB, "vec_id"))
    assert(ids(vSurvB, "vec_id") == Set(3L)) // 1 removed by 0, 5 by 2
    def keeperRows(p: String) = spark.read.parquet(s"$p/keepers")
      .select("cell", "keeper").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(keeperRows(s"$tmp/sa") == keeperRows(s"$tmp/sb"))
    Dedup.releaseIntermediates()
  }

  test("hashSplit deterministically partitions into the named bands") {
    val rows = (0L until 200L).toDF("id")
    val bands = Seq(("train", 80), ("val", 90), ("test", 100))
    val s1 = Sampling.hashSplit(rows, "id", bands)
    val m = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.values.sum == 200L && m.keySet == Set("train", "val", "test"))
    assert(m("train") > 120L && m("train") < 190L) // ~80% of 200
    assert(s1.except(Sampling.hashSplit(rows, "id", bands)).count() == 0)
  }

  test("packByBudget cuts bins at cumulative-budget boundaries") {
    val rows = Seq(("g", 1L, 500L), ("g", 2L, 600L), ("g", 3L, 600L),
      ("g", 4L, 100L), ("h", 9L, 50L)).toDF("grp", "id", "tok")
    val bins = Sampling.packByBudget(rows, "grp", "id", "tok", budget = 1000L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // cum-before: 0, 500, 1100, 1700 -> bins 0, 0, 1, 1; fresh group -> 0
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 9L -> 0L))
  }

  test("packTokens: concat-and-split — documents straddle, every " +
      "sequence but the last is exactly full") {
    val toks = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "d"), (2L, 2L, "e"), (2L, 3L, "f"), (2L, 4L, "g"),
      (3L, 1L, "h"), (3L, 2L, "i")).toDF("doc_id", "pos", "token")
    val p = Sampling.packTokens(toks, seqLen = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // global stream d1(0..2) d2(3..6) d3(7..8): d2 STRADDLES seq 0/1
    assert(p == Map(
      (1L, 1L) -> (0L, 0L), (1L, 2L) -> (0L, 1L), (1L, 3L) -> (0L, 2L),
      (2L, 1L) -> (0L, 3L), (2L, 2L) -> (1L, 0L), (2L, 3L) -> (1L, 1L),
      (2L, 4L) -> (1L, 2L),
      (3L, 1L) -> (1L, 3L), (3L, 2L) -> (2L, 0L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("packTokens grouped: per-group numbering in (orderCol, doc) " +
      "order; orderCol without groupCol is rejected") {
    val toks = Seq(
      // group g: doc 20 ordered FIRST (ord 1) despite the larger id
      ("g", 20L, 1L, 1L, "a"), ("g", 20L, 1L, 2L, "b"),
      ("g", 10L, 2L, 1L, "c"),
      ("h", 30L, 1L, 1L, "d"), ("h", 30L, 1L, 2L, "e"),
      ("h", 30L, 1L, 3L, "f"))
      .toDF("grp", "doc_id", "ord", "pos", "token")
    val p = Sampling.packTokens(toks, seqLen = 2L,
        groupCol = Some("grp"), orderCol = Some("ord"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)) ->
        (r.getLong(5), r.getLong(6))).toMap
    assert(p == Map(
      ("g", 20L, 1L) -> (0L, 0L), ("g", 20L, 2L) -> (0L, 1L),
      ("g", 10L, 1L) -> (1L, 0L),
      ("h", 30L, 1L) -> (0L, 0L), ("h", 30L, 2L) -> (0L, 1L),
      ("h", 30L, 3L) -> (1L, 0L)))
    intercept[IllegalArgumentException] {
      Sampling.packTokens(toks, 2L, orderCol = Some("ord"))
    }
    graft.operators.Dedup.releaseIntermediates()
  }

  test("packTokens refuses non-contiguous positions — a mid-document " +
      "gap (e.g. an upstream null-id filter) raises naming the doc " +
      "instead of silently packing holey sequences") {
    val gapped = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 4L, "d"), // pos 3 missing
      (2L, 1L, "c"), (2L, 2L, "e")).toDF("doc_id", "pos", "token")
    val e = intercept[Exception] {
      Sampling.packTokens(gapped, 2L).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(e).contains("non-contiguous"), msgs(e))
    // a head-drop (pos 2..n) is caught by the same max==count guard
    val headless = Seq((1L, 2L, "b"), (1L, 3L, "c"))
      .toDF("doc_id", "pos", "token")
    val e2 = intercept[Exception] {
      Sampling.packTokens(headless, 2L).collect()
    }
    assert(msgs(e2).contains("non-contiguous"), msgs(e2))
    // a DUPLICATE-masked gap (pos 1,2,2,4: max=count=4) would pass a
    // max==count check alone and silently produce colliding
    // (seq, seq_off) slots — the distinct-count leg catches it
    val dupMasked = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 2L, "b2"),
      (1L, 4L, "d")).toDF("doc_id", "pos", "token")
    val e3 = intercept[Exception] {
      Sampling.packTokens(dupMasked, 2L).collect()
    }
    assert(msgs(e3).contains("non-contiguous"), msgs(e3))
    // and a zero-based run (pos 0..n-1: max<count but distinct=count)
    // is pinned by the min==1 leg
    val zeroBased = Seq((1L, 0L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (1L, 4L, "d")).toDF("doc_id", "pos", "token")
    val e4 = intercept[Exception] {
      Sampling.packTokens(zeroBased, 2L).collect()
    }
    assert(msgs(e4).contains("non-contiguous"), msgs(e4))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("shardAssignOrdered: documents stream in (score, id) order — " +
      "curriculum-monotone shards, running-weight offsets") {
    val rows = Seq((1L, 5L, 30L), (2L, 5L, 10L), (3L, 5L, 20L),
      (4L, 5L, 10L)).toDF("doc_id", "w", "score")
    // order (10,2),(10,4),(20,3),(30,1); cum-before 0,5,10,15; /10
    val a = Sampling.shardAssignOrdered(rows, "doc_id", "w",
        orderCol = "score", shardWeight = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(a == Map(2L -> (0L, 0L), 4L -> (0L, 5L),
      3L -> (1L, 0L), 1L -> (1L, 5L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("appendDocSeparator: one boundary token per document at " +
      "max(pos)+1; doc-constant columns ride along") {
    val toks = Seq((1L, "g", 1L, "a"), (1L, "g", 2L, "b"),
      (2L, "h", 1L, "c")).toDF("doc_id", "grp", "pos", "token")
    val r = Sampling.appendDocSeparator(toks, "<eos>")
      .orderBy("doc_id", "pos").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getString(3))).toSeq
    assert(r == Seq(
      (1L, "g", 1L, "a"), (1L, "g", 2L, "b"), (1L, "g", 3L, "<eos>"),
      (2L, "h", 1L, "c"), (2L, "h", 2L, "<eos>")))
  }

  test("appendDocSeparator explicit keys: per-token extras are " +
      "DROPPED from the group (one separator per document, fixed " +
      "output schema); keys naming pos/token are rejected") {
    // `score` varies per token — the inferred-keys form would emit
    // one separator per (doc, score) combination; explicit keys pin
    // the document identity and drop the extra column
    val toks = Seq((1L, 1L, "a", 0.1), (1L, 2L, "b", 0.9),
      (2L, 1L, "c", 0.5)).toDF("doc_id", "pos", "token", "score")
    val r = Sampling.appendDocSeparator(toks, "<eos>",
        keys = Seq("doc_id"))
      .orderBy("doc_id", "pos").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq
    assert(r == Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "<eos>"),
      (2L, 1L, "c"), (2L, 2L, "<eos>")))
    intercept[IllegalArgumentException] {
      Sampling.appendDocSeparator(toks, "<eos>",
        keys = Seq("doc_id", "pos"))
    }
  }

  test("prependDocStart: one bos row per doc at position 1, real " +
      "tokens shift up one; composes with appendDocSeparator and " +
      "packs without tripping the contiguity guard") {
    val toks = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c"))
      .toDF("doc_id", "pos", "token")
    val bos = Sampling.prependDocStart(toks, "<bos>")
    assert(bos.orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 1L, "<bos>"), (1L, 2L, "a"), (1L, 3L, "b"),
        (2L, 1L, "<bos>"), (2L, 2L, "c")))
    // bos-then-eos: eos lands after the shifted last token
    val both = Sampling.appendDocSeparator(bos, "<eos>")
    val d1 = both.where($"doc_id" === 1).orderBy("pos").collect()
      .map(_.getString(2)).toSeq
    assert(d1 == Seq("<bos>", "a", "b", "<eos>"))
    // positions stay 1-based consecutive -> the pack guard passes
    assert(Sampling.packTokens(both, 3L).count() == 7)
    intercept[IllegalArgumentException] {
      Sampling.prependDocStart(toks, "<bos>", keys = Seq("pos"))
    }
    graft.operators.Dedup.releaseIntermediates()
  }

  test("epochSchedule: ranks complete per level, same epoch " +
      "reproduces exactly, different epochs permute") {
    val pairs = (for (s <- 0L to 3L; q <- 0L to 4L) yield (s, q))
      .toDF("shard", "seq")
    def sched(e: Long) = Sampling.epochSchedule(pairs, epoch = e)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq"))
        -> (r.getAs[Long]("shard_rank"), r.getAs[Long]("seq_rank")))
      .toMap
    val e1 = sched(1L)
    // complete: shard ranks are a permutation of 1..4, seq ranks 1..5
    // within every shard
    assert(e1.values.map(_._1).toSet == (1L to 4L).toSet)
    (0L to 3L).foreach { s =>
      assert(e1.collect { case ((sh, _), (_, r)) if sh == s => r }
        .toSet == (1L to 5L).toSet)
    }
    // deterministic: the same epoch replays bit for bit
    assert(sched(1L) == e1)
    // decorrelated: another epoch is a different permutation
    val e2 = sched(2L)
    assert(e2 != e1)
    // delimiter injectivity: (epoch=1, salt="2graft") and
    // (epoch=12, salt="graft") must NOT collide — the '|' between
    // the epoch and salt hash components keeps (epoch, salt) → key
    // injective
    def schedS(e: Long, s: String) =
      Sampling.epochSchedule(pairs, epoch = e, salt = s)
        .collect().map(r => (r.getAs[Long]("shard"),
          r.getAs[Long]("seq"))
          -> (r.getAs[Long]("shard_rank"), r.getAs[Long]("seq_rank")))
        .toMap
    assert(schedS(1L, "2graft") != schedS(12L, "graft"))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("ewmMean matches the closed-form truncated weights") {
    val rows = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
      .toDF("g", "i", "v")
    val e = WindowOps.ewmMean(rows, "v", Seq("g"), Seq("i"),
        alpha = 0.5, window = 4)
      .orderBy("i").collect().map(_.getDouble(3))
    assert(math.abs(e(0) - 10.0) < 1e-5)
    assert(math.abs(e(1) - (20.0 + 0.5 * 10.0) / 1.5) < 1e-5)
    assert(math.abs(e(2) - (30.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75) < 1e-5)
  }

  test("anomalyZScore nulls short baselines and flags the spike") {
    val rows = ((1 to 20).map(i =>
      ("a", i.toLong, if (i % 2 == 0) 2.0 else 1.0)) :+ ("a", 21L, 100.0))
      .toDF("g", "i", "v")
    val r = WindowOps.anomalyZScore(rows, "v", Seq("g"), Seq("i"),
      n = 48, minPeriods = 12, z = 3.0).orderBy("i").collect()
    assert(r.take(12).forall(_.isNullAt(3))) // cnt < minPeriods
    assert(r(12).getDouble(3) != 0.0)        // first scored row
    assert(r.last.getLong(4) == 1L)          // the spike
    assert(r(13).getLong(4) == 0L)           // a normal row
  }

  test("anomalyZScoreChunked equals the keyed window bit for bit") {
    // 3 keys x 700 rows of varied values; bucketRows=128 forces ~6
    // buckets per key AND context replication across every boundary;
    // rangeParts=7 exercises keys spanning multiple range partitions
    // (the ordinal offset arithmetic)
    val rows = (for (g <- Seq("a", "b", "c"); i <- 1 to 700) yield
      (g, i.toLong, ((i * 37 + g.hashCode) % 101).toDouble))
      .toDF("g", "i", "v")
    val plain = WindowOps.anomalyZScore(rows, "v", Seq("g"), Seq("i"),
        n = 48, minPeriods = 12, z = 2.0)
      .select("g", "i", "v", "zscore", "is_anomaly")
      .orderBy("g", "i").collect().toSeq
    val chunked = WindowOps.anomalyZScoreChunked(rows, "v", Seq("g"),
        Seq("i"), n = 48, minPeriods = 12, z = 2.0,
        bucketRows = 128, rangeParts = 7)
      .select("g", "i", "v", "zscore", "is_anomaly")
      .orderBy("g", "i").collect().toSeq
    assert(chunked == plain) // Row equality: exact doubles, exact nulls
    graft.operators.Dedup.releaseIntermediates()
  }

  test("rollingMeanChunked equals the keyed window bit for bit") {
    val rows = (for (g <- Seq("a", "b"); i <- 1 to 500) yield
      (g, i.toLong, ((i * 31 + g.hashCode) % 97).toDouble))
      .toDF("g", "i", "v")
    val plain = WindowOps.rollingMean(rows, "v", 10, Seq("g"), Seq("i"))
      .orderBy("g", "i").collect().toSeq
    val chunked = WindowOps.rollingMeanChunked(rows, "v", 10, Seq("g"),
        Seq("i"), bucketRows = 64, rangeParts = 5)
      .select("g", "i", "v", "rolling_mean")
      .orderBy("g", "i").collect().toSeq
    assert(chunked == plain)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("equalFrequencyBins sizes differ by at most one and cover all rows") {
    val rows = (0 until 103).map(i => ((i * 37) % 103).toDouble).toDF("v")
    val bins = WindowOps.equalFrequencyBins(rows, "v", Seq("v"), k = 10)
      .orderBy("bin").collect()
    assert(bins.length == 10)
    assert(bins.map(_.getLong(1)).sum == 103L)
    assert(bins.map(_.getLong(1)).forall(n => n == 10L || n == 11L))
    assert(bins.head.getDouble(2) == 0.0 && bins.last.getDouble(3) == 102.0)
  }

  test("groupCentroids averages per dimension; l2Normalize yields unit norm") {
    val vecs = Seq((0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
      (1, Array(2.0f, 2.0f))).toDF("label", "embedding")
    val c = Similarity.groupCentroids(vecs, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c == Map((0, 1L) -> 2.0, (0, 2L) -> 4.0,
      (1, 1L) -> 2.0, (1, 2L) -> 2.0))
    val norms = vecs.select(
        Similarity.l2Norm(Similarity.l2Normalize(col("embedding"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(x => math.abs(x - 1.0) < 1e-9))
  }

  test("patternProfile counts regex occurrences per row") {
    val d = Seq((1L, "contact a@b.com and c@d.org plus 12 and 3456"))
      .toDF("id", "text")
    val r = d.select(col("id") +: TextOps.patternProfile(col("text"), Seq(
      "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "digits" -> "[0-9]+")): _*).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  test("corrMatrix: perfect correlation, anti-correlation, pairwise-complete") {
    val f = graft.core.EnergyFrame(Seq(
      (1L, 1.0, 2.0, Some(4.0)), (2L, 2.0, 4.0, Some(3.0)),
      (3L, 3.0, 6.0, Some(2.0)), (4L, 4.0, 8.0, None))
      .toDF("i", "a", "b", "c"), Seq("i"))
    val m = f.corrMatrix().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("a", "b")) == 1.0)   // b = 2a exactly
    assert(m(("a", "c")) == -1.0)  // over the 3 complete rows, c = 5 - a
    assert(m(("b", "c")) == -1.0)
  }

  test("groupLinearRegression recovers an exact fit; degenerate -> NULL") {
    val rows = Seq(("g", 0.0, 1.0), ("g", 1.0, 3.0), ("g", 2.0, 5.0),
      ("h", 7.0, 2.0)).toDF("grp", "x", "y")
    val r = Analytics.groupLinearRegression(rows, Seq("grp"),
        col("x"), col("y"))
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("g").getDouble(2) == 2.0 && r("g").getDouble(3) == 1.0)
    assert(r("h").isNullAt(2) && r("h").isNullAt(3)) // single point
  }

  test("winnowed fingerprints keep the shared-substring guarantee") {
    // k=8, w=4: any shared substring of length >= w+k-1 = 11 must yield a
    // shared fingerprint. Docs 0/1 share a 40-char prefix; 0/3 identical.
    val pairs = Dedup.winnowedFingerprintPairs(docs, "text", "doc_id",
        k = 8, w = 4, minShared = 1, docFreqCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L))
      && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated doc
    // and it indexes strictly fewer keys than the full-window variant
    Dedup.releaseIntermediates()
  }

  test("aggPartsFor: defaults on small/missing stats, saturates at the " +
      "cap on huge stats, never wraps negative") {
    // small input -> the session default, never fewer tasks
    assert(Dedup.aggPartsFor(BigInt(1024), 32) == 32)
    assert(Dedup.aggPartsFor(BigInt(0), 32) == 32)
    // linear in-between: one task per ~4 MB
    assert(Dedup.aggPartsFor(BigInt(400L * (4L << 20)), 32) == 400)
    // missing stats surface as defaultSizeInBytes = Long.MaxValue -> cap
    assert(Dedup.aggPartsFor(BigInt(Long.MaxValue), 32) == 4096)
    // derived-input stats multiply past Long range; a bare .toLong
    // would WRAP (possibly negative) and collapse to the default
    // exactly when the input is largest — clamp must win instead
    val huge = BigInt(Long.MaxValue) * BigInt(Long.MaxValue)
    assert(Dedup.aggPartsFor(huge, 32) == 4096)
    assert((huge / (4L << 20)).toLong < 0 || // the wrap this guards
      (huge / (4L << 20)) > BigInt(Long.MaxValue))
  }

  test("native wordShingles is bit-identical to the HOF formulation " +
      "(multi-space, empties, unicode, short docs, distinct fold)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, col}
    // edge zoo: consecutive/leading/trailing spaces (empty words),
    // repeated shingles (distinct path), non-BMP text, shorter than n,
    // empty and single-word strings
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",
      "x  y   z", // empty words from double/triple spaces
      " leading and trailing ",
      "数据 模型 数据 模型 训练",
      "😀 «mot» 😀 «mot» naïve",
      "one two", "solo", "",
      "dup pair dup pair dup pair dup pair").toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = docs.select(
        Dedup.wordShingles(col("text"), n).as("native"),
        Dedup.wordShinglesHof(col("text"), n).as("hof"),
        Dedup.wordShinglesDistinct(col("text"), n).as("nd"),
        array_distinct(Dedup.wordShinglesHof(col("text"), n)).as("hd"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"plain n=$n: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
        assert(r.getSeq[String](2) == r.getSeq[String](3),
          s"distinct n=$n: ${r.getSeq[String](2)} vs ${r.getSeq[String](3)}")
      }
    }
    // null input -> EMPTY ARRAY on both paths (the HOF's filter over a
    // literal index sequence empties the all-null transform, and the
    // native kernel mirrors that)
    val nr = Seq[Option[String]](None).toDF("text")
      .select(Dedup.wordShingles(col("text"), 3).as("native"),
        Dedup.wordShinglesHof(col("text"), 3).as("hof")).collect().head
    assert(!nr.isNullAt(0) && nr.getSeq[String](0).isEmpty)
    assert(!nr.isNullAt(1) && nr.getSeq[String](1).isEmpty)
  }

  implicit class MediaOps(m: Multimodal.MediaFeature) {
    def sha_eq(o: Multimodal.MediaFeature): Boolean =
      m.n_bytes == o.n_bytes && m.width == o.width && m.height == o.height
  }
}
