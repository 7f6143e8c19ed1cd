package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Curation, WindowOps}
import graft.streaming.StreamDedup

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("calibrate→run: pickCalibratedThreshold takes the most " +
      "aggressive threshold meeting the weight target, from the " +
      "artifact alone") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cal").toString
    // scores 0.1..1.0, weight 10 each: threshold t keeps (11-10t)/10
    // of the weight -> 0.5 keeps 0.6, 0.6 keeps 0.5, ...
    val rows = (1 to 10).map(i => (i.toLong, i / 10.0, 10L))
      .toDF("id", "score", "w")
    Curation.writeFilterCalibration(rows, "score", "w",
      Seq(0.2, 0.5, 0.6, 0.9), s"$tmp/curve")
    assert(Curation.pickCalibratedThreshold(spark, s"$tmp/curve",
      minWeightFrac = 0.55) == 0.5) // 0.5 keeps 0.6; 0.6 keeps only 0.5
    assert(Curation.pickCalibratedThreshold(spark, s"$tmp/curve",
      minWeightFrac = 0.1) == 0.9) // most aggressive when all qualify
    intercept[IllegalArgumentException] {
      Curation.pickCalibratedThreshold(spark, s"$tmp/curve",
        minWeightFrac = 0.99) // nothing retains 99%
    }
    // the composed run filters exactly the rows the curve promised:
    // threshold 0.5 keeps scores >= 0.5 = 6 docs, 60 weight
    val thr = Curation.pickCalibratedThreshold(spark, s"$tmp/curve", 0.55)
    val kept = rows.where(col("score") >= thr)
    assert(kept.count() == 6L)
    assert(kept.agg(sum("w")).collect()(0).getLong(0) == 60L)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("dsirSelect: importance ratio ranks target-like docs first, " +
      "matches the hand-computed smoothed log ratio, enforces k") {
    // features (B=1024, salt 'graft', no bucket collisions — verified):
    // doc 1 (target) "a a" -> a,a,'a a'; doc 2 "b b" -> b,b,'b b';
    // doc 3 "a b" -> a,b,'a b'. Target model: a:2,'a a':1 (T=3);
    // raw model: a:3,b:3,'a a':1,'b b':1,'a b':1 (R=9).
    val docs = Seq((1L, "a a", true), (2L, "b b", false),
      (3L, "a b", false)).toDF("doc_id", "text", "t")
    val r = Curation.dsirSelect(docs, "text", "doc_id", col("t"),
      buckets = 1024, k = 3).collect()
    def term(t: Int, rc: Int): BigDecimal =
      BigDecimal(math.log((t + 1.0) / (3 + 1024.0)) -
        math.log((rc + 1.0) / (9 + 1024.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def w(terms: BigDecimal*): Double =
      (terms.sum.toDouble * 1e6).round / 1e6
    val expect = Map(
      1L -> w(term(2, 3), term(2, 3), term(1, 1)),
      2L -> w(term(0, 3), term(0, 3), term(0, 1)),
      3L -> w(term(2, 3), term(0, 3), term(0, 1)))
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L)) // target-like first
    r.foreach { row =>
      assert(row.getLong(1) == 3L) // n_features = 2*len-1
      assert(row.getDouble(2) == expect(row.getLong(0)))
    }
    // k bound: top-2 only, same order
    assert(Curation.dsirSelect(docs, "text", "doc_id", col("t"),
      buckets = 1024, k = 2).collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))
  }

  test("writeDsirModel + dsirScoreMicro: dense fixed-point artifact, " +
      "hand-computed scores, smoothed prior for unseen features") {
    // same fixture as dsirSelect: target a:2,'a a':1 (T=3); raw
    // a:3,b:3,'a a':1,'b b':1,'a b':1 (R=9); B=1024, no collisions
    val docs = Seq((1L, "a a", true), (2L, "b b", false),
      (3L, "a b", false)).toDF("doc_id", "text", "t")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsir")
      .toString + "/model"
    Curation.writeDsirModel(docs, "text", col("t"), buckets = 1024,
      salt = "graft", tmp)
    val model = spark.read.parquet(tmp)
      .select(col("b"), col("lr_micro")).orderBy("b").collect()
    assert(model.length == 1024 && model.head.getLong(0) == 0L)
    val lr = model.map(_.getLong(1))
    def micro(t: Int, r: Int): Long =
      BigDecimal((math.log((t + 1.0) / (3 + 1024.0)) -
        math.log((r + 1.0) / (9 + 1024.0))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // every never-hit bucket carries the smoothed prior ratio
    assert(lr(0) == micro(0, 0))
    val scored = graft.streaming.StreamDsirGate.batch(
      docs.withColumn("doc_id", col("doc_id"))
        .union(Seq((4L, "zzz qqq", false)).toDF("doc_id", "text", "t")),
      "text", "doc_id", lr, minMicro = Long.MinValue)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    val expect = Map(
      1L -> (2 * micro(2, 3) + micro(1, 1)),
      2L -> (2 * micro(0, 3) + micro(0, 1)),
      3L -> (micro(2, 3) + micro(0, 3) + micro(0, 1)),
      4L -> 3 * micro(0, 0)) // all features unseen -> prior ratio
    assert(scored == Seq(1L, 2L, 3L, 4L).map(i => (i, expect(i))))
    // the gate thresholds exactly: pick the midpoint of docs 3 and 1
    val thr = (expect(3L) + expect(1L)) / 2
    val admitted = graft.streaming.StreamDsirGate.batch(docs, "text",
      "doc_id", lr, minMicro = thr).collect().map(_.getLong(0)).toSeq
    assert(admitted == Seq(
      Seq(1L, 2L, 3L).filter(i => expect(i) >= thr): _*))
  }

  test("appendDsirModel: fold-in artifact is BIT-IDENTICAL to a " +
      "from-scratch rebuild on the union") {
    val even = Seq((0L, "a a", true), (2L, "a b", false))
      .toDF("doc_id", "text", "t")
    val odd = Seq((1L, "b b", false), (3L, "b a b", true))
      .toDF("doc_id", "text", "t")
    val base = java.nio.file.Files.createTempDirectory("graft_dsirf")
      .toString
    Curation.writeDsirModel(even, "text", col("t"), buckets = 1024,
      salt = "graft", s"$base/folded")
    Curation.appendDsirModel(odd, "text", col("t"), salt = "graft",
      s"$base/folded")
    Curation.writeDsirModel(even.union(odd), "text", col("t"),
      buckets = 1024, salt = "graft", s"$base/rebuilt")
    def rows(p: String) = spark.read.parquet(p).orderBy("b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val folded = rows(s"$base/folded")
    assert(folded == rows(s"$base/rebuilt"))
    // and it is a real model of the union (nonzero target mass)
    assert(folded.map(_._3).sum == 3L + 5L) // 'a a' feats + 'b a b' feats
  }

  test("bpeMerges: learns the classic low/lower/lowest merges with " +
      "deterministic tie-breaks, ignores non-alpha words") {
    // vocab: low:3, lower:1, lowest:1 ("Low!" is filtered). Round 1
    // ties (l,o)=5 with (o,w)=5 -> lex pick (l,o); then (lo,w)=5,
    // (low,e)=2, and a 3-way tie at 1 -> (lowe,r).
    val docs = Seq((1L, "low low lower Low!"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text", merges = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(m == Seq(
      (1L, "l", "o", "lo", 5L),
      (2L, "lo", "w", "low", 5L),
      (3L, "low", "e", "lowe", 2L),
      (4L, "lowe", "r", "lower", 1L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpeMerges: overlapping-run merge is left-to-right BPE " +
      "(aaaa -> aa aa), and learning stops when no pair remains") {
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text", merges = 5)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .toSeq
    // (a,a) counts overlapping-adjacent (3 per word x 2 words); the
    // merge leaves TWO 'aa' symbols per word, so round 2 sees (aa,aa)
    // once per word; round 3 has a single symbol -> early stop.
    assert(m == Seq((1L, "aa", 6L), (2L, "aaaa", 2L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpeTokenCounts: encodes under learned merges in order, " +
      "counts OOV words as one token") {
    val docs = Seq((1L, "low low lower Low!"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text", merges = 4)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val r = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", m)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    // doc 1: low,low,lower each one merged token + "low!" OOV = 4;
    // doc 2: low (1) + lowest -> lowe|s|t (3) = 4
    assert(r == Seq((1L, 4L, 4L), (2L, 2L, 4L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpeTokenCounts: the native encoder takes the pass-based " +
      "fallback on a non-well-formed merge list and still equals " +
      "sequential pass application") {
    // ("ab","c") ranked BEFORE ("a","b") references a symbol no
    // earlier merge produces — the rank-priority precondition fails.
    // Sequential passes on "abc": pass 1 finds no "ab" symbol, pass 2
    // yields ab|c -> 2 tokens. A rank-priority encode would merge
    // (a,b) first and then see (ab,c) -> 1 token — the fallback is
    // what keeps list order authoritative.
    val merges = Seq(("ab", "c"), ("a", "b"))
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val r = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", merges)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSeq
    assert(r == Seq((1L, 2L)))
    // and an empty merge list is the degenerate char-count tokenizer
    // (the oracle-totality contract: a corpus with no learnable pair
    // must not fail the encode job)
    val r0 = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", Nil)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSeq
    assert(r0 == Seq((1L, 3L)))
  }

  test("bpeTokenCounts: plan carries the native bpe_token_count " +
      "expression, not a regex chain") {
    // range-backed input: a local Seq relation would constant-fold the
    // whole projection into a LocalTableScan and hide the expression
    val docs = spark.range(1, 3).select(col("id").as("doc_id"),
      concat(lit("low lower doc"), col("id")).as("text"))
    val plan = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", Seq(("l", "o")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_token_count"))
    assert(!plan.contains("regexp_replace"))
  }

  test("bpeTokenize: emits the pieces in document order, OOV words " +
      "pass through whole, and size agrees with bpeTokenCounts") {
    val docs = Seq((1L, "low lower Low!"), (2L, "lowest"))
      .toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 4).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", m)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // merges learned on vocab {low:2, lower:1, lowest:1}: lo, low,
    // lowe, lower -> doc 1: low | lower | "low!" (OOV, lowercased);
    // doc 2: lowe|s|t
    assert(toks == Seq((1L, 1L, "low"), (1L, 2L, "lower"),
      (1L, 3L, "low!"), (2L, 1L, "lowe"), (2L, 2L, "s"),
      (2L, 3L, "t")))
    // size(tokenize) == token count, by construction on both paths
    val counts = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sizes = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(sizes == counts)
    // the pass-based fallback emits pieces too (the q213 divergence
    // list): "abc" under [(ab,c),(a,b)] -> ab | c
    val fb = graft.operators.Tokenizer.bpeTokenize(
        Seq((1L, "abc")).toDF("doc_id", "text"), "text", "doc_id",
        Seq(("ab", "c"), ("a", "b")))
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(fb == Seq("ab", "c"))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe unicode mode: accented/CJK/digit words enter the learned " +
      "vocabulary (ascii mode passes the same corpus through as OOV)") {
    val docs = Seq((1L, "café café 数据 数据 数据"),
      (2L, "übung 123 café")).toDF("doc_id", "text")
    // vocab {café:3, 数据:3, übung:1, 123:1}; round 1 ties at 3 —
    // (a,f) < (c,a) < (f,é) < (数,据) lexicographically; round 2 then
    // sees (af,é)=3 and (c,af)=3 and (数,据)=3 — (af,é) wins.
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 2, unicode = true)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(m == Seq(("a", "f", 3L), ("af", "é", 3L)))
    val pairs = m.map { case (l, r, _) => (l, r) }
    val uni = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", pairs, unicode = true)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    // doc 1: café -> c|afé (2) x2, 数据 -> 数|据 (2) x3 = 10 tokens;
    // doc 2: übung (5 code points) + 123 (3) + café (2) = 10
    assert(uni == Seq((1L, 5L, 10L), (2L, 3L, 10L)))
    // the ascii tokenizer sees the SAME corpus as pure OOV passthrough
    // — one token per word, the quiet narrowing the unicode mode lifts
    val ascii = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", pairs)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSeq
    assert(ascii == Seq((1L, 5L), (2L, 3L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe unicode mode: symbols are CODE POINTS — supplementary-" +
      "plane characters stay whole, and size(tokenize) == count") {
    // U+1D41A/U+1D41B (mathematical bold a/b): letters outside the
    // BMP, two chars each — a per-char split would emit lone
    // surrogates
    val w = new String(Character.toChars(0x1D41A)) +
      new String(Character.toChars(0x1D41B))
    val docs = Seq((1L, w)).toDF("doc_id", "text")
    val toks = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", Nil, unicode = true)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(toks.length == 2)
    assert(toks.forall(t =>
      t.length == 2 && t.codePointCount(0, t.length) == 1))
    val n = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", Nil, unicode = true)
      .collect().head.getLong(2)
    assert(n == 2L)
    // and a merge of the two supplementary symbols applies cleanly
    val merged = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id",
        Seq((toks(0), toks(1))), unicode = true)
      .collect().head.getLong(2)
    assert(merged == 1L)
  }

  test("bpe byte fallback: the shared alphabet maps out-of-class " +
      "code points to UTF-8 byte placeholders, in-class stay whole") {
    import graft.functions.BpeByteAlphabet
    def sym(b: Int) = String.valueOf((0x2500 + b).toChar)
    // ASCII punctuation: 1 byte (don't -> d o n <27> t)
    assert(BpeByteAlphabet.symbols("don't").toSeq ==
      Seq("d", "o", "n", sym(0x27), "t"))
    // in-class letters (accented included) stay code points
    assert(BpeByteAlphabet.symbols("café").toSeq ==
      Seq("c", "a", "f", "é"))
    // en dash U+2013: 3 bytes E2 80 93
    assert(BpeByteAlphabet.symbols("–").toSeq ==
      Seq(sym(0xE2), sym(0x80), sym(0x93)))
    // « U+00AB: 2 bytes C2 AB
    assert(BpeByteAlphabet.symbols("«").toSeq ==
      Seq(sym(0xC2), sym(0xAB)))
    // emoji U+1F600: 4 bytes F0 9F 98 80 (supplementary plane)
    assert(BpeByteAlphabet.symbols("😀").toSeq ==
      Seq(sym(0xF0), sym(0x9F), sym(0x98), sym(0x80)))
    // every placeholder is outside [\p{L}\p{N}] and is not the
    // sentinel — it can never collide with an in-class symbol
    (0 to 255).foreach { b =>
      val cp = 0x2500 + b
      assert(!BpeByteAlphabet.inClass(cp) && cp != 0xB7)
    }
  }

  test("bpe byte fallback: punctuated words learn merges and encode " +
      "under them (unicode mode would pass them through as OOV)") {

    def sym(b: Int) = String.valueOf((0x2500 + b).toChar)
    val docs = Seq((1L, "a'b a'b a'b")).toDF("doc_id", "text")
    // vocab {a'b:3} as a | <27> | b; round 1 ties (a,<27>)=(27,b)=3,
    // 'a' (U+0061) < placeholder (U+2527) so (a,<27>) wins; round 2
    // merges (a<27>, b)
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 2, byteFallback = true)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(m == Seq(("a", sym(0x27), 3L),
      ("a" + sym(0x27), "b", 3L)))
    val pairs = m.map { case (l, r, _) => (l, r) }
    val enc = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", pairs,
        byteFallback = true)
      .collect().head
    assert((enc.getLong(1), enc.getLong(2)) == (3L, 3L))
    // under unicode mode the same corpus is pure OOV passthrough
    val uni = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", pairs, unicode = true)
      .collect().head.getLong(2)
    assert(uni == 3L)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe byte fallback: size(tokenize) == count, pieces are the " +
      "mixed code-point/byte-placeholder symbols") {

    def sym(b: Int) = String.valueOf((0x2500 + b).toChar)
    val docs = Seq((1L, "3.14 x=1 😀")).toDF("doc_id", "text")
    val toks = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", Nil, byteFallback = true)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(toks == Seq("3", sym(0x2E), "1", "4",
      "x", sym(0x3D), "1",
      sym(0xF0), sym(0x9F), sym(0x98), sym(0x80)))
    val n = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", Nil, byteFallback = true)
      .collect().head.getLong(2)
    assert(n == toks.length.toLong)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe pretok: GPT-2-style segmentation — contractions, letter " +
      "runs, digit runs, punct runs; symbols unchanged at zero " +
      "merges; merges can no longer cross a piece boundary") {
    def sym(b: Int) = String.valueOf((0x2500 + b).toChar)
    val docs = Seq((1L, "don't co-op 3.14 x=1;y=2"))
      .toDF("doc_id", "text")
    // at ZERO merges the symbol stream is segmentation-independent
    // (boundaries only matter once merges exist)
    def syms(pretok: Boolean) = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", Nil, byteFallback = true,
        pretok = pretok)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(syms(pretok = true) == syms(pretok = false))
    // n_words counts the mode's segmentation unit: 4 whitespace words
    // vs 15 pretok pieces (don,'t | co,-,op | 3,.,14 | x,=,1,;,y,=,2)
    val nw = (pt: Boolean) => graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", Nil,
        byteFallback = true, pretok = pt)
      .collect().head.getLong(1)
    assert(nw(false) == 4L && nw(true) == 15L)
    // word markers now mark PIECES: one leading sentinel per pretok
    // piece
    val marked = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", Nil, byteFallback = true,
        pretok = true, wordMarker = true)
      .collect().map(_.getString(2)).count(_.startsWith("·"))
    assert(marked == 15)
    // merges cannot cross a piece boundary: "n't" class-run learns
    // the (n, <27>) pair first (ties break on lhs; 'n' < placeholder)
    // but pretok segments n | 't, so that pair never exists and the
    // first learned merge is the contraction-internal (<27>, t)
    val nx = Seq((1L, "n't n't")).toDF("doc_id", "text")
    def firstMerge(pt: Boolean) = graft.operators.Tokenizer
      .bpeMerges(nx, "text", merges = 1, byteFallback = true,
        pretok = pt)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(firstMerge(false) == (("n", sym(0x27))))
    assert(firstMerge(true) == ((sym(0x27), "t")))
    // the model artifact carries the mode flag
    val p = java.nio.file.Files
      .createTempDirectory("graft_pretokmodel").toString
    graft.operators.Tokenizer.writeBpeModel(spark, p,
      Seq((sym(0x27), "x")), byteFallback = true, pretok = true)
    val model = graft.operators.Tokenizer.readBpeModel(spark, p)
    assert(model.pretok && model.byteFallback && !model.unicode)
    // and pretok without byteFallback refuses (punct runs need the
    // byte alphabet)
    intercept[IllegalArgumentException] {
      graft.operators.Tokenizer.bpeTokenize(docs, "text", "doc_id",
        Nil, pretok = true)
    }
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe word markers: first piece of every word gets one leading " +
      "sentinel; stripped stream is bit-identical to marker-off") {
    val docs = Seq((1L, "don't co-op 3.14 ab ab"))
      .toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 4, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val plain = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", m, byteFallback = true)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    val marked = graft.operators.Tokenizer
      .bpeTokenize(docs, "text", "doc_id", m, byteFallback = true,
        wordMarker = true)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(marked.length == plain.length)
    assert(marked.count(_.startsWith("·")) == 5) // one per word
    val stripped = marked.map(t =>
      if (t.startsWith("·")) t.substring(1) else t)
    assert(stripped == plain)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe detok: byte-fallback round trip is EXACT across every " +
      "UTF-8 width; input row order is irrelevant (pos sort)") {
    val text = "Don't   CO-OP 3.14 😀😀 数据,模型 «mot» a–b"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 6, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = graft.operators.Tokenizer.bpeTokenize(docs, "text",
      "doc_id", m, byteFallback = true, wordMarker = true)
    val back = graft.operators.Tokenizer
      .bpeDetokenize(toks.orderBy(col("pos").desc)) // scrambled order
      .collect().head.getString(1)
    assert(back == text.toLowerCase.trim.replaceAll("\\s+", " "))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe detok: in-class modes round-trip too — an OOV passthrough " +
      "beginning with the marker char stays unambiguous") {
    val docs = Seq((1L, "·x ab ·x")).toDF("doc_id", "text")
    val toks = graft.operators.Tokenizer.bpeTokenize(docs, "text",
      "doc_id", Nil, wordMarker = true)
    val pieces = toks.orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(pieces == Seq("··x", "·a", "b", "··x")) // marker + raw word
    val back = graft.operators.Tokenizer.bpeDetokenize(toks)
      .collect().head.getString(1)
    assert(back == "·x ab ·x")
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe model artifact: write -> read round-trips the list and " +
      "flags; a truncated artifact is refused by the digest") {
    val docs = Seq((1L, "don't don't ab ab don't")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 3, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpemodel").toString
    graft.operators.Tokenizer.writeBpeModel(spark, dir, m,
      byteFallback = true)
    val model = graft.operators.Tokenizer.readBpeModel(spark, dir)
    assert(model.merges == m)
    assert(!model.unicode && model.byteFallback)
    // encode under the read-back list == encode under the in-memory one
    val a = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", m, byteFallback = true)
      .collect().head.getLong(2)
    val b = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", model.merges,
        byteFallback = model.byteFallback)
      .collect().head.getLong(2)
    assert(a == b)
    // truncate merges on disk, keep meta -> count/digest mismatch
    m.take(2).zipWithIndex
      .map { case ((l, r), i) => ((i + 1).toLong, l, r) }
      .toDF("step", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    intercept[IllegalArgumentException] {
      graft.operators.Tokenizer.readBpeModel(spark, dir)
    }
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe vocabulary: deterministic ids (base in UTF-8 order, merges " +
      "after); unseen in-class code points surface as null ids") {
    def sym(b: Int) = String.valueOf((0x2500 + b).toChar)
    val docs = Seq((1L, "ab ab a'b")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 2, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // round 1: (a,b) weight 2 beats the apostrophe pairs at 1;
    // round 2: (a,<27>) vs (<27>,b) tie at 1, 'a' < U+2527 wins
    assert(m == Seq(("a", "b"), ("a", sym(0x27))))
    val vocab = graft.operators.Tokenizer.bpeVocabulary(docs, "text",
      m, byteFallback = true)
    val ids = vocab.collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getBoolean(2))).toMap
    // base in UTF-8 byte order: 'a' 0x61 < 'b' 0x62 < U+2527 (0xE2..)
    assert(ids == Map(
      "a" -> (0L, true), "b" -> (1L, true), sym(0x27) -> (2L, true),
      "ab" -> (3L, false), ("a" + sym(0x27)) -> (4L, false)))
    // same-corpus encode: every id resolves, in piece order
    val enc = graft.operators.Tokenizer.bpeEncodeIds(docs, "text",
        "doc_id", m, vocab, byteFallback = true)
      .orderBy("pos").collect()
    assert(enc.forall(!_.isNullAt(3)))
    assert(enc.map(_.getLong(3)).toSeq == Seq(3L, 3L, 4L, 1L))
    // an in-class code point the vocab corpus never saw -> null id
    // (the audit path), while known symbols still resolve
    val other = Seq((9L, "az")).toDF("doc_id", "text")
    val enc2 = graft.operators.Tokenizer.bpeEncodeIds(other, "text",
        "doc_id", m, vocab, byteFallback = true)
      .orderBy("pos").collect()
    assert(enc2.length == 2 && !enc2(0).isNullAt(3) &&
      enc2(1).isNullAt(3) && enc2(1).getString(2) == "z")
    // unk mapping: the null coalesces to the registered unk id,
    // known ids untouched — the audit signal survives as
    // token_id == unk (a reserved id no real piece can carry)
    val enc3 = graft.operators.Tokenizer.bpeEncodeIds(other, "text",
        "doc_id", m, vocab, byteFallback = true, unk = Some(99L))
      .orderBy("pos").collect()
    assert(enc3(0).getLong(3) == enc2(0).getLong(3) &&
      enc3(1).getLong(3) == 99L)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("bpe vocab artifact: digest-verified round trip; a renumbered " +
      "artifact is refused") {
    val docs = Seq((1L, "ab ab a'b")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 2, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = graft.operators.Tokenizer.bpeVocabulary(docs, "text",
      m, byteFallback = true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpevocab").toString
    graft.operators.Tokenizer.writeBpeVocab(spark, dir, vocab)
    val back = graft.operators.Tokenizer.readBpeVocab(spark, dir)
    assert(back.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet ==
      vocab.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet)
    // renumber one id on disk, keep the meta -> digest mismatch
    back.withColumn("token_id", col("token_id") + 100)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    intercept[IllegalArgumentException] {
      graft.operators.Tokenizer.readBpeVocab(spark, dir)
    }
    graft.operators.Dedup.releaseIntermediates()
  }

  test("special-token registry: reserved ids land contiguously above " +
      "the vocab and round-trip digest-verified; a stale registry " +
      "against a larger vocab refuses; a legacy artifact refuses " +
      "readBpeSpecials") {
    val docs = Seq((1L, "ab ab a'b cd cd ce")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 2, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = graft.operators.Tokenizer.bpeVocabulary(docs, "text",
      m, byteFallback = true)
    val maxId = vocab.agg(max(col("token_id"))).collect()
      .head.getLong(0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpespecials").toString
    val reg0 = graft.operators.Tokenizer.writeBpeVocab(spark, dir,
      vocab, specials = Seq("eos", "pad", "bos")).get
    val reg = graft.operators.Tokenizer.readBpeSpecials(spark, dir)
    // read-back equals write-time registration: contiguous reserved
    // block in registration order, embedding size = max reserved + 1
    assert(reg == reg0)
    assert(reg.eos == maxId + 1 && reg.pad.contains(maxId + 2) &&
      reg.bos.contains(maxId + 3) && reg.unk.isEmpty &&
      reg.embeddingSize == maxId + 4)
    // validateAgainst the SAME vocab passes (fluent)
    assert(reg.validateAgainst(vocab).eos == reg.eos)
    // STALE-REGISTRY COLLISION: a larger vocabulary (more merges ->
    // higher max id) under the old registry would collide eos with a
    // real id — refused loudly
    val m2 = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 5, byteFallback = true).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab2 = graft.operators.Tokenizer.bpeVocabulary(docs, "text",
      m2, byteFallback = true)
    assert(vocab2.agg(max(col("token_id"))).collect()
      .head.getLong(0) >= reg.eos, "fixture must create the collision")
    val eStale = intercept[IllegalArgumentException] {
      reg.validateAgainst(vocab2)
    }
    assert(eStale.getMessage.contains("stale"), eStale.getMessage)
    // the artifact-level twin: re-land the vocab table WITHOUT its
    // registry (the torn-update scenario) — readBpeSpecials'
    // contiguity check refuses
    graft.operators.Tokenizer.bpeVocabulary(docs, "text", m2,
        byteFallback = true)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    // (vocab digest now mismatches too, but specials consistency is
    // checked against the vocab table directly)
    intercept[IllegalArgumentException] {
      graft.operators.Tokenizer.readBpeSpecials(spark, dir)
    }
    // LEGACY artifact (no registry block): readBpeSpecials refuses
    // with remediation, never falls back to max+1
    val legacy = java.nio.file.Files
      .createTempDirectory("graft_bpelegacy").toString
    graft.operators.Tokenizer.writeBpeVocab(spark, legacy, vocab)
    val eLegacy = intercept[IllegalArgumentException] {
      graft.operators.Tokenizer.readBpeSpecials(spark, legacy)
    }
    assert(eLegacy.getMessage.contains("NO special-token registry"),
      eLegacy.getMessage)
    // eos must be present in the registration
    intercept[IllegalArgumentException] {
      graft.operators.Tokenizer.writeBpeVocab(spark, legacy, vocab,
        specials = Seq("pad"))
    }
    graft.operators.Dedup.releaseIntermediates()
  }

  test("BpeSeqApplier: one-call round application equals the chained " +
      "per-merge replaces (left-to-right non-overlapping, in order)") {
    import org.apache.spark.unsafe.types.UTF8String
    def chained(seq: String, ms: Seq[(String, String)]): String =
      ms.foldLeft(seq) { case (s, (l, r)) =>
        s.replace("·" + l + "··" + r + "·", "·" + l + r + "·")
      }
    def applied(seq: String, ms: Seq[(String, String)]): String =
      new graft.functions.BpeSeqApplier(ms)
        .apply(UTF8String.fromString(seq)).toString
    // overlapping run: ·a··a··a··a· -> ·aa··aa· (BPE's left-to-right)
    val run = "·a··a··a··a·"
    assert(applied(run, Seq(("a", "a"))) == "·aa··aa·")
    assert(applied(run, Seq(("a", "a"))) ==
      chained(run, Seq(("a", "a"))))
    // two merges in order, the second consuming the first's output
    val seq = "·l··o··w··e··r·"
    val ms = Seq(("l", "o"), ("lo", "w"))
    assert(applied(seq, ms) == chained(seq, ms))
    assert(applied(seq, ms) == "·low··e··r·")
    // order matters: the reverse list must reproduce the reverse chain
    val rev = ms.reverse
    assert(applied(seq, rev) == chained(seq, rev))
    // boundary safety: a pattern never matches across symbols
    assert(applied("·a··bc·", Seq(("a", "b"))) == "·a··bc·")
    // multi-code-point symbols (unicode/byte-fallback alphabets)
    val uni = "·数··据··数··据·"
    assert(applied(uni, Seq(("数", "据"))) ==
      chained(uni, Seq(("数", "据"))))
  }

  test("bpeMergesBatched: batch=1 equals sequential bpeMerges; " +
      "within-round picks are symbol-disjoint greedy") {
    val docs = Seq((1L, "low low lower Low!"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val seq4 = graft.operators.Tokenizer.bpeMerges(docs, "text",
        merges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSeq
    val b1 = graft.operators.Tokenizer.bpeMergesBatched(docs, "text",
        rounds = 4, batch = 1).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3),
        r.getLong(5))).toSeq
    assert(b1 == seq4)
    // batch=2, round 1 counts: (l,o)=5,(o,w)=5,(w,e)=2,(e,r)=1,
    // (e,s)=1,(s,t)=1. Greedy: (l,o) first; (o,w) conflicts (shares
    // o); (w,e) is disjoint -> picks {(l,o),(w,e)}.
    val b2 = graft.operators.Tokenizer.bpeMergesBatched(docs, "text",
        rounds = 1, batch = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4),
        r.getLong(5))).toSeq
    assert(b2 == Seq((1L, 1L, "lo", 5L), (2L, 1L, "we", 2L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("driver-local BPE learning equals the distributed loop merge " +
      "for merge, in every mode (the round-19 size-gated routing)") {
    // fixture engineered for ties (equal-count pairs exercising the
    // UTF-8-binary tie-break), multi-byte symbols, byte-fallback
    // placeholders, and pretok punctuation splits
    val docs = Seq(
      (1L, "low low lower lowest ab ab ba ba"),
      (2L, "naïve naïve café café don't don't"),
      (3L, "数据 模型 数据 模型 x=1;y=2 co-op co-op"),
      (4L, "aa aa bb bb ab ba 😀ok 😀ok")).toDF("doc_id", "text")
    val modes = Seq(
      ("ascii", false, false, false),
      ("unicode", true, false, false),
      ("bytefb", false, true, false),
      ("pretok", false, true, true))
    modes.foreach { case (name, uni, fb, pre) =>
      val local = graft.operators.Tokenizer.bpeMerges(docs, "text",
          merges = 12, unicode = uni, byteFallback = fb, pretok = pre)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      val dist = graft.operators.Tokenizer.bpeMergesDistributed(docs,
          "text", merges = 12, unicode = uni, byteFallback = fb,
          pretok = pre)
        .map { case (s, l, r2, m, c) => (s.toLong, l, r2, m, c) }
      assert(local == dist, s"mode $name: local $local vs dist $dist")
      graft.operators.Dedup.releaseIntermediates()
    }
  }

  test("driver-local BATCHED BPE learning equals the distributed " +
      "adaptive-prefix loop pick for pick, in every mode (the r19 " +
      "ADVICE gap: the distributed batched loop must stay reachable " +
      "and equal)") {
    val docs = Seq(
      (1L, "low low lower lowest ab ab ba ba"),
      (2L, "naïve naïve café café don't don't"),
      (3L, "数据 模型 数据 模型 x=1;y=2 co-op co-op"),
      (4L, "aa aa bb bb ab ba 😀ok 😀ok")).toDF("doc_id", "text")
    val modes = Seq(
      ("ascii", false, false, false),
      ("unicode", true, false, false),
      ("bytefb", false, true, false),
      ("pretok", false, true, true))
    modes.foreach { case (name, uni, fb, pre) =>
      val local = graft.operators.Tokenizer.bpeMergesBatched(docs,
          "text", rounds = 4, batch = 3, unicode = uni,
          byteFallback = fb, pretok = pre)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getString(4), r.getLong(5))).toSeq
      val dist = graft.operators.Tokenizer
        .bpeMergesBatchedDistributed(docs, "text", rounds = 4,
          batch = 3, unicode = uni, byteFallback = fb, pretok = pre)
        .map { case (s, rd, l, r2, m, c) =>
          (s.toLong, rd.toLong, l, r2, m, c) }
      assert(local == dist, s"mode $name: local $local vs dist $dist")
      graft.operators.Dedup.releaseIntermediates()
    }
  }

  test("bpeMergesBatched: learned list is well-formed for the " +
      "rank-priority encoder and the encode matches the chained " +
      "reference") {
    val docs = Seq((1L, "low low lower lowest lows slow slower below"),
      (2L, "owl owls glow glows flow flows low lower"))
      .toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeMergesBatched(docs, "text",
        rounds = 3, batch = 3).orderBy("step").collect()
      .map(r => (r.getString(2), r.getString(3))).toSeq
    assert(m.nonEmpty)
    val native = graft.operators.Tokenizer
      .bpeTokenCounts(docs, "text", "doc_id", m)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSeq
    val chained = graft.operators.Tokenizer
      .bpeTokenCountsChained(docs, "text", "doc_id", m)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSeq
    assert(native == chained)
    graft.operators.Dedup.releaseIntermediates()
  }

  test("disposition audit is an exact partition of the increment: " +
      "every doc exactly one stage, admitted == pipeline survivors") {
    val dir = "/root/testdata/sf0.001"
    val disp = SparkEntry.queries("q221_disposition_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val inc = graft.Tables.load(spark, dir, "documents")
      .where(col("doc_id") >= 10 && pmod(col("doc_id"), lit(2)) === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(disp.length == inc.size) // total coverage
    assert(disp.map(_._1).toSet == inc) // same docs
    assert(disp.map(_._1).distinct.length == disp.length) // disjoint
    // 'admitted' matches the summary query's final-stage doc count
    val admitted = disp.count(_._2 == "6_admitted")
    val summary = SparkEntry
      .queries("q207_incremental_pipeline")(spark, dir)
      .where(col("stage") === "5_filters").collect().head
    assert(admitted.toLong == summary.getAs[Long]("n_docs"))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("vocabCoverage: ranks by count then token, coverage hits 1.0") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b z")).toDF("doc_id", "text")
    val v = Curation.vocabCoverage(docs, "text", topK = 10)
      .orderBy("rank").collect()
    assert(v.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 4L), (2L, "b", 3L), (3L, "c", 1L), (4L, "z", 1L)))
    assert(v.last.getDouble(3) == 1.0)
    assert(v.head.getDouble(3) == math.round(4.0 / 9.0 * 1e6) / 1e6)
  }

  test("vocabCoverage: topK truncates but coverage stays corpus-total") {
    val docs = Seq((1L, "a a a b c")).toDF("doc_id", "text")
    val v = Curation.vocabCoverage(docs, "text", topK = 1).collect()
    assert(v.length == 1)
    assert(v.head.getDouble(3) == 0.6) // 3 of 5 tokens, not 3 of 3
  }

  test("blocklistScrub masks token-exact only") {
    val docs = Seq((1L, "key keystone the key"), (2L, "clean"))
      .toDF("doc_id", "text")
    val r = Curation.blocklistScrub(docs, "text", "doc_id", Seq("key"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 2L)
    assert(r(0).getString(2) == "<MASK> keystone the <MASK>")
    assert(r(1).getLong(1) == 0L)
    assert(r(1).getString(2) == "clean")
  }

  test("spanDuplication: shared 2-gram counted once per doc, short docs drop") {
    val docs = Seq(
      (1L, "x y z w"),   // grams: "x y","y z","z w"
      (2L, "x y q x y"), // distinct grams: "x y","y q","q x"
      (3L, "solo")       // < n words -> no grams
    ).toDF("doc_id", "text")
    val r = Curation.spanDuplication(docs, "text", "doc_id", n = 2)
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getLong(1) == 3L && r(0).getDouble(2) == 0.333333)
    assert(r(1).getLong(1) == 3L && r(1).getDouble(2) == 0.333333)
  }

  test("spanScrub excises cross-doc spans, keeps short and clean docs") {
    val docs = Seq(
      (1L, "x1 aa bb cc dd ee y1"),      // shared 5-gram mid-doc
      (2L, "aa bb cc dd ee z2 w2"),      // same 5-gram at the start
      (3L, "completely different words here indeed now"), // clean
      (5L, "pp qq rr ss tt"),            // identical to 6: fully covered
      (6L, "pp qq rr ss tt"),
      (7L, "tiny doc")                   // < n words: passes through
    ).toDF("doc_id", "text")
    val r = Curation.spanScrub(docs, "text", "doc_id", n = 5, minDf = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, "x1 y1", 7L, 5L),
      (2L, "z2 w2", 7L, 5L),
      (3L, "completely different words here indeed now", 6L, 0L),
      (5L, "", 5L, 5L),
      (6L, "", 5L, 5L),
      (7L, "tiny doc", 2L, 0L)))
    graft.operators.Dedup.releaseIntermediates()
  }

  test("fuzzyNamePairs: blocked pairs within distance, ordered canonically") {
    val parts = Seq("cold widget", "bold widget", "cold bolt", "old widget",
      "anchor bracket").toDF("p_name")
    val r = Curation.fuzzyNamePairs(parts, "p_name", maxDist = 3)
      .orderBy("name_a", "name_b").collect()
    // widget block: bold~cold (1 sub), bold~old (1 del), cold~old
    // (1 del); bolt and bracket blocks are singletons; cross-block
    // pairs never compared
    assert(r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
      == Seq(("bold widget", "cold widget", 1L),
        ("bold widget", "old widget", 1L),
        ("cold widget", "old widget", 1L)))
  }

  test("resampleInterpolate: time-weighted values on the hourly grid") {
    def t(s: String) = Timestamp.valueOf(s)
    val obs = Seq(
      ("a", t("2024-01-01 00:30:00"), 10.0),
      ("a", t("2024-01-01 02:30:00"), 20.0),
      ("a", t("2024-01-01 02:30:00"), 30.0), // duplicate ts -> mean 25
      ("b", t("2024-01-01 01:00:00"), 5.0)   // single obs, on the hour
    ).toDF("event_type", "ts", "value")
    val r = WindowOps.resampleInterpolate(obs, "ts", "value",
        Seq("event_type"), freq = "hour")
      .orderBy("event_type", "ts").collect()
    val a = r.filter(_.getString(0) == "a")
    // grid 00:00,01:00,02:00; 00:00 precedes first obs -> null;
    // 01:00 is 30/120 of the way 10 -> 25; 02:00 is 90/120
    assert(a.length == 3)
    assert(a(0).isNullAt(2))
    assert(a(1).getDouble(2) == 13.75)
    assert(a(2).getDouble(2) == 21.25)
    val b = r.filter(_.getString(0) == "b")
    assert(b.length == 1 && b(0).getDouble(2) == 5.0) // exact-hit grid point
  }

  test("first-seen dedup: stream equals batch on ordered input, drops replays") {
    implicit val sqlCtx = spark.sqlContext
    def e(id: Long, user: Long, typ: String, minute: Int, v: Double) =
      StreamDedup.Ev(user, typ, id,
        Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), v)
    val batch1 = Seq(e(1, 1, "click", 1, 1.0), e(2, 1, "click", 2, 2.0),
      e(3, 2, "view", 3, 3.0))
    val batch2 = Seq(e(4, 1, "click", 9, 4.0), // replayed key -> dropped
      e(5, 3, "click", 4, 5.0))                // new key -> emitted

    val stream = MemoryStream[StreamDedup.Ev]
    val q = StreamDedup.streaming(stream.toDS())
      .writeStream.format("memory").queryName("firstseen")
      .outputMode("append").start()
    stream.addData(batch1: _*); q.processAllAvailable()
    stream.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT event_id FROM firstseen")
      .as[Long].collect().sorted.toSeq
    assert(streamed == Seq(1L, 3L, 5L))

    val batchRes = StreamDedup.batch((batch1 ++ batch2).toDF())
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(batchRes == streamed) // arrival order respected event time here
  }
}
