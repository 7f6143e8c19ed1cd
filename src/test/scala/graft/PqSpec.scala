package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.functions.{PqEncode, PqLut}

/** Product-quantization kernels: the native expressions must reproduce
  * the reference argmin/distance math bit for bit (they replaced a
  * literal-expression tree that was semantically pinned by the q141
  * oracle gate) and must stay inside generated code — CODEGEN_ONLY
  * factory mode turns any silent interpreted fallback into a hard
  * failure here. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val m = 4
  private val ncent = 8
  private val sub = 4
  private val dim = m * sub
  private val books: Seq[Seq[Seq[Double]]] =
    Seq.fill(m)(Seq.fill(ncent)(Seq.fill(sub)(rng.nextGaussian())))
  private val vecs: Seq[Seq[Float]] =
    Seq.fill(50)(Seq.fill(dim)(rng.nextGaussian().toFloat))

  /** Reference implementation: plain Scala, same association order as
    * the documented contract. */
  private def refEncode(v: Seq[Float]): Seq[Int] =
    (0 until m).map { b =>
      val xb = v.slice(b * sub, (b + 1) * sub).map(_.toDouble)
      val scores = books(b).map { c =>
        val acc = xb.zip(c).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
        c.map(x => x * x).sum - 2.0 * acc
      }
      scores.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }

  private def refLut(v: Seq[Float]): Seq[Double] =
    (0 until m).flatMap { b =>
      val xb = v.slice(b * sub, (b + 1) * sub).map(_.toDouble)
      val xx = xb.foldLeft(0.0)((s, x) => s + x * x)
      books(b).map { c =>
        val acc = xb.zip(c).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
        (xx - 2.0 * acc) + c.map(x => x * x).sum
      }
    }

  private def withCodegenOnly[A](body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("PqEncode matches the reference argmin codes under CODEGEN_ONLY") {
    withCodegenOnly {
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("id", "vec")
      val got = df.select(col("id"), ColumnShim.column(
          PqEncode(ColumnShim.expression(col("vec")), books)).as("codes"))
        .orderBy("id").collect()
        .map(_.getSeq[Int](1))
      vecs.zip(got).foreach { case (v, codes) =>
        assert(codes == refEncode(v))
      }
    }
  }

  test("PqLut matches the reference distances bit for bit under CODEGEN_ONLY") {
    withCodegenOnly {
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("id", "vec")
      val got = df.select(col("id"), ColumnShim.column(
          PqLut(ColumnShim.expression(col("vec")), books)).as("lut"))
        .orderBy("id").collect()
        .map(_.getSeq[Double](1))
      vecs.zip(got).foreach { case (v, lut) =>
        assert(lut == refLut(v)) // exact double equality: same fold order
      }
    }
  }

  test("width mismatch and null input produce null, not garbage") {
    val df = Seq(
      (1, Some(Seq.fill(dim)(1.0f))),
      (2, Some(Seq.fill(dim - 1)(1.0f))), // ragged
      (3, None: Option[Seq[Float]])
    ).toDF("id", "vec")
    val out = df.select(col("id"), ColumnShim.column(
        PqEncode(ColumnShim.expression(col("vec")), books)).as("codes"),
      ColumnShim.column(
        PqLut(ColumnShim.expression(col("vec")), books)).as("lut"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("RollingWindowHashes matches brute-force substring window sets") {
    import graft.functions.RollingWindowHashes
    import org.apache.spark.unsafe.types.UTF8String
    def windowsOf(s: String, k: Int): Seq[String] = {
      val cps = s.codePoints().toArray
      if (cps.length < k) Seq.empty
      else (0 to cps.length - k).map(i =>
        new String(cps, i, k)).distinct
    }
    def hashesOf(s: String, k: Int): Seq[(Long, Long)] = {
      val arr = RollingWindowHashes.compute(UTF8String.fromString(s), k)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    }
    val samples = Seq(
      "abcabcabcabc", "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa", "ab", "",
      "café touché résumé déjà vu encore",
      "astral 😀 plane 😀 astral 😀 plane")
    for (s <- samples; k <- Seq(1, 3, 5)) {
      val subs = windowsOf(s, k)
      val hs = hashesOf(s, k)
      // distinct counts agree (no collisions on test data) and equal
      // substrings hash equal: position i's hash appears exactly where
      // the substring first appears
      assert(hs.length == subs.length, s"($s, $k)")
      assert(hs.distinct.length == hs.length)
      // cross-string equality: shared windows between two strings match
      // by hash exactly as by substring
      for (t <- samples if t != s) {
        val shared = windowsOf(t, k).toSet.intersect(subs.toSet).size
        val sharedH = hashesOf(t, k).toSet.intersect(hs.toSet).size
        assert(sharedH == shared, s"($s vs $t, $k)")
      }
    }
    // expression-level: null in -> null out; short string -> empty array
    val df = Seq(Some("hello world"), Some("hi"), None).toDF("text")
    val out = df.select(ColumnShim.column(RollingWindowHashes(
      ColumnShim.expression(col("text")), 5)).as("w")).collect()
    assert(out(0).getSeq[Any](0).nonEmpty)
    assert(out(1).getSeq[Any](0).isEmpty)
    assert(out(2).isNullAt(0))
    // SQL registration (GraftExtensions): literal windowLen required
    df.createOrReplaceTempView("rwh_t")
    val viaSql = spark.sql(
      "SELECT size(rolling_window_hashes(text, 5)) FROM rwh_t WHERE text = 'hello world'")
      .collect()(0).getInt(0)
    assert(viaSql == out(0).getSeq[Any](0).size)
  }

  test("interpreted eval (NO_CODEGEN) agrees with generated code") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "NO_CODEGEN")
    try {
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("id", "vec")
      val got = df.select(col("id"), ColumnShim.column(
          PqEncode(ColumnShim.expression(col("vec")), books)).as("codes"))
        .orderBy("id").collect().map(_.getSeq[Int](1))
      vecs.zip(got).foreach { case (v, codes) =>
        assert(codes == refEncode(v))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
