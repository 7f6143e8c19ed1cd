package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinklerAlgo
import graft.functions.JaroWinklerAlgo.jaroWinkler

/** Golden values probed from DuckDB's jaro_winkler_similarity — the
  * oracle dialect this expression is pinned to. */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  val goldens = Seq(
    ("martha", "marhta", 0.9611111111111111),   // 2 transpositions
    ("dixon", "dicksonx", 0.8133333333333332),  // prefix boost l=2
    ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
    ("dwayne", "duane", 0.8400000000000001),
    ("new widget", "red widget", 0.8250000000000001), // ODD mismatch
    // count: half-transpositions floor, not x.5
    ("abcdef", "abzzzz", 0.5555555555555555),   // jaro <= 0.7: NO boost
    ("abc", "abc", 1.0),
    ("ab", "ba", 0.0),                          // window 0, no matches
    ("", "abc", 0.0), ("", "", 0.0))            // empty -> 0 (DuckDB)

  test("algorithm matches the DuckDB goldens exactly") {
    goldens.foreach { case (a, b, want) =>
      assert(JaroWinklerAlgo.sim(a, b) == want, s"sim($a, $b)")
      assert(JaroWinklerAlgo.sim(b, a) == want, s"symmetric($b, $a)")
    }
  }

  test("expression: codegen path equals eval path equals algorithm") {
    val df = goldens.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
    // projection goes through whole-stage codegen (doGenCode)
    val viaCodegen = df.select(col("want"),
      jaroWinkler(col("a"), col("b")).as("jw")).collect()
    viaCodegen.foreach(r => assert(r.getDouble(1) == r.getDouble(0)))
    // filter forces interpreted eval in some plans; also exercise SQL fn
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql(
      "SELECT want, jaro_winkler(a, b) AS jw FROM jw_pairs").collect()
    viaSql.foreach(r => assert(r.getDouble(1) == r.getDouble(0)))
  }

  test("null propagation") {
    val df = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
    val r = df.select(jaroWinkler(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }
}
