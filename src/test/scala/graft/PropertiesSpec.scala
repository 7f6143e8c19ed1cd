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
}
