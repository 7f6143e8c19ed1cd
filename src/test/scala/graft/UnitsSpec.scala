package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.units._

class UnitsSpec extends AnyFunSuite {

  // the 39 EnergyPlus declarations exercised by the reference suite
  // (/root/reference/tests/test_energypandas.py:270-312)
  val energyplusUnits: Seq[String] = Seq(
    "deg", "m", "m2", "m3", "s", "Hz", "C", "K", "deltaC", "m/s", "J", "W",
    "kg", "N", "kg/s", "m3/s", "Pa", "Pa", "J/kg", "kg/m3", "W/m2",
    "J/kg-K", "W/m-K", "m2/s", "W/m2-K", "m2-K/W", "W", "V", "A", "lx",
    "lm", "cd", "cd/m2", "m2/s", "kg/m-s", "N-s/m2", "kg/kg-K", "m3/kg"
  )

  test("all EnergyPlus unit declarations parse") {
    energyplusUnits.foreach { s =>
      val u = UnitRegistry.parse(s)
      assert(u != null, s)
    }
  }

  test("to_ip and to_si conversion lookups work on every declaration") {
    energyplusUnits.foreach { s =>
      val u = UnitRegistry.parse(s)
      UnitRegistry.toIpUnit(u).foreach { ip =>
        val (k, b) = UnitRegistry.conversion(u, ip) // must not throw
        assert(!k.isNaN && !b.isNaN)
        // and back
        val si = UnitRegistry.toSiUnit(ip)
        si.foreach(t => UnitRegistry.conversion(ip, t))
      }
    }
  }

  test("dash dialect: W/m-K == W/(m*K)") {
    val a = UnitRegistry.parse("W/m-K")
    assert(a.dims == Map("kg" -> 1, "m" -> 1, "s" -> -3, "K" -> -1))
  }

  test("C means Celsius, not Coulomb (affine)") {
    val c = UnitRegistry.parse("C")
    val k = UnitRegistry.parse("K")
    assert(UnitRegistry.convert(0.0, c, k) == 273.15)
    assert(UnitRegistry.convert(100.0, c, k) == 373.15)
  }

  test("degC -> degF affine") {
    val c = UnitRegistry.parse("degC")
    val f = UnitRegistry.parse("degF")
    assert(math.abs(UnitRegistry.convert(100.0, c, f) - 212.0) < 1e-9)
    assert(math.abs(UnitRegistry.convert(0.0, c, f) - 32.0) < 1e-9)
  }

  test("delta temperatures are linear, not affine") {
    val dc = UnitRegistry.parse("deltaC")
    val df = UnitRegistry.parse("deltaF")
    assert(math.abs(UnitRegistry.convert(1.0, dc, df) - 1.8) < 1e-12)
  }

  test("W -> Btu/h") {
    val w = UnitRegistry.parse("W")
    val b = UnitRegistry.parse("Btu/h")
    assert(math.abs(UnitRegistry.convert(1.0, w, b) - 3.412141633) < 1e-6)
  }

  test("ip table: m2 -> ft2, W/m2 -> W/ft2 (dict last-wins)") {
    val m2 = UnitRegistry.parse("m2")
    assert(UnitRegistry.toIpUnit(m2).get.canonical ==
      UnitRegistry.parse("ft2").canonical)
    val wm2 = UnitRegistry.parse("W/m2")
    assert(UnitRegistry.toIpUnit(wm2).get.canonical ==
      UnitRegistry.parse("W/ft2").canonical)
  }

  test("unknown unit in ip table -> silent passthrough (None)") {
    assert(UnitRegistry.toIpUnit(UnitRegistry.parse("J/mol")).isEmpty)
  }

  test("dimension mismatch raises") {
    intercept[DimensionalityError] {
      UnitRegistry.conversion(UnitRegistry.parse("m"), UnitRegistry.parse("s"))
    }
  }

  test("exponent dialects: m3, m**3, m^3, m³ identical") {
    val expected = UnitRegistry.parse("m3")
    Seq("m**3", "m^3", "m³").foreach { s =>
      val u = UnitRegistry.parse(s)
      assert(u.dims == expected.dims && u.factor == expected.factor, s)
    }
  }

  test("nested parens: (kg/s)/W and W/(m3/s)") {
    val a = UnitRegistry.parse("(kg/s)/W")
    assert(a.dims == Map("s" -> 2, "m" -> -2))
    val b = UnitRegistry.parse("W/(m3/s)")
    assert(b.dims == Map("kg" -> 1, "m" -> -1, "s" -> -2))
  }

  test("prefixes: kW, kWh, MWh, GJ, kPa, cm") {
    assert(UnitRegistry.convert(1.0, UnitRegistry.parse("kW"),
      UnitRegistry.parse("W")) == 1000.0)
    assert(UnitRegistry.convert(1.0, UnitRegistry.parse("kWh"),
      UnitRegistry.parse("J")) == 3.6e6)
    assert(UnitRegistry.convert(1.0, UnitRegistry.parse("GJ"),
      UnitRegistry.parse("J")) == 1e9)
    assert(UnitRegistry.convert(1.0, UnitRegistry.parse("cm"),
      UnitRegistry.parse("m")) == 0.01)
  }

  test("round-trips are identity for linear and affine units") {
    val cases = Seq("W" -> "Btu/h", "m" -> "ft", "degC" -> "degF",
      "kg/m3" -> "lb/ft3", "Pa" -> "psi", "lux" -> "fc")
    for ((a, b) <- cases; x <- Seq(-40.0, 0.0, 1.0, 99.5)) {
      val ua = UnitRegistry.parse(a); val ub = UnitRegistry.parse(b)
      val back = UnitRegistry.convert(UnitRegistry.convert(x, ua, ub), ub, ua)
      assert(math.abs(back - x) < 1e-9, s"$a<->$b @ $x")
    }
  }
}
