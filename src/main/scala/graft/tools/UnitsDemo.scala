package graft.tools

import graft.units._

/** Library-surface usage sample for the units engine (no Spark needed). */
object UnitsDemo extends App {
  val (k, b) = UnitRegistry.conversion(UnitRegistry.parse("J"), UnitRegistry.parse("kWh"))
  println(s"J->kWh slope=$k intercept=$b")
  val cond = UnitRegistry.parse("W/m-K")
  println(s"W/m-K parsed: ${cond.canonical} dims=${cond.dims}")
  println(s"toIp(W/m-K) = ${UnitRegistry.toIpUnit(cond).map(_.raw)}")
  println(s"20 degC in degF = ${UnitRegistry.convert(20.0, UnitRegistry.parse("C"), UnitRegistry.parse("F"))}")
  try UnitRegistry.parse("blorps/m")
  catch { case e: Exception => println(s"garbage -> ${e.getClass.getSimpleName}: ${e.getMessage}") }
  try UnitRegistry.parse("W/(m-K")
  catch { case e: Exception => println(s"unbalanced -> ${e.getClass.getSimpleName}: ${e.getMessage}") }
  println(s"empty -> '${UnitRegistry.parse("").canonical}'")
  try UnitRegistry.conversion(UnitRegistry.parse("kW"), UnitRegistry.parse("kBtuh/h"))
  catch { case e: Exception => println(s"kW->kBtuh/h (dim-broken reference pair) -> ${e.getClass.getSimpleName}") }
  println(s"roundtrip 21.5 C->F->C = ${UnitRegistry.convert(UnitRegistry.convert(21.5, UnitRegistry.parse("C"), UnitRegistry.parse("F")), UnitRegistry.parse("F"), UnitRegistry.parse("C"))}")
}
