package graft.units

/** Physical-units engine for the EnergyPlus dialect.
  *
  * Re-expresses the behavior of the reference's pint-based registry
  * (`/root/reference/energy_pandas/units.py:14-40`, definitions
  * `/root/reference/energy_pandas/energyplus_en.txt:1-49`) as a small
  * pure-Scala module. Driver-side only: unit math produces a scalar
  * `(slope, intercept)` per column conversion which the engine emits as
  * constant-folded Column arithmetic — never a per-row UDF.
  *
  * Semantics reproduced:
  *  - EnergyPlus "dash dialect": `W/m-K` means `W/(m*K)` — everything
  *    after the first `/` at a nesting level is denominator, and `-`
  *    multiplies (reference `units.py:14-30`).
  *  - Exponents appear as trailing digits (`m3`, `K2`) or unicode
  *    superscripts (`m³`) (reference `energyplus_en.txt:24-34`).
  *  - `C` means Celsius, not Coulomb (`energyplus_en.txt:49`).
  *  - Affine units (degC, degF) convert with offsets when standalone;
  *    inside compound expressions they behave multiplicatively (delta
  *    scale), as pint does.
  */
final case class EUnit(
    /** canonical composition, e.g. Map("W"->1,"m"->-1,"K"->-1) */
    comp: Map[String, Int],
    /** multiplicative factor to base-SI */
    factor: Double,
    /** additive offset to base-SI (nonzero only for standalone affine) */
    offset: Double,
    /** base-dimension vector, e.g. Map("kg"->1,"m"->2,"s"->-3) */
    dims: Map[String, Int],
    /** original (trimmed) string as given by the user */
    raw: String
) {
  def canonical: String =
    if (comp.isEmpty) "dimensionless"
    else
      comp.toSeq.sortBy { case (n, e) => (-e.sign, n) }
        .map { case (n, e) => if (e == 1) n else s"$n^$e" }
        .mkString("*")
  def isDimensionless: Boolean = dims.isEmpty
  override def toString: String = canonical
}

class DimensionalityError(msg: String) extends RuntimeException(msg)
class UndefinedUnitError(msg: String) extends RuntimeException(msg)
/** Raised when ReportData carries >1 distinct unit and no override is
  * given (reference `edf_utils.py:4-7`, used at `energypandas.py:283-288`). */
class MultipleUnitsError(msg: String) extends RuntimeException(msg)

object UnitRegistry {

  /** (primary symbol, aliases, factor, offset, dims) */
  private case class Def(sym: String, aliases: Seq[String], factor: Double,
      offset: Double, dims: Map[String, Int])

  private def d(pairs: (String, Int)*): Map[String, Int] = pairs.toMap

  private val BTU = 1055.05585262
  private val LB = 0.45359237
  private val FT = 0.3048

  // Base dims: m kg s K A cd mol rad person count
  private val defs: Seq[Def] = Seq(
    Def("m", Seq("meter", "metre", "meters"), 1, 0, d("m" -> 1)),
    Def("ft", Seq("feet", "foot"), FT, 0, d("m" -> 1)),
    Def("in", Seq("inch", "inches"), 0.0254, 0, d("m" -> 1)),
    Def("s", Seq("second", "sec", "seconds"), 1, 0, d("s" -> 1)),
    Def("min", Seq("minute", "minutes"), 60, 0, d("s" -> 1)),
    Def("h", Seq("hr", "hour", "hours"), 3600, 0, d("s" -> 1)),
    Def("day", Seq("days"), 86400, 0, d("s" -> 1)),
    Def("yr", Seq("year", "years"), 31557600.0, 0, d("s" -> 1)),
    Def("g", Seq("gram", "grams"), 1e-3, 0, d("kg" -> 1)),
    Def("lb", Seq("lbm", "pound", "pounds"), LB, 0, d("kg" -> 1)),
    Def("grain", Seq("grains"), LB / 7000.0, 0, d("kg" -> 1)),
    Def("K", Seq("kelvin", "degK", "degree_Kelvin"), 1, 0, d("K" -> 1)),
    Def("R", Seq("degree_Rankine", "rankine", "degR"), 5.0 / 9.0, 0, d("K" -> 1)),
    // affine; C overridden to Celsius as in energyplus_en.txt:49
    Def("degC", Seq("C", "celsius", "degreeC", "degree_Celsius", "°C"),
      1, 273.15, d("K" -> 1)),
    Def("degF", Seq("F", "fahrenheit", "degreeF", "degree_Fahrenheit", "°F"),
      5.0 / 9.0, 459.67 * 5.0 / 9.0, d("K" -> 1)),
    Def("deltaC", Seq("delta_degreeC", "delta_degC"), 1, 0, d("K" -> 1)),
    Def("deltaF", Seq("delta_degree_Fahrenheit", "delta_degF"), 5.0 / 9.0, 0, d("K" -> 1)),
    Def("J", Seq("joule", "joules"), 1, 0, d("kg" -> 1, "m" -> 2, "s" -> -2)),
    Def("Btu", Seq("btu", "BTU"), BTU, 0, d("kg" -> 1, "m" -> 2, "s" -> -2)),
    Def("Wh", Seq(), 3600, 0, d("kg" -> 1, "m" -> 2, "s" -> -2)),
    Def("W", Seq("watt", "watts", "Watts"), 1, 0, d("kg" -> 1, "m" -> 2, "s" -> -3)),
    // ton of refrigeration (energyplus_en.txt @alias ton)
    Def("ton", Seq("ton_of_refrigeration", "tons"), 12000.0 * BTU / 3600.0, 0,
      d("kg" -> 1, "m" -> 2, "s" -> -3)),
    // kBtuh = 1000 * Btu * hour (energyplus_en.txt:44)
    Def("kBtuh", Seq(), 1000.0 * BTU * 3600.0, 0, d("kg" -> 1, "m" -> 2, "s" -> -1)),
    Def("Pa", Seq("pascal", "pascals"), 1, 0, d("kg" -> 1, "m" -> -1, "s" -> -2)),
    Def("psi", Seq(), 6894.757293168361, 0, d("kg" -> 1, "m" -> -1, "s" -> -2)),
    Def("bar", Seq(), 1e5, 0, d("kg" -> 1, "m" -> -1, "s" -> -2)),
    Def("N", Seq("newton", "newtons"), 1, 0, d("kg" -> 1, "m" -> 1, "s" -> -2)),
    Def("lbf", Seq(), 4.4482216152605, 0, d("kg" -> 1, "m" -> 1, "s" -> -2)),
    Def("L", Seq("liter", "litre", "liters"), 1e-3, 0, d("m" -> 3)),
    Def("gal", Seq("gallon", "gallons"), 3.785411784e-3, 0, d("m" -> 3)),
    Def("pint", Seq("pints"), 473.176473e-6, 0, d("m" -> 3)),
    Def("A", Seq("ampere", "amperes", "amp"), 1, 0, d("A" -> 1)),
    Def("V", Seq("volt", "volts"), 1, 0, d("kg" -> 1, "m" -> 2, "s" -> -3, "A" -> -1)),
    Def("Hz", Seq("hertz", "Hertz"), 1, 0, d("s" -> -1)),
    Def("cd", Seq("candela", "candelas"), 1, 0, d("cd" -> 1)),
    Def("lm", Seq("lumen", "lumens"), 1, 0, d("cd" -> 1)),
    Def("lx", Seq("lux"), 1, 0, d("cd" -> 1, "m" -> -2)),
    // footcandle = lumen/ft2 (energyplus_en.txt:45)
    Def("fc", Seq("footcandle", "footcandles", "ft-c"), 1.0 / (FT * FT), 0,
      d("cd" -> 1, "m" -> -2)),
    Def("mol", Seq("mole", "moles"), 1, 0, d("mol" -> 1)),
    Def("rad", Seq("radian", "radians"), 1, 0, d("rad" -> 1)),
    Def("deg", Seq("degree", "degrees"), math.Pi / 180.0, 0, d("rad" -> 1)),
    Def("person", Seq("people", "persons"), 1, 0, d("person" -> 1)),
    Def("count", Seq(), 1, 0, d("count" -> 1)),
    Def("percent", Seq("%"), 0.01, 0, d("count" -> 1)),
    // ach = dimensionless; acr = 1/hour (energyplus_en.txt:41-43)
    Def("ach", Seq(), 1, 0, Map.empty),
    Def("acr", Seq(), 1.0 / 3600.0, 0, d("s" -> -1)),
    Def("dimensionless", Seq("1", "_"), 1, 0, Map.empty)
  )

  private val byName: Map[String, Def] =
    defs.flatMap(u => (u.sym +: u.aliases).map(_ -> u)).toMap

  private val prefixes: Seq[(String, Double)] = Seq(
    "da" -> 1e1, "h" -> 1e2, "k" -> 1e3, "M" -> 1e6, "G" -> 1e9,
    "T" -> 1e12, "P" -> 1e15, "d" -> 1e-1, "c" -> 1e-2, "m" -> 1e-3,
    "µ" -> 1e-6, "u" -> 1e-6, "n" -> 1e-9, "p" -> 1e-12
  )

  /** exact name first, then prefix + exact name */
  private def lookup(name: String): Option[(String, Def, Double)] =
    byName.get(name).map(u => (u.sym, u, 1.0)).orElse {
      prefixes.collectFirst {
        case (p, mult) if name.startsWith(p) && name.length > p.length &&
          byName.contains(name.stripPrefix(p)) =>
          val u = byName(name.stripPrefix(p))
          (p + u.sym, u, mult)
      }
    }

  // ---------------------------------------------------------------- parsing

  private sealed trait Tok
  private case class Name(s: String) extends Tok
  private case class Num(v: Double) extends Tok
  private case object Mul extends Tok
  private case object Div extends Tok
  private case object LPar extends Tok
  private case object RPar extends Tok
  private case class Pow(e: Int) extends Tok

  private def tokenize(s0: String): List[Tok] = {
    val s = s0.replace("²", "2").replace("³", "3")
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    def isNameCh(c: Char) =
      c.isLetter || c == '_' || c == '%' || c == '°' || c == 'µ'
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LPar; i += 1 }
      else if (c == ')') { out += RPar; i += 1 }
      else if (c == '*') {
        if (i + 1 < s.length && s(i + 1) == '*') { // '**' exponent
          i += 2
          val j = i
          var k = j
          if (k < s.length && (s(k) == '-' || s(k) == '+')) k += 1
          while (k < s.length && s(k).isDigit) k += 1
          if (k == j) throw new UndefinedUnitError(s"bad exponent in '$s0'")
          out += Pow(s.substring(j, k).toInt); i = k
        } else { out += Mul; i += 1 }
      } else if (c == '^') {
        i += 1
        val j = i
        var k = j
        if (k < s.length && (s(k) == '-' || s(k) == '+')) k += 1
        while (k < s.length && s(k).isDigit) k += 1
        if (k == j) throw new UndefinedUnitError(s"bad exponent in '$s0'")
        out += Pow(s.substring(j, k).toInt); i = k
      } else if (c == '/') { out += Div; i += 1 }
      else if (c == '-') { out += Mul; i += 1 } // EnergyPlus dash = multiply
      else if (c.isDigit) {
        val j = i
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        out += Num(s.substring(j, i).toDouble)
      } else if (isNameCh(c)) {
        val j = i
        while (i < s.length && isNameCh(s(i))) i += 1
        val name = s.substring(j, i)
        // trailing digits = exponent (EnergyPlus writes kg/m3, W/m2-K)
        var expo = 0
        var k = i
        while (k < s.length && s(k).isDigit) k += 1
        if (k > i && (byName.contains(name + s.substring(i, k)) ||
            lookup(name + s.substring(i, k)).isDefined)) {
          // the digits are part of a defined name (none today, future-proof)
          out += Name(name + s.substring(i, k)); i = k
        } else {
          out += Name(name)
          if (k > i) { expo = s.substring(i, k).toInt; out += Pow(expo); i = k }
        }
      } else throw new UndefinedUnitError(s"cannot tokenize '$s0' at '$c'")
    }
    out.toList
  }

  private case class Parsed(comp: Map[String, Int], factor: Double,
      dims: Map[String, Int], singletons: List[(Def, Int)])

  private def merge(a: Map[String, Int], b: Map[String, Int], sign: Int)
      : Map[String, Int] =
    b.foldLeft(a) { case (acc, (k, v)) =>
      val nv = acc.getOrElse(k, 0) + sign * v
      if (nv == 0) acc - k else acc.updated(k, nv)
    }

  /** Parse one nesting level: product of factors; first `/` sends
    * everything after it at this level to the denominator. */
  private def parseLevel(toks: List[Tok], src: String, depth: Int = 0)
      : (Parsed, List[Tok]) = {
    var comp = Map.empty[String, Int]
    var dims = Map.empty[String, Int]
    var factor = 1.0
    var single = List.empty[(Def, Int)]
    var sign = 1
    var rest = toks
    var done = false
    while (!done) rest match {
      case Nil =>
        if (depth > 0)
          throw new UndefinedUnitError(s"unbalanced parentheses in '$src'")
        done = true
      case RPar :: t =>
        if (depth == 0)
          throw new UndefinedUnitError(s"unbalanced parentheses in '$src'")
        rest = t; done = true
      case Mul :: t => rest = t
      case Div :: t => sign = -1; rest = t
      case Num(v) :: t =>
        val (v2, t2) = t match {
          case Pow(e) :: tt => (math.pow(v, e), tt)
          case _ => (v, t)
        }
        factor *= (if (sign > 0) v2 else 1.0 / v2); rest = t2
      case LPar :: t =>
        val (inner, t2) = parseLevel(t, src, depth + 1)
        comp = merge(comp, inner.comp, sign)
        dims = merge(dims, inner.dims, sign)
        factor *= (if (sign > 0) inner.factor else 1.0 / inner.factor)
        single :::= inner.singletons.map { case (u, e) => (u, e * sign) }
        rest = t2
      case Name(n) :: t =>
        val (cname, u, mult) = lookup(n).getOrElse(
          throw new UndefinedUnitError(s"'$n' is not defined (in '$src')"))
        val (e, t2) = t match {
          case Pow(p) :: tt => (p, tt)
          case _ => (1, t)
        }
        val ee = e * sign
        comp = merge(comp, Map(cname -> 1), ee)
        dims = merge(dims, u.dims, ee)
        factor *= math.pow(mult * u.factor, ee)
        single ::= (u, ee)
        rest = t2
      case Pow(_) :: _ =>
        throw new UndefinedUnitError(s"misplaced exponent in '$src'")
    }
    (Parsed(comp, factor, dims, single), rest)
  }

  /** Parse a unit string in the EnergyPlus dialect. */
  def parse(s: String): EUnit = {
    val trimmed = s.trim
    if (trimmed.isEmpty || trimmed == "dimensionless")
      return EUnit(Map.empty, 1, 0, Map.empty, trimmed)
    val (p, rest) = parseLevel(tokenize(trimmed), trimmed)
    if (rest.nonEmpty)
      throw new UndefinedUnitError(s"unbalanced parentheses in '$s'")
    // affine offset survives only for a standalone single unit^1
    val offset = p.singletons match {
      case (u, 1) :: Nil if p.comp.size == 1 && p.factor == u.factor => u.offset
      case _ => 0.0
    }
    EUnit(p.comp, p.factor, offset, p.dims, trimmed)
  }

  /** Scalar conversion: value_to = slope * value_from + intercept.
    * The engine emits these as literal Column arithmetic. */
  def conversion(from: EUnit, to: EUnit): (Double, Double) = {
    if (from.dims != to.dims)
      throw new DimensionalityError(
        s"cannot convert ${from.canonical} [${from.dims}] to ${to.canonical} [${to.dims}]")
    (from.factor / to.factor, (from.offset - to.offset) / to.factor)
  }

  def convert(value: Double, from: EUnit, to: EUnit): Double = {
    val (k, b) = conversion(from, to)
    value * k + b
  }

  // --------------------------------------------------- SI <-> IP tables
  // Re-expression of the reference's IP_DEFAULT_CONVERSION
  // (`/root/reference/energy_pandas/units.py:43-138`); dict order kept so
  // that duplicate keys resolve last-wins exactly as in Python.
  private val ipPairs: Seq[(String, String)] = Seq(
    "m3/s" -> "ft3/min", "W/K" -> "Btu/h-F", "kW" -> "kBtuh/h",
    "m2" -> "ft2", "m3" -> "ft3", "(kg/s)/W" -> "(lbm/sec)/(Btu/hr)",
    "1/K" -> "1/F", "1/m" -> "1/ft", "A/K" -> "A/F", "C" -> "F",
    "cm" -> "in", "cm2" -> "inch2", "deltaC" -> "deltaF",
    "g/GJ" -> "lb/MWh", "g/kg" -> "grains/lb", "g/MJ" -> "lb/MWh",
    "g/mol" -> "lb/mol", "g/m-s" -> "lb/ft-s", "g/m-s-K" -> "lb/ft-s-F",
    "GJ" -> "ton-h", "J" -> "Wh", "J/K" -> "Btu/F", "J/kg" -> "Btu/lb",
    "J/kg-K" -> "Btu/lb-F", "J/kg-K2" -> "Btu/lb-F2",
    "J/kg-K3" -> "Btu/lb-F3", "J/m2-K" -> "Btu/ft2-F", "J/m3" -> "Btu/ft3",
    "J/m3-K" -> "Btu/ft3-F", "K" -> "R", "K/m" -> "F/ft", "kg" -> "lb",
    "kg/J" -> "lb/Btu", "kg/kg-K" -> "lb/lb-F", "kg/m" -> "lb/ft",
    "kg/m2" -> "lb/ft2", "kg/m3" -> "lb/ft3", "kg/m-s" -> "lb/ft-s",
    "kg/m-s-K" -> "lb/ft-s-F", "kg/m-s-K2" -> "lb/ft-s-F2",
    "kg/Pa-s-m2" -> "lb/psi-s-ft2", "kg/s" -> "lb/s", "kg/s2" -> "lb/s2",
    "kg/s-m" -> "lb/s-ft", "kJ/kg" -> "Btu/lb", "kPa" -> "psi",
    "L/day" -> "pint/day", "L/GJ" -> "gal/kWh", "L/kWh" -> "pint/kWh",
    "L/MJ" -> "gal/kWh", "lux" -> "footcandles", "m" -> "ft",
    "m/hr" -> "ft/hr", "m/s" -> "ft/min", "m/yr" -> "in/yr",
    "m2/m" -> "ft2/ft", "m2/person" -> "ft2/person", "m2/s" -> "ft2/s",
    "m2-K/W" -> "ft2-F-hr/Btu", "m3/GJ" -> "ft3/MWh", "m3/hr" -> "ft3/hr",
    "m3/hr-m2" -> "ft3/hr-ft2", "m3/hr-person" -> "ft3/hr-person",
    "m3/kg" -> "ft3/lb", "m3/m2" -> "ft3/ft2", "m3/MJ" -> "ft3/kWh",
    "m3/person" -> "ft3/person", "m3/s-m" -> "ft3/min-ft",
    "m3/s-m2" -> "ft3/min-ft2", "m3/s-person" -> "ft3/min-person",
    "m3/s-W" -> "(ft3/min)/(Btu/h)", "N-m" -> "lbf-in",
    "N-s/m2" -> "lbf-s/ft2", "Pa" -> "psi", "percent/K" -> "percent/F",
    "person/m2" -> "person/ft2", "s/m" -> "s/ft", "V/K" -> "V/F",
    "W" -> "Btu/h", "W/(m3/s)" -> "W/(ft3/min)", "W/m" -> "Btu/h-ft",
    "W/m2" -> "Btu/h-ft2", "W/m2" -> "W/ft2", "W/m2-K" -> "Btu/h-ft2-F",
    "W/m2-K2" -> "Btu/h-ft2-F2", "W/m-K" -> "Btu-in/h-ft2-F",
    "W/m-K2" -> "Btu/h-F2-ft", "W/m-K3" -> "Btu/h-F3-ft",
    "W/person" -> "Btu/h-person"
  )

  /** canonical-composition key -> target unit (last-wins like a Python dict) */
  lazy val ipTable: Map[String, EUnit] =
    ipPairs.map { case (k, v) => parse(k).canonical -> parse(v) }.toMap
  lazy val siTable: Map[String, EUnit] =
    ipPairs.map { case (k, v) => parse(v).canonical -> parse(k) }.toMap

  /** IP target for an SI unit; None = silent passthrough
    * (reference `energypandas.py:659-662`). */
  def toIpUnit(u: EUnit): Option[EUnit] = ipTable.get(u.canonical)
  def toSiUnit(u: EUnit): Option[EUnit] = siTable.get(u.canonical)
}
