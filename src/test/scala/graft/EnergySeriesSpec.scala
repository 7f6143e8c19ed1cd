package graft

import org.apache.spark.sql.functions._
import graft.core.{EnergyFrame, EnergySeries}
import graft.units.UnitRegistry

/** Mirrors the reference's test assertions
  * (`/root/reference/tests/test_energypandas.py`) on the same fixtures:
  * a 100-row hourly-2018 series of 0..99. */
class EnergySeriesSpec extends SparkTestBase {

  def es(units: Option[String] = Some("degC")): EnergySeries =
    EnergySeries.rangeSeries(spark, 100, baseYear = 2018, units = units)

  test("normalize golden: sum == 50 (test_energypandas.py:106-114)") {
    val n = es().normalize()
    assert(math.abs(n.sum() - 50.0) < 1e-9)
    assert(n.units.exists(_.isDimensionless))
  }

  test("standardize: zero mean, unit variance, dimensionless") {
    val z = es().standardize()
    assert(math.abs(z.sum()) < 1e-6) // mean 0 => sum 0
    // population variance of z is 1: sum(z^2) == n
    val sq = z.mapValues(v => v * v)
    assert(math.abs(sq.sum() - 100.0) < 1e-6)
    assert(z.units.exists(_.isDimensionless))
  }

  test("to_units kelvin identity: == es + 273.15 (test_energypandas.py:80-87)") {
    val k = es().toUnits("kelvin")
    val added = es().+(273.15)
    val joined = k.df.withColumnRenamed("value", "k")
      .join(added.df.withColumnRenamed("value", "a"), "ts")
    assert(joined.where(abs(col("k") - col("a")) > 1e-9).count() == 0)
    assert(k.units.get.canonical == UnitRegistry.parse("K").canonical)
  }

  test("units are inert in arithmetic (test_energypandas.py:75-78,193-197)") {
    val a = es(Some("degC"))
    val b = es(Some("K"))
    val sum = a + b
    assert(sum.units.get.canonical == UnitRegistry.parse("degC").canonical)
  }

  test("round-trip conversion is identity") {
    val rt = es().toUnits("degF").toUnits("degC")
    val joined = rt.df.withColumnRenamed("value", "rt")
      .join(es().df.withColumnRenamed("value", "orig"), "ts")
    assert(joined.where(abs(col("rt") - col("orig")) > 1e-9).count() == 0)
  }

  test("to_ip table lookup (W -> Btu/h) and silent passthrough") {
    val w = es(Some("W")).toIp
    assert(w.units.get.canonical == UnitRegistry.parse("Btu/h").canonical)
    val odd = es(Some("mol")).toIp // not in the table -> unchanged
    assert(odd.units.get.canonical == UnitRegistry.parse("mol").canonical)
  }

  test("capacity factor = mean/max (energypandas.py:618-622)") {
    assert(math.abs(es().capacityFactor - 49.5 / 99.0) < 1e-12)
  }

  test("p_max and time_at_min") {
    assert(es().pMax == 99.0)
    val tmin = es().timeAtMin.asInstanceOf[java.sql.Timestamp]
    assert(tmin.toInstant.toString.startsWith("2018-01-01T00:00:00"))
  }

  test("ldc sorts descending with 0..n-1 index (energypandas.py:641-644)") {
    val l = es().ldc
    val rows = l.df.orderBy("idx").collect()
    assert(rows.length == 100)
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 99.0)
    assert(rows.last.getLong(0) == 99L && rows.last.getDouble(1) == 0.0)
    // windowed variant agrees
    val lw = es().ldcWindowed.df.orderBy("idx").collect()
    assert(rows.map(_.getDouble(1)).toSeq == lw.map(_.getDouble(1)).toSeq)
  }

  test("source_side splits heating/cooling (energypandas.py:366-382)") {
    val vals = spark.range(4).select(col("id").cast("long").as("ts"),
      (col("id") - lit(1.5)).as("value")) // -1.5 -0.5 0.5 1.5
    val s = EnergySeries(vals, Seq("ts"), "value")
      .sourceSide(Some(4.0), Some(2.0))
    val out = s.df.orderBy("ts").collect().map(_.getDouble(1))
    assert(out(0) == -1.5 * 1.5 && out(1) == -0.5 * 1.5)
    assert(out(2) == 0.5 * 0.75 && out(3) == 1.5 * 0.75)
    intercept[IllegalArgumentException] {
      EnergySeries(vals, Seq("ts"), "value").sourceSide(None, None)
    }
  }

  test("monthly resamples to month-end labels (energypandas.py:610-616)") {
    val year = EnergySeries.rangeSeries(spark, 8760, 2018, Some("degC"))
    val m = year.monthly
    val rows = m.df.orderBy("ts").collect()
    assert(rows.length == 12)
    assert(rows.head.getDate(0).toString == "2018-01-31")
    // January mean = mean(0..743) = 371.5
    assert(math.abs(rows.head.getDouble(1) - 371.5) < 1e-9)
    assert(m.frequency.contains("M"))
  }

  test("align-arithmetic is a full-outer join on the index") {
    val a = es()
    val shifted = EnergySeries.withTimeIndex(spark,
      spark.range(100).select((col("id") + 50).as("id"),
        col("id").cast("double").as("value")), "value", 2018, 3600)
    val sum = a + shifted
    assert(sum.df.count() == 150) // sorted union of indexes
    assert(sum.df.where(col("value").isNull).count() == 100) // non-overlap -> null
  }

  test("period matrix reshapes day x hour") {
    val m = es().toPeriodMatrix(24)
    val rows = m.collect()
    assert(rows.length == 5) // 100 hours -> 4 full days + 4-hour tail
    assert(rows.head.getDouble(1) == 0.0) // period 0 slot 0
    assert(rows(1).getDouble(1) == 24.0) // period 1 slot 0
  }

  test("frame: slicing fans units in; row aggregates keep shared units") {
    val f = es(Some("degC")).toFrame
    assert(f.unitsMap.values.head.canonical ==
      UnitRegistry.parse("degC").canonical)
    val two = EnergyFrame(
      f.df.withColumn("value2", col("value") * 2), Seq("ts"),
      Map("value" -> UnitRegistry.parse("degC"),
        "value2" -> UnitRegistry.parse("degC")))
    val rm = two.rowMean()
    assert(rm.units.get.canonical == UnitRegistry.parse("degC").canonical)
    // mean of (v, 2v) = 1.5v; sum over 0..99 = 1.5 * 4950
    assert(math.abs(rm.sum() - 1.5 * 4950.0) < 1e-9)
  }

  test("units metadata survives a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toString
    es(Some("kW")).toDF.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("value").metadata.getString("units") == "kW")
  }

  test("positional slice (iloc analog) follows index order") {
    val s = es().slicePositional(10, 5)
    val rows = s.df.orderBy("ts").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(10.0, 11.0, 12.0, 13.0, 14.0))
  }

  test("frame: per-column day-hour matrices in one pass") {
    val f = es(Some("degC")).toFrame
    val two = graft.core.EnergyFrame(
      f.df.withColumn("doubled", col("value") * 2), Seq("ts"))
    val m = two.toDayHourMatrices.orderBy("period_date").collect()
    assert(m.length == 5)
    assert(m.head.getAs[Double]("value_h3") == 3.0)
    assert(m.head.getAs[Double]("doubled_h3") == 6.0)
  }

  test("frame: column-subset slice keeps per-column units") {
    val f = es(Some("degC")).toFrame
    val two = graft.core.EnergyFrame(
      f.df.withColumn("power", col("value") * 2), Seq("ts"),
      Map("value" -> UnitRegistry.parse("degC"),
        "power" -> UnitRegistry.parse("kW")))
    val sliced = two.selectCols("power")
    assert(sliced.valueCols == Seq("power"))
    assert(sliced.unitsMap.keySet == Set("power"))
    assert(sliced.unitsMap("power").canonical == UnitRegistry.parse("kW").canonical)
  }

  test("frame: normalize resets units to dimensionless (documented deviation)") {
    val f = es(Some("degC")).toFrame.normalize()
    assert(f.unitsMap.values.forall(_.isDimensionless))
    assert(math.abs(f("value").sum() - 50.0) < 1e-9)
  }

  test("nseries: 1 for a series, value-column count for a frame " +
      "(energypandas.py:646-650,1110-1117)") {
    val s = es(Some("degC"))
    assert(s.nseries == 1)
    val f = s.toFrame
    assert(f.nseries == 1)
    val two = graft.core.EnergyFrame(
      f.df.withColumn("power", col("value") * 2), Seq("ts"))
    assert(two.nseries == 2)
  }
}
