package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.units._

/** 2-D table of named columns with per-column units — the Spark-native
  * analog of `EnergyDataFrame(pandas.DataFrame)`
  * (`/root/reference/energy_pandas/energypandas.py:817-827`).
  *
  * Per-column units live in the wrapper (`unitsMap`) and are mirrored to
  * `StructField.metadata` on materialization. Mixed-unit frames are
  * allowed (`energypandas.py:980-991`).
  */
final case class EnergyFrame(
    df: DataFrame,
    indexCols: Seq[String],
    unitsMap: Map[String, EUnit] = Map.empty,
    meta: Map[String, String] = Map.empty,
    baseYear: Int = 2018
) {

  def valueCols: Seq[String] = df.columns.filterNot(indexCols.contains).toSeq

  /** Number of value series — the reference's `nseries` shape accessor
    * (`energypandas.py:1110-1117`): the value-column count, a pure
    * schema property (no job runs). */
  def nseries: Int = valueCols.size

  /** Column slice -> EnergySeries with that column's units + all extra
    * metadata (`energypandas.py:841-843,872-893`). Unit fan-in: when the
    * requested name has no unit but ALL columns share one unit, that unit
    * is inherited (`energypandas.py:152-158`, SURVEY §1.4.5). */
  def apply(colName: String): EnergySeries = {
    val u = unitsMap.get(colName).orElse {
      val distinct = unitsMap.values.map(_.canonical).toSet
      if (unitsMap.nonEmpty && distinct.size == 1) Some(unitsMap.values.head)
      else None
    }
    EnergySeries(df.select(indexCols.map(col) :+ col(colName): _*),
      indexCols, colName, u, meta, baseYear = baseYear)
  }

  /** Column-subset slice -> frame keeping each column's units — the
    * `edf[["a", "b"]]` form (`energypandas.py:841-843`). */
  def selectCols(names: String*): EnergyFrame =
    copy(df = df.select((indexCols ++ names).map(col): _*),
      unitsMap = unitsMap.view.filterKeys(names.contains).toMap)

  /** Per-column conversion to a single target unit
    * (`energypandas.py:960-991`): one projection, per-column literal
    * (slope, intercept) — constant-folded, no UDF. */
  def toUnits(target: String): EnergyFrame = {
    val to = UnitRegistry.parse(target)
    val projected = valueCols.map { c =>
      unitsMap.get(c) match {
        case Some(from) =>
          val (k, b) = UnitRegistry.conversion(from, to)
          (col(c) * lit(k) + lit(b)).as(c)
        case None => col(c)
      }
    }
    copy(df = df.select(indexCols.map(col) ++ projected: _*),
      unitsMap = valueCols.map(_ -> to).toMap)
  }

  def toIp: EnergyFrame = convertVia(UnitRegistry.toIpUnit)
  def toSi: EnergyFrame = convertVia(UnitRegistry.toSiUnit)

  private def convertVia(table: EUnit => Option[EUnit]): EnergyFrame = {
    var newUnits = unitsMap
    val projected = valueCols.map { c =>
      unitsMap.get(c).flatMap(from => table(from).map((from, _))) match {
        case Some((from, to)) =>
          val (k, b) = UnitRegistry.conversion(from, to)
          newUnits = newUnits.updated(c, to)
          (col(c) * lit(k) + lit(b)).as(c)
        case None => col(c) // silent passthrough (energypandas.py:659-662)
      }
    }
    copy(df = df.select(indexCols.map(col) ++ projected: _*), unitsMap = newUnits)
  }

  /** Min-max scale each column independently (`energypandas.py:993-1008`):
    * ONE aggregate action computes every column's (min, max), then one
    * projection — two stages regardless of column count. */
  def normalize(): EnergyFrame = {
    val aggs = valueCols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val projected = valueCols.zipWithIndex.map { case (c, i) =>
      val lo = r.getDouble(2 * i); val hi = r.getDouble(2 * i + 1)
      val e = if (hi == lo) lit(0.0) else (col(c) - lit(lo)) / lit(hi - lo)
      e.as(c)
    }
    val dimless = UnitRegistry.parse("dimensionless")
    copy(df = df.select(indexCols.map(col) ++ projected: _*),
      unitsMap = valueCols.map(_ -> dimless).toMap)
  }

  /** Row-wise aggregate across columns keeping shared units
    * (`tests/test_energypandas.py:242-244`): pure row expression, no
    * shuffle. */
  def rowMean(as: String = "mean"): EnergySeries = {
    val summed = valueCols.map(col).reduce(_ + _) / lit(valueCols.size)
    sharedUnitSeries(summed, as)
  }

  def rowSum(as: String = "sum"): EnergySeries =
    sharedUnitSeries(valueCols.map(col).reduce(_ + _), as)

  private def sharedUnitSeries(e: Column, as: String): EnergySeries = {
    val distinct = unitsMap.values.map(_.canonical).toSet
    val u = if (distinct.size == 1) Some(unitsMap.values.head) else None
    EnergySeries(df.select(indexCols.map(col) :+ e.as(as): _*),
      indexCols, as, u, meta, baseYear = baseYear)
  }

  /** Z-score standardization per column — the frame twin of
    * `EnergySeries.standardize`: one decimal-routed aggregate computes
    * every column's (Σx, Σx², n), then a single literal projection.
    * Units become dimensionless (same policy as normalize). */
  def standardize(): EnergyFrame = {
    val aggs = valueCols.flatMap(c => Seq(
      DetAgg.detSum(col(c)).as(s"__s_$c"),
      DetAgg.detSum(col(c) * col(c)).as(s"__q_$c"),
      count(col(c)).as(s"__n_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = valueCols.map { c =>
      val n = r.getAs[Long](s"__n_$c").toDouble
      val m = r.getAs[Double](s"__s_$c") / n
      val sd = math.sqrt(r.getAs[Double](s"__q_$c") / n - m * m)
      (if (sd == 0.0) lit(0.0) else (col(c) - lit(m)) / lit(sd)).as(c)
    }
    copy(df = df.select(indexCols.map(col) ++ scaled: _*),
      unitsMap = valueCols.map(_ -> UnitRegistry.parse("dimensionless"))
        .toMap)
  }

  /** Pairwise Pearson correlation of the value columns in long
    * `(col_a, col_b, corr)` form — the pandas `DataFrame.corr()` analog
    * the reference's frames inherit. Pairwise-COMPLETE observations
    * (pandas semantics): each pair's moments are conditioned on both
    * columns being non-null, so pivot gaps don't bias the estimate. ONE
    * decimal-routed aggregate computes every pair's six sufficient
    * statistics (map-side combinable, one row out), then each
    * correlation is literal arithmetic on that row — column count sets
    * the aggregate width, never the number of passes. */
  def corrMatrix(): DataFrame = {
    val vc = valueCols
    require(vc.size >= 2, "corrMatrix needs at least two value columns")
    val pairs = (for { i <- vc.indices; j <- i + 1 until vc.size }
      yield (vc(i), vc(j))).zipWithIndex
    // internal aliases are keyed by pair INDEX, not by joined column
    // names — underscore-joined names can collide ("x"+"y_z" vs "x_y"+"z")
    val aggs = pairs.flatMap { case ((a, b), k) =>
      val both = col(a).isNotNull && col(b).isNotNull
      def s(e: Column, name: String) =
        DetAgg.detSum(when(both, e)).as(s"__${name}_$k")
      Seq(count(when(both, lit(1))).as(s"__n_$k"),
        s(col(a), "sa"), s(col(b), "sb"),
        s(col(a) * col(a), "qa"), s(col(b) * col(b), "qb"),
        s(col(a) * col(b), "p"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    pairs.map { case ((a, b), k) =>
      def f(name: String) = col(s"__${name}_$k")
      val n = f("n").cast(DoubleType)
      val cov = n * f("p") - f("sa") * f("sb")
      val va = n * f("qa") - f("sa") * f("sa")
      val vb = n * f("qb") - f("sb") * f("sb")
      one.select(lit(a).as("col_a"), lit(b).as("col_b"),
        round(cov / sqrt(va * vb), 6).as("corr"))
    }.reduce(_ union _)
  }

  /** Calendar-month mean per column, labeled at month end — the frame
    * twin of `EnergySeries.monthly` (pandas frames inherit `resample`;
    * SURVEY §2.4 A5). One shuffle on ~12 keys, DetAgg means. */
  def monthly: EnergyFrame = {
    require(indexCols.nonEmpty, "monthly requires a time index")
    val ts = col(indexCols.head)
    val aggs = valueCols.map(c => DetAgg.detAvg(col(c)).as(c))
    copy(df = df.groupBy(last_day(date_trunc("month", ts))
      .as(indexCols.head)).agg(aggs.head, aggs.tail: _*))
  }

  /** Generic tumbling-window resample over every value column. */
  def resample(duration: String): EnergyFrame = {
    require(indexCols.nonEmpty, "resample requires a time index")
    val ts = col(indexCols.head)
    val aggs = valueCols.map(c => DetAgg.detAvg(col(c)).as(c))
    copy(df = df.groupBy(window(ts, duration).getField("start")
      .as(indexCols.head)).agg(aggs.head, aggs.tail: _*))
  }

  def sumAll(): Double = {
    val total = valueCols.map(c => DetAgg.detSum(col(c))).reduce(_ + _)
    df.agg(coalesce(total, lit(0.0))).head().getDouble(0)
  }

  /** Day × hour matrices for EVERY value column (the plot2d frame data
    * layer, `energypandas.py:1010-1108`): a `<col>_h<hour>`
    * deterministic-mean cell per (column, hour). Two-stage like the
    * series variant: aggregate on the natural (date, hour) key first
    * (no per-row CASE fan-out across columns × 24 cells), then pivot
    * the tiny per-hour aggregate. */
  def toDayHourMatrices: DataFrame = {
    val ts = col(indexCols.head)
    val colAggs = valueCols.flatMap(c => Seq(
      sum(col(c).cast(DetAgg.Dec)).as(s"__s_$c"),
      count(col(c)).as(s"__c_$c")))
    val hourly = df.groupBy(to_date(ts).as("period_date"),
        hour(ts).as("__h"))
      .agg(colAggs.head, colAggs.tail: _*)
    val cells = for (c <- valueCols; h <- 0 until 24) yield
      (max(when(col("__h") === h, col(s"__s_$c"))).cast("double") /
        max(when(col("__h") === h, col(s"__c_$c")))).as(s"${c}_h$h")
    hourly.groupBy(col("period_date")).agg(cells.head, cells.tail: _*)
  }

  /** Wide → long reshape (pandas `melt` / the inverse of the ingest
    * pivot): one row per (index, column) with the column name in
    * `metricCol`. Uses Spark's native unpivot — a generator projection,
    * no shuffle. */
  def melt(metricCol: String = "metric", valueCol: String = "value")
      : DataFrame =
    df.unpivot(indexCols.map(col).toArray,
      valueCols.map(col).toArray, metricCol, valueCol)

  /** DataFrame with per-column units mirrored into field metadata. */
  def toDF: DataFrame = {
    val projected = df.columns.toSeq.map { c =>
      unitsMap.get(c) match {
        case Some(u) =>
          val m = new MetadataBuilder().putString("units", u.raw).build()
          col(c).as(c, m)
        case None => col(c)
      }
    }
    df.select(projected: _*)
  }

  def show(n: Int = 20): Unit = {
    df.show(n)
    if (unitsMap.nonEmpty)
      println(unitsMap.map { case (c, u) => s"$c: ${u.raw}" }.mkString("units: ", ", ", ""))
  }
}
