package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.core.{EnergyFrame, EnergySeries}
import graft.plots.Render

/** The V4 rendering sink: the period-matrix heatmap renders to
  * deterministic PNG bytes with exact cell geometry and the RdBu
  * normalization of the reference's plot2d (pixel-level assertions
  * replace matplotlib golden images — same data semantics, documented
  * rendering deviation). */
class PlotRenderSpec extends SparkTestBase {
  import spark.implicits._

  private def rgb(argb: Int): (Int, Int, Int) =
    ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)

  test("plot2d renders the period matrix with RdBu min/max normalization") {
    // 48 hourly values 0..47 -> 2 periods x 24 slots; vmin=0, vmax=47.
    // axisOff pins the bare-panel geometry; the default-on axes case is
    // pinned in its own test below.
    val es = EnergySeries.rangeSeries(spark, 48, 2018, Some("degC"))
    val png = Render.plot2d(es, axisOff = true)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // width: 2 periods x 8px + 8 gap + 18 colorbar; height: 24 x 8px
    // + 14 units-label margin (no title: rangeSeries has no name)
    assert(img.getWidth == 2 * 8 + 8 + 18)
    assert(img.getHeight == 24 * 8 + 14)
    // cell (period 0, slot 0) = value 0 = vmin -> RdBu(0) dark red
    assert(rgb(img.getRGB(0, 0)) == ((103, 0, 31)))
    // cell (period 1, slot 23) = value 47 = vmax -> RdBu(1) dark blue
    assert(rgb(img.getRGB(8, 23 * 8)) == ((5, 48, 97)))
    // colorbar: vmax at top (blue), vmin at bottom (dark red)
    val cbX = 2 * 8 + 8 + 2
    assert(rgb(img.getRGB(cbX, 0)) == ((5, 48, 97)))
    assert(rgb(img.getRGB(cbX, 24 * 8 - 1)) == ((103, 0, 31)))
    // deterministic: render twice, byte-identical
    assert(java.util.Arrays.equals(png, Render.plot2d(es, axisOff = true)))
    // PNG signature
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N')
  }

  test("plot2d default draws RESOLUTION_NAME axes: margins, ticks, labels") {
    // hourly step, periodLength 24 -> xlabel "Days", ylabel
    // "Hours of Day" (energypandas.py:759-770 + RESOLUTION_NAME)
    assert(Render.axisLabels(3600, 24) == (("Days", "Hours of Day")))
    // 15-minute step, 96 slots/day; 24 slots of hourly-of-Hour quirk
    // mirrored from the reference's resolution_string math
    assert(Render.axisLabels(900, 96) == (("Days", "15-Minutes of Day")))
    assert(Render.axisLabels(3600, 12) == (("Hours", "Hours of Hour")))
    val es = EnergySeries.rangeSeries(spark, 48, 2018, Some("degC"))
    val png = Render.plot2d(es)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // left margin 12 (ylabel) + 18 (y ticks); bottom 10 (x ticks) + 12
    // (xlabel) + 2 + 14 (units row)
    assert(img.getWidth == 30 + 2 * 8 + 8 + 18)
    assert(img.getHeight == 24 * 8 + 24 + 14)
    // panel shifts right by the margin; color pins hold at the offset
    assert(rgb(img.getRGB(30, 0)) == ((103, 0, 31)))
    assert(rgb(img.getRGB(30 + 8, 23 * 8)) == ((5, 48, 97)))
    // y tick numbers (0/6/12/18) leave dark pixels in the tick strip
    def darkIn(x0: Int, x1: Int, y0: Int, y1: Int): Boolean =
      (x0 until x1).exists(x => (y0 until y1).exists { y =>
        val (r, g, b) = rgb(img.getRGB(x, y)); r + g + b < 384
      })
    assert(darkIn(12, 30, 0, 24 * 8))          // y ticks
    assert(darkIn(0, 12, 0, 24 * 8))           // rotated ylabel
    assert(darkIn(30, img.getWidth, 24 * 8, img.getHeight)) // x ticks+label
    assert(java.util.Arrays.equals(png, Render.plot2d(es)))
  }

  test("plot2d vcenter uses the two-slope norm: center renders white") {
    val es = EnergySeries.rangeSeries(spark, 48, 2018, Some("degC"))
    val png = Render.plot2d(es, vcenter = Some(10.0), axisOff = true)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // value 10 (period 0, slot 10) is the vcenter -> RdBu(0.5) white
    assert(rgb(img.getRGB(0, 10 * 8)) == ((247, 247, 247)))
  }

  test("norm and rdbu endpoints match the documented mapping") {
    assert(Render.norm(0.0, 0.0, 10.0) == 0.0)
    assert(Render.norm(10.0, 0.0, 10.0) == 1.0)
    assert(Render.norm(2.0, 0.0, 10.0, Some(2.0)) == 0.5)
    assert(Render.norm(6.0, 2.0, 10.0, Some(6.0)) == 0.5)
    // degenerate range -> midpoint, not NaN
    assert(Render.norm(5.0, 5.0, 5.0) == 0.5)
    assert(rgb(Render.rdbu(0.5)) == ((247, 247, 247)))
  }

  test("saveAndShow writes filename.format only when save=true") {
    val es = EnergySeries.rangeSeries(spark, 48)
    val png = Render.plot2d(es, colorbar = false)
    assert(Render.saveAndShow(png, save = false).isEmpty)
    val base = java.nio.file.Files.createTempDirectory("plotspec")
      .resolve("heat").toString
    val written = Render.saveAndShow(png, save = true, filename = base)
    assert(written.exists(_.toString == s"$base.png"))
    val bytes = java.nio.file.Files.readAllBytes(written.get)
    assert(java.util.Arrays.equals(bytes, png))
  }

  test("renderRidges: oblique stack, back-to-front occlusion, period colors") {
    // two periods x 24 slots: front (p=0) all-high, back (p=1) all-low
    val m: Array[Array[Option[Double]]] = Array(
      Array.fill(24)(Some(1.0)), Array.fill(24)(Some(0.0)))
    val png = Render.renderRidges(m, vmin = Some(0.0), vmax = Some(1.0))
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // w = (24-1)*8 + (2-1)*4 + 2; h = 96 + (2-1)*6 + 2 (no title)
    assert(img.getWidth == 23 * 8 + 4 + 2)
    assert(img.getHeight == 96 + 6 + 2)
    // strictly inside the front polygon: front is painted LAST and
    // colored RdBu(0) (dark red) — it must occlude the back period
    assert(rgb(img.getRGB(50, 50)) == ((103, 0, 31)))
    // beyond the front polygon's right edge (x > 184): the back
    // period's black profile outline at its baseline y = 96 survives
    assert(rgb(img.getRGB(186, 96)) == ((0, 0, 0)))
    // deterministic bytes
    assert(java.util.Arrays.equals(png,
      Render.renderRidges(m, vmin = Some(0.0), vmax = Some(1.0))))
  }

  test("plot3dBy renders one shared-normalization ridge panel per group") {
    val df = spark.range(96).select(
      org.apache.spark.sql.functions.expr(
        "timestamp'2018-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 48 AS INT),0,0)").as("ts"),
      org.apache.spark.sql.functions.when($"id" < 48, "a").otherwise("b")
        .as("grp"),
      ($"id" % 48).cast("double").as("value"))
    val es = EnergySeries(df, Seq("ts"), "value")
    val png = Render.plot3dBy(es, "grp")
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // per panel: 2 dates x 24 hours -> w = 23*8 + 4 + 2 = 190,
    // h = 16 (title) + 96 + 6 + 2 = 120; two panels + 6 px gutter
    assert(img.getWidth == 190)
    assert(img.getHeight == 120 * 2 + 6)
    assert(java.util.Arrays.equals(png, Render.plot3dBy(es, "grp")))
  }

  test("renderSurface: hillshaded relief, flat fields render unshaded") {
    def m(rows: Array[Double]*): Array[Array[Option[Double]]] =
      rows.map(_.map(Option(_)).toArray).toArray
    // constant field: zero gradient everywhere -> rescale degenerates to
    // i = 0.5 -> pegtop soft-light is the identity -> pure ramp color
    // (hi == lo -> norm 0.5 -> RdBu midpoint white)
    val flatPng = Render.renderSurface(m(
      Array(3.0, 3.0, 3.0), Array(3.0, 3.0, 3.0)))
    val flat = ImageIO.read(new ByteArrayInputStream(flatPng))
    assert(flat.getWidth == 16 && flat.getHeight == 24)
    assert(rgb(flat.getRGB(0, 0)) == ((247, 247, 247)))
    // quadratic slope z = s^2 along slots, identical periods: dy = 0,
    // dx = (1, 2, 4, 5) by np.gradient edges/center -> intensity
    // rescales to exactly 0 at slot 0 and 1 at slot 3
    val png = Render.renderSurface(m(
      Array(0.0, 1.0, 4.0, 9.0), Array(0.0, 1.0, 4.0, 9.0)))
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth == 16 && img.getHeight == 32)
    // slot 0: v=0 -> RdBu(0)=(103,0,31), i=0 -> c^2 shading = (42,0,4)
    assert(rgb(img.getRGB(0, 0)) == ((42, 0, 4)))
    // slot 3: v=9 -> RdBu(1)=(5,48,97), i=1 -> 2c-c^2 = (10,87,157)
    assert(rgb(img.getRGB(0, 3 * 8)) == ((10, 87, 157)))
    // same math via the public scalar helpers (the q185 oracle contract)
    assert(Render.softLight(103, 0.0) == 42 && Render.softLight(31, 0.0) == 4)
    assert(Render.softLight(5, 1.0) == 10 && Render.softLight(48, 1.0) == 87
      && Render.softLight(97, 1.0) == 157)
    assert(java.util.Arrays.equals(png, Render.renderSurface(m(
      Array(0.0, 1.0, 4.0, 9.0), Array(0.0, 1.0, 4.0, 9.0)))))
  }

  test("renderContour: 150 level bands along the ramp, missing stays gray") {
    val matrix: Array[Array[Option[Double]]] = Array(
      Array(Some(0.0), Some(1.0), None, Some(9.0)))
    val png = Render.renderContour(matrix)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth == 8 && img.getHeight == 32)
    // v=0 -> band 0 -> RdBu(0); v=9 -> band 149 -> RdBu(1)
    assert(rgb(img.getRGB(0, 0)) == ((103, 0, 31)))
    assert(rgb(img.getRGB(0, 3 * 8)) == ((5, 48, 97)))
    assert(rgb(img.getRGB(0, 2 * 8)) == ((220, 220, 220))) // missing
    // band quantization: v=1 of [0,9] -> floor(150/9) = band 16
    assert(Render.contourBand(1.0, 0.0, 9.0, 150) == 16)
    assert(Render.contourBand(9.0, 0.0, 9.0, 150) == 149)
    assert(java.util.Arrays.equals(png, Render.renderContour(matrix)))
  }

  test("plot3d dispatches on kind; unknown kind is the reference error") {
    val es = EnergySeries.rangeSeries(spark, 48, 2018, Some("degC"))
    val surface = Render.plot3d(es, kind = "surface")
    val contour = Render.plot3d(es, kind = "contour")
    val polygon = Render.plot3d(es) // default stays the ridge stack
    assert((surface(0) & 0xff) == 0x89 && (contour(0) & 0xff) == 0x89
      && (polygon(0) & 0xff) == 0x89)
    // surface/contour: 2 periods x 24 slots grid, no title (no name)
    val simg = ImageIO.read(new ByteArrayInputStream(surface))
    assert(simg.getWidth == 16 && simg.getHeight == 24 * 8)
    val e = intercept[IllegalArgumentException] {
      Render.plot3d(es, kind = "banana")
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("plot2dFrame stacks per-column panels with shared normalization") {
    val df = spark.range(24).select(
      org.apache.spark.sql.functions.expr(
        "timestamp'2018-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0)").as("ts"),
      $"id".cast("double").as("a"),
      (org.apache.spark.sql.functions.lit(46.0) - $"id").as("b"))
    val ef = EnergyFrame(df, Seq("ts"))
    val png = Render.plot2dFrame(ef, colorbar = false, axisOff = true)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // one period wide; two 24-slot panels + 1 gutter slot row tall
    assert(img.getWidth == 8)
    assert(img.getHeight == (24 + 1 + 24) * 8)
    // shared norm over [0, 46]: a's slot 0 = 0 -> dark red;
    // b's slot 0 (row 25) = 46 -> dark blue; gutter row = background
    // white (layout, not missing data — missing cells stay gray)
    assert(rgb(img.getRGB(0, 0)) == ((103, 0, 31)))
    assert(rgb(img.getRGB(0, 25 * 8)) == ((5, 48, 97)))
    assert(rgb(img.getRGB(0, 24 * 8)) == ((255, 255, 255)))
    // default axes (the reference's axis_off=False): panels shift right
    // by the margin, y ticks per panel, x axis under the BOTTOM panel
    // only (sharex rendering)
    val png2 = Render.plot2dFrame(ef, colorbar = false)
    val img2 = ImageIO.read(new ByteArrayInputStream(png2))
    assert(img2.getWidth == 30 + 8)
    assert(img2.getHeight == (24 + 1 + 24) * 8 + 24)
    assert(rgb(img2.getRGB(30, 0)) == ((103, 0, 31)))
    assert(rgb(img2.getRGB(30, 25 * 8)) == ((5, 48, 97)))
    def darkIn(x0: Int, x1: Int, y0: Int, y1: Int): Boolean =
      (x0 until x1).exists(x => (y0 until y1).exists { y =>
        val c = img2.getRGB(x, y)
        ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff) < 384
      })
    assert(darkIn(12, 30, 0, 24 * 8))               // top panel y ticks
    assert(darkIn(12, 30, 25 * 8, 49 * 8))          // bottom panel y ticks
    assert(darkIn(30, img2.getWidth, 49 * 8, img2.getHeight)) // x axis
  }

  test("rdbuCols/contourBandCol match the JVM scalars on every input " +
      "class, including NaN and infinities") {
    import org.apache.spark.sql.functions.col
    // NaN is the adversarial case: math.min/max propagate it (scalar →
    // black / band 0) while Spark's least/greatest would clamp it to
    // the 1.0 end — and ANSI mode throws on cast(NaN as int) if it
    // reaches the segment-index cast. The twins must branch it out.
    val ts = Seq(Double.NaN, Double.NegativeInfinity, -0.5, 0.0, 0.049,
      1.0 / 3.0, 0.5, 0.95, 1.0, 1.5, Double.PositiveInfinity)
    val df = ts.toDF("t")
    val (r, g, b) = Render.rdbuCols(col("t"))
    val band = Render.contourBandCol(col("t"), org.apache.spark.sql
      .functions.lit(0.0), org.apache.spark.sql.functions.lit(1.0), 150)
    val got = df.select(col("t"), r.as("r"), g.as("g"), b.as("b"),
      band.as("band")).collect()
    got.foreach { row =>
      val t = row.getDouble(0)
      val expected = rgb(Render.rdbu(t))
      assert((row.getInt(1), row.getInt(2), row.getInt(3)) == expected,
        s"rdbuCols($t)")
      assert(row.getInt(4) == Render.contourBand(t, 0.0, 1.0, 150),
        s"contourBandCol($t)")
    }
  }
}
