package graft.operators

/** Deterministic driver-side k-means (seeded k-means++ init + Lloyd).
  *
  * Spark.ml's KMeans launches dozens of scheduler-round-trip jobs
  * (k-means|| init passes + one per Lloyd iteration), which costs seconds
  * even on a 30-row input. Every k-means in this engine runs over data
  * that is small BY CONSTRUCTION — the period×slot matrix
  * (rows/periodLength rows; SURVEY §4 plans it driver-side, mirroring
  * tsam, which runs sklearn in-process) and the IVF coarse-quantizer
  * training sample (bounded at 4096) — so the fit belongs on the driver:
  * one collect of the already-aggregated matrix, zero extra jobs.
  * Callers keep the spark.ml path as the fallback for matrices too large
  * to collect (see Discretize.MaxLocalRows).
  *
  * Determinism: seeded RNG for k-means++ sampling, ties broken toward the
  * lowest centroid index, input order fixed by the caller (sorted by
  * period id / sample id) — identical output across runs, thread counts,
  * and cluster layouts.
  */
object LocalKMeans {

  /** @return cluster index per input row (and the centroids) */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 40, tol: Double = 1e-9): (Array[Int], Array[Array[Double]]) = {
    require(points.nonEmpty, "k-means on empty input")
    val n = points.length
    val dim = points(0).length
    val kk = math.min(k, n)
    val rng = new scala.util.Random(seed)

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // k-means++ init
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rng.nextInt(n)).clone()
    val minD2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      var total = 0.0
      while (i < n) {
        val d = dist2(points(i), centers(c - 1))
        if (d < minD2(i)) minD2(i) = d
        total += minD2(i)
        i += 1
      }
      // sample proportional to D²; on total == 0 (all points coincide with
      // chosen centers) fall back to the first point — deterministic
      val r = rng.nextDouble() * total
      var acc = 0.0
      var pick = 0
      i = 0
      var found = false
      while (i < n && !found) {
        acc += minD2(i)
        if (acc >= r && minD2(i) > 0) { pick = i; found = true }
        i += 1
      }
      centers(c) = points(pick).clone()
      c += 1
    }

    // Lloyd iterations
    val assign = new Array[Int](n)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = dist2(points(i), centers(0))
        var j = 1
        while (j < kk) {
          val d = dist2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j } // strict <: lowest index wins ties
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += points(i)(d); d += 1 }
        i += 1
      }
      moved = 0.0
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var d = 0
          while (d < dim) { sums(j)(d) /= counts(j); d += 1 }
          moved += dist2(centers(j), sums(j))
          centers(j) = sums(j)
        } // empty cluster keeps its previous center
        j += 1
      }
      iter += 1
    }
    (assign, centers)
  }
}
