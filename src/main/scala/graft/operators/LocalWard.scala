package graft.operators

/** Deterministic driver-side Ward-linkage agglomerative clustering —
  * the tsam-parity clustering mode for `discretize`
  * (`/root/reference/energy_pandas/energypandas.py:384-412` delegates to
  * tsam's `TimeSeriesAggregation`, whose default `clusterMethod` is
  * `'hierarchical'`, i.e. sklearn `AgglomerativeClustering` with Ward
  * linkage run in-process over the period×slot matrix).
  *
  * Standard Ward via the Lance–Williams recurrence on squared Euclidean
  * cluster distances:
  *
  *   D²(i∪j, k) = [(nᵢ+nₖ)·D²(i,k) + (nⱼ+nₖ)·D²(j,k) − nₖ·D²(i,j)]
  *                / (nᵢ+nⱼ+nₖ)
  *
  * seeded with D²(i,j) = ‖xᵢ−xⱼ‖²·(ninj/(ni+nj))·2 for singletons —
  * equivalently the Ward objective increase. O(n³) time / O(n²) space,
  * which is fine by construction: the period matrix has at most a few
  * hundred rows (366 for daily periods of a year).
  *
  * Determinism: merges pick the minimum distance with ties broken toward
  * the lowest (i, j) pair; final labels are renumbered by first
  * appearance in input order, so identical inputs give identical labels
  * across runs, thread counts, and cluster layouts.
  */
object LocalWard {

  /** @return cluster index per input row (0-based, renumbered by first
    *         appearance in input order) */
  def fit(points: Array[Array[Double]], k: Int): Array[Int] = {
    require(points.nonEmpty, "ward on empty input")
    val n = points.length
    val kk = math.min(k, n)
    val dim = points(0).length

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // active clusters; D(i)(j) = Ward merge cost between clusters i and j
    val size = Array.fill(n)(1)
    val active = Array.fill(n)(true)
    val d = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        // Ward cost of merging two singletons = ||xi - xj||^2 / 2
        d(i)(j) = dist2(points(i), points(j)) / 2.0
        d(j)(i) = d(i)(j)
        j += 1
      }
      i += 1
    }
    // membership: each point's current cluster id (cluster ids are the
    // index of one representative row)
    val label = Array.tabulate(n)(identity)

    var remaining = n
    while (remaining > kk) {
      // find the cheapest merge, lowest (i, j) on ties
      var bi = -1; var bj = -1; var best = Double.MaxValue
      i = 0
      while (i < n) {
        if (active(i)) {
          var j = i + 1
          while (j < n) {
            if (active(j) && d(i)(j) < best) { best = d(i)(j); bi = i; bj = j }
            j += 1
          }
        }
        i += 1
      }
      // merge bj into bi; update distances via Lance–Williams (Ward)
      val ni = size(bi).toDouble; val nj = size(bj).toDouble
      var t = 0
      while (t < n) {
        if (active(t) && t != bi && t != bj) {
          val nt = size(t).toDouble
          d(bi)(t) = ((ni + nt) * d(bi)(t) + (nj + nt) * d(bj)(t) -
            nt * d(bi)(bj)) / (ni + nj + nt)
          d(t)(bi) = d(bi)(t)
        }
        t += 1
      }
      active(bj) = false
      size(bi) += size(bj)
      t = 0
      while (t < n) { if (label(t) == bj) label(t) = bi; t += 1 }
      remaining -= 1
    }

    // renumber labels by first appearance — stable, 0-based
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    label.map(l => seen.getOrElseUpdate(l, seen.size))
  }
}
