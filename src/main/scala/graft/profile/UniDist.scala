package graft.profile

/** Inverse-CDF distribution over a histogram — the reference's `UniDist`
  * (reference: wlg/profiler/dist_store.py:15-47): piecewise-linear
  * interpolation inside each bin. Driver-side math over finished stats.
  */
case class UniDist(edges: Seq[Double], counts: Seq[Long]) {
  require(edges.length == counts.length + 1, "edges must be counts+1")
  private val total = counts.sum.toDouble
  private val cum: Array[Double] = counts.scanLeft(0L)(_ + _).map(_ / total).toArray

  /** Value at cumulative probability p (clamped to [0,1]). */
  def invCdf(p: Double): Double = {
    if (total == 0) return edges.head
    val q = math.max(0.0, math.min(1.0, p))
    // first bin i with cum(i+1) >= q
    var i = java.util.Arrays.binarySearch(cum, q)
    if (i < 0) i = -i - 2
    i = math.max(0, math.min(counts.length - 1, i))
    val (c0, c1) = (cum(i), cum(i + 1))
    val frac = if (c1 > c0) (q - c0) / (c1 - c0) else 0.0
    edges(i) + frac * (edges(i + 1) - edges(i))
  }

  /** Cumulative probability at value v (inverse of invCdf, for tests). */
  def cdf(v: Double): Double = {
    if (v <= edges.head) return 0.0
    if (v >= edges.last) return 1.0
    var i = 0
    while (i < counts.length && edges(i + 1) < v) i += 1
    val frac =
      if (edges(i + 1) > edges(i)) (v - edges(i)) / (edges(i + 1) - edges(i)) else 1.0
    cum(i) + frac * (cum(i + 1) - cum(i))
  }
}

object UniDist {

  /** Fallback synthesis from min/quantiles/max when no histogram exists —
    * the reference's quantile-fallback path (wlg/cli/main.py:1313-1337).
    */
  def fromQuantiles(
      min: Double, max: Double, quantiles: Seq[(Double, Double)]): UniDist = {
    val pts = ((0.0, min) +: quantiles.sortBy(_._1) :+ (1.0, max))
      .distinctBy(_._1)
    val edges = pts.map(_._2)
    val masses = pts.sliding(2).map { case Seq((p0, _), (p1, _)) =>
      math.max(0L, math.round((p1 - p0) * 1e6))
    }.toSeq
    UniDist(edges, masses)
  }
}
