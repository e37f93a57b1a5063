package graft.wlg

import graft.profile.UniDist
import scala.util.Random

/** Selectivity-targeted predicate samplers — the reference's wlg sampler
  * (G1–G3; reference: wlg/sampler/predicates.py:11-107). Driver-side
  * math over finished stats; Spark never sees this.
  */
object Samplers {

  /** G1: a range [lo,hi] covering `targetSel` of the CDF mass, placed
    * uniformly (predicates.py:11-25).
    */
  def sampleBetween(dist: UniDist, targetSel: Double, rnd: Random): (Double, Double) = {
    val s = math.max(0.0, math.min(1.0, targetSel))
    val u = rnd.nextDouble() * (1.0 - s)
    (dist.invCdf(u), dist.invCdf(u + s))
  }

  /** G2: frequency-weighted roulette over top-k values (predicates.py:28-45). */
  def sampleEqFromTopk(topk: Seq[(String, Long)], rnd: Random): String = {
    require(topk.nonEmpty, "empty topk")
    val total = topk.map(_._2).sum
    var r = rnd.nextDouble() * total
    topk.find { case (_, f) => r -= f; r <= 0 }.map(_._1).getOrElse(topk.last._1)
  }

  /** Standard normal CDF (Abramowitz–Stegun 7.1.26 erf approximation). */
  def phi(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x) / math.sqrt(2.0))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x / 2.0)
    if (x >= 0) 0.5 * (1.0 + y) else 0.5 * (1.0 - y)
  }

  /** G3: Gaussian-copula correlated N-D ranges with per-dim span
    * targetSel^(1/d) (predicates.py:48-107). Equicorrelation Cholesky:
    * z = L·g with L from the closed-form decomposition.
    */
  def sampleCopula(
      dists: Seq[UniDist],
      targetSel: Double,
      rho: Double,
      rnd: Random): Seq[(Double, Double)] = {
    val d = dists.length
    require(d >= 1)
    val span = math.pow(math.max(1e-12, targetSel), 1.0 / d)
    // correlated standard normals via Cholesky of (1-rho)I + rho*J
    val g = Array.fill(d)(rnd.nextGaussian())
    val l = choleskyEquicorr(d, rho)
    val z = Array.tabulate(d)(i =>
      (0 to i).map(j => l(i)(j) * g(j)).sum)
    dists.zipWithIndex.map { case (dist, i) =>
      val u = phi(z(i))
      val lo = math.max(0.0, math.min(1.0 - span, u - span / 2))
      (dist.invCdf(lo), dist.invCdf(lo + span))
    }
  }

  /** Lower-triangular Cholesky factor of the d×d equicorrelation matrix. */
  def choleskyEquicorr(d: Int, rho: Double): Array[Array[Double]] = {
    val a = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else rho)
    val l = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 to i) {
      val s = (0 until j).map(k => l(i)(k) * l(j)(k)).sum
      if (i == j) l(i)(j) = math.sqrt(math.max(0, a(i)(i) - s))
      else l(i)(j) = (a(i)(j) - s) / l(j)(j)
    }
    l
  }

  /** Copula fill mode (G3 wired into G4's planned-points protocol):
    * n rows of correlated CDF positions, each row phi(z) with
    * z ~ N(0, equicorrelation(rho)). fill() maps position u to the
    * window [u·(1-sel), u·(1-sel)+sel] per range param, so correlated
    * positions yield correlated windows while every param keeps its own
    * marginal selectivity — the generalization of [[sampleCopula]]'s
    * single joint target to per-param targets.
    */
  def copulaPoints(dims: Int, n: Int, rho: Double, rnd: Random): Seq[Seq[Double]] = {
    val r = math.max(-0.99, math.min(0.99, rho))
    val l = choleskyEquicorr(dims, r)
    (0 until n).map { _ =>
      val g = Array.fill(dims)(rnd.nextGaussian())
      (0 until dims).map(i => phi((0 to i).map(j => l(i)(j) * g(j)).sum))
    }
  }

  /** G4 grid mode: ⌈n^(1/d)⌉ evenly spaced CDF points per dim, cartesian
    * product truncated to n (wlg/cli/main.py:206-249).
    */
  def gridPoints(dims: Int, n: Int): Seq[Seq[Double]] = {
    val m = math.ceil(math.pow(n.toDouble, 1.0 / dims)).toInt
    val axis = (0 until m).map(i => (i + 0.5) / m)
    def cart(d: Int): Seq[Seq[Double]] =
      if (d == 0) Seq(Seq.empty)
      else for (rest <- cart(d - 1); v <- axis) yield v +: rest
    cart(dims).take(n)
  }

  /** G4 LHS mode: one sample per stratum per dim, strata order permuted
    * independently per dim (wlg/cli/main.py:251-284).
    */
  def lhsPoints(dims: Int, n: Int, rnd: Random): Seq[Seq[Double]] = {
    val cols = (0 until dims).map { _ =>
      rnd.shuffle((0 until n).toVector)
        .map(s => (s + rnd.nextDouble()) / n)
    }
    (0 until n).map(i => cols.map(_(i)))
  }

  /** G9: the reference's selectivity bands (generate_tpch_rq1_specs.py:31-36). */
  val SelectivityBands: Map[String, (Double, Double)] = Map(
    "S1" -> (0.0, 0.001), "S2" -> (0.001, 0.01),
    "S3" -> (0.01, 0.1), "S4" -> (0.1, 0.2))
}
