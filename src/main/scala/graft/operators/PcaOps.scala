package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the
  * variance-structure screen a training-data pipeline runs before
  * clustering/dedup (effective dimensionality, dominant directions,
  * 1-D/2-D projections for stratified sampling).
  *
  * Scale split, the only one that works at 100 TB: the DATA pass is
  * ONE [[graft.functions.GramAggregate]] aggregation collapsing
  * every partition to `1 + d + d(d+1)/2` doubles; everything
  * afterwards — covariance, eigenvectors — is O(d²)/O(d³) driver
  * arithmetic on that fixed-size state (d ≤ a few hundred; for
  * larger d use random projection first). Projection is a broadcast
  * literal dot product, zero shuffles.
  *
  * Determinism — the part that makes an iterative eigensolver
  * oracle-able at all: after the covariance lands on the 1e-9 grid,
  * the ENTIRE power iteration runs in exact integer fixed-point
  * (1e-9 units, arbitrary precision): matrix-vector products are
  * integer sums, each round rescales by the L∞ norm (an exact
  * integer max — no square root in the loop), rounding is integer
  * round-half-up, and the single final L2 normalization takes one
  * correctly-rounded `sqrt` of an exact integer. A float
  * formulation snapped per step is NOT enough — with the uniform
  * start vector the products sit exactly ON the rounding
  * boundaries, so engine summation order flips grid cells and each
  * normalization amplifies the flip ~100× (observed; the integer
  * loop has no boundaries to flip). Fixed `iters` rounds, no
  * convergence test: an engine-independent fixed point matters more
  * than the last ulp of eigen-accuracy. Further components deflate
  * `C −= λ·vvᵀ` in the same integer arithmetic.
  */
object PcaOps {

  /** @param n input rows (non-null vectors)
    * @param mean per-dim mean, 1e-9 grid
    * @param components row per component, each a unit vector on the
    *        1e-9 grid
    * @param eigenvalues variance captured per component, 1e-9 grid
    */
  case class PcaModel(
      n: Long,
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  private def snap(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  private val G = BigInt(1000000000L)

  /** floor(t/u) for u > 0 (BigInt `mod` is non-negative for a
    * positive modulus, so this is true floor division).
    */
  private def fld(t: BigInt, u: BigInt): BigInt = (t - t.mod(u)) / u

  /** round-half-up(p/q) for q > 0 = floor((2p + q) / 2q). */
  private def rhu(p: BigInt, q: BigInt): BigInt = fld(2 * p + q, 2 * q)

  /** Fit `nComponents` principal components of `vecCol` (length
    * `dim`) — one aggregation pass, then exact integer fixed-point
    * power iteration on the driver.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      nComponents: Int = 1,
      iters: Int = 16
  ): PcaModel = {
    require(nComponents >= 1 && nComponents <= dim,
      s"nComponents must be in [1, $dim], got $nComponents")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val state = df
      .select(graft.functions.GramAggregate.gramMatrix(col(vecCol), dim).as("g"))
      .head().getSeq[Double](0).toArray
    val n = state(0).toLong
    require(n >= 2, s"PCA needs >= 2 vectors, got $n")
    val mean = Array.tabulate(dim)(i => snap(state(1 + i) / n))
    // covariance directly in integer 1e-9 units
    val ci = Array.ofDim[BigInt](dim, dim)
    var off = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = BigInt(math.floor((state(off) / n - mean(i) * mean(j)) * 1e9 + 0.5).toLong)
        ci(i)(j) = c; ci(j)(i) = c
        off += 1; j += 1
      }
      i += 1
    }
    val comps = Array.ofDim[Double](nComponents, dim)
    val evs = new Array[Double](nComponents)
    var k = 0
    while (k < nComponents) {
      // uniform start: 1/sqrt(64)=0.125 is exact; other dims round once
      var x = Array.fill(dim)(BigInt(math.floor(1.0 / math.sqrt(dim.toDouble) * 1e9 + 0.5).toLong))
      var it = 0
      while (it < iters) {
        val y = Array.tabulate(dim) { a =>
          var s = BigInt(0)
          var b = 0
          while (b < dim) { s += ci(a)(b) * x(b); b += 1 }
          s
        }
        val mx = y.map(_.abs).max
        require(mx > 0, s"power iteration collapsed (component $k, iter $it)")
        x = y.map(ya => rhu(ya * G, mx))
        it += 1
      }
      // one L2 normalization: sqrt of an exact integer, correctly
      // rounded in any IEEE engine, then integer division
      val s2 = x.map(xi => xi * xi).sum
      val nn = BigInt(math.floor(math.sqrt(s2.toDouble) + 0.5).toLong)
      require(nn > 0, s"zero-norm component $k")
      val v = x.map(xi => rhu(xi * G, nn))
      comps(k) = v.map(_.toDouble / 1e9).toArray
      // Rayleigh quotient in integer units: λ = Σ c_ab v_a v_b · 1e-27
      var lamNum = BigInt(0)
      var a = 0
      while (a < dim) {
        var b = 0
        while (b < dim) { lamNum += ci(a)(b) * v(a) * v(b); b += 1 }
        a += 1
      }
      val lamInt = rhu(lamNum, G * G) // 1e-9 units
      evs(k) = lamInt.toDouble / 1e9
      // integer deflation: c_ab -= round(λ·v_a·v_b) in 1e-9 units
      a = 0
      while (a < dim) {
        var b = 0
        while (b < dim) {
          ci(a)(b) -= rhu(lamInt * v(a) * v(b), G * G)
          b += 1
        }
        a += 1
      }
      k += 1
    }
    PcaModel(n, mean, comps, evs)
  }

  /** Project each vector onto the model's components:
    * `pc<k> = Σ v_f·x_f − Σ v_f·mean_f` as a broadcast-literal
    * fold (codegen'd `zip_with`+`aggregate`), emitted on the 1e-6
    * grid. Zero shuffles.
    *
    * The dot product runs in FIXED-POINT: each product lands on an
    * integer 1e-9 lattice (`floor(x·v·1e9 + 0.5)` as a long) and
    * the fold sums longs — integer addition is order-independent
    * EXACTLY, so the score cannot drift a grid cell between engines
    * the way a float summation can (a float dot summed in two
    * orders differs by ~1e-16, which flips the 1e-6 rounding on
    * boundary rows — observed on real data, not hypothetical).
    */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val scoreCols = model.components.zipWithIndex.map { case (v, k) =>
      val biasInt = v.zip(model.mean)
        .map { case (a, b) => math.floor(a * b * 1e9 + 0.5).toLong }.sum
      val vlit = array(v.map(lit): _*)
      val dotInt = aggregate(
        zip_with(x, vlit, (a, b) => floor(a * b * lit(1e9) + lit(0.5)).cast("long")),
        lit(0L), (acc, e) => acc + e)
      (floor((dotInt - lit(biasInt)).cast("double") / lit(1000.0) + lit(0.5)) / lit(1e6))
        .as(s"pc${k + 1}")
    }
    df.select(col(idCol) +: scoreCols: _*)
  }

  /** fit + project in one call; returns (id, pc1..pcK). */
  def fitProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nComponents: Int = 1,
      iters: Int = 16
  ): DataFrame =
    project(df, idCol, vecCol, fit(df, vecCol, dim, nComponents, iters))
}
