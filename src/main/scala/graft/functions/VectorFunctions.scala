package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding
  * columns, built from `zip_with` / `aggregate` / `transform` —
  * all codegen'd Catalyst expressions, no UDFs, so they inline into
  * whole-stage codegen next to the scan.
  *
  * All math is done in double: cast first, then a left-to-right
  * sequential fold — numerically identical across runs and across
  * engines that fold the same way (this is what lets DuckDB oracles
  * hash-match on rounded cosine values).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x
    )

  def l2Norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(l2DistanceSq(a, b))

  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into
    * a long. Hyperplane h_i component for dimension d is a
    * deterministic pseudo-random ±1 derived from xxhash64(seed,i,d)
    * — no stored projection matrix to broadcast; the "matrix" is
    * the hash function, identical on every executor.
    */
  def hyperplaneLshBits(vec: Column, nBits: Int, seed: Long = 7L): Column = {
    require(nBits >= 1 && nBits <= 63, "nBits in [1,63]")
    val v = asDouble(vec)
    val bits = (0 until nBits).map { i =>
      // projection_i = Σ_d v[d] * sign(hash(seed, i, d))
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, d) =>
          x * when(pmod(xxhash64(lit(seed), lit(i), d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
        ),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two packed-bit longs. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Half-up decimal rounding via floor — matches the identical
    * formulation used in SQL oracles (Spark round is HALF_UP,
    * DuckDB round is half-even; floor(x·10^d + 0.5)/10^d is
    * engine-independent).
    */
  def hround(c: Column, d: Int): Column = {
    val m = math.pow(10, d)
    floor(c * m + lit(0.5)) / m
  }
}
