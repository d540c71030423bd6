package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.operators.IvfKnnOps.NearestCentroid

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering step under cluster-balanced sampling, SemDeDup-style
  * semantic dedup, and topic-stratified corpus analysis (reference
  * semantics: the embedding-grouping utilities of `biosets`; the IVF
  * trainer in [[IvfKnnOps]] fits on a driver-side sample — this
  * operator is the full-corpus variant whose E-step runs on the
  * cluster).
  *
  * Scale design:
  *   - The assignment (E) step is [[NearestCentroid]] — a codegen'd
  *     zero-shuffle map with the k·dim centroid table riding inside
  *     the expression; no join, no shuffle.
  *   - The update (M) step is `posexplode` → `groupBy(cluster, dim)`
  *     with map-side partial aggregation: ONE shuffle of at most
  *     k·dim·partitions partial rows; only k·dim averaged doubles
  *     ever reach the driver per iteration.
  *   - Per-iteration driver state is the k×dim centroid matrix —
  *     bounded and tiny, same documented pattern as the IVF trainer.
  *
  * Determinism (what makes a fixed-point float algorithm
  * oracle-checkable): init is the embeddings of the k smallest ids
  * (no RNG), ties in the argmin break toward the lower cluster id on
  * both engines, and centroids are snapped to the 1e-9 grid after
  * every update so cross-engine summation-order noise (~1e-15)
  * cannot compound across iterations.
  */
object KMeansOps {

  final case class KMeansModel(centroids: Array[Array[Double]])

  /** Assign each row to its nearest centroid (L2²). Adds `cluster`. */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("cluster",
      ColumnBridge.column(NearestCentroid(ColumnBridge.expression(col(vecCol)), centroids)))

  /** Fit `iters` rounds of (assign, update) starting from the
    * embeddings of the k smallest `idCol` values. A cluster that
    * captures no points keeps its previous centroid.
    */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int): KMeansModel = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val init: Array[Array[Double]] = df
      .orderBy(col(idCol))
      .limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(init.length == k, s"need at least $k rows to seed $k clusters, got ${init.length}")
    var centroids = init
    for (_ <- 1 to iters) {
      val means = assign(df, vecCol, centroids)
        .select(col("cluster"), posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg((floor(avg(col("v")) * 1e9 + lit(0.5)) / 1e9).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }
    KMeansModel(centroids)
  }

  /** Final assignments under a fitted model: (id, cluster, dist2)
    * with dist2 the L2² to the chosen centroid, rounded to 1e-6.
    * The distance is computed against a literal centroid matrix via
    * codegen'd collection expressions — still zero-shuffle.
    */
  def transform(df: DataFrame, vecCol: String, idCol: String, model: KMeansModel): DataFrame = {
    val cents = array(model.centroids.map(c => array(c.map(lit): _*)): _*)
    assign(df, vecCol, model.centroids)
      .withColumn("__c", element_at(cents, col("cluster") + 1))
      .withColumn(
        "dist2",
        floor(
          aggregate(
            zip_with(col(vecCol).cast("array<double>"), col("__c"), (a, b) => (a - b) * (a - b)),
            lit(0.0),
            (acc, x) => acc + x) * 1e6 + lit(0.5)) / 1e6)
      .select(col(idCol), col("cluster"), col("dist2"))
  }

  /** Fit + transform in one call. */
  def fitTransform(df: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int): DataFrame =
    transform(df, vecCol, idCol, fit(df, vecCol, idCol, k, iters))
}
