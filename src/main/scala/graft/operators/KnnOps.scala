package graft.operators

import graft.functions.{HashExpressions => HE, VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate & exact nearest-neighbor search over embedding
  * columns.
  *
  * Scale design: the query set is broadcast (top-k search is
  * queries≪corpus); the corpus streams through codegen'd cosine +
  * a per-query top-k window. The LSH variant prunes the corpus to
  * hamming-adjacent buckets first, turning O(|Q|·n) into
  * O(|Q|·n/2^b · buckets_probed).
  */
object KnnOps {

  /** Exact top-k cosine neighbors of each query row.
    * `queries`/`corpus`: (id, vec). Ranks on cosine rounded to 6
    * decimals with id tiebreak → fully deterministic output.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.hround(HE.cosineSim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: corpus is pre-bucketed by hyperplane bits;
    * a query probes its own bucket plus all buckets within hamming
    * distance `probes` of it (multi-probe LSH). Recall rises with
    * probes; cost is corpus/2^nBits per probed bucket.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 12,
      probes: Int = 1
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      HE.hyperplaneLsh(col(vecCol), nBits).as("bkt"))
    // multi-probe: query bucket ⊕ each single bit (probes=1 → nBits+1 probes)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      HE.hyperplaneLsh(col(vecCol), nBits).as("qbkt"))
    val probeBkts =
      if (probes <= 0) array(col("qbkt"))
      else
        array((col("qbkt") +: (0 until nBits).map(i => col("qbkt").bitwiseXOR(shiftleft(lit(1L), i)))): _*)
    val q = q0.withColumn("bkt", explode(probeBkts)).drop("qbkt")
    val scored = c
      .join(broadcast(q), Seq("bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.hround(HE.cosineSim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .select("query_id", "neighbor_id", "cosine")
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
