package graft.operators

import graft.functions.{HashExpressions => HE, VectorFunctions => VF}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the
  * centroid-partitioned scale path for similarity search, next to
  * [[KnnOps.lshTopK]]'s hyperplane variant.
  *
  * Build: KMeans (Spark MLlib, itself a distributed Lloyd's over
  * DataFrames) fits `nLists` coarse centroids on a sample; every
  * corpus vector is assigned to its nearest centroid — that
  * assignment is the inverted file, and on disk it is simply a
  * `partitionBy("list_id")` parquet layout so a probe only READS
  * the probed lists (partition pruning does the index lookup).
  *
  * Query: each query probes its `nProbe` nearest centroids (tiny
  * broadcast compare) and scores only vectors in those lists —
  * corpus-side work drops by ~nLists/nProbe vs brute force.
  */
object IvfKnnOps {

  final case class IvfIndex(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Fit centroids and assign every corpus row to a list.
    * `assigned` = corpus + `list_id`; persist it partitioned by
    * list_id for probe-time partition pruning.
    */
  def buildIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      seed: Long = 42L,
      sampleFraction: Double = 1.0,
      maxIter: Int = 10
  ): IvfIndex = {
    val spark = corpus.sparkSession
    val ml = corpus.select(col(idCol), col(vecCol))
      .withColumn("features", array_to_vector(col(vecCol).cast("array<double>")))
    val fitOn = if (sampleFraction < 1.0) ml.sample(sampleFraction, seed) else ml
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter).fit(fitOn)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val assigned = model.transform(ml)
      .withColumnRenamed("prediction", "list_id")
      .drop("features")
    IvfIndex(centroids, assigned)
  }

  /** Persist the inverted file partitioned by list — the on-disk
    * index layout. A probe that filters `list_id IN (...)` then
    * only LISTS and READS the probed partitions (Catalyst partition
    * pruning is the index lookup; no custom reader needed).
    */
  def saveIndex(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIndex(spark: SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    IvfIndex(centroids, spark.read.parquet(s"$path/lists"))
  }

  /** Top-k cosine neighbors probing nProbe lists per query. */
  def topK(
      queries: DataFrame,
      index: IvfIndex,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = index.centroids.toSeq.toDF("list_id", "centroid")

    // query → its nProbe nearest centroids (|Q| × nLists tiny compare)
    val qc = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("cdist", VF.l2Distance(col("qv"), col("centroid")))
    val wProbe = Window.partitionBy("query_id").orderBy(col("cdist"), col("list_id"))
    val probes = qc.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "list_id")

    // score only the probed lists
    val scored = index.assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("list_id"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.hround(HE.cosineSim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .select("query_id", "neighbor_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
