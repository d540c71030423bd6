package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Sample- and feature-metadata attachment — the heart of the
  * reference's load path.
  *
  * Reference semantics reproduced (biodata.py:897-972
  * `_add_sample_metadata`):
  *  - keyed path: LEFT join data←metadata on the sample column;
  *    colliding columns are DROPPED FROM THE DATA side (metadata
  *    wins); output column order is metadata columns first, then
  *    the surviving data columns.
  *  - keyless path: positional horizontal concat — see
  *    [[ReshapeOps.concatColumns]] (row-count equality enforced
  *    there, as at biodata.py:936-945).
  *
  * Scale: sample metadata is per-sample (thousands–millions of rows
  * vs billions of fact rows) → broadcast it. The fact side never
  * shuffles; the join stays inside the scan's whole-stage codegen.
  * If metadata outgrows the broadcast threshold Spark's planner
  * falls back to shuffle join on its own — we hint, not force.
  */
object MetadataOps {

  def joinSampleMetadata(data: DataFrame, meta: DataFrame, sampleColumn: String): DataFrame = {
    require(data.columns.contains(sampleColumn), s"data table has no '$sampleColumn' column")
    require(meta.columns.contains(sampleColumn), s"metadata table has no '$sampleColumn' column")
    val colliding = data.columns.toSet.intersect(meta.columns.toSet) - sampleColumn
    val cleanData = if (colliding.nonEmpty) data.drop(colliding.toSeq: _*) else data
    val dataCols = cleanData.columns.filter(_ != sampleColumn)
    val order: Seq[Column] = meta.columns.map(col).toSeq ++ dataCols.map(col)
    cleanData.join(broadcast(meta), Seq(sampleColumn), "left").select(order: _*)
  }

  /** Attach per-feature metadata into `StructField.metadata` — the
    * Spark-native home for the reference's feature-metadata table
    * (biodata.py:707 `_convert_feature_metadata_to_dict`, which maps
    * feature name → {metadata key → value}). Catalyst carries field
    * metadata through projections, so downstream operators (and
    * parquet, which persists it) see it for free — no extra table
    * rides along with the data.
    *
    * @param featureMeta feature name → (metadata key → string value)
    */
  def attachFeatureMetadata(df: DataFrame, featureMeta: Map[String, Map[String, String]]): DataFrame = {
    val cols = df.schema.fields.map { f =>
      featureMeta.get(f.name) match {
        case Some(kv) =>
          val mb = new MetadataBuilder().withMetadata(f.metadata)
          kv.foreach { case (k, v) => mb.putString(k, v) }
          col(f.name).as(f.name, mb.build())
        case None => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Read back attached feature metadata (inverse of the above). */
  def featureMetadataOf(df: DataFrame, column: String): Metadata = df.schema(column).metadata

  /** Feature-metadata as a joinable long table (feature, key, value)
    * — for queries over the metadata itself, e.g. "aggregate
    * abundances by taxonomy level", where the metadata drives a
    * broadcast-join rollup rather than schema annotation.
    */
  def featureMetadataTable(df: DataFrame, featureNameCol: String, meta: DataFrame): DataFrame =
    df.join(broadcast(meta), Seq(featureNameCol), "left")
}
