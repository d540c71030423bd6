package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application — the CDC/merge surface a continuously-
  * refreshed training corpus needs: apply an upsert/delete stream to
  * a snapshot (latest version wins), and turn a change stream into
  * SCD2 validity intervals for time-travel joins.
  *
  * Scale shape: both operators are ONE hash shuffle on the business
  * key; within a key the window sees only that key's versions, so
  * skew is bounded by the hottest key's change count, never by table
  * size. No driver-side state, no collect. This is the portable core
  * of what table formats (Delta/Iceberg/Hudi — public designs) do in
  * their MERGE path, expressed on plain DataFrames.
  */
object MergeOps {

  /** Apply a changelog to a snapshot: for every key, the highest-
    * version change wins; a winning delete removes the row; keys
    * untouched by the changelog survive as-is.
    *
    * @param snapshot   base table (treated as version 0 upserts)
    * @param changes    same data columns as `snapshot`, plus
    *                   `versionCol` (> 0, orderable) and `opCol`
    *                   ("U" upsert / "D" delete)
    * @return the merged snapshot, data columns only
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val dataCols = snapshot.columns.toSeq
    val missing = (dataCols ++ Seq(versionCol, opCol)).filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: ${missing.mkString(", ")}")
    val base = snapshot
      .withColumn(versionCol, lit(0L))
      .withColumn(opCol, lit("U"))
    val all = base.unionByName(changes.select((dataCols ++ Seq(versionCol, opCol)).map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
  }

  /** SCD2: collapse a change stream into validity intervals per key
    * — `valid_from` = the change's version, `valid_to` = the next
    * change's version (null while current). Deletes close the
    * interval without opening a new one (their own row is dropped
    * after providing the boundary).
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .drop(versionCol, opCol)
  }
}
