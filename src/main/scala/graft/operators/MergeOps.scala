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

  /** Snapshot diff — added/removed/changed rows between two
    * versions of a keyed table (the audit/reconciliation layer
    * over [[applyChangelog]]: CDC APPLIES a change stream, this
    * RECOVERS one from two snapshots — migration validation,
    * replication drift, "what did yesterday's run change").
    *
    * Scale shape: ONE full-outer hash equi-join on the key (both
    * sides shuffle once — co-locate via [[BucketOps]] for repeated
    * diffs of the same table); per-row column comparison is pure
    * scan-stage arithmetic with null-safe `<=>` semantics.
    * `changed_cols` is a comma-joined sorted column list, so the
    * output is flat and engine-portable. Unchanged rows drop by
    * default (the diff of two 100 TB snapshots is the CHANGES, not
    * a third snapshot).
    *
    * @param compareCols columns to compare (default: every shared
    *                    non-key column)
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Nil,
      includeUnchanged: Boolean = false
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val shared = oldDf.columns.toSet.intersect(newDf.columns.toSet) -- keyCols
    val cmp = if (compareCols.nonEmpty) compareCols else shared.toSeq.sorted
    require(cmp.forall(shared), s"compare columns must exist on both sides: $cmp")
    val o = oldDf.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__in_old", lit(1))
      .select(keyCols.map(col) ++ cmp.map(c => col(c).as(s"__o_$c")) :+ col("__in_old"): _*)
    val n = newDf.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__in_new", lit(1))
      .select(keyCols.map(col) ++ cmp.map(c => col(c).as(s"__n_$c")) :+ col("__in_new"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val changedList = concat_ws(",",
      cmp.map(c => when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*)
    val status = when(col("__in_old").isNull, lit("added"))
      .when(col("__in_new").isNull, lit("removed"))
      .when(changedList =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined
      .withColumn("status", status)
      .withColumn("changed_cols", when(col("status") === "changed", changedList))
      .select(keyCols.map(col) ++ Seq(col("status"), col("changed_cols")) ++
        cmp.flatMap(c => Seq(col(s"__o_$c").as(s"old_$c"), col(s"__n_$c").as(s"new_$c"))): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** Golden-record survivorship — one canonical row per duplicate
    * cluster (the merge step after [[graft.operators.GraphOps]]
    * connected components resolves [[graft.operators.FuzzyJoinOps]]
    * matches into clusters, closing the C22c entity-resolution
    * pipeline): per field, the value from the cluster's most
    * recent row WHERE THAT FIELD IS NON-NULL — a newer record with
    * a missing phone number must not erase the older one we have
    * ("most recent non-null" survivorship, the standard MDM rule).
    *
    * Scale shape: ONE map-side-combinable groupBy(cluster) — every
    * field rides a `max_by` whose ordering struct is NULL when the
    * field is null (max_by skips null orderings), so the whole
    * merge is a single aggregation with no window sort and no
    * second pass. `orderCols` must totally order rows within a
    * cluster (pass a version/ts plus a unique id).
    */
  def goldenRecord(
      df: DataFrame,
      clusterCol: String,
      orderCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(valueCols.nonEmpty, "need at least one value column")
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(col(clusterCol))
      .agg(
        count(lit(1)).as("n_members"),
        valueCols.map(c =>
          max_by(col(c), when(col(c).isNotNull, ord)).as(c)): _*)
      .select(col(clusterCol) +: col("n_members") +: valueCols.map(col): _*)
  }
}
