package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for repeated co-located joins.
  *
  * A fact table joined on the same key by many downstream jobs
  * should be written `bucketBy(key)`: both sides of a
  * bucketed-bucketed equi-join arrive pre-partitioned, so the join
  * plan has NO Exchange — at 100 TB that's the difference between
  * re-shuffling the table per query and shuffling once at write
  * time. (Same trick the reference can't express at all — arrow
  * files have no co-location contract.)
  */
object BucketOps {

  /** Write as a bucketed managed table (spark_catalog).
    *
    * Overwrite-robust across SESSIONS: with the default in-memory
    * catalog, a managed table's warehouse directory survives the JVM
    * while its catalog entry does not — a fresh session's
    * `mode("overwrite").saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS. Drop any registered table AND clear a
    * stale orphaned location first, so re-running a build is
    * idempotent (found by the r9 sf0.1 re-verify of q_band_index).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // Only simple (unqualified, path-safe) names: the orphan-location
    // cleanup below must never be able to point outside the table's
    // own default warehouse directory.
    require(
      table.matches("[A-Za-z0-9_]+"),
      s"writeBucketed requires a simple unqualified table name, got '$table'")
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    // Resolve the REGISTERED location (external tables live elsewhere)
    // before dropping, falling back to the default managed path for
    // an orphaned directory with no catalog entry.
    val loc: org.apache.hadoop.fs.Path =
      if (catalog.tableExists(ident))
        new org.apache.hadoop.fs.Path(catalog.getTableMetadata(ident).location)
      else new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    var w = df.write.mode("overwrite").bucketBy(buckets, key)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
