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
    val meta =
      if (catalog.tableExists(ident)) Some(catalog.getTableMetadata(ident)) else None
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Backing data is deleted ONLY for a MANAGED registration (DROP
    // on an EXTERNAL table preserves its data by Spark's own
    // contract — overwriting the NAME must never destroy unrelated
    // external storage), plus any stale orphan at the default
    // managed path (the cross-session LOCATION_ALREADY_EXISTS case).
    val managedLoc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    val clear = meta match {
      case Some(m)
          if m.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED =>
        Seq(new org.apache.hadoop.fs.Path(m.location), managedLoc)
      case _ => Seq(managedLoc)
    }
    clear.distinct.foreach { loc =>
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    var w = df.write.mode("overwrite").bucketBy(buckets, key)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
