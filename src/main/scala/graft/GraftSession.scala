package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings graft assumes everywhere:
  * UTC, AQE on, shuffle parallelism sized to the machine (32 locally;
  * on a real cluster this is set per-job or left to AQE coalescing).
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // nanosecond parquet timestamps surface as long (epoch nanos);
      // graft normalizes them via TimeOps.nanosToTimestamp
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // one timestamp flavor engine-wide: naive parquet timestamps
      // read as UTC instants (see BioLoader.normalizeNtz)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
