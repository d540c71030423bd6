package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * before a write, so parquet file-level min/max statistics prune on
  * EVERY interleaved dimension, not just a lexicographic prefix.
  * The 100 TB story: a range-partitioned sort on (a, b) prunes scans
  * filtered on `a` but reads everything for a filter on `b` alone;
  * Z-ordering bounds the per-file span of BOTH columns, so either
  * predicate skips most files at planning time.
  *
  * Quantization is INTEGER-ONLY — `((x − min) · (2^bits − 1)) div
  * (max − min)` in BIGINT arithmetic — so the curve cell of a row is
  * exact, reproducible, and oracle-checkable (no float boundary
  * noise). Column mins/maxes ride in as a 1-row broadcast scalar
  * (same pattern as the quantile gates).
  *
  * Scale design: the stats pass is one cheap column-pruned agg; the
  * z-value is a zero-shuffle codegen'd integer expression chain;
  * the write is ONE `repartitionByRange` shuffle on the z-value
  * (range exchange samples the z distribution, so output files hold
  * contiguous curve segments — the property that bounds per-file
  * spans). No driver collect anywhere.
  */
object LayoutOps {

  /** Interleave the low `bits` bits of each quantized column:
    * bit i of column j lands at position i·n + j. Columns must
    * already be non-negative and < 2^bits (see [[quantize]]).
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column to interleave")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits * columns must fit a positive long, got $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _).as("zvalue")
  }

  /** Affine integer quantization of `c` from [min, max] onto
    * [0, 2^bits): `((c − min) · (2^bits − 1)) div (max − min)`.
    * Exact BIGINT arithmetic; degenerate (min == max) maps to 0.
    */
  def quantize(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val num = (c.cast("long") - minC) * lit((1L << bits) - 1)
    // true BIGINT floor division (Column./ is double division — its
    // 53-bit mantissa would silently misquantize wide key ranges)
    val idiv = ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(num), ColumnBridge.expression(maxC - minC)))
    when(maxC === minC, lit(0L)).otherwise(idiv.cast("long"))
  }

  /** Append a `zvalue` column interleaving the quantized `cols`.
    * Numeric columns only; min/max come from one stats pass attached
    * as a 1-row broadcast.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggCols = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__min_$c"),
      max(col(c)).cast("long").as(s"__max_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*)
    val quantized = cols.map(c =>
      quantize(col(c), col(s"__min_$c"), col(s"__max_$c"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("zvalue", interleaveBits(quantized, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Z-order `df` by `cols` and write parquet: range-partition on
    * the z-value (contiguous curve segments per file) with an
    * in-file sort so row groups inherit tight spans too.
    */
  def zorderWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 16
  ): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions("zvalue")
      .drop("zvalue")
      .write.mode("overwrite").parquet(path)
  }
}
