package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Column-role inference — the Spark analogue of the reference's
  * automatic sample/batch/target/feature detection
  * (reference: biodata.py:1381 `_infer_column_name`, biodata.py:596
  * `_set_columns`, biodata.py:72/87 task typing).
  *
  * Resolution order per role, as in the reference: explicitly
  * configured name → default name → known pattern found in the
  * schema. Data (feature) columns are whatever numeric columns
  * remain after roles and declared metadata columns are removed.
  */
object ColumnInference {

  sealed trait TaskType
  case object Regression extends TaskType
  case object Classification extends TaskType

  final case class Roles(
      sampleColumn: Option[String],
      batchColumn: Option[String],
      targetColumn: Option[String],
      metadataColumns: Seq[String],
      dataColumns: Seq[String]
  )

  /** Default names the reference uses (biodata.py:59-63). */
  val DefaultSample = "samples"
  val DefaultBatch = "batches"
  val DefaultTarget = "labels"

  private val samplePatterns = Seq("samples", "sample", "sample_id", "sample_name", "subject", "id")
  private val batchPatterns = Seq("batches", "batch", "batch_id", "run", "plate")
  private val targetPatterns = Seq("labels", "label", "target", "targets", "y", "class", "outcome")

  def inferRoles(
      df: DataFrame,
      sampleColumn: Option[String] = None,
      batchColumn: Option[String] = None,
      targetColumn: Option[String] = None,
      metadataColumns: Seq[String] = Nil
  ): Roles = {
    val cols = df.columns.toSeq
    val lower = cols.map(c => c.toLowerCase -> c).toMap
    def resolve(explicit: Option[String], default: String, patterns: Seq[String]): Option[String] =
      explicit.filter(cols.contains).orElse(Some(default).filter(cols.contains)).orElse {
        patterns.collectFirst { case p if lower.contains(p) => lower(p) }
      }
    val sample = resolve(sampleColumn, DefaultSample, samplePatterns)
    val batch = resolve(batchColumn, DefaultBatch, batchPatterns)
    val target = resolve(targetColumn, DefaultTarget, targetPatterns)
    val roleCols = Seq(sample, batch, target).flatten ++ metadataColumns
    val data = df.schema.fields.collect {
      case f if !roleCols.contains(f.name) && isNumeric(f.dataType) => f.name
    }
    Roles(sample, batch, target, metadataColumns, data.toSeq)
  }

  /** Regression iff float-typed target, classification for
    * bool/string/integer (reference: biodata.py:72-95).
    */
  def inferTask(df: DataFrame, targetColumn: String): TaskType =
    df.schema(targetColumn).dataType match {
      case FloatType | DoubleType | _: DecimalType | DateType | TimestampType => Regression
      case BooleanType | StringType | ByteType | ShortType | IntegerType | LongType => Classification
      case other => throw new IllegalArgumentException(s"cannot infer task for target type $other")
    }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }
}
