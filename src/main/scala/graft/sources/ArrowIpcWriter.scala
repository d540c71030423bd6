package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import java.io.FileOutputStream
import scala.jdk.CollectionConverters._

/** Arrow IPC "file" format (.arrow, magic `ARROW1`) writer — the
  * export side of [[ArrowIpcReader]], re-expressing the reference's
  * arrow round-trip surface (biodata.py:194 EXTENSION_MAP;
  * arrow_dataset.py save path) on Spark's bundled Arrow Java.
  *
  * Driver-side utility for fixtures and bounded interop exports
  * (rows are collected once) — large corpora export sharded parquet
  * via [[graft.operators.ExportOps]]. Scalar types only, matching
  * the reader's coverage.
  */
object ArrowIpcWriter {

  def write(df: DataFrame, path: String, batchRows: Int = 4096): Unit = {
    val sparkSchema = df.schema
    val arrowSchema = new Schema(sparkSchema.fields.map(toArrowField).toSeq.asJava)
    val rows = df.collect()
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val out = new FileOutputStream(path)
      val writer = new ArrowFileWriter(root, null, out.getChannel)
      try {
        writer.start()
        rows.grouped(batchRows).foreach { batch =>
          root.allocateNew()
          batch.zipWithIndex.foreach { case (row, i) =>
            sparkSchema.fields.zipWithIndex.foreach { case (f, j) =>
              setCell(root.getVector(j), i, if (row.isNullAt(j)) null else row.get(j), f.dataType)
            }
          }
          root.setRowCount(batch.length)
          writer.writeBatch()
        }
        writer.end()
      } finally { writer.close(); out.close(); root.close() }
    } finally allocator.close()
  }

  private def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case StringType  => ArrowType.Utf8.INSTANCE
      case BinaryType  => ArrowType.Binary.INSTANCE
      case other       => throw new UnsupportedOperationException(s"spark type $other not supported for arrow export")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private def setCell(v: FieldVector, i: Int, value: Any, dt: DataType): Unit =
    if (value == null) v.asInstanceOf[BaseValueVector with FieldVector] match {
      case x: BigIntVector    => x.setNull(i)
      case x: IntVector       => x.setNull(i)
      case x: Float8Vector    => x.setNull(i)
      case x: Float4Vector    => x.setNull(i)
      case x: BitVector       => x.setNull(i)
      case x: VarCharVector   => x.setNull(i)
      case x: VarBinaryVector => x.setNull(i)
      case other              => throw new UnsupportedOperationException(s"null into ${other.getClass.getSimpleName}")
    }
    else v match {
      case x: BigIntVector    => x.setSafe(i, value.asInstanceOf[Long])
      case x: IntVector       => x.setSafe(i, value.asInstanceOf[Int])
      case x: Float8Vector    => x.setSafe(i, value.asInstanceOf[Double])
      case x: Float4Vector    => x.setSafe(i, value.asInstanceOf[Float])
      case x: BitVector       => x.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case x: VarCharVector   => x.setSafe(i, value.asInstanceOf[String].getBytes("UTF-8"))
      case x: VarBinaryVector => x.setSafe(i, value.asInstanceOf[Array[Byte]])
      case other              => throw new UnsupportedOperationException(s"write into ${other.getClass.getSimpleName}")
    }
}
