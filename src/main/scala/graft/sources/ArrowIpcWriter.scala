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
  * [[write]] is the driver-side path for fixtures and bounded
  * interop exports (rows are collected once); [[writeDir]] is the
  * DISTRIBUTED path — one arrow file per partition through the
  * Hadoop FileSystem, the sharded layout arrow-native consumers
  * expect at corpus scale. Scalars plus list<scalar>
  * (embedding columns), matching the reader's coverage.
  */
object ArrowIpcWriter {

  def write(df: DataFrame, path: String, batchRows: Int = 4096): Unit = {
    val sparkSchema = df.schema
    val rows = df.collect()
    val out = new FileOutputStream(path)
    try writeRows(rows.iterator, sparkSchema, out.getChannel, batchRows)
    finally out.close()
  }

  /** DISTRIBUTED Arrow export: one `part-NNNNN.arrow` file per
    * partition under `dir`, written through the Hadoop FileSystem
    * (works on HDFS/S3/file) — the sharded-arrow layout HF-style
    * datasets interop with, at corpus scale. Read back with
    * [[ArrowIpcReader.read]] over the part files. `_SUCCESS` marks
    * a complete export.
    */
  def writeDir(df: DataFrame, dir: String, batchRows: Int = 4096): Unit = {
    import org.apache.hadoop.fs.Path
    val sparkSchema = df.schema
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val dirPath = new Path(dir)
    val fs0 = dirPath.getFileSystem(confSer.value)
    if (fs0.exists(dirPath)) fs0.delete(dirPath, true)
    fs0.mkdirs(dirPath)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        // task-commit protocol: write to an attempt-unique temp name,
        // rename into place only after a full successful write — a
        // task death mid-write leaves a .tmp the reader never lists,
        // and speculative/retried attempts race benignly (first
        // rename wins, losers discard their temp)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val part = new Path(dir, f"part-$pid%05d.arrow")
        val tmp = new Path(dir, f".part-$pid%05d-$attempt%d.arrow.tmp")
        val fs = part.getFileSystem(confSer.value)
        val out = fs.create(tmp, true)
        val ch = java.nio.channels.Channels.newChannel(out)
        try {
          try writeRows(rows, sparkSchema, ch, batchRows)
          finally { ch.close(); out.close() }
          if (fs.exists(part) || !fs.rename(tmp, part)) fs.delete(tmp, false)
        } catch {
          case e: Throwable => fs.delete(tmp, false); throw e
        }
        Iterator.single(1)
      }
    }.count()
    val ok = fs0.create(new Path(dirPath, "_SUCCESS"), true)
    ok.close()
  }

  private def writeRows(
      rows: Iterator[org.apache.spark.sql.Row],
      sparkSchema: StructType,
      channel: java.nio.channels.WritableByteChannel,
      batchRows: Int
  ): Unit = {
    val arrowSchema = new Schema(sparkSchema.fields.map(toArrowField).toSeq.asJava)
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val writer = new ArrowFileWriter(root, null, channel)
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
      } finally { writer.close(); root.close() }
    } finally allocator.close()
  }

  private def scalarArrowType(dt: DataType): ArrowType = dt match {
    case LongType    => new ArrowType.Int(64, true)
    case IntegerType => new ArrowType.Int(32, true)
    case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case BooleanType => ArrowType.Bool.INSTANCE
    case StringType  => ArrowType.Utf8.INSTANCE
    case BinaryType  => ArrowType.Binary.INSTANCE
    case other       => throw new UnsupportedOperationException(s"spark type $other not supported for arrow export")
  }

  private def toArrowField(f: StructField): Field = f.dataType match {
    // list<numeric> — the embedding-column shape; element field is
    // the conventional "$data$" child
    case ArrayType(elem, containsNull) =>
      val child = new Field("$data$", new FieldType(containsNull, scalarArrowType(elem), null), null)
      new Field(f.name, new FieldType(f.nullable, ArrowType.List.INSTANCE, null),
        java.util.Collections.singletonList(child))
    case dt =>
      new Field(f.name, new FieldType(f.nullable, scalarArrowType(dt), null), null)
  }

  private def setCell(v: FieldVector, i: Int, value: Any, dt: DataType): Unit =
    v match {
      case lv: org.apache.arrow.vector.complex.ListVector =>
        val w = lv.getWriter
        w.setPosition(i)
        if (value == null) w.writeNull()
        else {
          val elem = dt.asInstanceOf[ArrayType].elementType
          w.startList()
          value.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
            if (e == null) elem match {
              case FloatType   => w.float4().writeNull()
              case DoubleType  => w.float8().writeNull()
              case LongType    => w.bigInt().writeNull()
              case IntegerType => w.integer().writeNull()
              case other       => throw new UnsupportedOperationException(s"null list element of $other")
            }
            else elem match {
              case FloatType   => w.float4().writeFloat4(e.asInstanceOf[Float])
              case DoubleType  => w.float8().writeFloat8(e.asInstanceOf[Double])
              case LongType    => w.bigInt().writeBigInt(e.asInstanceOf[Long])
              case IntegerType => w.integer().writeInt(e.asInstanceOf[Int])
              case other       => throw new UnsupportedOperationException(s"list element type $other not supported")
            }
          }
          w.endList()
        }
      case _ => setScalarCell(v, i, value)
    }

  private def setScalarCell(v: FieldVector, i: Int, value: Any): Unit =
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
