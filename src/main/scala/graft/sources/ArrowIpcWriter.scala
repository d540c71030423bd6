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
  * expect at corpus scale. Scalars, struct, and list<T> for any
  * supported T (embedding columns, ValueWithMetadata-shaped struct
  * columns), matching the reader's coverage.
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

  private def toArrowField(f: StructField): Field =
    toArrowFieldNamed(f.name, f.dataType, f.nullable)

  /** Recursive Spark→Arrow field mapping: scalars, struct,
    * list<T> for any supported T (so list<struct> too). List
    * element field keeps the conventional "$data$" child name.
    */
  private def toArrowFieldNamed(name: String, dt: DataType, nullable: Boolean): Field = dt match {
    case ArrayType(elem, containsNull) =>
      new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
        java.util.Collections.singletonList(toArrowFieldNamed("$data$", elem, containsNull)))
    case StructType(fields) =>
      new Field(name, new FieldType(nullable, ArrowType.Struct.INSTANCE, null),
        fields.map(sf => toArrowFieldNamed(sf.name, sf.dataType, sf.nullable)).toSeq.asJava)
    case other =>
      new Field(name, new FieldType(nullable, scalarArrowType(other), null), null)
  }

  private def setCell(v: FieldVector, i: Int, value: Any, dt: DataType): Unit =
    v match {
      case lv: org.apache.arrow.vector.complex.ListVector =>
        // offset-level write (startNewValue/endValue) instead of the
        // writer API: recursion then covers ANY element type —
        // scalars, structs, nested lists — with one code path
        if (value == null) lv.setNull(i)
        else {
          val elem = dt.asInstanceOf[ArrayType].elementType
          val start = lv.startNewValue(i)
          val inner = lv.getDataVector.asInstanceOf[FieldVector]
          val seq = value.asInstanceOf[scala.collection.Seq[Any]]
          var j = 0
          seq.foreach { e => setCell(inner, start + j, e, elem); j += 1 }
          lv.endValue(i, seq.length)
        }
      case sv: org.apache.arrow.vector.complex.StructVector =>
        while (i >= sv.getValueCapacity) sv.reAlloc()
        if (value == null) sv.setNull(i)
        else {
          sv.setIndexDefined(i)
          val st = dt.asInstanceOf[StructType]
          val row = value.asInstanceOf[org.apache.spark.sql.Row]
          st.fields.zipWithIndex.foreach { case (sf, j) =>
            setCell(sv.getChildByOrdinal(j).asInstanceOf[FieldVector], i,
              if (row.isNullAt(j)) null else row.get(j), sf.dataType)
          }
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
