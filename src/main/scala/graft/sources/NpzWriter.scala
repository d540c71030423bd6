package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Pure-JVM writer for scipy-sparse CSR `.npz` files — the export
  * side of [[NpzReader]] (reference: packaged_modules/npz/npz.py
  * reads these; scipy.sparse.save_npz documents the member layout:
  * format/shape/data/indices/indptr as .npy zip members).
  *
  * Driver-side utility for fixtures and bounded exports (the member
  * arrays live in memory once) — sharded large-matrix export stays
  * on parquet via [[graft.operators.ExportOps]]. NPY headers follow
  * the public NPY format spec v1.0 (numpy/lib/format.py docs).
  */
object NpzWriter {

  /** Write COO triples (must be unique (row, col)) as a CSR npz.
    * Entries are sorted internally; explicit zeros are kept (CSR
    * permits stored zeros).
    */
  def writeCsr(
      path: String,
      nRows: Long,
      nCols: Long,
      rows: Array[Long],
      cols: Array[Long],
      values: Array[Double]
  ): Unit = {
    require(rows.length == cols.length && cols.length == values.length, "parallel arrays must align")
    require(rows.forall(r => r >= 0 && r < nRows), s"row index out of [0, $nRows)")
    require(cols.forall(c => c >= 0 && c < nCols), s"col index out of [0, $nCols)")
    val order = rows.indices.sortBy(i => (rows(i), cols(i)))
    val indptr = new Array[Long](nRows.toInt + 1)
    order.foreach(i => indptr(rows(i).toInt + 1) += 1)
    for (i <- 1 to nRows.toInt) indptr(i) += indptr(i - 1)

    val z = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def member(name: String, bytes: Array[Byte]): Unit = {
        z.putNextEntry(new ZipEntry(s"$name.npy")); z.write(bytes); z.closeEntry()
      }
      member("format", npy("|S3", Nil, "csr".getBytes("ASCII")))
      member("shape", npy("<i8", Seq(2), longsLe(Array(nRows, nCols))))
      member("data", npy("<f8", Seq(order.length), doublesLe(order.map(values).toArray)))
      member("indices", npy("<i8", Seq(order.length), longsLe(order.map(cols).toArray)))
      member("indptr", npy("<i8", Seq(indptr.length), longsLe(indptr)))
    } finally z.close()
  }

  /** NPY v1.0: magic, version, 2-byte LE header length, ASCII dict
    * header padded with spaces to a 64-byte boundary, '\n'-terminated.
    */
  private[sources] def npy(descr: String, shape: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val shapeStr = shape match {
      case Nil      => "()"
      case Seq(one) => s"($one,)"
      case many     => many.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val bb = ByteBuffer.allocate(10 + header.length + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).put("NUMPY".getBytes("ASCII")).put(1.toByte).put(0.toByte)
    bb.putShort(header.length.toShort)
    bb.put(header.getBytes("ASCII")).put(payload)
    bb.array()
  }

  private def longsLe(xs: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putLong); bb.array()
  }

  private def doublesLe(xs: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putDouble); bb.array()
  }
}
