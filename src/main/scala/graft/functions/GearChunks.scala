package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Content-defined chunking (CDC) of binary payloads with a Gear rolling
  * hash — the storage-dedup kernel for OPAQUE media columns (Xia et al.
  * 2014 "Ddelta"; Xia et al. 2016 "FastCDC", USENIX ATC — public
  * algorithms). Fixed-size chunking shatters under a single inserted
  * byte (every later chunk shifts); content-defined boundaries depend
  * only on a 64-byte sliding context — `h = (h << 1) + GEAR[b]` forgets
  * a byte completely after 64 shifts — so an insertion re-synchronizes
  * within one boundary + 64 bytes and every later chunk hash is
  * preserved. That shift-invariance is what makes chunk-level dedup of
  * lightly-edited media work, and it is the property the spec pins.
  *
  * This is the single-mask gear CDC: boundary where
  * `(h & mask) == 0` with `mask = avgSize − 1` (avgSize a power of two),
  * subject to `minSize`/`maxSize` cut bounds (FastCDC's additional
  * normalized two-mask acceleration changes the chunk-size distribution,
  * not the dedup semantics — documented simplification).
  *
  * Chunk identity is FNV-1a 64 over the chunk bytes (deterministic,
  * engine-free; 2⁻⁶⁴ collisions are dedup-stat noise). The GEAR table is
  * derived from md5(index) so every JVM/executor/run sees identical
  * boundaries — no RNG at execution time, the repo-wide hashing
  * discipline.
  *
  * Scale shape: pure per-row CPU inside whole-stage codegen, no shuffle,
  * no state; the output is one array of (off, len, hash) structs per
  * blob, bounded by blobSize / minSize.
  */
object GearChunks {

  /** 256 deterministic 64-bit gear values: first 8 md5 bytes of the byte
    * value's decimal string, big-endian.
    */
  val GEAR: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { i =>
      md.reset()
      val d = md.digest(i.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    }
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 of bytes[off, off+len). */
  def fnv64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = FnvOffset
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Chunk boundaries of `bytes`: flat array of (off, len, fnv64) triples
    * encoded as 3 longs each. Static entry shared by interpreted eval and
    * generated code.
    *
    * The gear hash SLIDES CONTINUOUSLY over the blob — it is NOT reset at
    * cuts (FastCDC resets per chunk, which makes every boundary within 64
    * bytes of a cut depend on where the previous cut fell, so a single
    * edit can cascade misaligned cuts far downstream). Window-only
    * breakpoints are the original LBFS design (Muthitacharoen et al.
    * 2001, SOSP — breakpoints determined solely by the sliding-window
    * content): with minSize = 1 the boundary SET is a pure function of
    * local content, so an insertion perturbs only chunks overlapping its
    * 64-byte influence range — the maximal-resync property the spec pins
    * strictly. minSize/maxSize then only suppress/force cuts relative to
    * the previous cut (the standard size-bound coupling).
    */
  def chunks(bytes: Array[Byte], minSize: Int, avgSize: Int, maxSize: Int): Array[Long] = {
    val mask = (avgSize - 1).toLong
    val n = bytes.length
    val out = new java.util.ArrayList[Long]()
    var h = 0L
    var lastCut = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + GEAR(bytes(i) & 0xff)
      i += 1
      if ((i - lastCut >= minSize && (h & mask) == 0L) || i - lastCut == maxSize) {
        out.add(lastCut.toLong)
        out.add((i - lastCut).toLong)
        out.add(fnv64(bytes, lastCut, i - lastCut))
        lastCut = i
      }
    }
    if (lastCut < n) {
      out.add(lastCut.toLong)
      out.add((n - lastCut).toLong)
      out.add(fnv64(bytes, lastCut, n - lastCut))
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    arr
  }

  /** Triples → Catalyst array<struct<off,len,hash>>. */
  def toArrayData(triples: Array[Long]): GenericArrayData = {
    val rows = new Array[Any](triples.length / 3)
    var i = 0
    while (i < rows.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](triples(i * 3), triples(i * 3 + 1), triples(i * 3 + 2)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** `graft_cdc_chunks(bin)` — content-defined chunk table of a blob. */
  case class CdcChunks(child: Expression, minSize: Int, avgSize: Int, maxSize: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(avgSize >= 2 && (avgSize & (avgSize - 1)) == 0,
      s"graft_cdc_chunks: avgSize must be a power of two, got $avgSize")
    require(minSize >= 1 && minSize <= avgSize && avgSize <= maxSize,
      s"graft_cdc_chunks: need 1 <= minSize <= avgSize <= maxSize, " +
        s"got ($minSize, $avgSize, $maxSize)")

    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("off", LongType, nullable = false),
        StructField("len", LongType, nullable = false),
        StructField("hash", LongType, nullable = false))),
      containsNull = false)

    override protected def nullSafeEval(input: Any): Any =
      toArrayData(chunks(input.asInstanceOf[Array[Byte]], minSize, avgSize, maxSize))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} = graft.functions.GearChunks.toArrayData(
           |  graft.functions.GearChunks.chunks($v, $minSize, $avgSize, $maxSize));""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): CdcChunks =
      copy(child = newChild)
  }

  def cdcChunks(bin: Column, minSize: Int, avgSize: Int, maxSize: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(bin), minSize, avgSize, maxSize))
}
