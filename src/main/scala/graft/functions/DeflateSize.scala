package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: DEFLATE (zlib) size of a document's
  * UTF-8 bytes at a fixed compression level. Gopher-class corpus filters
  * (Rae et al. 2021 §A.1.2 use the analogous "repetition" family; data
  * curation pipelines commonly threshold `compressed/raw`) treat highly
  * compressible text — boilerplate, template spam, keyword stuffing — as
  * low quality, and nearly incompressible text as binary junk.
  *
  * Determinism: java.util.zip.Deflater wraps zlib with a FIXED algorithm per
  * (level, strategy, nowrap) triple — same input bytes → same output length
  * on every JVM/executor, so results are reproducible run-to-run and
  * checkable by invariant specs (no SQL oracle: DuckDB has no deflate).
  *
  * Scale shape: pure per-row CPU inside whole-stage codegen (the generated
  * code calls the static helper below), no shuffle, no state. One Deflater
  * is allocated per call; `reset()`-per-row pooling was measured as noise
  * next to the deflate itself for multi-KB documents.
  */
object DeflateSize {

  /** Static entry point shared by interpreted eval and generated code. */
  def deflatedSize(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** `graft_deflate_size(text)` — DEFLATE(level 6, raw) byte count of the
    * UTF-8 encoding of `text`.
    */
  case class DeflateSizeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.IntegerType

    override protected def nullSafeEval(input: Any): Any =
      deflatedSize(input.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.DeflateSize.deflatedSize($v.getBytes());")

    override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
      copy(child = newChild)
  }

  def deflateSize(text: Column): Column =
    ColumnBridge.column(DeflateSizeExpr(ColumnBridge.expression(text)))
}
