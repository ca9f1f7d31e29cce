package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of an `array<double>` column — the centroid
  * aggregate of the k-means trainers and IVF codebooks.
  *
  * The declarative formulation (`posexplode` → per-(group, pos) hash agg →
  * `collect_list` reassembly) multiplies every vector into `dim` rows
  * BEFORE the exchange — a 64-dim corpus pushes 64× its row count through
  * the shuffle and then pays a second shuffle to reassemble. This
  * aggregate keeps one partial-sum array per group per partition
  * (classic map-side combine), so the exchange carries one row per group
  * per partition and there is no reassembly step at all.
  *
  * Null vectors are ignored (like `avg`); an empty group yields null;
  * mismatched dimensionality fails loudly (a silent min-length sum would
  * produce plausible-but-wrong centroids — same posture as
  * [[DotProduct]]).
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvg.Buf]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorAvg.Buf = new VectorAvg.Buf(0L, null)

  override def update(b: VectorAvg.Buf, input: InternalRow): VectorAvg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      else if (b.sums.length != n) {
        throw new IllegalArgumentException(
          s"graft_vector_avg: vector length mismatch (${b.sums.length} vs $n)")
      }
      var i = 0
      while (i < n) { b.sums(i) += arr.getDouble(i); i += 1 }
      b.n += 1
    }
    b
  }

  override def merge(b: VectorAvg.Buf, o: VectorAvg.Buf): VectorAvg.Buf = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums; b.n = o.n }
      else {
        if (b.sums.length != o.sums.length) {
          throw new IllegalArgumentException(
            s"graft_vector_avg: vector length mismatch (${b.sums.length} vs ${o.sums.length})")
        }
        var i = 0
        while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
        b.n += o.n
      }
    }
    b
  }

  override def eval(b: VectorAvg.Buf): Any =
    if (b.n == 0L) null
    else new GenericArrayData(b.sums.map(_ / b.n))

  override def serialize(b: VectorAvg.Buf): Array[Byte] = {
    val len = if (b.sums == null) -1 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + math.max(len, 0) * 8)
    buf.putLong(b.n).putInt(len)
    if (len > 0) { var i = 0; while (i < len) { buf.putDouble(b.sums(i)); i += 1 } }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buf = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong
    val len = buf.getInt
    val sums =
      if (len < 0) null
      else {
        val a = new Array[Double](len)
        var i = 0
        while (i < len) { a(i) = buf.getDouble; i += 1 }
        a
      }
    new VectorAvg.Buf(n, sums)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorAvg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): VectorAvg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): VectorAvg =
    copy(child = newChild)
}

object VectorAvg {
  /** Mutable partial state: running element sums + contributing count. */
  final class Buf(var n: Long, var sums: Array[Double])

  /** Column API: element-wise mean aggregate over array<double>. */
  def vectorAvg(c: Column): Column =
    ColumnBridge.column(VectorAvg(ColumnBridge.expression(c)).toAggregateExpression())
}
