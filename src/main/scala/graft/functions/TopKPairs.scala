package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k (score, id) aggregate — the ranking kernel of the ANN
  * family: `array<struct<id, score>>` of the k best pairs per group,
  * ordered (score desc, id asc).
  *
  * The declarative formulation (two `row_number` ranking windows — a
  * per-partition pre-prune, then the global rank) must EXCHANGE AND SORT
  * every scored pair before the first filter can drop anything: a kNN
  * join that scores n·m candidate pairs shuffles all n·m rows. This
  * aggregate is a k-bounded binary heap with map-side partial
  * aggregation (hash agg, no sort anywhere): each partition keeps at
  * most k pairs per query, the exchange carries ≤ k rows per (query,
  * partition), and the final merge is k·partitions heap inserts. Result
  * and tie behavior are identical to the window form — the heap's total
  * order is (score desc, id asc), `row_number`'s order — so oracle-tier
  * callers keep their hash matches.
  *
  * Null AND NaN scores are ignored (a broken cosine is not a best
  * match — deliberately unlike a raw ranking window, where Spark's
  * NaN-largest sort order would rank a NaN score FIRST); null ids are
  * ignored. An empty group yields an empty array, not null — callers
  * explode the result, so "no candidates" must vanish, not nullify.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Heap]
    with ImplicitCastInputTypes
    with BinaryLike[Expression] {

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def inputTypes = Seq(DoubleType, LongType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKPairs.Heap = new TopKPairs.Heap(k)

  override def update(h: TopKPairs.Heap, input: InternalRow): TopKPairs.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val d = s.asInstanceOf[Double]
      // NaN never compares "better" under worse(), but it would slip into
      // a non-full heap and pollute the result — drop it like null
      if (!java.lang.Double.isNaN(d)) h.insert(d, i.asInstanceOf[Long])
    }
    h
  }

  override def merge(h: TopKPairs.Heap, o: TopKPairs.Heap): TopKPairs.Heap = {
    var j = 0
    while (j < o.size) { h.insert(o.scores(j), o.ids(j)); j += 1 }
    h
  }

  override def eval(h: TopKPairs.Heap): Any = {
    val out = h.sortedBestFirst()
    new GenericArrayData(out.map { case (i, s) =>
      new GenericInternalRow(Array[Any](i, s))
    })
  }

  override def serialize(h: TopKPairs.Heap): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + h.size * 16)
    buf.putInt(h.size)
    var j = 0
    while (j < h.size) { buf.putLong(h.ids(j)).putDouble(h.scores(j)); j += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Heap = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val h = new TopKPairs.Heap(k)
    var j = 0
    while (j < n) {
      val i = buf.getLong; val s = buf.getDouble
      h.insert(s, i); j += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(score = newLeft, id = newRight)
}

object TopKPairs {

  /** k-bounded binary min-heap whose ROOT is the WORST kept pair under
    * (score desc, id asc) — a new pair either beats the root (replace +
    * sift-down) or is dropped in O(1). Parallel primitive arrays, no
    * boxing; capacity GROWS geometrically toward k rather than
    * allocating k slots per group upfront (a large k over many mostly-
    * small groups would otherwise pin k·16 bytes per group before a
    * single row arrives).
    */
  final class Heap(k: Int) {
    var scores = new Array[Double](math.min(k, 16))
    var ids = new Array[Long](math.min(k, 16))
    var size: Int = 0

    @inline private def ensureCapacity(): Unit =
      if (size == scores.length && size < k) {
        val cap = math.min(k, math.max(scores.length * 2, 16))
        scores = java.util.Arrays.copyOf(scores, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }

    /** a strictly worse than b under (score desc, id asc)? */
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    def insert(s: Double, i: Long): Unit =
      if (size < k) {
        ensureCapacity()
        var c = size
        scores(c) = s; ids(c) = i; size += 1
        // sift up: parent must be worse-or-equal than child
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val r = l + 1
          var w = c
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == c) done = true
          else { swap(c, w); c = w }
        }
      }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    /** (id, score) pairs ordered best-first: (score desc, id asc). */
    def sortedBestFirst(): Array[(Long, Double)] = {
      val out = new Array[(Long, Double)](size)
      var j = 0
      while (j < size) { out(j) = (ids(j), scores(j)); j += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Double), b: (Long, Double)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }
  }

  /** Column API: top-k (score, id) pairs, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairs(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
