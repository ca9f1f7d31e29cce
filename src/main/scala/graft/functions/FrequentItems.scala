package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; merge analysis
  * per Agarwal et al., "Mergeable Summaries", PODS 2012) — heavy hitters
  * over a huge keyspace WITHOUT shuffling the keyspace.
  *
  * The exact formulation (hash agg per term, then top-k) is fine when the
  * vocabulary fits a shuffle, but the exchange carries one row per
  * DISTINCT term per partition. This aggregate keeps ≤ `k` counters per
  * partition, so the exchange carries ≤ k rows per partition whatever the
  * vocabulary size — the classic sketch trade: estimated counts undercount
  * by at most n/(k+1), and any term with true count > n/(k+1) is
  * guaranteed present in the merged summary.
  *
  * Partials merge by SUMMING counter maps with no truncation (bounded by
  * k · numPartials entries, trivially small) — pairwise-truncating merges
  * would make the result depend on merge ARRIVAL ORDER, which is
  * nondeterministic across runs; summing is commutative, so two runs over
  * the same partition layout give byte-identical output. Truncation to the
  * `outK` reported items happens once, at eval, ordered (est desc, item
  * asc) so the cut is a total order.
  *
  * Null items are ignored; an empty group yields an empty array.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    outK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FrequentItems.Sketch]
    with UnaryLike[Expression] {

  require(k > 0, s"graft_freq_items: k must be positive, got $k")
  require(outK > 0 && outK <= k,
    s"graft_freq_items: outK must be in [1, k], got $outK (k = $k)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): FrequentItems.Sketch =
    new FrequentItems.Sketch

  override def update(s: FrequentItems.Sketch, input: InternalRow): FrequentItems.Sketch = {
    val v = child.eval(input)
    if (v != null) s.add(v.asInstanceOf[UTF8String], k)
    s
  }

  override def merge(s: FrequentItems.Sketch, o: FrequentItems.Sketch): FrequentItems.Sketch = {
    o.counts.foreach { case (item, c) =>
      s.counts.updateWith(item) {
        case Some(prev) => Some(prev + c)
        case None => Some(c)
      }
    }
    s
  }

  override def eval(s: FrequentItems.Sketch): Any = {
    val top = s.counts.toArray
      .sortWith { (a, b) =>
        a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
      }
      .take(outK)
    new GenericArrayData(top.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
  }

  override def serialize(s: FrequentItems.Sketch): Array[Byte] = {
    var bytes = 4
    s.counts.foreach { case (item, _) => bytes += 4 + item.numBytes() + 8 }
    val buf = ByteBuffer.allocate(bytes)
    buf.putInt(s.counts.size)
    s.counts.foreach { case (item, c) =>
      val b = item.getBytes
      buf.putInt(b.length).put(b).putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): FrequentItems.Sketch = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new FrequentItems.Sketch
    var j = 0
    while (j < n) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      val c = buf.getLong
      s.counts.put(UTF8String.fromBytes(b), c)
      j += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItems =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): FrequentItems =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}

object FrequentItems {

  /** Counter map. `add` is the classic Misra–Gries step: increment a
    * tracked item, start tracking under capacity, otherwise decrement ALL
    * counters (dropping zeros) — the step that happens at most n/(k+1)
    * times total, which is where the error bound comes from.
    */
  final class Sketch {
    val counts = new mutable.HashMap[UTF8String, Long]

    def add(item: UTF8String, k: Int): Unit = counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k =>
        // the eval'd UTF8String may point into a reused row buffer — copy
        counts.put(item.clone(), 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.mapValuesInPlace { (key, c) =>
          if (c == 1L) dead += key
          c - 1L
        }
        dead.foreach(counts.remove)
    }
  }

  /** Column API: Misra–Gries heavy hitters — `k` counters per partition,
    * top `outK` (item, est_count) structs reported, (est desc, item asc).
    */
  def freqItems(item: Column, k: Int, outK: Int): Column =
    ColumnBridge.column(
      FrequentItems(ColumnBridge.expression(item), k, outK)
        .toAggregateExpression())
}
