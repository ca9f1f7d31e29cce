package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-sketch probe for the bloom-gated operators
  * ([[graft.operators.Dedup.incrementalBloom]],
  * [[graft.operators.Relational.bloomPrunedJoin]]): Spark's own
  * `BloomFilterMightContain` runtime-filter expression over a
  * serialized-sketch binary literal — the exact layout
  * `InjectRuntimeFilter` injects, so the probe participates in
  * whole-stage codegen instead of paying a Scala-UDF serialization
  * round-trip per row (which also severed the codegen span around every
  * probe site).
  *
  * The expression tests LONGS, so the sketch must be built over
  * `xxhash64(key)` ([[hashed]]) and probed with the same hash
  * ([[mightContainHashed]]) — mirroring how `BloomFilterAggregate` and
  * its probe share `XxHash64`. Changing the probe hash only moves WHICH
  * keys false-positive; both bloom-gated operators are exact under any
  * false-positive set (positives are verified against the true key set /
  * dropped by the join), so results are unchanged by construction.
  *
  * The sketch rides the plan as a binary literal rather than a broadcast
  * variable: task binaries are themselves broadcast per stage, so the
  * bytes ship to each executor once either way, and the literal needs no
  * driver-side destroy() lifecycle. (Spark's runtime filters inline the
  * sketch into the plan the same way, as a scalar-subquery result.)
  */
object BloomProbe {

  /** The key column in the domain the sketch stores: xxhash64 of the
    * string form. Build the sketch over THIS (`df.select(hashed(k).as("h"))
    * .stat.bloomFilter("h", n, fpp)` — LongType → putLong) and probe with
    * [[mightContainHashed]] on the same key expression.
    */
  def hashed(key: Column): Column = xxhash64(key)

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd probe: true iff the sketch might contain `key` (hashed as
    * [[hashed]]). Never null: xxhash64 maps a NULL key to its seed, so
    * null keys probe like any other value and take the operator's exact
    * path (anti-join / equi-join) where nulls can never match — the same
    * net result as the former UDF's explicit null-is-false.
    */
  def mightContainHashed(sketchBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketchBytes, BinaryType),
      ColumnBridge.expression(hashed(key))))
}
