package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

import java.nio.ByteBuffer

/** Single-pass MinHash signature aggregate (SURVEY §7.6: custom
  * sketch-style aggregates as TypedImperativeAggregate).
  *
  * Computes all k minhash values in one mutable Array[Long] buffer per
  * group — replacing k separate min() aggregate columns (k buffer
  * slots, k aggregate expression trees) with one object aggregate.
  * Hash values are EXACTLY the ones `xxhash64(lit(i), token)` produces
  * (seed chain: XXH64(int i, seed 42) → XXH64(token bytes, that)), so
  * the two formulations are interchangeable; the equivalence is pinned
  * by a test. Partial aggregation (map-side combine) works as usual —
  * merge is elementwise min — so shuffle volume per doc is k longs, not
  * the token stream.
  */
case class MinHashSignature(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  // analysis-time, like the sibling aggregates: any other input type
  // would ClassCastException per-row deep in executors, and k <= 0
  // would emit empty signatures that make EVERY doc pair LSH-collide
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okType = child.dataType == LongType ||
      child.dataType == org.apache.spark.sql.types.StringType
    if (!okType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects a long or string token, got ${child.dataType}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig needs k >= 1, got $k")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  @transient private lazy val isLongInput: Boolean =
    child.dataType == org.apache.spark.sql.types.LongType

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (isLongInput) {
        // pre-hashed token (xxhash64(token)): per-plane hash is an
        // 8-byte mix instead of rehashing the token bytes k times —
        // the fast path for long/shingled tokens
        val t = v.asInstanceOf[Long]
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(t, seeds(i))
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      } else {
        val s = v.asInstanceOf[UTF8String]
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, seeds(i))
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSignature =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object MinHashSignature {
  /** Delegates to the shared registry so the function list lives in
    * exactly one place ([[NativeFunctions.registry]]). */
  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def sig(tok: Column, k: Int): Column =
    call_function("graft_minhash_sig", tok, org.apache.spark.sql.functions.lit(k))
}
