package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** Bounded top-k aggregate over (value, id) long pairs, ordered by
  * (value DESC, id ASC) — the deterministic tie-break that makes the
  * result engine-replayable.
  *
  * This is the map-side-combinable alternative to the
  * row_number-window idiom for "top k per group": a window sorts and
  * shuffles EVERY row of every group; this aggregate's partial
  * buffers cap at 2k entries, so the shuffle carries at most 2k rows
  * per (group × input partition) no matter how large the group is —
  * the difference between shuffling a hot group's millions of rows
  * and shuffling a constant. Compaction is amortized: inserts append
  * until 2k, then one sort keeps the best k, so per-row cost is
  * O(log k) amortized rather than per-insert sorting.
  *
  * Output: array<struct<value: bigint, id: bigint>>, sorted by
  * (value DESC, id ASC), length ≤ k. Null value or id rows are
  * ignored.
  */
object TopKPairs {
  /** (value DESC, id ASC) as a comparator — NOT `sortBy(-v)`:
    * negating Long.MinValue overflows back to Long.MinValue, which
    * would sort an extreme-negative value as the largest. */
  val ordering: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Keep the best ≤ k of `buf` by (value desc, id asc), in order. */
  def compact(buf: mutable.ArrayBuffer[(Long, Long)], k: Int): Unit = {
    val best = buf.sorted(ordering).take(k)
    buf.clear()
    buf ++= best
  }
}

case class TopKPairs(value: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  require(k >= 1, s"graft_topk needs k >= 1, got $k")

  // analysis-time type check: non-long inputs fail here with a clear
  // message rather than a ClassCastException mid-execution
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (value.dataType, id.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk expects (bigint value, bigint id), got ($v, $i)")
    }
  override def children: Seq[Expression] = value :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", LongType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      buf += ((v.asInstanceOf[Long], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) TopKPairs.compact(buf, k)
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Long, Long)],
                     b: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    a ++= b
    if (a.length >= 2 * k) TopKPairs.compact(a, k)
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    TopKPairs.compact(buf, k)
    new GenericArrayData(buf.map { case (v, i) =>
      InternalRow(v, i).asInstanceOf[Any]
    }.toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    TopKPairs.compact(buf, k) // ship at most k pairs per partial
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (v, i) => bb.putLong(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    (0 until n).foreach(_ => buf += ((bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(value = c.head, id = c(1))
}
