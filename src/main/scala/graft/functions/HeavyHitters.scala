package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a single-pass mergeable
  * aggregate (the k-counter generalization of Boyer-Moore majority;
  * merge rule from Agarwal et al. 2012, "Mergeable Summaries").
  *
  * Maintains at most `k` (item, count) counters per buffer. Seeing a
  * tracked item increments it; an untracked item takes a free slot or,
  * when all k are taken, decrements every counter (dropping zeros) —
  * charging one occurrence of each tracked item against the new one.
  * Merging sums counters, then subtracts the (k+1)-th largest count
  * and drops non-positives, which preserves the error bound across
  * partial aggregation.
  *
  * Deterministic GUARANTEE (not probabilistic, unlike HLL/bloom):
  * after any stream of n rows, every item with true frequency
  * > n/(k+1) is present, and every reported count undercounts its true
  * frequency by at most n/(k+1). That makes this the candidate
  * generator for exact heavy-hitters at scale: one O(k)-memory pass
  * over 100 TB produces ≤ k candidates per group, and an exact
  * recount of just those candidates (a semi-join against a k-row
  * broadcast) gives precise answers — the corpus is never aggregated
  * at full item cardinality. `q_heavy_hitters` is exactly that
  * two-phase plan; the sketch-level guarantee is pinned in
  * NativeFunctionsSpec against adversarial streams.
  *
  * The output map's contents depend on partition layout (any MG
  * result set does — only the guarantee is stable), so downstream use
  * must treat it as a candidate superset, never as exact counts.
  */
object MisraGries {
  /** One MG update step: fold `item` into a ≤k-counter buffer. Shared
    * by the batch aggregate below and the streaming per-key state in
    * [[graft.streaming.HeavyHittersStream]] so the two surfaces cannot
    * drift. */
  def offer(buf: mutable.HashMap[String, Long], item: String, k: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // decrement-all: every tracked item pays one occurrence to
        // absorb the untracked one; zeros free their slots
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (key, c) =>
          if (c == 1L) dead += key else buf.update(key, c - 1)
        }
        dead.foreach(buf.remove)
    }

  /** Merge `b` into `a` with the Agarwal-et-al rule: sum counters,
    * subtract the (k+1)-th largest, drop non-positives — preserves the
    * n/(k+1) bound across partials. */
  def mergeInto(a: mutable.HashMap[String, Long],
                b: collection.Map[String, Long], k: Int): Unit = {
    b.foreach { case (key, c) =>
      a.update(key, a.getOrElse(key, 0L) + c)
    }
    if (a.size > k) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (key, c) =>
        if (c - threshold <= 0L) dead += key else a.update(key, c - threshold)
      }
      dead.foreach(a.remove)
    }
  }
}

case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"graft_heavy_hitters needs k >= 1, got $k")

  // analysis-time type check: without this a non-string column fails
  // deep in execution with a ClassCastException instead of a clear error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_heavy_hitters expects a string item column, got $other")
    }
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String buffers are reused by the row reader — materialize
      MisraGries.offer(buf, v.asInstanceOf[UTF8String].toString, k)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MisraGries.mergeInto(a, b, k)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic ORDER for a given content: sort by (-count, item)
    val entries = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e =>
        UTF8String.fromString(e._1).asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
