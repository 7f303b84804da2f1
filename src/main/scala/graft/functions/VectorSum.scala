package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import java.nio.ByteBuffer

/** Element-wise sum of array<double> vectors as a single object
  * aggregate — one mutable Array[Double] buffer per group, map-side
  * combinable. The posexplode → per-(group, dim) avg → re-assemble
  * formulation shuffles |rows|·dims exploded rows and runs two extra
  * aggregations; this ships one dims-long buffer per group per
  * partition. Used by the IVF k-means centroid recomputation (mean =
  * sum / count). Rows are assumed dimension-consistent (the first
  * row's length wins; shorter rows add their prefix). */
case class VectorSum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vector_sum"

  // analysis-time, like the sibling aggregates: an array<float> input
  // would reach arr.getDouble, which on UnsafeArrayData reads 8-byte
  // slots over 4-byte elements — GARBAGE sums with no error (or a
  // mid-execution ClassCastException on the generic path)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vector_sum expects array<double>, got $t")
    }

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf.length >= n) buf else {
        val grown = new Array[Double](n)
        System.arraycopy(buf, 0, grown, 0, buf.length)
        grown
      }
      var i = 0
      // null ELEMENTS contribute nothing (getDouble on a null slot is
      // undefined on some ArrayData implementations, 0.0 on others —
      // make the skip explicit either way)
      while (i < n) {
        if (!arr.isNullAt(i)) acc(i) += arr.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
