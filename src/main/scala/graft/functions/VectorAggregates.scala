package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.graftshim.SparkShims.AbstractDataType
import org.apache.spark.sql.types._

/** Elementwise sum of a vector column (array<float|double> -> array<double>).
  *
  * The posexplode encoding of a vector mean (`posexplode(v)` ->
  * `groupBy(key, pos).avg` -> re-collect) multiplies the shuffle by the
  * dimensionality: averaging 10^9 64-dim embeddings explodes to 6.4*10^10
  * rows across TWO shuffles plus a sort to reassemble. This aggregate
  * ships ONE dim-length buffer per (partition, group) through a single
  * shuffle — the standard way to compute cluster centroids at corpus scale.
  *
  * Semantics: null vectors are skipped; null ELEMENTS are treated as 0.0;
  * an empty group sums to NULL. Dimension mismatches within a group raise
  * (same contract as the vector scalar ops).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // null buffer = "no vector seen yet": the dimension is data-derived
  override def createAggregationBuffer(): Array[Double] = null

  private def addInto(buf: Array[Double], a: ArrayData): Array[Double] = {
    val n = a.numElements()
    val acc = if (buf == null) new Array[Double](n) else buf
    if (acc.length != n) throw VectorErrors.dimMismatch(acc.length, n)
    val fl = isFloat
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        acc(i) += (if (fl) a.getFloat(i).toDouble else a.getDouble(i))
      }
      i += 1
    }
    acc
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2 == null) return b1
    if (b1 == null) return b2
    if (b1.length != b2.length) throw VectorErrors.dimMismatch(b1.length, b2.length)
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null
    else new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
