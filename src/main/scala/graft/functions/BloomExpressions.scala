package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.graftshim.SparkShims.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` over a Bloom filter built once on the driver
  * (`DataFrameStatFunctions.bloomFilter`) and shipped to executors inside
  * the expression — the 100 TB membership PREFILTER: a batch row whose key
  * the filter rejects is GUARANTEED unseen (zero false negatives) and can
  * skip the expensive dedup join entirely; only "possibly seen" rows go on
  * to the exact tier.
  *
  * The serialized filter travels as plain bytes (task-broadcast with the
  * closure); each executor JVM deserializes it once (transient lazy).
  * Spark's `util.sketch.BloomFilter` is order-independent (bitwise OR of
  * per-item bit sets, fixed seed), so the filter — and therefore every
  * probe — is deterministic for a given key set, which is what lets the
  * membership CONTRACT (no false negatives, bounded false-positive rate)
  * sit under the DuckDB hash gate as stable booleans.
  *
  * String keys probe via the UTF-8 byte path, matching how
  * `stat.bloomFilter` inserts them; long keys via the long path.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShims.typeCollection(StringType, LongType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomMightContain.deserialize(filterBytes)

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case _ => filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one deserialized filter per generated-class instance, not per row
    val f = ctx.addReferenceObj("bloomFilter",
      BloomMightContain.deserialize(filterBytes),
      classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$f.mightContainBinary($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$f.mightContainLong($c)")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomMightContain {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }
}
