package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** Native HyperLogLog register aggregate (m = 256, 32-bit hash input):
  * the mergeable-sketch core of q33's approx count-distinct, as a
  * Catalyst [[TypedImperativeAggregate]].
  *
  * Input is the 32-bit md5-derived hash value (a long in [0, 2^32) —
  * the `hv` the q33 pipeline computes with codegen'd builtins);
  * register index = top 8 bits, rank = 25 − bit-length of the low 24
  * bits. The buffer is the 256-byte max-rank array itself, so partial
  * aggregation ships 256 bytes per group per task — the map-side
  * combine that makes HLL the 100-TB count-distinct: the exchange
  * moves O(groups) sketches, never O(rows), and sketches from any
  * partitioning merge to the identical result (spec-asserted by
  * repartition invariance).
  *
  * eval returns struct(s_total, v_zero): the harmonic sum scaled by
  * 2^25 (exact integer — empty registers contribute 2^25, occupied
  * ones 2^(25−rank)) and the empty-register count. The float estimate
  * stays OUTSIDE the aggregate, in the query projection, where it is
  * shared verbatim with the DuckDB oracle replay — the aggregate is
  * pure integer arithmetic and bit-equal to the declarative
  * (group × register) formulation by construction.
  */
case class HllRegisters(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  private val m = 256

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral 32-bit hash column, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("s_total", LongType, nullable = false),
    StructField("v_zero", IntegerType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Number].longValue()
      val r = ((hv >>> 24) & 0xFFL).toInt
      val rest = hv & 0xFFFFFFL
      // rank = leading-zero count of the 24-bit remainder + 1
      //      = 25 − bit-length(rest); rest == 0 → 25
      val rho =
        if (rest == 0L) 25
        else 25 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > buf(r)) buf(r) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L; var v = 0; var i = 0
    while (i < m) {
      s += 1L << (25 - buf(i))
      if (buf(i) == 0) v += 1
      i += 1
    }
    InternalRow(s, v)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
  override def prettyName: String = "hll_registers"
}
