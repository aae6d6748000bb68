package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signature: bit j of the result is
  * sign(v · plane_j). The plane matrix is precomputed driver-side
  * (deterministic hash family, see
  * [[graft.functions.VectorFunctions.hyperplaneSignature]]); signing
  * is numBits × dim multiply-adds in one compiled loop per row over a
  * lazily-materialized primitive matrix.
  *
  * The constructor parameter is `Seq[Seq[Double]]`, NOT arrays: case
  * classes over arrays compare by identity, which silently breaks
  * Catalyst canonicalization / `semanticEquals` / common-subexpression
  * elimination — two structurally identical signatures would never
  * dedupe. Structural-equality params keep the expression a first-
  * class Catalyst citizen; the hot loop still runs on primitives.
  *
  * A vector whose dimension differs from the plane dimension raises
  * (same contract as [[CosineSimilarity]]) — a garbage signature for a
  * wrong-dim vector would silently poison every downstream bucket.
  *
  * The HOF formulation (one `aggregate(zip_with(...))` per bit with a
  * per-element `xxhash64`) evaluates numBits × dim interpreted
  * lambdas + hashes per row — the s02 signature hot spot. Bit-exact
  * parity with it is asserted in FunctionsSpec (the driver-side plane
  * replication uses the same xxhash64 chain Spark evaluates).
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (planes.nonEmpty && planes.length <= 64) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1..64 planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // primitive copy for the hot loop; built once per task, not per row
  private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = a.numElements()
    var sig = 0L
    var j = 0
    while (j < planeArr.length) {
      val plane = planeArr(j)
      if (plane.length != dim) {
        throw new IllegalArgumentException(
          s"$prettyName: vector dimension $dim does not match plane dimension ${plane.length}")
      }
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_signature"
}
