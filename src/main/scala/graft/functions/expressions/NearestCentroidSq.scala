package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Argmin-by-squared-L2 centroid assignment over EXACT integer
  * vectors — the Lloyd-iteration inner loop of the replayable
  * integer-quantized k-means fit (graft.operators.IntLloyd).
  *
  * All arithmetic is Long: squared distance of quantized vectors
  * (|x| ≤ ~2^11 per element, 64 dims → ≤ 2^28 total) never
  * approaches overflow, and integer comparisons are order-independent
  * and engine-independent — the property that lets the whole fit
  * replay as plain SQL in the DuckDB oracle, unlike a float fit whose
  * reduction order perturbs ulps. Strict `<` keeps the LOWEST centroid
  * index on distance ties, matching the oracle's
  * `ORDER BY dist, cluster LIMIT 1`.
  *
  * `left` is the subspace id (PQ fits train dim/M independent
  * codebooks in one pass; coarse fits pass the single subspace 0),
  * `right` the quantized sub-vector. Centroids are `Seq`s for
  * structural equality (canonicalization / CSE — the
  * [[NearestClusters]] lesson).
  */
case class NearestCentroidSq(left: Expression, right: Expression,
                             centroids: Seq[Seq[Seq[Long]]])
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(LongType, _)) =>
        if (centroids.nonEmpty && centroids.forall(_.nonEmpty))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a non-empty centroid set per subspace")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (int subspace, array<bigint> vector), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  // primitive copy once — the per-row loop runs over Long arrays
  private lazy val centArr: Array[Array[Array[Long]]] =
    centroids.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(m: Any, v: Any): Any = {
    val cents = centArr(m.asInstanceOf[Int])
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != dim) {
        throw new IllegalArgumentException(
          s"$prettyName: vector dimension $dim does not match centroid dimension ${cent.length}")
      }
      var d = 0L
      var j = 0
      while (j < dim) { val t = a.getLong(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c } // strict <: lowest index wins ties
      c += 1
    }
    best
  }

  /** Public forwarder so generated code reaches the one JVM loop. */
  def computeAny(m: Any, v: Any): Any = nullSafeEval(m, v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, v) => {
      val ref = ctx.addReferenceObj("graftExpr", this,
        "graft.functions.expressions.NearestCentroidSq")
      s"${ev.value} = (java.lang.Integer) $ref.computeAny($m, $v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidSq =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "nearest_centroid_sq"
}
