package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric arrays in one compiled pass.
  *
  * The HOF formulation (`aggregate(zip_with(...))` for the dot product
  * plus two more folds for the norms) is interpreted per element —
  * three lambda evaluations per dimension per pair, which dominates
  * wall-clock on pairwise workloads (candidate verify in near-dup
  * join d06, scoring in s01/s02 ANN). This walks both arrays once and
  * accumulates dot/normA/normB in three registers.
  *
  * Accumulation is left-to-right in DOUBLE and the result is
  * `dot / (sqrt(na) * sqrt(nb))` CLAMPED to [-1, 1] — the exact IEEE
  * op order of the HOF version and of DuckDB's
  * `list_cosine_similarity` on DOUBLE[], so oracle hashes are
  * bit-identical. The clamp matters only for bit-identical-vector
  * pairs, where the unclamped quotient can land one ulp ABOVE 1.0
  * (sqrt(s)·sqrt(s) rounds below s): DuckDB clamps, so we clamp —
  * in-range values are bit-unchanged (round-9 fix surfaced by p05's
  * exact-duplicate images).
  *
  * Edge-case contract (mirrors DuckDB so the oracle stays exact,
  * verified against duckdb 1.0.0):
  *  - mismatched array lengths raise (DuckDB: "list dimensions must
  *    be equal") rather than silently truncating;
  *  - a zero-norm input yields -1.0 (DuckDB's result for the
  *    degenerate 0/0 case — sorts such pairs last by similarity);
  *  - non-float/double array inputs are rejected at analysis time by
  *    [[checkInputDataTypes]], not at eval time.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val leftFloat = elemIsFloat(left)
  private lazy val rightFloat = elemIsFloat(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: array dimensions must be equal, got " +
          s"${a.numElements()} and ${b.numElements()}")
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) -1.0
    else math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  }

  /** Full whole-stage-codegen support (not CodegenFallback): the
    * generated loop is the same three-register accumulation as
    * [[nullSafeEval]], so the expression stays inside the
    * WholeStageCodegen span of the enclosing join/filter instead of
    * forcing a per-row interpreted boundary on the hottest path
    * (candidate verify in d06/d07, scoring in s01–s03). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, idx: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: array dimensions must be equal, got " +
         |    $a.numElements() + " and " + $b.numElements());
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${get(a, i, leftFloat)};
         |  final double $y = ${get(b, i, rightFloat)};
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? -1.0 : java.lang.Math.max(-1.0, java.lang.Math.min(1.0,
         |      $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}
