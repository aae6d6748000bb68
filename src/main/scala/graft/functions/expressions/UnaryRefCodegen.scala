package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Whole-stage-codegen support via a reference-object call.
  *
  * CodegenFallback evaluates through the interpreter against the
  * current input ROW, which forces the enclosing WholeStageCodegen
  * stage to materialize that row per call — splitting the fused
  * pipeline exactly where these expressions sit (the hot per-row
  * loops). This trait instead generates a direct call to the ONE JVM
  * implementation of the loop ([[UnaryExpression.nullSafeEval]],
  * surfaced as [[computeAny]]) with just the child value: no row
  * materialization, no interpreted eval tree, one JIT-able virtual
  * call per row. Used by every graft unary expression; binary/custom
  * shapes (CosineSimilarity) write their loop into the generated code
  * directly.
  */
trait UnaryRefCodegen extends UnaryExpression {

  /** Public forwarder so generated code can reach the hot loop. */
  def computeAny(input: Any): Any = nullSafeEval(input)

  private def boxed(dt: DataType): String = dt match {
    case LongType => "java.lang.Long"
    case IntegerType => "java.lang.Integer"
    case DoubleType => "java.lang.Double"
    case _: ArrayType => "org.apache.spark.sql.catalyst.util.ArrayData"
    case _: StructType => "org.apache.spark.sql.catalyst.InternalRow"
    case other => throw new IllegalStateException(
      s"UnaryRefCodegen: unsupported result type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftExpr", this,
        "graft.functions.expressions.UnaryRefCodegen")
      s"${ev.value} = (${boxed(dataType)}) $ref.computeAny($c);"
    })
}
