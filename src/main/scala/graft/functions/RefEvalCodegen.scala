package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** Codegen by reference-call into the expression's own eval body.
  *
  * `CodegenFallback` pushes the ENTIRE projection containing the
  * expression onto the interpreted path and boxes an InternalRow per
  * call; these traits instead emit a direct call to the expression's
  * (public) `nullSafeEval` from inside the generated code, so the
  * surrounding operators stay in one whole-stage-codegen function and
  * the per-row cost is a single virtual call into the same JIT-compiled
  * loop. Semantics are exactly `nullSafeEval`'s — nothing is
  * re-implemented. */
trait RefEvalCodegen extends UnaryExpression {
  // requires the concrete class to override nullSafeEval PUBLICLY (the
  // default for a bare `override def` in Scala) — the generated Java
  // calls it on a reference typed as the concrete class
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val jt = CodeGenerator.javaType(dataType)
      val bt = CodeGenerator.boxedType(dataType)
      val call = s"(($bt) $ref.nullSafeEval($c))"
      val value = if (jt == bt) call else s"$call.${jt}Value()"
      s"${ev.value} = $value;"
    })
}

/** Binary variant of [[RefEvalCodegen]]. */
trait RefEvalCodegenBinary extends BinaryExpression {
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val jt = CodeGenerator.javaType(dataType)
      val bt = CodeGenerator.boxedType(dataType)
      val call = s"(($bt) $ref.nullSafeEval($l, $r))"
      val value = if (jt == bt) call else s"$call.${jt}Value()"
      s"${ev.value} = $value;"
    })
}
