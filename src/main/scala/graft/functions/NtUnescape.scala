package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object NtUnescapeUtil {
  def unescape(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.emit.NTriples.unescape(s.toString))
}

/** Native Catalyst expression inverting [[NtEscape]] — the read side of
  * SC3, used by [[graft.sources.NtReader]] to recover lexical forms
  * from N-Triples literals while staying inside whole-stage codegen.
  * Ordered escape decoding (`\\` must not re-trigger on its own output)
  * cannot be expressed as chained `regexp_replace`s, so this is a
  * legitimate custom-Expression case per the build brief's preference
  * order.
  */
case class NtUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nt_unescape"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nt_unescape requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NtUnescapeUtil.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NtUnescapeUtil.unescape($c)")

  override protected def withNewChildInternal(newChild: Expression): NtUnescape =
    copy(child = newChild)
}
