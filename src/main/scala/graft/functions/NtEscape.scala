package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object NtEscapeUtil {
  def escape(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.emit.NTriples.escape(s.toString))
}

/** Native Catalyst expression for N-Triples string escaping (SC3).
  *
  * The emitter does its escaping inside the typed flatMap; this
  * expression exists for the pure-Column emission paths (e.g. term
  * triples straight off the parsed struct) where staying inside
  * whole-stage codegen avoids the object serialization boundary
  * entirely. Preference order per the build brief: compose built-ins >
  * custom Expression (this) > UDF — a Scala UDF here would break the
  * codegen span and box every row.
  */
case class NtEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nt_escape"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nt_escape requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NtEscapeUtil.escape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NtEscapeUtil.escape($c)")

  override protected def withNewChildInternal(newChild: Expression): NtEscape =
    copy(child = newChild)
}
