package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions for SQL use:
  * `spark.sql("SELECT nt_escape(text) ...")`. Install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; the
  * `register` helper covers an already-built session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.ntEscapeDescriptor)
    e.injectFunction(GraftExtensions.ntUnescapeDescriptor)
  }
}

object GraftExtensions {
  val ntEscapeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nt_escape"),
    new ExpressionInfo(classOf[NtEscape].getName, "nt_escape"),
    (exprs: Seq[Expression]) => NtEscape(exprs.head)
  )

  val ntUnescapeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nt_unescape"),
    new ExpressionInfo(classOf[NtUnescape].getName, "nt_unescape"),
    (exprs: Seq[Expression]) => NtUnescape(exprs.head)
  )

  /** register on an existing session (tests, REPL) */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nt_escape", exprs => NtEscape(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nt_unescape", exprs => NtUnescape(exprs.head), "built-in")
  }
}
