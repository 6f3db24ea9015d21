package graft.plans

import graft.core.Urls
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for URL canonicalization — the optional
  * codegen upgrade SURVEY.md §4 reserves for the hottest frontier scalar
  * (every discovered link passes through it before hashing). Compared to a
  * Scala UDF this avoids the UDF wrapper's catalyst↔scala converters and
  * per-row closure dispatch: generated code calls [[compute]] directly on
  * UTF8String.
  *
  * Registered as SQL function `canonicalize_url(url[, deep])` by
  * [[GraftExtensions]] (spark.sql.extensions=graft.plans.GraftExtensions) or
  * [[GraftExtensions.install]] on an existing session.
  */
case class CanonicalizeUrl(child: Expression, deep: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url expects STRING, got ${child.dataType.sql}")
  }

  /** Codegen-callable kernel (UTF8String in/out, no converters). */
  def compute(s: UTF8String): UTF8String = {
    if (s == null) return null
    val out =
      if (deep) Urls.canonicalizeDeep(s.toString, "")
      else Urls.canonicalize(s.toString, "")
    if (out == null) null else UTF8String.fromString(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("canon", this, classOf[CanonicalizeUrl].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)

  override def prettyName: String = "canonicalize_url"
}

/** Session extension: injects `canonicalize_url` into the function registry
  * (SparkSessionExtensions — the documented extension point; no internal
  * APIs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.canonicalizeUrlFn)
  }
}

object GraftExtensions {
  val canonicalizeUrlFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("canonicalize_url"),
    new ExpressionInfo(classOf[CanonicalizeUrl].getName, "canonicalize_url"),
    (args: Seq[Expression]) => args match {
      case Seq(u) => CanonicalizeUrl(u, deep = true)
      case Seq(u, d) =>
        CanonicalizeUrl(u, deep = d.eval() == true)
      case _ => throw new IllegalArgumentException(
        "canonicalize_url(url[, deep]) takes 1 or 2 arguments")
    })

  /** Register on an already-built session (tests / REPL). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      canonicalizeUrlFn._1, canonicalizeUrlFn._2, canonicalizeUrlFn._3)

  /** Column-API handle (requires [[install]] / the extension to have
    * registered the function in the session).
    */
  def canonicalizeUrl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("canonicalize_url", c)
}
