package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `Locale.ROOT` lowercasing as an expression. Spark's own `lower()`
  * delegates non-ASCII strings to `String.toLowerCase()` — the JVM
  * DEFAULT locale — so on a tr/az/lt-default JVM `lower('İstanbul IQ')`
  * and a `Locale.ROOT` JVM-side lowering disagree on the dotted/dotless
  * i family. Components whose JVM half pins ROOT (the BPE trainer, whose
  * learned merge alphabet must match [[BpeEncode]]'s ROOT-lowered
  * symbols on EVERY deployment) lower their Spark half with this
  * expression instead, so the pair cannot diverge by deployment locale.
  *
  * CodegenFallback: used on frequency-reduction scans (one eval per
  * document), not in per-row hot loops. */
case class RootLower(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"root_lower input must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      input.asInstanceOf[UTF8String].toString.toLowerCase(Locale.ROOT))

  override def dataType: DataType = StringType
  override protected def withNewChildInternal(c: Expression): RootLower =
    copy(child = c)
}
