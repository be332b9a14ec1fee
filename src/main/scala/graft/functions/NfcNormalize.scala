package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Canonical-composes combining sequences (e.g. `e` + U+0301 → `é`) so
  * that text hashing, dedup keys, and equality joins treat canonically
  * equivalent strings as identical — a prerequisite for exact dedup
  * over web text, where the same word arrives in both composed and
  * decomposed forms depending on the upstream encoder. Matches
  * DuckDB's `nfc_normalize`, so oracle hash-checks hold.
  *
  * The fast path costs one `isNormalized` scan (true for pure-ASCII
  * and already-composed text — the overwhelming majority of a 100 TB
  * corpus) and only allocates when composition actually changes the
  * string; inside whole-stage codegen the call is a static helper, no
  * boxing or UDF serialization.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a STRING argument, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.normalize($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Static helper shared by interpreted and codegen paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private def builder(es: Seq[Expression]): Expression =
    NfcNormalize(es.head)

  private[functions] val info = new ExpressionInfo(
    classOf[NfcNormalize].getName, "nfc_normalize")

  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("nfc_normalize"), info, builder)
}
