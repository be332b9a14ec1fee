package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `aho_match(text, patterns)` — the SQL surface over
  * [[AhoCorasick]]: returns the DISTINCT elements of `patterns` that
  * occur in `text` as substrings, in pattern order, from ONE scan of
  * the text (q186's plan, available to `spark.sql` users without
  * leaving SQL).
  *
  * The automaton is compiled from the pattern array on first use and
  * cached on the expression instance: with a literal/foldable pattern
  * argument (the common case — a blocklist dimension collected to a
  * literal) every task compiles exactly once and each row pays only the
  * O(|text|) scan. A non-constant pattern column still evaluates
  * correctly — the cache revalidates by content — but rebuilds per
  * distinct pattern set, so keep patterns constant per query.
  *
  * Interpreted-only (CodegenFallback): the per-row work is the
  * automaton scan itself, which a generated-code wrapper would not
  * change; keeping the expression out of codegen does not split
  * surrounding WholeStageCodegen stages in Spark 4.
  */
case class AhoMatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"aho_match requires (STRING, ARRAY<STRING>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "aho_match"

  @transient private var cachedPats: Array[String] = _
  @transient private var cachedAc: AhoCorasick = _

  private def automatonFor(arr: ArrayData): (AhoCorasick, Array[String]) = {
    val pats = new Array[String](arr.numElements())
    var i = 0
    while (i < pats.length) {
      pats(i) = arr.getUTF8String(i).toString
      i += 1
    }
    // revalidate by content: O(|patterns|) string compares per row vs
    // an O(total pattern length) trie rebuild
    if (cachedPats == null || !java.util.Arrays.equals(
        cachedPats.asInstanceOf[Array[AnyRef]],
        pats.asInstanceOf[Array[AnyRef]])) {
      cachedPats = pats
      cachedAc = AhoCorasick.build(pats.toSeq)
    }
    (cachedAc, cachedPats)
  }

  override protected def nullSafeEval(t: Any, p: Any): Any = {
    val (ac, pats) = automatonFor(p.asInstanceOf[ArrayData])
    val ids = ac.matchedPatterns(t.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) {
      out(i) = UTF8String.fromString(pats(ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AhoMatch =
    copy(left = newLeft, right = newRight)
}

object AhoMatch {
  private def builder(es: Seq[Expression]): Expression =
    AhoMatch(es.head, es(1))

  private[functions] val info = new ExpressionInfo(
    classOf[AhoMatch].getName, "aho_match")

  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("aho_match"), info, builder)
}
