package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two float vectors in double precision —
  * sequential left-to-right accumulation (bit-identical to
  * `aggregate(zip_with(...))` and to DuckDB's `list_dot_product`, so
  * oracle hash-checks still hold).
  *
  * This is the one hot-path scalar the built-ins can't do efficiently:
  * the `zip_with` + `aggregate` chain materializes an intermediate
  * array and evaluates two lambda closures per element, while this
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen — the difference between O(n) allocations and zero per row
  * on a 100 TB embedding scan.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // Exact `aggregate(zip_with(...))` semantics, so DotProductRewrite is
  // a pure performance rewrite for ANY ARRAY<FLOAT> inputs: unequal
  // lengths → null (zip_with pads with null; null propagates through
  // *,+), and a null element → null. Hence nullable even when the
  // children aren't.
  override def nullable: Boolean = true

  /** Element-null checks are only emitted when the schema says nulls
    * can occur — containsNull=false vectors keep the tight branch-free
    * loop. */
  private def mayContainNull: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (mayContainNull && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (mayContainNull)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
                ${ev.isNull} = true; break;
              }"""
        else ""
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          if (!${ev.isNull}) {
            ${ev.value} = $s;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions: imperative (any
  * existing session) and via `SparkSessionExtensions` (for
  * `builder.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {
  private def builder(es: Seq[Expression]): Expression =
    ArrayDot(es.head, es(1))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", es => NfcNormalize(es.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "aho_match", es => AhoMatch(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_planes", es => SimHashPlanes(es.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", es => MinHashSigs(es.head), "built-in")
  }

  private[functions] val info = new ExpressionInfo(
    classOf[ArrayDot].getName, "array_dot")

  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("array_dot"), info, builder)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.injection)
    ext.injectFunction(NfcNormalize.injection)
    ext.injectFunction(AhoMatch.injection)
    ext.injectFunction(SimHashPlanes.injection)
    ext.injectFunction(MinHashSigs.injection)
    ext.injectFunction(CdcChunks.injection)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
