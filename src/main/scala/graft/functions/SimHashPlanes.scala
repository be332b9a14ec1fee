package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 4-plane SimHash signature of a token array: plane j
  * (j = 0..3), bit i (i = 1..16) is the sign of Σ over token
  * OCCURRENCES of ±1 by bit j of the i-th hex digit of md5(token) —
  * bit-identical to the relational explode + 64-aggregate formulation
  * (TextOps.simhashPlanes' original form and the q48/q101 DuckDB
  * oracles), which this replaces.
  *
  * Why native: the relational form EXPLODES every token onto its own
  * row and shuffles them into a 64-buffer aggregate — a token-count
  * shuffle just to fold each document's tokens. This expression folds
  * the whole document inside the scan task: one md5 per token, 64
  * counters on the stack, zero extra rows, zero shuffle — the
  * signature stage becomes map-only and stays inside whole-stage
  * codegen (doGenCode delegates to a static JVM kernel, keeping the
  * surrounding operators fused).
  *
  * Returns ARRAY<STRING> of the four 16-char '0'/'1' planes. A NULL
  * token contributes −1 to every bit (what the relational
  * when/otherwise did); an empty array yields all-'0' planes (the
  * relational groupBy emitted no row — callers filter empty token
  * arrays first, as TextOps does).
  */
case class SimHashPlanes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_planes requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "simhash_planes"

  override protected def nullSafeEval(a: Any): Any =
    SimHashPlanes.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashPlanes.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashPlanes = copy(child = newChild)
}

object SimHashPlanes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM kernel shared by eval and codegen (static from generated
    * Java). */
  def compute(tokens: ArrayData): ArrayData = {
    val acc = new Array[Int](64) // [j * 16 + (i - 1)]
    val md = digest.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t)) {
        // relational when(NULL cond).otherwise(-1): every bit gets -1
        var k = 0
        while (k < 64) { acc(k) -= 1; k += 1 }
      } else {
        md.reset()
        val h = md.digest(tokens.getUTF8String(t).getBytes)
        // the first 16 hex digits are bytes 0..7: high nibble = digit
        // 2b, low nibble = digit 2b+1 (0-based digit index)
        var b = 0
        while (b < 8) {
          val hi = (h(b) >> 4) & 0xf
          val lo = h(b) & 0xf
          var j = 0
          while (j < 4) {
            acc(j * 16 + 2 * b) += (if (((hi >> j) & 1) == 1) 1 else -1)
            acc(j * 16 + 2 * b + 1) += (if (((lo >> j) & 1) == 1) 1 else -1)
            j += 1
          }
          b += 1
        }
      }
      t += 1
    }
    val planes = new Array[AnyRef](4)
    var j = 0
    while (j < 4) {
      val bits = new Array[Byte](16)
      var i = 0
      while (i < 16) {
        bits(i) = if (acc(j * 16 + i) > 0) '1'.toByte else '0'.toByte
        i += 1
      }
      planes(j) = UTF8String.fromBytes(bits)
      j += 1
    }
    new GenericArrayData(planes)
  }

  private[functions] val info = new ExpressionInfo(
    classOf[SimHashPlanes].getName, "simhash_planes")

  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash_planes"),
      info, es => SimHashPlanes(es.head))
}
