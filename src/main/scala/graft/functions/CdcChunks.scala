package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking (q223): split `text` at every
  * position i (1-based char index, 2 ≤ i ≤ len−3) where the first 16
  * bits of md5 of the 4-char window starting at i are ≡ 0 mod 37, plus
  * the implicit cut at 1 — byte-identical to the relational
  * formulation it replaces:
  *
  * {{{
  * cuts   = array_sort(concat(array(1),
  *            filter(sequence(2, greatest(2, len - 3)), i ->
  *              i <= len - 3 AND
  *              conv(substring(md5(substring(text, i, 4)), 1, 4),
  *                   16, 10) % 37 = 0)))
  * chunks = zip_with(cuts, concat(slice(cuts, 2, size(cuts) - 1),
  *                                array(len + 1)),
  *            (st, en) -> substring(text, st, en - st))
  * }}}
  *
  * Why native: the relational form materializes, per DOCUMENT
  * CHARACTER, a 4-char UTF8String copy, a 32-char md5 hex string, and
  * a base-16 string parse (`conv`) — plus the position `sequence`
  * array and three array-lambda passes. This kernel walks the
  * document's UTF-8 bytes once (char→byte offsets computed in the same
  * walk, so non-ASCII text keeps exact substring() char semantics),
  * feeds each 4-char window's bytes straight into a thread-local
  * MessageDigest, and compares the digest's first two BYTES — the
  * exact integer `conv` produced — against the modulus. Zero
  * per-window allocation; the expression stays inside whole-stage
  * codegen (doGenCode delegates to the static kernel below).
  *
  * Returns ARRAY<STRING> of chunks (empty text yields a single empty
  * chunk, exactly like the zip_with over cuts=[1], en=len+1=1).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(t: Any): Any =
    CdcChunks.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CdcChunks.compute($t);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunks = copy(child = newChild)
}

object CdcChunks {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM kernel shared by eval and codegen (static from generated
    * Java). */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // char k (0-based) starts at byte charOff(k); charOff(nChars)=end.
    // One walk over the bytes; ASCII text is the straight-line case.
    val nBytes = bytes.length
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    val charOff = new Array[Int](nChars + 1)
    var k = 0
    b = 0
    while (b < nBytes) {
      charOff(k) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      k += 1
    }
    charOff(nChars) = nBytes
    // cuts: 1-based char positions, ascending; 1 is always a cut.
    val md = digest.get()
    val out = new Array[Byte](16)
    var cutsBuf = new Array[Int](16)
    var nCuts = 0
    def addCut(i: Int): Unit = {
      if (nCuts == cutsBuf.length)
        cutsBuf = java.util.Arrays.copyOf(cutsBuf, nCuts * 2)
      cutsBuf(nCuts) = i
      nCuts += 1
    }
    addCut(1)
    var i = 2
    val lastStart = nChars - 3 // window [i, i+3] must fit
    while (i <= lastStart) {
      val o0 = charOff(i - 1)
      md.reset()
      md.update(bytes, o0, charOff(i + 3) - o0)
      md.digest(out, 0, 16)
      // first 4 hex digits of the md5 = first two digest bytes; conv
      // parsed them as one 16-bit unsigned integer.
      val v = ((out(0) & 0xff) << 8) | (out(1) & 0xff)
      if (v % 37 == 0) addCut(i)
      i += 1
    }
    val chunks = new Array[AnyRef](nCuts)
    var j = 0
    while (j < nCuts) {
      val st = cutsBuf(j)
      val en = if (j + 1 < nCuts) cutsBuf(j + 1) else nChars + 1
      chunks(j) = UTF8String.fromBytes(
        bytes, charOff(st - 1), charOff(en - 1) - charOff(st - 1))
      j += 1
    }
    new GenericArrayData(chunks)
  }

  private[functions] val info = new ExpressionInfo(
    classOf[CdcChunks].getName, "cdc_chunks")

  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("cdc_chunks"),
      info, es => CdcChunks(es.head))
}
