package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking boundary scan — bit-identical to the
  * rolling-hash HOF formulation in [[graft.operators.TextOps.cdcChunksHof]]
  * (Rabin-Karp over per-character code points: seed = fold of the first
  * `window` chars via (acc*B + c) mod M, then h' = (h*B - c_out*B^w + c_in)
  * mod M; a boundary wherever h % avgChunk == 0, position `window`
  * included), but evaluated as one tight loop per document.
  *
  * The HOF shape costs O(len^2): `ascii(substring(text, i, 1))` re-seeks
  * the UTF-8 string from the start for every position, and the interpreted
  * `aggregate` adds closure dispatch plus a struct copy per character —
  * measured 69 s for the sf0.1 corpus vs ~1 s native. Output frame is
  * [0, boundaries..., len] (len omitted when it is already a boundary),
  * exactly the frame the chunk slicing consumes.
  */
case class CdcBoundaries(child: Expression, window: Int, avgChunk: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window > 0 && avgChunk > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_boundaries requires string and window/avgChunk > 0, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String], window, avgChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CdcBoundaries.boundaries($c, $window, $avgChunk)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  private val B = 257L
  private val M = 1000000007L

  /** Called from generated code. Character positions are CODE POINTS
    * (matching `ascii(substring(text, i, 1))`: one UTF-8 code point per
    * position, full code point value for non-BMP chars) and the modular
    * arithmetic replicates the HOF lambda exactly (no intermediate mod on
    * the h*B term; pmod on the rolling update).
    */
  def boundaries(text: UTF8String, window: Int, avgChunk: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val len = cps.length
    if (len < window) return ArrayData.toArrayData(Array(0, len))
    var bw = 1L
    var k = 0
    while (k < window) { bw = bw * B % M; k += 1 }
    val bs = scala.collection.mutable.ArrayBuffer[Int](0)
    var h = 0L
    var j = 0
    while (j < window) { h = (h * B + cps(j)) % M; j += 1 }
    if (h % avgChunk == 0) bs += window
    var i = window + 1 // 1-based position of the incoming char
    while (i <= len) {
      h = java.lang.Math.floorMod(h * B - cps(i - window - 1) * bw + cps(i - 1), M)
      if (h % avgChunk == 0) bs += i
      i += 1
    }
    if (bs.last != len) bs += len
    ArrayData.toArrayData(bs.toArray)
  }
}
