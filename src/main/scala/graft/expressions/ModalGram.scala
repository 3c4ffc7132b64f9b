package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Modal element of a string array: `struct(gram, cnt)` of the most
  * frequent element, ties to the LEXICOGRAPHICALLY SMALLEST (binary
  * UTF-8 order, which for the corpus alphabet equals SQL string order).
  * Empty array -> ("", 0).
  *
  * This is the per-document statistic behind the repetition signals
  * (modal token / modal bigram share). A groupBy formulation shuffles
  * (doc, gram) pairs corpus-wide to compute a PER-ROW quantity — this
  * expression is one hashmap pass per row inside the scan stage, zero
  * exchanges (measured 6.7 s -> sub-second for t13 at sf0.1). The
  * equivalence-tested twin is the explode/groupBy formulation in
  * TextOpsSpec.
  */
case class ModalGram(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  override def prettyName: String = "graft_modal_gram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_modal_gram requires array<string>, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    ModalGram.modal(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ModalGram.modal($c)")

  override protected def withNewChildInternal(newChild: Expression): ModalGram =
    copy(child = newChild)
}

object ModalGram {
  /** Called from generated code. One hashmap pass; null elements are
    * skipped (split() never produces them, but an explicit array might).
    */
  def modal(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = arr.getUTF8String(i)
        counts.merge(g, 1L, (a, b) => a + b)
      }
      i += 1
    }
    var bestG: UTF8String = UTF8String.EMPTY_UTF8
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && bestC > 0 && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey
        bestC = c
      }
    }
    // copy: the UTF8String may point into reusable row memory
    InternalRow(bestG.clone(), bestC)
  }
}
