package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document CHARACTER ENTROPY — the zero-shuffle twin of
  * the t43 explode→groupBy form: `struct(n_chars, n_distinct, entropy,
  * entropy_norm)` computed in-row, so at 100 TB the screen is a pure
  * projection instead of an alphabet×docs exchange.
  *
  * Arithmetic is pinned to t43's oracle-portable construction EXACTLY:
  * per character class, term = round(p·ln p, 12) with p = c/n one
  * double division; terms fold as exact BigDecimal (order-free — the
  * HashMap iteration order cannot matter), entropy = round(−Σ, 6),
  * entropy_norm = round(−Σ/ln(k), 6) for k > 1 else 0.0. Characters
  * are Unicode CODE POINTS (matching `split(text, "")`/DuckDB
  * `string_split_regex(text, '')` on this corpus's ASCII payloads).
  * The t46 query hash-matches this against t43's restated SQL — the
  * equivalence proof that the in-row kit computes the shuffled form.
  */
case class EntropyKit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = EntropyKit.schema
  override def prettyName: String = "graft_entropy_kit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_entropy_kit requires string, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    EntropyKit.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.EntropyKit.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): EntropyKit =
    copy(child = newChild)
}

object EntropyKit {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false),
    StructField("entropy_norm", DoubleType, nullable = false)))

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Called from generated code. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (x, y) => x + y)
      n += 1
      i += Character.charCount(cp)
    }
    val k = counts.size().toLong
    if (n == 0L) return InternalRow(0L, 0L, 0.0, 0.0)
    var sum = BigDecimal(0)
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      val p = c.toDouble / n.toDouble
      sum += BigDecimal(r(p * math.log(p), 12))
    }
    val sd = sum.toDouble
    val entropy = r(-sd, 6)
    val norm = if (k > 1) r(-sd / math.log(k.toDouble), 6) else 0.0
    InternalRow(n, k, entropy, norm)
  }
}
