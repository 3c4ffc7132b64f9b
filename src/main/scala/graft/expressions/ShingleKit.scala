package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native integer 3-shingle hashes of a token array — bit-identical to the
  * higher-order-function formulation in [[graft.operators.TextOps
  * .hashedShingles3]] (one md5 per token via [[Md5Hash64]], then the
  * rolling combine ((h1*B + h2) mod M * B + h3) mod M), but evaluated as a
  * single tight loop inside whole-stage codegen. The HOF `aggregate`
  * evaluates interpreted with per-element closure dispatch and a growing
  * array-copy per step (O(tokens^2) allocation per document) — measured
  * ~25x slower on the corpus tables. At 100 TB this expression runs once
  * per document per dedup pass, so it is the hot loop of the whole
  * MinHash/Jaccard family.
  *
  * Semantics (reference: corpus shingling for near-dup detection, SURVEY.md
  * §2 training-data extensions): tokens below 3 yield an empty array;
  * shingle i hashes tokens (i, i+1, i+2).
  */
case class HashedShingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles3 requires array<string>, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashedShingles3.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashedShingles3.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles3 =
    copy(child = newChild)
}

object HashedShingles3 {
  import graft.operators.TextOps.{ShingleMod => M, ShingleMul => B}

  /** Called from generated code. Iteration order and modular arithmetic
    * must stay bit-identical to the HOF fold (and the DuckDB oracle SQL
    * that restates it) — determinism contracts depend on it.
    *
    * Null ELEMENTS (legal for any SQL caller — the type check accepts
    * array<string> regardless of containsNull) are skipped, i.e. the
    * array is shingled as if nulls were filtered out first; the output
    * therefore honors the declared containsNull=false.
    */
  def shingles(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](math.max(0, n - 2))
    var p1 = -1L
    var p2 = -1L
    var i = 0
    var j = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = Md5Hash64.hash(toks.getUTF8String(i)) % M
        if (p1 >= 0) {
          out(j) = ((p1 * B + p2) % M * B + h) % M
          j += 1
        }
        p1 = p2
        p2 = h
      }
      i += 1
    }
    ArrayData.toArrayData(if (j == out.length) out else out.take(j))
  }
}

/** Native MinHash signature over pre-hashed shingles — bit-identical to the
  * single-fold HOF formulation in [[graft.operators.TextOps
  * .minhashSignature]] (permutation p is the affine map
  * ((2p+3)*(x mod P) + 7p+1) mod P over the Mersenne prime P = 2^31-1;
  * empty input yields the P sentinel in every slot), but looping natively
  * in codegen instead of re-building a numPerm-wide struct array per
  * element.
  */
case class MinhashSig(child: Expression, numPerm: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerm > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<bigint> and numPerm > 0, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    MinhashSig.signature(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinhashSig.signature($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  import graft.operators.TextOps.{MinhashPrime => P}

  /** Called from generated code. Null elements are skipped (a getLong on
    * a null slot would read garbage); see [[HashedShingles3.shingles]].
    */
  def signature(shingles: ArrayData, numPerm: Int): ArrayData = {
    val out = Array.fill(numPerm)(P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val x = shingles.getLong(i) % P
        var p = 0
        while (p < numPerm) {
          val v = ((2L * p + 3L) * x + (7L * p + 1L)) % P
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
