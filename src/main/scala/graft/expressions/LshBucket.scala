package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-LSH bucket id over `numPlanes` deterministic integer
  * hyperplanes: bit p is set iff the index-order left-fold dot of the
  * vector with plane p is > 0, with plane weight
  * `(p*37 + i*17) % 19 - 9` (i 0-based) — bit-identical to the
  * `aggregate(sequence(...), 0L, (acc, p) => acc + when(dot > 0, 2^p))`
  * higher-order formulation ([[graft.operators.SimilarityOps.lshBucketHof]],
  * the equivalence-tested twin), but evaluated as one tight
  * O(numPlanes * dims) loop inside whole-stage codegen. The HOF evaluates
  * interpreted with per-element closure dispatch AND re-evaluates the
  * vector subtree per lambda element — the exact pattern measured ~10x
  * slower on [[DotFold]].
  *
  * This is the bucket assignment of the designated ANN scale path (every
  * vector, every ingest batch), so the constant factor is the point.
  * Null array -> null; a null ELEMENT poisons every plane's dot (null
  * semantics of the HOF's `+`), so any-null-element -> bucket 0, same as
  * the twin.
  */
case class LshBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lshbucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if numPlanes > 0 && numPlanes < 63 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lshbucket requires array<float|double> and 0 < numPlanes < 63, " +
        s"got $t, numPlanes=$numPlanes")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(input: Any): Any =
    LshBucket.bucket(input.asInstanceOf[ArrayData], isFloat, numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshBucket.bucket($c, $isFloat, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Called from generated code. The inner dot is a strict index-order
    * left fold in double — keep the order; the twin equivalence (and any
    * cross-engine oracle) depends on the exact bits.
    */
  def bucket(v: ArrayData, isFloat: Boolean, numPlanes: Int): Long = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var acc = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * ((p * 37 + j * 17) % 19 - 9)
        j += 1
      }
      // Double.compare, not `>`: Spark SQL's GreaterThan (and DuckDB's)
      // order NaN above every double, so a NaN dot SETS the bit in the
      // HOF twin and the SQL oracle — plain Java `NaN > 0` is false and
      // would silently break the bit-identical-twin invariant.
      if (java.lang.Double.compare(dot, 0.0) > 0) acc += (1L << p)
      p += 1
    }
    acc
  }
}
