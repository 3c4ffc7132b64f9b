package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared distance arithmetic for the nearest-centroid expressions: the
  * decimal-exact squared euclidean distance the k-means / PQ oracle
  * contract pins, replicated step for step —
  *
  *   round((a-b)^2, 12)                  Spark Round on double:
  *                                       BigDecimal.valueOf(x)
  *                                         .setScale(12, HALF_UP)
  *                                         .doubleValue
  *   CAST(... AS DECIMAL(38,12))         BigDecimal.valueOf(rounded)
  *                                         .setScale(12, HALF_UP)
  *   SUM(...)                            exact BigDecimal addition
  *
  * so a plan using these expressions is bit-identical to the exploded
  * `round(...).cast("decimal(38,12)")` + `sum` formulation (and to the
  * DuckDB oracles that unroll it), while evaluating as one tight JVM
  * loop per row instead of an interpreted higher-order-function tree or
  * a fan-out join + two shuffled aggregations. A NaN/Infinity term
  * throws, mirroring the ANSI double->decimal cast.
  */
object NearestMath {
  /** d2 between vec[offset, offset+cent.length) and cent — exact
    * DECIMAL(38,12) arithmetic as documented above. Called from
    * generated code.
    *
    * `stopAfter` (nullable) is argmin pruning: terms are non-negative,
    * so once the partial sum exceeds the current best the centroid can
    * never win and the loop exits with the partial (only valid for the
    * better/worse DECISION, not as a distance). Exactness is untouched:
    * pruning skips only candidates STRICTLY worse than the running best,
    * so exact-decimal ties still surface and resolve to the first
    * (lowest-id) entry.
    */
  def d2Range(
      vec: ArrayData, isFloat: Boolean, offset: Int,
      cent: Array[Double], stopAfter: JBigDecimal): JBigDecimal = {
    val n = math.min(cent.length, vec.numElements() - offset)
    var acc = JBigDecimal.ZERO.setScale(12)
    var i = 0
    while (i < n) {
      val a =
        if (isFloat) vec.getFloat(offset + i).toDouble
        else vec.getDouble(offset + i)
      val diff = a - cent(i)
      val sq = diff * diff
      if (java.lang.Double.isNaN(sq) || java.lang.Double.isInfinite(sq))
        throw new ArithmeticException(
          "graft nearest-centroid: non-finite squared-distance term " +
            "(mirrors the ANSI NaN/Infinity -> decimal cast failure)")
      val rounded = JBigDecimal.valueOf(sq)
        .setScale(12, RoundingMode.HALF_UP).doubleValue()
      acc = acc.add(
        JBigDecimal.valueOf(rounded).setScale(12, RoundingMode.HALF_UP))
      if (stopAfter != null && acc.compareTo(stopAfter) > 0) return acc
      i += 1
    }
    acc
  }

  private[expressions] def vecElemType(e: Expression): Option[DataType] =
    e.dataType match {
      case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
      case _ => None
    }
}

/** Nearest centroid of a literal codebook for a float/double vector
  * column: struct(cluster, d2 DECIMAL(38,12)), ties -> the FIRST entry
  * (callers pass `clusters` sorted ascending, making the tie rule
  * "lowest cluster id" — the min_by(struct(d2, cluster)) contract).
  * The codebook (k x dims doubles — metadata) is expression
  * configuration, shipped once per task via codegen references, and
  * every row argmins over it in one compiled loop: the 100 TB
  * assignment shape — zero shuffles, zero joins, a single scan.
  */
case class NearestCentroid(
    child: Expression,
    clusters: Array[Int],
    centroids: Array[Array[Double]])
  extends UnaryExpression {

  require(clusters.nonEmpty && clusters.length == centroids.length,
    "graft_nearest_centroid needs one cluster id per centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("d2", DecimalType(38, 12), nullable = false)))
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult =
    if (NearestMath.vecElemType(child).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid requires array<float|double>, got ${child.dataType}")

  private lazy val isFloat = NearestMath.vecElemType(child).contains(FloatType)

  protected override def nullSafeEval(v: Any): Any =
    NearestCentroid.nearest(
      v.asInstanceOf[ArrayData], isFloat, clusters, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cl = ctx.addReferenceObj("clusters", clusters, "int[]")
    val ce = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.NearestCentroid.nearest($v, $isFloat, $cl, $ce)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Called from generated code. Strict `<` keeps the first (= lowest
    * id) centroid on exact-decimal ties.
    */
  def nearest(
      vec: ArrayData, isFloat: Boolean, clusters: Array[Int],
      centroids: Array[Array[Double]]): InternalRow = {
    var best: JBigDecimal = null
    var bi = 0
    var c = 0
    while (c < centroids.length) {
      val d = NearestMath.d2Range(vec, isFloat, 0, centroids(c), best)
      if (best == null || d.compareTo(best) < 0) { best = d; bi = c }
      c += 1
    }
    InternalRow(clusters(bi), Decimal(scala.math.BigDecimal(best)))
  }
}

/** Per-subspace nearest-codeword ids (PQ encoding) for a float/double
  * vector column against a literal PQ codebook: array<int> in subspace
  * order, subvector `s` = vec[s*dsubLen, (s+1)*dsubLen), ties -> the
  * first entry of `codes(s)` (callers pass codes sorted ascending =
  * lowest code id). Same decimal discipline as [[NearestCentroid]];
  * one compiled loop per row replaces the exploded fan-out + two
  * aggregations per encode.
  */
case class PqCodesOf(
    child: Expression,
    codes: Array[Array[Int]],
    codebooks: Array[Array[Array[Double]]],
    dsubLen: Int)
  extends UnaryExpression {

  require(codes.nonEmpty && codes.length == codebooks.length &&
    codes.indices.forall(s => codes(s).nonEmpty &&
      codes(s).length == codebooks(s).length),
    "graft_pq_codes needs one code id per codeword in every subspace")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (NearestMath.vecElemType(child).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes requires array<float|double>, got ${child.dataType}")

  private lazy val isFloat = NearestMath.vecElemType(child).contains(FloatType)

  protected override def nullSafeEval(v: Any): Any =
    PqCodesOf.encode(
      v.asInstanceOf[ArrayData], isFloat, codes, codebooks, dsubLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("codes", codes, "int[][]")
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.PqCodesOf.encode($v, $isFloat, $co, $cb, $dsubLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesOf =
    copy(child = newChild)
}

object PqCodesOf {
  /** Called from generated code. */
  def encode(
      vec: ArrayData, isFloat: Boolean, codes: Array[Array[Int]],
      codebooks: Array[Array[Array[Double]]], dsubLen: Int): ArrayData = {
    val out = new Array[Int](codebooks.length)
    var s = 0
    while (s < codebooks.length) {
      val cws = codebooks(s)
      var best: JBigDecimal = null
      var bi = 0
      var c = 0
      while (c < cws.length) {
        val d = NearestMath.d2Range(vec, isFloat, s * dsubLen, cws(c), best)
        if (best == null || d.compareTo(best) < 0) { best = d; bi = c }
        c += 1
      }
      out(s) = codes(s)(bi)
      s += 1
    }
    new GenericArrayData(out)
  }
}
