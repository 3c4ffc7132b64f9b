package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine trainable linear classifiers — the quality-filter family:
  * a fastText-style doc-quality gate is, at its core, a logistic
  * regression over cheap per-row features, and training one INSIDE the
  * engine (instead of exporting to a Python sidecar) keeps the whole
  * curation chain one lineage. The reference has no model training;
  * this extends the training-data surface the same way kmeansFit does
  * for vector indexing (same driver-loop + decimal-sum conventions,
  * `operators/SimilarityOps.scala`).
  *
  * Determinism contract (the a17/c5/kmeansFit discipline): every
  * per-row gradient term rounds to 9 dp and sums as decimal(38,9) —
  * order-independent, so any partitioning and any SQL engine reproduce
  * the identical weight trajectory; weights themselves round to 9 dp
  * after each update so the trajectory is representable exactly on
  * both sides.
  *
  * Scale shape: one full scan per iteration (partial-aggregated sums,
  * no shuffle beyond the 1-row agg), weights are O(features) driver
  * metadata — the Lloyd's shape. Feature count is assumed small
  * (quality signals, not hashed vocab); a web-scale corpus costs
  * iters × one map-reduce pass, nothing is per-corpus on the driver.
  */
object ClassifierOps {

  /** Full-batch gradient descent for L2-free logistic regression.
    *
    * @param df       training frame
    * @param features raw feature columns (caller pre-scales them into
    *                 O(1) range — GD on unscaled features diverges)
    * @param label    0/1 (or boolean) target column
    * @param iters    gradient steps (full passes over df)
    * @param lr       learning rate
    * @return weights, bias first then one per feature, each rounded
    *         to 9 dp
    */
  def logisticFit(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      iters: Int,
      lr: Double): Seq[Double] = {
    require(features.nonEmpty, "at least one feature")
    require(iters > 0 && lr > 0, "iters and lr must be positive")
    val xs = lit(1.0) +: features.map(_.cast("double"))
    val y = label.cast("int").cast("double")
    var w = Seq.fill(xs.size)(0.0)
    var i = 0
    while (i < iters) {
      val z = xs.zip(w).map { case (x, wi) => x * lit(wi) }.reduce(_ + _)
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - y
      val aggs = xs.zipWithIndex.map { case (x, j) =>
        sum(round(err * x, 9).cast("decimal(38,9)")).as(s"g$j")
      } :+ count(lit(1)).as("n")
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getLong(xs.size).toDouble
      w = w.zipWithIndex.map { case (wi, j) =>
        // g first, then lr·g — the exact FP order the SQL restatement
        // (0.5 * (CAST(sum AS DOUBLE) / count)) uses
        val g = row.getDecimal(j).doubleValue() / n
        BigDecimal(wi - lr * g)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      i += 1
    }
    w
  }

  /** The sigmoid score for a trained weight vector (bias first), as a
    * column — map-side, codegen, no shuffle.
    */
  def logisticScore(features: Seq[Column], weights: Seq[Double]): Column = {
    require(weights.size == features.size + 1,
      s"${features.size} features need ${features.size + 1} weights " +
        s"(bias first), got ${weights.size}")
    val z = (lit(1.0) +: features.map(_.cast("double"))).zip(weights)
      .map { case (x, wi) => x * lit(wi) }.reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Reliability diagram + Expected Calibration Error for a scored
    * frame — the audit that must pass BEFORE a classifier score is
    * used as a filter threshold (a quality gate cut at p≥0.9 keeps
    * the wrong documents if 0.9 really means 60% precision; ECE is
    * the standard one-number summary of that miscalibration).
    *
    * Semantics: scores bin into `bins` equal-width buckets over
    * [0,1] (the top edge folds into the last bin); per bin —
    * n, confidence = mean score, accuracy = mean label, gap =
    * |conf − acc|; ece = Σ (n_b/N)·gap_b, repeated on every row so
    * the frame is self-contained.
    *
    * Numeric discipline: the caller passes an ALREADY-ROUNDED score
    * (≤6 dp — t26's output convention), so the per-bin score sum is
    * EXACT as decimal(38,6) and the label sum is a BIGINT; conf/acc
    * are each ONE double division rounded 6 dp, the gap subtracts
    * two 6-dp values (within 1 ulp of a 6-dp point — never near a
    * rounding midpoint), and ece folds round(n·gap, 6) decimals with
    * one final division. One exchange on the bin id (B≈10 groups —
    * partial-aggregated, skew-free by construction); the 1-row ECE
    * total broadcasts back.
    */
  def calibrationBins(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in 2..1000, got $bins")
    val s = score.cast("double")
    val perBin = df
      .select(
        // a score outside [0, 1] is not a calibrated probability — it
        // would silently saturate into an edge bin and bias the ECE
        // weighting (ADVICE r15). The assert rides the bin expression
        // itself as the FIRST coalesce branch (binary arithmetic
        // codegen short-circuits a null operand; see DedupOps' __key):
        // pass -> null -> fall through to the real bin; fail -> throw.
        // Null scores pass through as a null bin, exactly as before.
        // The edge clamp stays: floor(1.0 * bins) needs bins-1, and a
        // score within 1 ulp of an edge must not mint bin -1/bins.
        coalesce(
          assert_true(s.isNull || (s >= 0.0 && s <= 1.0),
            lit(s"calibrationBins: score outside [0, 1] is not a " +
              "calibrated probability")).cast("int"),
          greatest(
            least(floor(s * lit(bins.toDouble)).cast("int"), lit(bins - 1)),
            lit(0))).as("bin"),
        s.as("__s"),
        label.cast("int").cast("bigint").as("__y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__s").cast("decimal(38,6)")).as("__ss"),
        sum(col("__y")).as("__sy"))
      .select(col("bin"), col("n"),
        round(col("__ss").cast("double") / col("n").cast("double"), 6)
          .as("conf"),
        round(col("__sy").cast("double") / col("n").cast("double"), 6)
          .as("acc"))
      .withColumn("gap", round(abs(col("conf") - col("acc")), 6))
    val total = perBin.agg(
      round(
        sum(round(col("gap") * col("n").cast("double"), 6)
          .cast("decimal(38,6)")).cast("double") /
          sum(col("n")).cast("double"), 9).as("ece"))
    perBin.crossJoin(broadcast(total)).orderBy(col("bin"))
  }
}
