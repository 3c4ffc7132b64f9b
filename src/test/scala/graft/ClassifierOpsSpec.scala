package graft

import graft.operators.ClassifierOps
import org.apache.spark.sql.functions._

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  test("logisticFit: hand-checked trajectory on a symmetric pair, " +
    "9 dp weight rounding applied each step") {
    // rows (x=1, y=1) and (x=-1, y=0); lr=1.
    // step 1: p=0.5 both -> grad = (0, -0.5), w = (0, 0.5)
    // step 2: p = sigma(+-0.5) -> per-row term rounds to -+0.377540669,
    //         grad_x = -0.377540669, w_x = 0.877540669
    val df = Seq((1.0, 1), (-1.0, 0)).toDF("x", "y")
    val w1 = ClassifierOps.logisticFit(df, Seq(col("x")), col("y"), 1, 1.0)
    assert(w1 === Seq(0.0, 0.5))
    val w2 = ClassifierOps.logisticFit(df, Seq(col("x")), col("y"), 2, 1.0)
    assert(w2 === Seq(0.0, 0.877540669))
  }

  test("logisticFit separates separable data; logisticScore is the " +
    "sigmoid of the learned margin and rejects wrong arity") {
    val df = (1 to 40).map(i =>
      (i.toLong, i / 40.0, if (i > 20) 1 else 0)).toDF("id", "x", "y")
    val w = ClassifierOps.logisticFit(df, Seq(col("x")), col("y"), 25, 2.0)
    val scored = df.select(col("y"),
      ClassifierOps.logisticScore(Seq(col("x")), w).as("p"))
      .as[(Int, Double)].collect()
    // every score is a probability and accuracy beats the 50% base rate
    assert(scored.forall { case (_, p) => p > 0.0 && p < 1.0 })
    val acc = scored.count { case (y, p) => (p >= 0.5) == (y == 1) } / 40.0
    assert(acc >= 0.8, s"accuracy $acc")
    intercept[IllegalArgumentException] {
      ClassifierOps.logisticScore(Seq(col("x")), Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      ClassifierOps.logisticFit(df, Seq.empty, col("y"), 1, 1.0)
    }
  }

  test("calibrationBins: perfectly calibrated bins gap≈0, a confident-" +
    "but-wrong bin carries its full gap into ECE, score=1.0 folds into " +
    "the top bin, bins guard") {
    // bin 1 (scores ~0.15): 20 rows, 3 positive -> conf 0.15, acc 0.15
    // bin 9 (score 0.95 + one 1.0): 10 rows, 0 positive -> gap ~0.955
    val rows =
      (0 until 20).map(i => (0.15, i < 3)) ++
      (0 until 9).map(_ => (0.95, false)) :+ ((1.0, false))
    val df = rows.toDF("score", "y")
    val out = ClassifierOps.calibrationBins(df, col("score"), col("y"), 10)
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1, 9), "two occupied bins, 1.0 " +
      "folded into bin 9")
    val byBin = out.map(r => r._1 -> r).toMap
    assert(byBin(1)._2 === 20L)
    assert(byBin(1)._3 === 0.15 && byBin(1)._4 === 0.15)
    assert(byBin(1)._5 === 0.0)
    assert(byBin(9)._2 === 10L)
    assert(byBin(9)._3 === 0.955 && byBin(9)._4 === 0.0)
    assert(byBin(9)._5 === 0.955)
    // ece = (20*0 + 10*0.955) / 30
    assert(math.abs(out.head._6 - 9.55 / 30.0) < 1e-6, out.head._6.toString)
    assert(out.map(_._6).distinct.size === 1, "ece repeated on every row")
    intercept[IllegalArgumentException] {
      ClassifierOps.calibrationBins(df, col("score"), col("y"), 1)
    }
  }
}
