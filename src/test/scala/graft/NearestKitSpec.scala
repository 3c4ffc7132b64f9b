package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** The native argmin expressions (NearestCentroid / PqCodesOf) against
  * an independent driver-side replication of their documented decimal
  * contract: round((a-b)^2, 12) -> DECIMAL(38,12) -> exact sum, strict
  * argmin, ties to the lowest id. The codegen path (DataFrame eval) and
  * the interpreted entry points must both match it — and the argmin
  * PRUNING (early exit once the partial sum exceeds the running best)
  * must be invisible in results.
  */
class NearestKitSpec extends SparkSpec {
  import spark.implicits._

  private def d2Ref(v: Array[Double], c: Array[Double]): JBigDecimal = {
    var acc = JBigDecimal.ZERO.setScale(12)
    for (i <- c.indices) {
      val sq = (v(i) - c(i)) * (v(i) - c(i))
      val r = JBigDecimal.valueOf(sq).setScale(12, RoundingMode.HALF_UP)
        .doubleValue()
      acc = acc.add(JBigDecimal.valueOf(r).setScale(12, RoundingMode.HALF_UP))
    }
    acc
  }

  private def argminRef(
      v: Array[Double], cents: Seq[(Int, Array[Double])]): Int = {
    // no pruning here — the straightforward full-sum argmin
    val sorted = cents.sortBy(_._1)
    var best: JBigDecimal = null
    var bi = 0
    for (((_, c), i) <- sorted.zipWithIndex) {
      val d = d2Ref(v, c)
      if (best == null || d.compareTo(best) < 0) { best = d; bi = i }
    }
    sorted(bi)._1
  }

  // deterministic pseudo-random vectors (no Math.random in specs either)
  private def vec(seed: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(i => math.sin(seed * 31 + i * 7) * 10)

  test("NearestCentroid == unpruned decimal-exact reference, double and " +
    "float inputs, 40 vectors x 8 centroids") {
    val cents = (0 until 8).map(c => (c, vec(c + 100, 16)))
    val rows = (0 until 40).map(i => (i.toLong, vec(i, 16)))
    val expect = rows.map { case (id, v) => id -> argminRef(v, cents) }.toMap

    val gotD = SimilarityOps.assignNearest(
      rows.toDF("id", "v"), "id", "v", cents)
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    assert(gotD === expect)

    val gotF = SimilarityOps.assignNearest(
      rows.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("id", "v"),
      "id", "v", cents.map { case (c, a) => (c, a.map(_.toFloat.toDouble)) })
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    val expectF = rows.map { case (id, v) =>
      id -> argminRef(v.map(_.toFloat.toDouble),
        cents.map { case (c, a) => (c, a.map(_.toFloat.toDouble)) })
    }.toMap
    assert(gotF === expectF)
  }

  test("exact-decimal ties resolve to the LOWEST cluster id, with the " +
    "duplicate centroid listed last") {
    val c = vec(7, 8)
    // clusters 5 and 2 share one centroid; 9 is far away
    val cents = Seq((5, c), (2, c), (9, c.map(_ + 100.0)))
    val got = SimilarityOps.assignNearest(
      Seq((1L, c)).toDF("id", "v"), "id", "v", cents)
      .select($"cluster").as[Int].head()
    assert(got === 2)
  }

  test("interpreted eval (nearest/encode entry points) agrees with the " +
    "codegen path") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cents = (0 until 5).map(c => (c, vec(c + 50, 12)))
    val sorted = cents.sortBy(_._1)
    for (i <- 0 until 20) {
      val v = vec(i + 1000, 12)
      val row = graft.expressions.NearestCentroid.nearest(
        new GenericArrayData(v), false,
        sorted.map(_._1).toArray, sorted.map(_._2).toArray)
      assert(row.getInt(0) === argminRef(v, cents), s"vector $i")
    }
  }

  test("NearestCentroidGrouped (two-level tree) == flat NearestCentroid " +
    "cell-for-cell, on clustered, uniform, tied, and boundary vectors") {
    val dims = 16
    // 120 centroids in 10 tight clusters (pruning actually fires) plus
    // 8 scattered ones; cluster ids shuffled so ascending-id != grouped
    val clustered = for {
      g <- 0 until 10; j <- 0 until 12
    } yield vec(g + 300, dims).zip(vec(g * 12 + j + 700, dims))
      .map { case (base, nudge) => base + nudge * 0.01 }
    val scattered = (0 until 8).map(i => vec(i + 900, dims))
    val allCents = (clustered ++ scattered).zipWithIndex
      .map { case (c, i) => ((i * 37) % 128, c.toArray) } // permuted ids
    assert(allCents.map(_._1).distinct.length === allCents.length)
    // probes: near cluster centers, between clusters (boundary — the
    // case where a lazily-pruned group could hide the true argmin),
    // far outside, and EXACTLY on a centroid (tie with itself)
    val probes =
      (0 until 40).map(i => vec(i + 1500, dims)) ++
        (0 until 10).map(g => vec(g + 300, dims)) ++
        clustered.take(5).map(_.toArray) ++
        Seq(vec(301, dims).zip(vec(302, dims)).map { case (a, b) => (a + b) / 2 })
    val df = probes.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val flat = df.select($"id",
      SimilarityOps.nearestExprFlat($"v", allCents).as("m"))
      .select($"id", $"m.cluster", $"m.d2".cast("string"))
      .as[(Long, Int, String)].collect().sortBy(_._1)
    val tree = df.select($"id",
      SimilarityOps.nearestExprTree($"v", allCents).as("m"))
      .select($"id", $"m.cluster", $"m.d2".cast("string"))
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(tree === flat,
      "tree assignment must equal the flat argmin bit-for-bit " +
        "(cell AND exact decimal distance)")
    // duplicate-centroid tie across DIFFERENT tree groups still lands
    // the lowest cluster id
    val c0 = vec(42, dims)
    val tied = (0 until 80).map(i => (i + 1, vec(i + 2500, dims))) ++
      Seq((90, c0), (85, c0)) // same point, ids out of order
    val got = df.limit(1).select(
      SimilarityOps.nearestExprTree(typedlit(c0), tied).as("m"))
      .select($"m.cluster").as[Int].head()
    assert(got === 85)
  }

  test("NearestCentroidGrouped3 (three-level tree) == flat argmin " +
    "bit-for-bit on clustered, uniform, tied, and boundary vectors; " +
    "adaptive routing (sampled flat fallback) changes nothing") {
    val dims = 16
    // 120 clustered + 8 scattered centroids, permuted ids — the same
    // adversarial codebook as the 2-level parity test
    val clustered = for {
      g <- 0 until 10; j <- 0 until 12
    } yield vec(g + 300, dims).zip(vec(g * 12 + j + 700, dims))
      .map { case (base, nudge) => base + nudge * 0.01 }
    val scattered = (0 until 8).map(i => vec(i + 900, dims))
    val allCents = (clustered ++ scattered).zipWithIndex
      .map { case (c, i) => ((i * 37) % 128, c.toArray) }
    val probes =
      (0 until 40).map(i => vec(i + 1500, dims)) ++
        (0 until 10).map(g => vec(g + 300, dims)) ++
        clustered.take(5).map(_.toArray) ++
        Seq(vec(301, dims).zip(vec(302, dims)).map { case (a, b) => (a + b) / 2 })
    val df = probes.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    def run(c: org.apache.spark.sql.Column) =
      df.select($"id", c.as("m"))
        .select($"id", $"m.cluster", $"m.d2".cast("string"))
        .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    val flat = run(SimilarityOps.nearestExprFlat($"v", allCents))
    assert(run(SimilarityOps.nearestExprTree3($"v", allCents)) === flat,
      "3-level assignment must equal the flat argmin bit-for-bit")
    // adaptive routing decided mid-stream: sampleRows smaller than the
    // probe count forces a decision; uniform random probes against this
    // codebook exercise both verdicts across tasks — results must not
    // move either way
    assert(run(SimilarityOps.nearestExprTree($"v", allCents,
      adaptiveRouting = true)) === flat)
    assert(run(SimilarityOps.nearestExprTree($"v", allCents,
      adaptiveRouting = false)) === flat)
    // duplicate-centroid tie across different 3-level branches still
    // lands the lowest cluster id
    val c0 = vec(42, dims)
    val tied = (0 until 80).map(i => (i + 1, vec(i + 2500, dims))) ++
      Seq((90, c0), (85, c0))
    val got = df.limit(1).select(
      SimilarityOps.nearestExprTree3(typedlit(c0), tied).as("m"))
      .select($"m.cluster").as[Int].head()
    assert(got === 85)
  }

  test("TreeRouting decides flat on a dead screen and stays on the tree " +
    "when bounds separate; both only after the sample") {
    val r = new graft.expressions.TreeRouting(sampleRows = 10,
      minSkipFrac = 0.5)
    for (_ <- 0 until 9) { r.record(0, 8); assert(!r.useFlat && r.sampling) }
    r.record(0, 8) // 10th row: 0/80 skipped < 0.5 -> flat
    assert(r.useFlat && !r.sampling)
    val keep = new graft.expressions.TreeRouting(10, 0.5)
    for (_ <- 0 until 10) keep.record(7, 8) // 70/80 skipped >= 0.5
    assert(!keep.useFlat && !keep.sampling)
  }

  test("a non-finite CANDIDATE throws the ANSI-cast error even when the " +
    "double minimum is finite (screening must not skip the throw — " +
    "ADVICE r16), flat / grouped / PQ forms alike") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val dims = 8
    val good = (0 until 3).map(c => (c, vec(c + 10, dims)))
    val poisoned = good :+ (3, Array.fill(dims)(Double.NaN))
    val v = new GenericArrayData(vec(1, dims))
    val sorted = poisoned.sortBy(_._1)
    // flat: the NaN centroid's double distance is NaN while the minimum
    // is finite — pre-fix it was screened out silently
    val eFlat = intercept[ArithmeticException] {
      graft.expressions.NearestCentroid.nearest(v, false,
        sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    }
    assert(eFlat.getMessage.contains("non-finite"))
    // grouped: same contract through the tree (poison in one group, the
    // probe nearest a clean group)
    val manyCents = (0 until 70).map(c => (c, vec(c + 10, dims))) :+
      (70, Array.fill(dims)(Double.NaN))
    intercept[Exception] {
      spark.range(1).select(
        SimilarityOps.nearestExprTree(typedlit(vec(1, dims)), manyCents))
        .collect()
    }
    // PQ: poison one subspace's codeword; the other codewords stay finite
    val cbRows = (for {
      s <- 0 until 2; code <- 0 until 3; d <- 0 until 4
    } yield (s, code, d, vec(s * 10 + code, 4)(d))) ++
      (0 until 4).map(d => (1, 3, d, Double.NaN))
    intercept[Exception] {
      SimilarityOps.pqEncode(
        Seq((1L, vec(5, 8))).toDF("id", "v"), "id", "v", cbRows).collect()
    }
    // an Inf-OVERFLOW distance whose TERMS are finite must NOT throw:
    // per-term (1e150)^2 = 1e300 is a finite double, but the plain-
    // double SUM of 8 of them overflows to Inf — the decimal contract
    // sums them exactly, so the fallback runs the full loop and returns
    // the clean argmin instead of throwing
    val okHuge = (0 until 3).map(c => (c, vec(c, dims))) :+
      (3, Array.fill(dims)(1e150))
    val rowHuge = graft.expressions.NearestCentroid.nearest(
      new GenericArrayData(vec(1, dims)), false,
      okHuge.map(_._1).toArray, okHuge.map(_._2).toArray)
    assert(rowHuge.getInt(0) === argminRef(vec(1, dims), okHuge))
  }

  test("PqCodesOf slices subspaces correctly: each code is the " +
    "per-subspace reference argmin (pruning invisible)") {
    val dims = 12
    val numSub = 3
    val dsub = dims / numSub
    // codebook rows (sub, code, dsub, c)
    val cbRows = for {
      s <- 0 until numSub; code <- 0 until 4; d <- 0 until dsub
    } yield (s, code, d, vec(s * 10 + code, dsub)(d))
    val rows = (0 until 30).map(i => (i.toLong, vec(i + 2000, dims)))
    val got = SimilarityOps.pqEncode(
      rows.toDF("id", "v"), "id", "v", cbRows)
      .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val expect = rows.map { case (id, v) =>
      id -> (0 until numSub).map { s =>
        val sub = v.slice(s * dsub, (s + 1) * dsub)
        argminRef(sub, (0 until 4).map(c => (c, vec(s * 10 + c, dsub))))
      }
    }.toMap
    assert(got.view.mapValues(_.toList).toMap ===
      expect.view.mapValues(_.toList).toMap)
  }

  test("parallel buildCellTree == an independent serial Lloyd's oracle, " +
    "array for array, above the parallel-path threshold — and " +
    "run-to-run deterministic (VERDICT r18 item 1)") {
    // k*g = 4096*64 = 262144 > the 65536 work floor, so this exercises
    // the PARALLEL argmin; the oracle below is a straight serial
    // re-statement of the documented algorithm (init = first g
    // centroids, fixed 8 rounds, ties to the lowest group, empty
    // groups keep their centroid and are dropped at the end). Equality
    // is exact — the parallel form writes per-index slots and
    // accumulates means sequentially, so no float reorder exists.
    val k = 4096; val dims = 8
    val cents = Array.tabulate(k)(i =>
      Array.tabulate(dims)(d => math.sin(i * 13.0 + d * 7.0) * 5.0))
    def serialOracle(cs: Array[Array[Double]])
        : (Array[Array[Double]], Array[Double], Array[Array[Int]]) = {
      val n = cs.length
      val g = math.ceil(math.sqrt(n.toDouble)).toInt
      def d2(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      var gc = Array.tabulate(math.min(g, n))(i => cs(i).clone())
      val assign = new Array[Int](n)
      for (_ <- 0 until 8) {
        for (i <- 0 until n)
          assign(i) = gc.indices.minBy(j => (d2(cs(i), gc(j)), j))
        val sums = Array.fill(gc.length)(new Array[Double](dims))
        val ns = new Array[Int](gc.length)
        for (i <- 0 until n) {
          for (d <- 0 until dims) sums(assign(i))(d) += cs(i)(d)
          ns(assign(i)) += 1
        }
        gc = Array.tabulate(gc.length)(j =>
          if (ns(j) == 0) gc(j) else sums(j).map(_ / ns(j)))
      }
      for (i <- 0 until n)
        assign(i) = gc.indices.minBy(j => (d2(cs(i), gc(j)), j))
      val kept = gc.indices.map(j =>
        (j, (0 until n).filter(assign(_) == j).toArray))
        .filter(_._2.nonEmpty)
      (kept.map(p => gc(p._1)).toArray,
        kept.map { case (j, ch) =>
          ch.map(ci => math.sqrt(d2(gc(j), cs(ci)))).max }.toArray,
        kept.map(_._2).toArray)
    }
    val (egc, er, ech) = serialOracle(cents)
    val (gc1, r1, ch1) = SimilarityOps.buildCellTree(cents)
    assert(gc1.map(_.toSeq).toSeq === egc.map(_.toSeq).toSeq,
      "group centroids must match the serial oracle exactly")
    assert(r1.toSeq === er.toSeq, "radii must match exactly")
    assert(ch1.map(_.toSeq).toSeq === ech.map(_.toSeq).toSeq,
      "children lists must match exactly")
    // run-to-run: a second build over the same input is identical
    // (parallel execution order must never leak into the tree)
    val (gc2, r2, ch2) = SimilarityOps.buildCellTree(cents)
    assert(gc2.map(_.toSeq).toSeq === gc1.map(_.toSeq).toSeq &&
      r2.toSeq === r1.toSeq &&
      ch2.map(_.toSeq).toSeq === ch1.map(_.toSeq).toSeq)
  }

  test("sampled-trainer buildCellTree (k > TreeBuildSampleMax) still " +
    "yields a valid disjoint radius-covering partition, " +
    "deterministically — grouping quality is pruning-only") {
    val k = SimilarityOps.TreeBuildSampleMax + 20000
    val cents = Array.tabulate(k)(i =>
      Array(math.sin(i * 13.0) * 5.0, math.cos(i * 7.0) * 5.0))
    val (gc, r, ch) = SimilarityOps.buildCellTree(cents)
    // disjoint cover: every cell index appears exactly once
    val flat = ch.flatten
    assert(flat.length === k && flat.toSet.size === k,
      "children lists must partition all k cells")
    // radii cover: each member sits within its group's radius (the
    // exactness of the tree's bound logic rests on this alone)
    for (gi <- gc.indices; ci <- ch(gi)) {
      val d = math.sqrt(gc(gi).zip(cents(ci))
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d <= r(gi) + 1e-9, s"member $ci outside group $gi radius")
    }
    // children ascend within each group (the documented contract)
    ch.foreach(c => assert(c.toSeq === c.sorted.toSeq))
    // deterministic run to run
    val (gc2, r2, ch2) = SimilarityOps.buildCellTree(cents)
    assert(gc2.map(_.toSeq).toSeq === gc.map(_.toSeq).toSeq &&
      r2.toSeq === r.toSeq &&
      ch2.map(_.toSeq).toSeq === ch.map(_.toSeq).toSeq)
  }
}
