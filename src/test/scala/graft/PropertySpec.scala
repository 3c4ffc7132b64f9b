package graft

import graft.operators.{IntensityOps, SimilarityOps, TimeSeriesOps}
import graft.operators.IntensityOps.IntensityPoint
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5d). ScalaCheck drives the pure
  * fold directly (cheap, many samples) and Spark-evaluated operators with
  * a reduced sample count.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, samples: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- validateOrdered: pure sequential fold, heavily sampled ----

  private val pointsGen: Gen[List[IntensityPoint]] = for {
    n <- Gen.choose(0, 40)
    vals <- Gen.listOfN(n, Gen.choose(50.0, 200.0))
    gaps <- Gen.listOfN(n, Gen.choose(600L, 30 * 3600L))
  } yield {
    val times = gaps.scanLeft(1704067200000L)((t, g) => t + g * 1000).tail
    times.zip(vals).map { case (t, v) =>
      IntensityPoint(1, new java.sql.Timestamp(t), v)
    }
  }

  test("validate: first point valid; flags binary; valid points in band") {
    check(Prop.forAll(pointsGen) { pts =>
      val (out, _) = IntensityOps.validateOrdered(pts.iterator, None, 0.2, 24 * 3600)
      val firstOk = pts.isEmpty || out.head.bad_data_flag == 0
      val binary = out.forall(p => p.bad_data_flag == 0 || p.bad_data_flag == 1)
      // replay: every flagged point really does drift vs the last valid
      var lastValid: Option[(Long, Double)] = None
      val consistent = out.forall { p =>
        val expectInvalid = lastValid.exists { case (t, v) =>
          (p.time.getTime - t) <= 24 * 3600 * 1000L &&
            (p.intensity < 0.8 * v || p.intensity > 1.2 * v)
        }
        if (!expectInvalid) lastValid = Some((p.time.getTime, p.intensity))
        (p.bad_data_flag == 1) == expectInvalid
      }
      firstOk && binary && consistent
    })
  }

  test("validate: state carry equals one-shot run (batch-split invariance)") {
    check(Prop.forAll(pointsGen, Gen.choose(0, 40)) { (pts, splitAt) =>
      val k = math.min(splitAt, pts.length)
      val (a, b) = pts.splitAt(k)
      val (outWhole, _) = IntensityOps.validateOrdered(pts.iterator, None, 0.2, 24 * 3600)
      val (outA, st) = IntensityOps.validateOrdered(a.iterator, None, 0.2, 24 * 3600)
      val (outB, _) = IntensityOps.validateOrdered(b.iterator, st, 0.2, 24 * 3600)
      outWhole == outA ++ outB
    })
  }

  // ---- native expression helpers vs independent references ----
  // The natives are rolling/one-pass; the references below RE-DERIVE per
  // position (the same formulation the DuckDB oracles use), so agreement
  // checks the algebra, not the implementation.

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 120)
    cps <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(32, 126),          // ascii
      1 -> Gen.oneOf(0xe9, 0x2713),      // é, ✓ (multi-byte BMP)
      1 -> Gen.const(0x1f680)))          // 🚀 (non-BMP, surrogate pair)
  } yield new String(cps.toArray, 0, cps.length)

  test("CdcBoundaries: rolling scan equals per-position refold (oracle shape)") {
    def ref(s: String, w: Int, avg: Int): Seq[Int] = {
      val cps = s.codePoints().toArray
      val len = cps.length
      if (len < w) Seq(0, len)
      else {
        val bs = (w to len).filter { i =>
          val h = (i - w until i).foldLeft(0L)(
            (acc, j) => (acc * 257L + cps(j)) % 1000000007L)
          h % avg == 0
        }
        (0 +: bs) ++ (if (bs.nonEmpty && bs.last == len) Nil else Seq(len))
      }
    }
    check(Prop.forAll(textGen, Gen.choose(1, 12), Gen.oneOf(4, 16, 64)) {
      (s, w, avg) =>
        val native = graft.expressions.CdcBoundaries
          .boundaries(org.apache.spark.unsafe.types.UTF8String.fromString(s),
            w, avg).toIntArray().toSeq
        native == ref(s, w, avg)
    }, samples = 200)
  }

  test("Simhash16: digest-byte votes equal hex-digit-arithmetic reference") {
    def ref(toks: Seq[String]): Long = {
      def bit(hex: String, j: Int): Int = {
        val c = hex(j / 4)
        val digit = if (c >= 'a') c - 87 else c - 48
        (digit >> (3 - j % 4)) & 1
      }
      val votes = new Array[Int](16)
      toks.foreach { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        (0 until 16).foreach(j =>
          votes(j) += (if (bit(hex, j) == 1) 1 else -1))
      }
      (0 until 16).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    check(Prop.forAll(Gen.listOf(textGen)) { toks =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      graft.expressions.Simhash16.simhash(arr) == ref(toks)
    }, samples = 200)
  }

  test("NgramProfileCounts: one-pass counts equal sliding-window reference") {
    val gramGen: Gen[String] =
      Gen.listOfN(3, Gen.oneOf('a', 'b', 'c', 'é', ' ')).map(_.mkString)
    check(Prop.forAll(textGen, Gen.listOfN(2, Gen.listOfN(3, gramGen))) {
      (s, profiles0) =>
        // profiles must be length-3 in code points (single-cp chars above)
        val profiles = profiles0.map { ps =>
          val ok = ps.filter(g => g.codePointCount(0, g.length) == 3)
          if (ok.isEmpty) Seq("abc") else ok
        }
        val expr = graft.expressions.NgramProfileCounts(
          org.apache.spark.sql.catalyst.expressions.Literal("x"), 3, profiles)
        val got = expr.counts(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray().toSeq
        val cps = s.codePoints().toArray
        val grams = cps.sliding(3).filter(_.length == 3)
          .map(a => new String(a, 0, 3)).toSeq
        val want = (if (cps.length >= 3) (cps.length - 3 + 1).toLong else 0L) +:
          profiles.map(ps => grams.count(ps.contains).toLong)
        got == want
    }, samples = 200)
  }

  // ---- Spark-evaluated operators: fewer samples ----

  private val seriesGen: Gen[List[(Int, Long, Int)]] = for {
    n <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      site <- Gen.choose(1, 2)
      offMin <- Gen.choose(0, 300)
      v <- Gen.choose(0, 2)
    } yield (site, 1704067200L + offMin * 60L, v))
  } yield rows

  test("LshBucket: native loop equals per-plane refold (NaN above zero)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vecGen: Gen[Array[Double]] = for {
      n <- Gen.choose(0, 20)
      xs <- Gen.listOfN(n, Gen.frequency(
        10 -> Gen.choose(-5.0, 5.0),
        1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity)))
    } yield xs.toArray
    check(Prop.forAll(vecGen, Gen.oneOf(1, 8, 16)) { (v, planes) =>
      var ref = 0L
      for (p <- 0 until planes) {
        val dot = v.zipWithIndex.foldLeft(0.0) { case (a, (x, i)) =>
          a + x * ((p * 37 + i * 17) % 19 - 9)
        }
        // Spark SQL / DuckDB order NaN above every double
        if (java.lang.Double.compare(dot, 0.0) > 0) ref += (1L << p)
      }
      graft.expressions.LshBucket.bucket(
        ArrayData.toArrayData(v), false, planes) == ref
    }, samples = 200)
  }

  test("RepetitionKit: one-pass counts equal sliding-window reference") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen: Gen[List[String]] = for {
      n <- Gen.choose(0, 30)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "xyz", "q9", ""))
    } yield ts
    check(Prop.forAll(tokGen) { toks =>
      def modal(gs: Seq[String]): (String, Long) =
        if (gs.isEmpty) ("", 0L)
        else {
          val m = gs.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val maxC = m.values.max
          (m.filter(_._2 == maxC).keys.min, maxC)
        }
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tgs = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val row = graft.expressions.RepetitionKit.counts(
        ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray))
      val (tw, twc) = modal(toks)
      val (tb, tbc) = modal(bgs)
      row.getInt(0) == toks.length &&
        row.getUTF8String(1).toString == tw && row.getLong(2) == twc &&
        row.getUTF8String(3).toString == tb && row.getLong(4) == tbc &&
        row.getInt(5) == bgs.length && row.getInt(6) == tgs.length &&
        row.getInt(7) == tgs.distinct.length
    }, samples = 300)
  }

  test("dedupWithin: idempotent, output subset, invariant holds") {
    check(Prop.forAll(seriesGen) { rows =>
      val df = rows.toDF("site", "epoch", "v")
        .withColumn("t", timestamp_seconds(col("epoch"))).drop("epoch")
        .distinct() // duplicate (site,t,v) triples are physically one point
      val once = TimeSeriesOps.dedupWithin(df, Seq("site"), "t", 29 * 60, Seq("v"))
      val kept = once.select("site", "t", "v")
        .as[(Int, java.sql.Timestamp, Int)].collect().toSet
      val input = df.select("site", "t", "v")
        .as[(Int, java.sql.Timestamp, Int)].collect().toSet
      val twice = TimeSeriesOps.dedupWithin(once, Seq("site"), "t", 29 * 60, Seq("v"))
        .select("site", "t", "v").as[(Int, java.sql.Timestamp, Int)].collect().toSet
      val subset = kept.subsetOf(input)
      val idempotent = twice == kept
      // invariant: among kept rows, no equal pair within (0, 29min]
      val noClose = kept.groupBy(r => (r._1, r._3)).values.forall { g =>
        val ts = g.map(_._2.getTime).toSeq.sorted
        ts.zip(ts.drop(1)).forall { case (a, b) =>
          b - a == 0 || b - a > 29 * 60 * 1000L
        }
      }
      subset && idempotent && noClose
    }, samples = 10)
  }

  test("cosine stays within [-1, 1] (rounded) and is symmetric") {
    val vecGen = Gen.listOfN(8, Gen.choose(-5.0f, 5.0f))
      .suchThat(_.exists(_ != 0.0f))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val Array(ab, ba) = df.select(
        SimilarityOps.cosine(col("a"), col("b")),
        SimilarityOps.cosine(col("b"), col("a")))
        .as[(Double, Double)].head() match { case (x, y) => Array(x, y) }
      ab >= -1.000001 && ab <= 1.000001 && ab == ba
    }, samples = 10)
  }

  test("zvalue: the interleave is a bijection — de-interleaving the key " +
    "recovers each column's scaled value exactly") {
    import graft.operators.Layouts
    val bits = 8
    val mx = (1L << bits) - 1
    val inGen = Gen.listOfN(2, Gen.choose(0L, mx))
    check(Prop.forAll(inGen) { case List(x, y) =>
      val z = Seq((x, y)).toDF("x", "y")
        .select(Layouts.zvalue(Seq(col("x"), col("y")),
          Seq(0L, 0L), Seq(mx, mx), bits).as("z"))
        .as[Long].head()
      // bit j of column i sits at position j*2 + i
      def dein(i: Int): Long =
        (0 until bits).map(j => ((z >> (j * 2 + i)) & 1L) << j).sum
      dein(0) == x && dein(1) == y
    }, samples = 15)
  }
}
