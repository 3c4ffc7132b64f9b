package graft

import graft.operators.{IncrementalRunner, IntensityOps, SimilarityOps, TimeSeriesOps}
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

  test("lineDedup: idempotent, kept segments are a prefix-preserving " +
    "subset, counts consistent") {
    import graft.operators.DedupOps
    val segGen = Gen.oneOf("x", "y", "z", "w")
    val docGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, segGen).map(_.mkString("|")))
    check(Prop.forAll(Gen.listOfN(3, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = DedupOps.lineDedup(docs, "doc_id", "text", "\\|", "|")
      val rows = once.as[(Long, Int, Int, String)].collect().sortBy(_._1)
      val again = DedupOps.lineDedup(
        once.select($"doc_id", $"text_dedup".as("text")),
        "doc_id", "text", "\\|", "|")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1)
      rows.zip(again).forall { case ((id, _, kept, txt), (id2, n2, k2, t2)) =>
        // re-applying is a no-op, and counts describe the output
        id == id2 && t2 == txt && n2 == kept && k2 == kept &&
          txt.split("\\|", -1).length == kept &&
          txt.split("\\|", -1).toSeq ==
            rows.find(_._1 == id).get._4.split("\\|", -1).toSeq.distinct
      }
    }, samples = 15)
  }

  test("qSketch: 3-way split merged in either grouping equals the " +
    "one-shot sketch (merge associativity / split invariance)") {
    import graft.operators.SketchOps
    val rowsGen = for {
      n <- Gen.choose(4, 60)
      vs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    check(Prop.forAll(rowsGen, Gen.choose(2, 5)) { (rows, k) =>
      val df = rows.toDF("id", "g", "v")
      def sk(d: org.apache.spark.sql.DataFrame) =
        SketchOps.qSketch(d, Seq("g"), "id", "v", k)
      def rowsOf(d: org.apache.spark.sql.DataFrame) =
        d.select($"g", $"qsk".cast("array<struct<h:long,v:double>>"))
          .as[(String, Seq[(Long, Double)])].collect().toSeq.sortBy(_._1)
      val whole = rowsOf(sk(df))
      val p0 = sk(df.filter($"id" % 3 === 0))
      val p1 = sk(df.filter($"id" % 3 === 1))
      val p2 = sk(df.filter($"id" % 3 === 2))
      // ((p0 + p1) + p2) and (p0 + (p1 + p2)) both equal the one-shot
      val left = SketchOps.qMerge(
        SketchOps.qMerge(p0.union(p1), Seq("g"), k).union(p2), Seq("g"), k)
      val right = SketchOps.qMerge(
        p0.union(SketchOps.qMerge(p1.union(p2), Seq("g"), k)), Seq("g"), k)
      rowsOf(left) == whole && rowsOf(right) == whole
    }, samples = 10)
  }

  test("hllMerge: 3-way split merged in either grouping equals the " +
    "one-shot register file, and re-merging it is a no-op (idempotent " +
    "max algebra)") {
    import graft.operators.SketchOps
    val rowsGen = for {
      n <- Gen.choose(4, 80)
      vs <- Gen.listOfN(n, Gen.choose(0L, 400L))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("id", "g", "v")
      def sk(d: org.apache.spark.sql.DataFrame) =
        SketchOps.hllSketch(d, Seq("g"), "v")
      def regsOf(d: org.apache.spark.sql.DataFrame) =
        d.select($"g", $"regs").as[(String, Seq[Int])]
          .collect().toSeq.sortBy(_._1)
      val whole = regsOf(sk(df))
      val p0 = sk(df.filter($"id" % 3 === 0))
      val p1 = sk(df.filter($"id" % 3 === 1))
      val p2 = sk(df.filter($"id" % 3 === 2))
      val left = SketchOps.hllMerge(
        SketchOps.hllMerge(p0.union(p1), Seq("g")).union(p2), Seq("g"))
      val right = SketchOps.hllMerge(
        p0.union(SketchOps.hllMerge(p1.union(p2), Seq("g"))), Seq("g"))
      regsOf(left) == whole && regsOf(right) == whole &&
        regsOf(SketchOps.hllMerge(left.union(left), Seq("g"))) == whole
    }, samples = 10)
  }

  // NOTE deliberately NOT asserted: second-pass idempotence. Removal
  // seams create new token adjacencies, and on a small alphabet those
  // can form fresh duplicated windows — the same artifact the paper's
  // char-span concatenation has. The invariants that ARE theorems:
  // count arithmetic, and owner survival (an owner's positions are all
  // kept and contiguous, so its window string survives reassembly).
  test("substringDedup: on random small-alphabet corpora the counts are " +
    "consistent and every originally-duplicated window survives " +
    "somewhere (the owner copy is never destroyed)") {
    import graft.operators.DedupOps
    val w = 3
    val docGen = for {
      n <- Gen.choose(0, 24)
      ts <- Gen.listOfN(n, Gen.oneOf("x", "y", "z", "q"))
    } yield ts.mkString(" ")
    val corpusGen = for {
      m <- Gen.choose(2, 10)
      ds <- Gen.listOfN(m, docGen)
    } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def windows(text: String): Seq[String] = {
      val ts = text.split(" ").toSeq
      if (text.isEmpty || ts.length < w) Seq.empty
      else ts.sliding(w).map(_.mkString(" ")).toSeq
    }
    check(Prop.forAll(corpusGen) { docs =>
      val out = DedupOps.substringDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .select($"doc_id", $"n_tokens", $"n_removed", $"n_kept",
          $"text_dedup")
        .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
      val arith = out.forall { case (_, n, r, k, td) =>
        n == r + k &&
          (if (k == 0) td.isEmpty
           else td.split(" ").length == k)
      }
      // every window that occurred >= 2 times in the original corpus
      // keeps its owner copy: it must still occur in the dedup'd corpus
      val orig = docs.flatMap(d => windows(d._2))
      val dupSet = orig.groupBy(identity).filter(_._2.size >= 2).keySet
      val after = out.flatMap(o => windows(o._5)).toSet
      val owners = dupSet.forall(after.contains)
      arith && owners
    }, samples = 10)
  }

  test("pagerankPick: rank mass stays ~1 over the graph, exactly one " +
    "authority per component, ranks positive") {
    import graft.operators.DedupOps
    val pairGen = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(1, 12)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.filter(p => p._1 != p._2).distinct
    check(Prop.forAll(pairGen.suchThat(_.nonEmpty)) { es =>
      val out = DedupOps.pagerankPick(es.toDF("a", "b"), 0.85, iters = 3)
        .as[(Long, Long, Double, Boolean)].collect().toSeq
      val mass = out.map(_._3).sum
      val comps = out.map(_._2).distinct
      math.abs(mass - 1.0) < 1e-6 &&
        out.forall(_._3 > 0.0) &&
        comps.forall(c => out.count(r => r._2 == c && r._4) == 1)
    }, samples = 10)
  }

  test("islands: expanding the runs reconstructs the exact value " +
    "sequence; ids are sequential; adjacent runs always differ") {
    val rowsGen: Gen[List[(Int, Int, Option[String])]] = for {
      n <- Gen.choose(1, 30)
      kvs <- Gen.listOfN(n, for {
        k <- Gen.choose(1, 2)
        v <- Gen.oneOf(Some("a"), Some("b"), Option.empty[String])
      } yield (k, v))
    } yield kvs.zipWithIndex.map { case ((k, v), i) => (k, i, v) }
    check(Prop.forAll(rowsGen) { rows =>
      val out = TimeSeriesOps
        .islands(rows.toDF("k", "seq", "v"), Seq("k"), "seq", "seq", "v")
        .select($"k", $"run_id", $"v", $"run_len", $"run_start",
          $"run_end")
        .as[(Int, Long, Option[String], Long, Int, Int)]
        .collect().sortBy(r => (r._1, r._2)).toList
      rows.groupBy(_._1).forall { case (k, rs) =>
        val seq = rs.sortBy(_._2).map(_._3)
        val runs = out.filter(_._1 == k)
        runs.map(_._2) == (1L to runs.size.toLong).toList &&
          runs.flatMap(r => List.fill(r._4.toInt)(r._3)) == seq &&
          runs.iterator.sliding(2).withPartial(false)
            .forall(p => p(0)._3 != p(1)._3) &&
          runs.forall(r => r._5 <= r._6)
      }
    }, samples = 15)
  }

  test("scd2History: intervals chain through every event; exactly one " +
    "current row unless the key ends deleted") {
    val chGen: Gen[List[(Long, Long, String, Double)]] = for {
      n <- Gen.choose(1, 12)
      ops <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const("I"),
        1 -> Gen.const("D")))
    } yield ops.zipWithIndex.map { case (op, i) =>
      (1L, i + 1L, op, i * 1.5)
    }
    check(Prop.forAll(chGen) { ch =>
      val out = IncrementalRunner
        .scd2History(ch.toDF("k", "seq", "op", "price"), Seq("k"))
        .select($"k", $"price", $"valid_from", $"valid_to", $"is_current")
        .as[(Long, Double, Long, Option[Long], Boolean)]
        .collect().sortBy(_._3).toList
      val nonDel = ch.filter(_._3 != "D").sortBy(_._2)
      out.size == nonDel.size &&
        out.zip(nonDel).forall { case (o, c) =>
          o._3 == c._2 && o._2 == c._4 } &&
        out.forall { o => // valid_to = the key's next event, if any
          o._4 == ch.map(_._2).filter(_ > o._3).sorted.headOption } &&
        out.count(_._5) == (if (ch.last._3 == "D") 0 else 1)
    }, samples = 15)
  }

  test("EntropyKit fuzz: arbitrary unicode strings — never throws; " +
    "0 <= H <= ln(k) + half-ulp, norm in [0,1], counts consistent, " +
    "deterministic, permutation-invariant") {
    import graft.expressions.EntropyKit
    import org.apache.spark.unsafe.types.UTF8String
    val strGen = Gen.oneOf(
      Gen.alphaStr,
      Gen.listOf(Gen.oneOf('a', 'b', ' ', 'é', '中', '\n'))
        .map(_.mkString),
      Gen.const(""),
      Gen.const("aaaaaaa"))
    check(Prop.forAll(strGen) { s =>
      val row = EntropyKit.compute(UTF8String.fromString(s))
      val (n, k) = (row.getLong(0), row.getLong(1))
      val (h, hn) = (row.getDouble(2), row.getDouble(3))
      val cps = s.codePoints().toArray
      val okCounts = n == cps.length && k == cps.distinct.length
      // bounds hold up to the 6-dp rounding half-ulp
      val okH = h >= -5e-7 &&
        (k <= 1 || h <= math.log(k.toDouble) + 5e-7)
      val okNorm = hn >= -5e-7 && hn <= 1.0 + 5e-7
      // deterministic, and invariant under character permutation
      val again = EntropyKit.compute(UTF8String.fromString(s))
      val perm = EntropyKit.compute(UTF8String.fromString(
        new String(cps.reverse, 0, cps.length)))
      okCounts && okH && okNorm &&
        again.getDouble(2) == h && again.getDouble(3) == hn &&
        perm.getDouble(2) == h && perm.getDouble(3) == hn
    }, samples = 300)
  }

  test("MediaCodec fuzz: arbitrary byte blobs — random, magic-prefixed, " +
    "and bit-flipped/truncated real containers — never throw; invalid " +
    "rows surface as invalid/None; pcmStats is consistent with " +
    "pcmSamples whenever either accepts") {
    import graft.operators.MediaCodec
    val rawGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 300)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    val magics: Seq[Array[Byte]] = Seq(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      Array(0xff, 0xd8), "GIF8".getBytes.map(_.toInt),
      "fLaC".getBytes.map(_.toInt),
      ("RIFF   WAVE").getBytes.map(_.toInt),
      ("RIFF   WEBP").getBytes.map(_.toInt))
      .map(_.map(_.toByte))
    val magicGen: Gen[Array[Byte]] = for {
      m <- Gen.oneOf(magics)
      tail <- rawGen
    } yield m ++ tail
    // real containers, corrupted: deterministic fixture + seeded flips
    // or a truncation — the adversarial-crawl shape
    val corruptGen: Gen[Array[Byte]] = for {
      id <- Gen.choose(0L, 40L)
      base <- Gen.oneOf(
        Gen.const(MediaCodec.buildFixture(id)),
        Gen.const(MediaCodec.buildWavTone(id)))
      mode <- Gen.choose(0, 2)
      cut <- Gen.choose(0, 60)
      flips <- Gen.listOfN(4, Gen.choose(0, 10000))
    } yield mode match {
      case 0 => base.take(math.min(cut, base.length))
      case _ =>
        val c = base.clone()
        flips.foreach(f => c(f % c.length) = (c(f % c.length) ^ 0x55).toByte)
        c
    }
    val blobGen = Gen.frequency(
      (3, rawGen), (3, magicGen), (4, corruptGen))
    check(Prop.forAll(blobGen) { b =>
      val info = MediaCodec.decode(b) // must not throw
      val st = MediaCodec.pcmStats(b)
      val sm = MediaCodec.pcmSamples(b)
      // the two WAV parsers share one validity verdict and agree on
      // every derived fact
      st.isDefined == sm.isDefined &&
        st.forall { case (rate, n, mn, mx, sum, sumSq) =>
          val (rate2, arr) = sm.get
          rate == rate2 && n == arr.length &&
            (n == 0 || (mn == arr.min && mx == arr.max)) &&
            sum == arr.map(_.toLong).sum &&
            sumSq == arr.map(s => s.toLong * s).sum
        } &&
        // a blob the sniffer can't type is never "valid"
        (info.format != "unknown" || !info.valid)
    }, samples = 500)
  }

  test("MyersLev: bit-parallel distance equals the classic DP on random " +
    "strings straddling the 64-cell word boundary, repeats, and " +
    "supplementary-plane code points; the Column form matches Spark's " +
    "levenshtein") {
    def dp(a: Array[Int], b: Array[Int]): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val tmp = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = tmp
        }
      }
      prev(b.length)
    }
    // small alphabet forces real match structure; lengths cluster at the
    // single-word/multi-word boundary and at 2+ full words
    val cpGen = Gen.frequency(
      (8, Gen.choose('a'.toInt, 'e'.toInt)),
      (1, Gen.choose(0x4e00, 0x4e05)),
      (1, Gen.const(0x1f600))) // 😀: one code point, two UTF-16 units
    val strGen = for {
      n <- Gen.frequency((3, Gen.choose(0, 20)), (3, Gen.choose(55, 75)),
        (2, Gen.choose(120, 200)))
      cs <- Gen.listOfN(n, cpGen)
    } yield cs.toArray
    check(Prop.forAll(strGen, strGen) { (a, b) =>
      graft.expressions.MyersLev.distanceCp(a, b) == dp(a, b)
    }, samples = 300)
    val pairs = Seq(("kitten", "sitting"), ("", "abc"), ("abc", ""),
      ("flaw", "lawn"), ("😀ab", "a😀b"),
      ("a" * 200, "b" * 150))
      .toDF("a", "b")
    val both = pairs.select(
      graft.operators.DedupOps.myersLevenshtein($"a", $"b"),
      levenshtein($"a", $"b")).as[(Int, Int)].collect()
    assert(both.forall(r => r._1 === r._2), both.toSeq.toString)
  }

  test("piiScrub / gopherRules fuzz: arbitrary text (PII-shaped " +
    "fragments, unicode, control chars) never throws, counts are " +
    "non-negative and match inserted tags, reruns are bit-identical") {
    import graft.operators.TextOps
    val fragGen = Gen.frequency(
      (4, Gen.alphaNumStr.map(_.take(12))),
      (2, Gen.const("a@b.co")),
      (2, Gen.const("1.2.3.4")),
      (1, Gen.const("4111111111111111")),
      (1, Gen.const("@@..19 . ")),
      (1, Gen.const(" \n\t一😀")),
      (1, Gen.const("#### - * ...")))
    val textGen = for {
      n <- Gen.choose(0, 12)
      fs <- Gen.listOfN(n, fragGen)
      sep <- Gen.oneOf(" ", "", "\n")
    } yield fs.mkString(sep)
    check(Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pii = TextOps.piiScrub(df, "doc_id", "text")
        .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
      val tagsMatch = pii.forall { case (_, ne, ni, nn, clean) =>
        ne == "<EMAIL>".r.findAllIn(clean).size &&
          ni == "<IP>".r.findAllIn(clean).size &&
          nn == "<NUM>".r.findAllIn(clean).size
      }
      val gr = TextOps.gopherRules(df, "doc_id", "text",
        Seq("the", "a")).collect().map(_.toSeq).sortBy(_.head.toString)
      val rerun = TextOps.gopherRules(df, "doc_id", "text",
        Seq("the", "a")).collect().map(_.toSeq).sortBy(_.head.toString)
      tagsMatch && (gr.toSeq == rerun.toSeq)
    }, samples = 30)
  }

  test("JaroWinkler: DuckDB-probed fixtures pin byte/window/transposition/" +
    "boost semantics; invariants (symmetry, [0,1], identity, boost >= " +
    "jaro) hold on random byte strings") {
    import graft.expressions.JaroWinkler
    def jw(a: String, b: String): Double =
      JaroWinkler.jaroWinkler(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    // every value below was read off DuckDB 1.0's
    // jaro_winkler_similarity on 2026-08-14 — an independent
    // implementation, not our own mirror
    val fixtures = Seq(
      ("", "", 0.0), ("a", "", 0.0), ("", "a", 0.0), ("a", "a", 1.0),
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abcd", "badc", 0.8333333333333334),
      ("ab", "ba", 0.0), ("x", "y", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("kitten", "sitting", 0.746031746031746),
      ("ss", "sss", 0.9111111111111111),
      // é is two UTF-8 bytes: byte semantics give 0.849206…, code-point
      // semantics would give 0.888888…
      ("éclair", "eclair", 0.8492063492063492),
      // jaro <= 0.7 with a common prefix: boost must NOT apply
      ("ab", "aXYZQRST", 0.5416666666666666),
      ("abcdef", "abczzzzzzzzzzzz", 0.5666666666666667),
      // odd mismatch count (3-cycle): transpositions floor to 1
      ("abcdefgh", "bcadefgh", 0.9583333333333334))
    fixtures.foreach { case (a, b, want) =>
      assert(jw(a, b) === want, s"jw($a, $b)")
    }
    val byteGen = Gen.frequency(
      (8, Gen.choose(97, 101)), (1, Gen.choose(0, 255)))
    val strGen = for {
      n <- Gen.frequency((2, Gen.choose(0, 3)), (5, Gen.choose(4, 24)),
        (1, Gen.choose(60, 120)))
      bs <- Gen.listOfN(n, byteGen)
    } yield bs.map(_.toByte).toArray
    check(Prop.forAll(strGen, strGen) { (a, b) =>
      val s = JaroWinkler.jaroWinkler(a, b)
      val j = JaroWinkler.jaro(a, b)
      s == JaroWinkler.jaroWinkler(b, a) &&
        s >= 0.0 && s <= 1.0 && s >= j &&
        (a.isEmpty || JaroWinkler.jaroWinkler(a, a) == 1.0) // identity
    }, samples = 500)
    // SQL-reachable through GraftExtensions, and the Column wrapper
    // agrees with the direct byte-level call
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw, " +
        "graft_myers_lev('kitten', 'sitting') AS lev")
      .as[(Double, Int)].head()
    assert(viaSql === ((0.9611111111111111, 3)))
    val viaCol = Seq(("dixon", "dicksonx")).toDF("a", "b")
      .select(graft.operators.DedupOps.jaroWinklerSim($"a", $"b"))
      .as[Double].head()
    assert(viaCol === 0.8133333333333332)
  }

  test("rakeKeywords / knBigramLogProb fuzz: arbitrary texts (stopword " +
    "runs, empties, unicode) never throw; RAKE phrases are stopword-free " +
    "with positive scores and rank <= k; KN log-probs are <= 0 (p <= 1 " +
    "is a theorem of the interpolated form); reruns are bit-identical") {
    import graft.operators.TextOps
    val stops = Seq("the", "a", "of", "to")
    val wordGen = Gen.frequency(
      (4, Gen.oneOf("data", "spark", "query", "join", "très", "一")),
      (3, Gen.oneOf(stops)),
      (1, Gen.const("")),
      (1, Gen.alphaLowerStr.map(_.take(6))))
    val textGen = for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    check(Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rake = TextOps.rakeKeywords(df, "doc_id", "text", stops, k = 3)
        .as[(Long, Int, String, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val rakeOk = rake.forall { case (_, rank, phrase, nWords, score) =>
        rank >= 1 && rank <= 3 && score > 0 &&
          nWords == phrase.split(" ").length &&
          phrase.split(" ").forall(w => !stops.contains(w) && w.nonEmpty)
      }
      val rake2 = TextOps.rakeKeywords(df, "doc_id", "text", stops, k = 3)
        .as[(Long, Int, String, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val kn = TextOps.knBigramLogProb(df, "doc_id", "text")
        .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
      val knOk = kn.forall { case (_, nBg, avg) =>
        nBg >= 0 && avg.forall(_ <= 0.0) && (nBg > 0 || avg.isEmpty)
      }
      rakeOk && rake == rake2 && knOk
    }, samples = 25)
  }

  // ---- BPE delta-rewrite trainer vs an independent naive reference ----

  /** Naive BPE trainer reimplemented from the spec (recount EVERY pair
    * from scratch each round — no incremental maintenance, no inverted
    * index, no delta rewrites, no heap), sharing NOTHING with
    * TextOps.bpeTrainDriver but the merge-symbol code-point mapping.
    * The r17 delta rewrite (only pairs around a merge site update) is
    * exactly the kind of boundary-condition code random small-alphabet
    * vocabularies break: runs ("aaaa"), back-to-back sites, sites at
    * word edges, words shrinking to one symbol.
    */
  private def naiveBpe(
      vocab0: Seq[(Array[Int], Long)],
      numMerges: Int): Seq[(Int, String, Long)] = {
    def cpOf(rank: Int): Int = 0xE000 + rank - 1 // ranks stay tiny here
    var words = vocab0.map { case (s, c) => (s.clone(), c) }
    val out = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var stop = false
    while (r <= numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(Int, Int), Long]
      for ((s, c) <- words; j <- 0 until s.length - 1)
        counts((s(j), s(j + 1))) = counts.getOrElse((s(j), s(j + 1)), 0L) + c
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((x, y), m) => (-m, x.toLong << 21 | y) }.head
        out += ((r,
          new String(Character.toChars(a)) + new String(Character.toChars(b)),
          n))
        val z = cpOf(r)
        words = words.map { case (s, c) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
              buf += z; j += 2
            } else { buf += s(j); j += 1 }
          }
          (buf.toArray, c)
        }
        r += 1
      }
    }
    out.result()
  }

  test("bpeTrainDriver (delta rewrites; heap AND scan argmax) == the " +
    "naive recount-from-scratch reference on random tiny-alphabet " +
    "vocabularies — runs, back-to-back sites, edge sites") {
    val wordGen = for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf('a'.toInt, 'b'.toInt, 'c'.toInt))
    } yield cs.toArray
    val vocabGen = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, wordGen)
      counts <- Gen.listOfN(n, Gen.choose(1L, 3L))
    } yield ws.zip(counts)
    check(Prop.forAll(vocabGen, Gen.choose(1, 12)) { (vocab, merges) =>
      val ref = naiveBpe(vocab, merges)
      val heap = graft.operators.TextOps.bpeTrainDriver(
        vocab.map { case (s, c) => (s.clone(), c) }.toArray, merges,
        argmaxViaHeap = true)
      val scan = graft.operators.TextOps.bpeTrainDriver(
        vocab.map { case (s, c) => (s.clone(), c) }.toArray, merges,
        argmaxViaHeap = false)
      heap == ref && scan == ref
    }, samples = 300)
  }
}
