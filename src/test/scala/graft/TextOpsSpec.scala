package graft

import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: overlapping k-grams, empty below k tokens") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(
      TextOps.shingles(TextOps.tokens($"text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
  }

  test("minhashSignature is deterministic and permutation-keyed") {
    val df = Seq("x y z w").toDF("text")
    def sigOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select(TextOps.minhashSignature(
        transform(TextOps.shingles(TextOps.tokens($"text"), 2),
          s => TextOps.baseHash60(s)), 4).as("sig"))
        .as[Seq[Long]].head()
    val sig = sigOf(df)
    assert(sig.length === 4)
    assert(sig.distinct.length === 4) // different perms -> different mins
    assert(sig.forall(v => v >= 0 && v < TextOps.MinhashPrime))
    assert(sig === sigOf(df)) // stable across evaluations
  }

  test("simhash16 in range, equal docs equal, disjoint docs differ") {
    val df = Seq(
      (1, "spark query engine"),
      (2, "spark query engine"),
      (3, "entirely different words here")).toDF("id", "text")
    val out = df.select($"id",
      TextOps.simhash16(TextOps.tokens($"text")).as("sh"))
      .as[(Int, Long)].collect().toMap
    assert(out(1) === out(2))
    assert(out(1) !== out(3))
    assert(out.values.forall(v => v >= 0 && v < 65536))
  }

  test("hammingDistance counts differing bits") {
    val df = Seq((0xF0F0L, 0x0F0FL), (5L, 5L)).toDF("a", "b")
    val out = df.select(TextOps.hammingDistance($"a", $"b"))
      .as[Int].collect().toSeq
    assert(out === Seq(16, 0))
  }

  test("minShingleMd5: native fold equals the HOF array formulation") {
    val docs = Seq(
      "", "one two", "one two three four five",
      "the quick brown fox jumps over the lazy dog",
      "émoji ✓ utf8 tokens here again and again").toDF("text")
    val toks = TextOps.tokens($"text")
    val out = docs.select(
      TextOps.fingerprint($"text", toks, 3)("min_shingle_hash").as("n"),
      TextOps.minShingleMd5Hof(toks, 3).as("h"))
      .collect()
    out.foreach(r => assert(r.get(0) === r.get(1)))
  }

  test("simhash16: native single-digest form equals the HOF fold") {
    val docs = Seq(
      "", "one", "the quick brown fox", "a b c d e f g h",
      "émoji ✓ utf8 tokens here", "dup dup dup dup").toDF("text")
    val out = docs.select(
      TextOps.simhash16(TextOps.tokens($"text")).as("n"),
      TextOps.simhash16Hof(TextOps.tokens($"text")).as("h"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, h) => assert(n === h) }
    // null ELEMENT votes -1 everywhere in both formulations
    val withNull = spark.sql(
      "SELECT graft_simhash16(array('a', CAST(NULL AS STRING), 'b')) AS n")
      .as[Long].head()
    val hofNull = Seq(1).toDF("x").select(TextOps.simhash16Hof(
      array(lit("a"), lit(null).cast("string"), lit("b")))).as[Long].head()
    assert(withNull === hofNull)
  }

  test("ngramLangScores: native one-pass counter equals the HOF fold") {
    val profiles = Seq(
      "en" -> Seq("the", "he ", " th"),
      "xx" -> Seq("éma", "a✓b", "the")) // overlap + unicode grams
    val docs = Seq(
      "", "th", "the theme of the thing",
      "cinéma✓bar éma éma", "no hits at all here?",
      "the" * 50).toDF("text")
    val (ns, np) = TextOps.ngramLangScores(col("text"), 3, profiles)
    val (hs, hp) = TextOps.ngramLangScoresHof(col("text"), 3, profiles)
    val cols = ns.map(_._2) ++ hs.map(_._2) :+ np :+ hp
    docs.select(cols: _*).collect().foreach { r =>
      assert(r.get(0) === r.get(2), "en score")
      assert(r.get(1) === r.get(3), "xx score")
      assert(r.get(4) === r.get(5), "pred")
    }
  }

  test("langScores argmax with first-wins tie-break and und fallback") {
    val markers = Seq("en" -> Seq("the"), "fr" -> Seq("le"))
    val df = Seq("the cat", "le chat", "the le", "nothing here").toDF("text")
    val (_, pred) = TextOps.langScores(TextOps.tokens($"text"), markers)
    val out = df.select(pred.as("p")).as[String].collect().toSeq
    assert(out === Seq("en", "fr", "en" /* tie -> first */, "und"))
  }

  test("repetitionSignals: modal word/bigram shares and dup-3gram fraction") {
    val docs = Seq(
      // "b b b a": top word b (3/4); bigrams: "b b" x2, "b a" -> 2/3;
      // 3-grams: "b b b", "b b a" -> 0 dup
      (1L, "b b b a"),
      // all same token: top a 4/4, bigram "a a" 3/3, 3-grams "a a a" x2
      // -> 1 duplicate instance of 2 -> 0.5
      (2L, "a a a a"),
      // all distinct, tie on counts -> lexicographically smallest wins
      (3L, "c b a"),
      // single token: no bigrams/3-grams
      (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Int, String, Double, String, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4, "b", 0.75, "b b", 0.666667, 0.0)))
    assert(out(2L) === ((2L, 4, "a", 1.0, "a a", 1.0, 0.5)))
    assert(out(3L) === ((3L, 3, "a", 0.333333, "b a", 0.5, 0.0)))
    assert(out(4L) === ((4L, 1, "z", 1.0, "", 0.0, 0.0)))
  }

  test("repetitionSignals native === explode/groupBy twin") {
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "y9")
    val docs = (0 until 60).map { s =>
      val n = 1 + (s * 7) % 23
      (s.toLong, (0 until n).map(i => words((s * 13 + i * i) % words.length))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val a = TextOps.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.repetitionSignalsShuffled(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("profileColumns: exact counts correct; approx within 5% of exact") {
    val df = Seq(
      (1L, "a", Option("x")), (2L, "b", None), (3L, "a", Option("y")),
      (4L, "c", Option("y")))
      .toDF("id", "s", "o")
    val exact = graft.operators.ProfileOps
      .profileColumns(df, Seq("id", "s", "o"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(exact("id") === ((4L, 0L, 4L, "1")))
    assert(exact("s") === ((4L, 0L, 3L, "a")))
    assert(exact("o") === ((4L, 1L, 2L, "x")))
    val approx = graft.operators.ProfileOps
      .profileColumns(df, Seq("id", "s", "o"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, (_, _, nd, _)) =>
      assert(math.abs(approx(c) - nd) <= math.max(1, nd / 20),
        s"$c approx ${approx(c)} vs exact $nd")
    }
  }

  test("flagContaminated: shared 3-shingle flags, disjoint text doesn't") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over"), // benchmark member
      (1L, "lazy dog sleeps the quick brown cat"), // shares "the quick brown"
      (2L, "completely different words entirely here"), // clean
      (3L, "quick brown fox runs")) // shares "quick brown fox"
      .toDF("doc_id", "text")
    val out = DedupOps.flagContaminated(
      docs, docs.filter($"doc_id" === 0), "doc_id", "text")
      .as[(Long, Boolean)].collect().toMap
    assert(out === Map(0L -> true, 1L -> true, 2L -> false, 3L -> true))
  }

  test("exactDedupStats keeps min id and counts group size") {
    val df = Seq(
      (10L, "aaa", "s1"), (11L, "aaa", "s2"), (12L, "bbb", "s3"))
      .toDF("doc_id", "text", "source")
    val out = DedupOps.exactDedupStats(df, md5($"text"), "doc_id", Seq("source"))
      .select("doc_id", "dup_count", "source")
      .as[(Long, Long, String)].collect().toSet
    assert(out === Set((10L, 2L, "s1"), (12L, 1L, "s3")))
  }

  test("minhashCandidatePairs finds identical docs, skips disjoint ones") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidatePairs(df, "doc_id", "text")
      .select("a", "b", "shared_bands").as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 2L))) // both bands agree; doc 3 nowhere
  }

  test("ngramJaccard: identical -> 1.0, disjoint -> 0.0") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val out = DedupOps.ngramJaccard(pairs, docs, "doc_id", "text", 3)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) === 0.0)
  }

  test("simhashPairs links near-identical docs via shared byte blocks") {
    val df = Seq(
      (1L, "spark window join group filter"),
      (2L, "spark window join group filter"),
      (3L, "totally unrelated content words"))
      .toDF("doc_id", "text")
    val out = DedupOps.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("graft_repetition_kit is SQL-reachable and matches the kit schema") {
    Seq((1L, "a b a b a c"), (2L, "x"))
      .toDF("doc_id", "text").createOrReplaceTempView("__rep_sql_probe")
    val out = spark.sql(
      """SELECT doc_id, graft_repetition_kit(split(text, ' ')) AS k
        |FROM __rep_sql_probe ORDER BY doc_id""".stripMargin)
      .select($"doc_id", $"k.n_tok", $"k.top_word", $"k.top_word_cnt",
        $"k.top_bigram", $"k.top_bigram_cnt", $"k.n_bigrams",
        $"k.n_trigrams", $"k.distinct_trigrams")
      .as[(Long, Int, String, Long, String, Long, Int, Int, Int)]
      .collect().toSeq
    // "a b a b a c": 6 tokens, modal word a x3, modal bigram "a b" x2 of
    // 5, trigrams {a b a, b a b, a b a, b a c} -> 4 total / 3 distinct
    assert(out === Seq(
      (1L, 6, "a", 3L, "a b", 2L, 5, 4, 3),
      (2L, 1, "x", 1L, "", 0L, 0, 0, 0)))
    // SQL registration evaluates the same expression the DataFrame path
    // (repetitionSignals' ColumnBridge kit) uses — cross-check the
    // derived fractions against the API output on the same rows
    val api = TextOps.repetitionSignals(
      Seq((1L, "a b a b a c"), (2L, "x")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select($"doc_id", $"n_tok", $"top_word", $"top_bigram")
      .as[(Long, Int, String, String)].collect().toSeq.sortBy(_._1)
    assert(api === Seq((1L, 6, "a", "a b"), (2L, 1, "x", "")))
  }

  test("nfcNormalize: composes decomposed sequences, passes NFC input " +
    "through, keeps orphan combining marks, null-safe, SQL-registered") {
    // explicit escapes ONLY -- source-encoding normalization must never
    // be able to silently merge the two spellings
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    assert(decomposed != composed) // the test's own sanity check
    val rows = Seq(
      (decomposed, composed),          // decomposed -> composed
      (composed, composed),            // already NFC, untouched
      ("\u0301x", "\u0301x"),          // orphan combining mark survives
      ("plain ascii", "plain ascii"))
    val got = rows.map(_._1).toDF("t")
      .select(TextOps.nfcNormalize($"t")).as[String].collect().toSeq
    assert(got === rows.map(_._2))

    // dedup keys of the two spellings collide after normalization
    val k = Seq(decomposed, composed).toDF("t")
      .select(md5(TextOps.nfcNormalize($"t"))).as[String].collect().toSet
    assert(k.size === 1)

    assert(Seq(Option.empty[String]).toDF("t")
      .select(TextOps.nfcNormalize($"t")).collect().head.isNullAt(0))

    val viaSql = spark.sql(
      "SELECT graft_nfc_normalize('cafe\u0301')").as[String].head()
    assert(viaSql === composed)
  }

  test("slidingChunks: overlap geometry, short tails, empty doc yields " +
    "one empty chunk, exact-fit has no phantom tail, guards") {
    def chunks(text: String, size: Int, stride: Int): Seq[String] = {
      val (_, cs) = TextOps.slidingChunks($"t", size, stride)
      Seq(text).toDF("t").select(cs).as[Seq[String]].head()
    }
    assert(chunks("abcdefghij", 4, 3) ===
      Seq("abcd", "defg", "ghij")) // [0,4) [3,7) [6,10): covers, overlaps
    assert(chunks("abcdefghij", 4, 4) === Seq("abcd", "efgh", "ij"))
    assert(chunks("abcd", 4, 3) === Seq("abcd")) // exact fit: one chunk
    assert(chunks("ab", 4, 3) === Seq("ab"))     // shorter than size
    assert(chunks("", 4, 3) === Seq(""))         // empty doc: one chunk
    intercept[IllegalArgumentException] {
      TextOps.slidingChunks($"t", 0, 3)
    }
    intercept[IllegalArgumentException] {
      TextOps.slidingChunks($"t", 4, 0)
    }
  }

  test("unigramLogProb: hand-computed corpus distribution — common " +
    "tokens score high, rare tokens drag the mean down") {
    // tokens: a:2, b:1, c:1 of 4 total -> lp(a)=ln(1/2), lp(b)=lp(c)=ln(1/4)
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc1: (2·ln(.5) + ln(.25))/3 = -0.924196; doc2: ln(.25) = -1.386294
    assert(got === Seq((1L, 3L, -0.924196), (2L, 1L, -1.386294)))
  }

  test("bigramLogProb: hand-computed interpolation, scrambled text " +
    "scores below its fluent twin, short docs surface null, λ guarded") {
    // corpus: "a b", "a b", "b a", "a" — uni a:4 b:3 N=7;
    // bi (a,b):2 (b,a):1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "b a"), (4L, "a"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLogProb(docs, "doc_id", "text", lambda = 0.7)
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val lam = 0.7
    def sc(c2: Double, cw1: Double, cw2: Double) =
      BigDecimal(math.log(
        lam * (c2 / cw1) + (1.0 - lam) * (cw2 / 7.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      (1L, 1L, Some(sc(2, 4, 3))),
      (2L, 1L, Some(sc(2, 4, 3))),
      (3L, 1L, Some(sc(1, 3, 4))),
      (4L, 0L, None)))
    // the repeated bigram outranks the one-off: context sensitivity
    assert(out(0)._3.get > out(2)._3.get)
    intercept[IllegalArgumentException] {
      TextOps.bigramLogProb(docs, "doc_id", "text", lambda = 1.0)
    }
  }

  test("sourceDivergence: a source matching the corpus distribution " +
    "scores 0; fully disjoint sources score ln(2) against a 50/50 mix") {
    val same = Seq(("s1", "a b"), ("s2", "a b")).toDF("source", "text")
    val kl0 = TextOps.sourceDivergence(same, "source", "text")
      .select($"source", $"kl").as[(String, Double)].collect().toMap
    assert(kl0 === Map("s1" -> 0.0, "s2" -> 0.0))

    // global: a/b each p=1/2; each source is all-one-token (p=1):
    // KL = 1·ln(1/0.5) = ln 2 = 0.693147
    val skew = Seq(("s1", "a a"), ("s2", "b b")).toDF("source", "text")
    val kl = TextOps.sourceDivergence(skew, "source", "text")
      .select($"source", $"n_tokens", $"vocab", $"kl")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(kl === Seq(("s1", 2L, 1L, 0.693147), ("s2", 2L, 1L, 0.693147)))
  }

  test("sourceOverlap: identical vocabularies score 1, disjoint pairs 0, " +
    "partial overlap counts distinct tokens once, pairs come back a < b") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a a"),  // s1 vocab {a,b,c}
      ("s2", "a b c"),                 // s2 vocab {a,b,c} — same as s1
      ("s3", "c d"),                   // s3 vocab {c,d} — 1 of 4 with s1/s2
      ("s4", "x y"))                   // s4 vocab {x,y} — disjoint
      .toDF("source", "text")
    val out = TextOps.sourceOverlap(docs, "source", "text")
      .as[(String, String, Int, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    assert(out(("s1", "s2")) === ((3, 3, 3, 1.0)))
    assert(out(("s1", "s3")) === ((3, 2, 1, 0.25)))
    assert(out(("s2", "s3")) === ((3, 2, 1, 0.25)))
  }

  test("ngramNovelty: first owner scores 1, an exact re-spin scores 0, " +
    "partial reuse prorates, short docs come back null") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles {abc, bcd} — both novel
      (2L, "a b c d"),     // identical — nothing novel
      (3L, "b c d e"),     // {bcd, cde}: bcd owned by doc 1 -> 1/2
      (4L, "x y"))         // < 3 tokens -> no shingles
      .toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(docs, "doc_id", "text", 3)
      .as[(Long, Int, Int, Option[Double])].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 2, 2, Some(1.0)),
      (2L, 2, 0, Some(0.0)),
      (3L, 2, 1, Some(0.5)),
      (4L, 0, 0, None)))
  }

  test("gopherRules: each rule fires on its own violation, the good doc " +
    "keeps, ratios are exact one-division values") {
    val good = ("the data " * 30).trim        // 60 words, mean 3.5, 30 stops
    val short = "the a of to x"               // 5 words -> r_words fails
    val hashy = ("x# the a " * 20).trim       // 60 words, 20 '#' -> r_symbol
    val bullets = "- a b\n- c d\n* e f"       // all 3 lines bullets
    val longw = ("abcdefghijklmnopqrst the " * 30).trim // mean 11.5
    val docs = Seq((1L, good), (2L, short), (3L, hashy), (4L, bullets),
      (5L, longw)).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text",
      Seq("the", "a", "of", "to"))
      .orderBy($"doc_id")
      .as[(Long, Int, Double, Double, Double, Int,
        Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    val g = out(0)
    assert(g._2 === 60 && g._3 === 3.5 && g._6 === 30, g.toString)
    assert(g._7 && g._8 && g._9 && g._10 && g._11 && g._12, g.toString)
    val s = out(1)
    assert(s._2 === 5 && !s._7 && !s._12, s.toString)
    val h = out(2)
    assert(h._4 === 0.333333 && !h._9 && !h._12, h.toString)
    val b = out(3)
    assert(b._5 === 1.0 && !b._10 && !b._12, b.toString)
    val lw = out(4)
    assert(lw._3 === 11.5 && !lw._8 && !lw._12, lw.toString)
    intercept[IllegalArgumentException] {
      TextOps.gopherRules(docs, "doc_id", "text", Nil)
    }
  }

  test("charEntropy kit: hand-computed values, uniform/degenerate " +
    "corners, and the 12-dp decimal fold matching the shuffled form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),        // one class: H = 0, norm pinned 0.0
      (2L, "ab"),          // uniform 2: H = ln 2, norm = 1.0
      (3L, "aab"),         // 2/3, 1/3
      (4L, "abcd")         // uniform 4: norm = 1.0
    ).toDF("doc_id", "text")
    val out = TextOps.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4L, 1L, 0.0, 0.0)))
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = (r12(0.5 * math.log(0.5)) * 2).toDouble
    assert(out(2L) === ((2L, 2L, 2L, r6(-s2), r6(-s2 / math.log(2.0)))))
    val s3 = (r12((2.0 / 3) * math.log(2.0 / 3)) +
      r12((1.0 / 3) * math.log(1.0 / 3))).toDouble
    assert(out(3L) === ((3L, 3L, 2L, r6(-s3), r6(-s3 / math.log(2.0)))))
    assert(out(4L)._5 === 1.0) // uniform over 4 classes
  }

  test("piiScrub: counts equal inserted tags, email digits are consumed " +
    "before the long-number pass, 12- and 20-digit runs don't match, " +
    "clean text is the exact sequential redaction") {
    val docs = Seq(
      (1L, "mail bob.smith99@ex.co now 1.2.3.4 and 4111111111111111 " +
        "plus 123456789012 id 12345678901234567890"),
      // the 15-digit run sits INSIDE the email — the email pass consumes
      // it, so n_num must be 0, not 1
      (2L, "user123456789012345@x.io says hi"),
      (3L, "nothing to scrub here"))
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out(0) === ((1L, 1, 1, 1,
      "mail <EMAIL> now <IP> and <NUM> " +
        "plus 123456789012 id 12345678901234567890")))
    assert(out(1) === ((2L, 1, 0, 0, "<EMAIL> says hi")))
    assert(out(2) === ((3L, 0, 0, 0, "nothing to scrub here")))
  }

  test("groupOverlap: exact pairwise Jaccard/containment over distinct " +
    "shingle sets, within-group repeats collapse, empty pairs omitted, " +
    "pair order is group_a < group_b") {
    val docs = Seq(
      ("A", "a b c d"),        // shingles {a b c, b c d}
      ("A", "a b c"),          // repeat of "a b c" — distinct collapses
      ("B", "b c d e"),        // {b c d, c d e} — shares "b c d" with A
      ("C", "x y z w"))        // {x y z, y z w} — disjoint
      .toDF("lang", "text")
    val out = TextOps.groupOverlap(docs, "lang", "text", 3)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(out === Seq(("A", "B", 2L, 2L, 1L, 0.333333, 0.5)),
      out.toString)
  }
}
