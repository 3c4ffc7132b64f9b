package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume spike for the inverted-index / shingle family (VERDICT r17
  * item 4): d6 (df-capped posting-list Jaccard), t25 (corpus-global
  * first-owner novelty), d26 (substring index + spans/dedup against a
  * batch), d28 (containment via intersection joins), d31 (LSH candidate
  * precision) had no mult ≥ 50 record like LEVELS/DEDUP/ANN have —
  * this main prices the posting-list joins at mult=50/200 to verify
  * none hides a driver-side or single-partition wall at volume.
  *
  * Corpus recipe = DedupBench's `dup_light`: documents replicated
  * `SPARK_GRAFT_TEXT_MULT`× with a replica-unique token spliced into
  * every 8-token stride, so (almost) every cross-replica shingle/window
  * breaks and posting-list DFs stay REALISTIC as the corpus grows — a
  * plain replication would multiply every df by mult and measure the
  * df-cap filter instead of the join. The d31 case additionally
  * injects 3/5-prefix twins for every 5th doc (its fixture recipe), so
  * the banding has true near-dups to surface at every scale.
  *
  * Same discipline as the sibling spikes: two timed passes per case in
  * one JVM, warm pass first-class, every output column materialized
  * through the xxhash64 fold, one JSON line.
  * `SPARK_GRAFT_TEXT_CASES` selects a case subset for forked per-JVM
  * runs at the heaviest mults (the DedupBench r14 lesson: six cases ×
  * two passes of accumulated shuffle state can kill a single session
  * long before any operator is actually slow).
  */
object TextSpike {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_TEXT_MULT", "50").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{DedupOps, TextOps}

    val docs = Tables(spark, sfDir, "documents").select($"doc_id", $"text")
    val corpus = docs
      .crossJoin(spark.range(mult.toLong).select($"id".as("__rep")))
      .withColumn("doc_id", $"doc_id" * mult + $"__rep")
      .withColumn("text", concat_ws(" ", expr(
        "flatten(transform(split(text, ' '), " +
          "(t, i) -> CASE WHEN i % 8 = 0 THEN array(concat('u', __rep, 'x', i), t) " +
          "ELSE array(t) END))")))
      .drop("__rep")

    // d6's posting-list Jaccard shape: hashed 3-shingle postings,
    // df-cap, per-doc sizes riding the postings, one self-join on the
    // shingle hash — md5/hash-only shuffles, text never re-read
    def invertedJaccard(in: DataFrame): DataFrame = {
      val dfCap = 50
      val arr = in.select($"doc_id",
        array_distinct(
          TextOps.hashedShingles3(TextOps.tokens($"text"))).as("arr"))
      val sh = arr.select($"doc_id", explode($"arr").as("s"))
      val kept = sh.groupBy($"s").agg(count(lit(1)).as("df"))
        .filter($"df" <= dfCap)
      val shP = sh.join(kept, "s")
        .groupBy($"doc_id")
        .agg(collect_list(struct($"s", $"df")).as("sd"))
        .select($"doc_id", size($"sd").as("sz"), explode($"sd").as("x"))
        .filter($"x.df" >= 2)
        .select($"doc_id", $"sz", $"x.s".as("s"))
      shP.select($"doc_id".as("a"), $"sz".as("sza"), $"s")
        .join(shP.select($"doc_id".as("b"), $"sz".as("szb"), $"s"), "s")
        .filter($"a" < $"b")
        .groupBy($"a", $"b")
        .agg(count(lit(1)).as("inter"),
          any_value($"sza").as("sza"), any_value($"szb").as("szb"))
        .filter($"inter" >= 5)
        .select($"a", $"b", $"inter",
          round($"inter".cast("double") / ($"sza" + $"szb" - $"inter"), 6)
            .as("jaccard"))
    }

    // d28's containment shape: neighbor pairs sized + intersected via
    // two hash-only joins, never pairwise text
    def containment(in: DataFrame): DataFrame = {
      val sets = in.select($"doc_id",
        explode(TextOps.shingles(TextOps.tokens($"text"), 3)).as("sh"))
        .select($"doc_id", md5($"sh").as("h"))
        .distinct()
      val sz = sets.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      val pairs = in
        .select($"doc_id".as("a"), explode(sequence(lit(1), lit(2))).as("d"))
        .select($"a", ($"a" + $"d").as("b"))
        .join(sz.select($"doc_id".as("a"), $"sz".as("size_a")), "a")
        .join(sz.select($"doc_id".as("b"), $"sz".as("size_b")), "b")
      val inter = pairs
        .join(sets.select($"doc_id".as("a"), $"h"), "a")
        .join(sets.select($"doc_id".as("b"), $"h".as("h2")), "b")
        .filter($"h" === $"h2")
        .groupBy($"a", $"b")
        .agg(count(lit(1)).as("inter"))
      pairs.join(inter, Seq("a", "b"), "left")
        .select($"a", $"b", $"size_a", $"size_b",
          coalesce($"inter", lit(0L)).as("intersection"))
    }

    // d31's precision shape: banded minhash candidates, exact Jaccard
    // computed ONLY on the candidate set via intersection joins.
    // `sampleOneIn` > 1 keeps a deterministic 1-in-N id-hash draw of
    // the candidate PAIRS before the exact-verification joins — the
    // scalable precision-measurement shape: precision is a statistic,
    // and the exact candidate×shingle join's spill footprint grows
    // with corpus × candidate volume (measured: > 80 GB of spill at
    // mult=200 / 1.2M docs on the unsampled form — the disk wall this
    // spike exists to find), while a fixed-rate sample bounds it at
    // 1/N with a √-law error on the estimated rate.
    def lshPrecision(in: DataFrame, sampleOneIn: Long = 1L): DataFrame = {
      val twins = in.filter(pmod($"doc_id", lit(5)) === 0)
        .select(($"doc_id" + lit(1000000000L)).as("doc_id"),
          array_join(expr(
            "slice(split(text, ' '), 1, " +
              "greatest(cast(floor(size(split(text, ' ')) * 3 / 5) " +
              "as int), 3))"), " ").as("text"))
      val c = in.unionByName(twins)
      val candAll = DedupOps.minhashCandidatePairs(
        c, "doc_id", "text", shingleK = 3, numPerm = 8, bands = 2)
        .select($"a", $"b")
      val cand =
        if (sampleOneIn <= 1L) candAll
        else candAll.filter(
          pmod(xxhash64($"a", $"b"), lit(sampleOneIn)) === 0)
      val sets = c.select($"doc_id",
        explode(TextOps.shingles(TextOps.tokens($"text"), 3)).as("sh"))
        .select($"doc_id", md5($"sh").as("h"))
        .distinct()
      val sz = sets.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      val pz = cand
        .join(sz.select($"doc_id".as("a"), $"sz".as("sza")), "a")
        .join(sz.select($"doc_id".as("b"), $"sz".as("szb")), "b")
      val inter = cand
        .join(sets.select($"doc_id".as("a"), $"h"), "a")
        .join(sets.select($"doc_id".as("b"), $"h".as("h2")), "b")
        .filter($"h" === $"h2")
        .groupBy($"a", $"b")
        .agg(count(lit(1)).as("i"))
      pz.join(inter, Seq("a", "b"), "left")
        .select(round(coalesce($"i", lit(0L)).cast("double") /
          ($"sza" + $"szb" - coalesce($"i", lit(0L))).cast("double"), 6)
          .as("j"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when($"j" >= 0.5, 1L).otherwise(0L)).as("n_true_neardup"))
    }

    val w = 8
    val even = corpus.filter(pmod($"doc_id", lit(2)) === 0)
    val odd = corpus.filter(pmod($"doc_id", lit(2)) === 1)
    val allCases: Seq[(String, () => DataFrame)] = Seq(
      "novelty" -> (() =>
        TextOps.ngramNovelty(corpus, "doc_id", "text", 3)),
      "inverted_jaccard" -> (() => invertedJaccard(corpus)),
      "substr_against" -> (() => {
        val idx = DedupOps.substrIndex(even, "doc_id", "text", w)
        val spans = DedupOps
          .substringSpansAgainst(idx, odd, "doc_id", "text", w)
        val dedup = DedupOps
          .substringDedupAgainst(idx, odd, "doc_id", "text", w)
          .select($"doc_id", $"n_removed", $"n_kept", $"text_dedup")
        spans.join(dedup, Seq("doc_id"))
      }),
      "containment" -> (() => containment(corpus)),
      "lsh_precision" -> (() => lshPrecision(corpus)),
      "lsh_precision_sampled" -> (() => lshPrecision(corpus,
        sampleOneIn = 16L)))
    // empty/whitespace selections and unknown names fail loudly
    // (ADVICE r18) — shared parser, see HarnessEnv
    val cases = HarnessEnv.selectCases("SPARK_GRAFT_TEXT_CASES", allCases)

    def force(df: DataFrame): Unit = {
      df.select(bit_xor(xxhash64(df.columns.map(col).toSeq: _*))).collect()
      ()
    }
    val nDocs = corpus.count()
    try force(cases.head._2().limit(1)) catch { case _: Throwable => () }
    def pass(): Seq[(String, Double)] = cases.map { case (name, mk) =>
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { force(mk()); true } catch { case e: Throwable =>
        System.err.println(s"[text-spike] $name FAILED: ${e.getMessage}")
        false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = pass()
    val p2 = pass()
    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"text_spike","unit":"sec","sf":"$sfDir","mult":$mult,"cpus":$cpus,"n_docs":$nDocs,"pass2":${fmt(p2)},"pass1":${fmt(p1)}}""")
    spark.stop()
  }
}
