package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r16 items 3 + 4: the isolated nearest-centroid ASSIGNMENT
  * probe — flat vs two-level tree (adaptive routing on and off) vs the
  * flag-gated three-level tree, on the distance-concentrated synthetic
  * embeddings where §10e measured the tree as a pure ~25% premium.
  *
  * What the artifact must show:
  *  - `k*_tree2_adaptive` within ~5% of `k*_flat`: the per-task
  *    TreeRouting sample detects the dead group screen and erases the
  *    premium (item 3's done bar);
  *  - `k4096_tree3` vs `k4096_tree2_fixed`: the 3-level structure's
  *    cost priced at an artificially large k long before the ~10⁵-cell
  *    scale that needs it (item 4's done bar — no win expected here,
  *    the corpus cannot give bounds anything to separate).
  *
  * Same discipline as the other spikes: the corpus is the embeddings
  * table replicated mult× with a dim-0 nudge (AnnBench's recipe), the
  * codebook is `k` strided corpus vectors (metadata, rides the
  * expression), every variant materializes the same xxhash64 fold,
  * two timed passes with the warm one reported, one JSON line.
  */
object TreeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_TREE_MULT", "50").toInt
    val kBig = sys.env.getOrElse("SPARK_GRAFT_TREE_K", "4096").toInt
    val kSmall = sys.env.getOrElse("SPARK_GRAFT_TREE_KSMALL", "313").toInt
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

    // SPARK_GRAFT_TREE_SYNTH_ONLY=1 skips the strided-codebook default
    // families so the >= 1e5-cell synthetic probe (below) can run on 3
    // JVMs without re-paying the k4096 flat baselines each time
    val synthOnly = sys.env.get("SPARK_GRAFT_TREE_SYNTH_ONLY").contains("1")
    // parsed once here, consumed by the synth block below
    val synthK = sys.env.getOrElse("SPARK_GRAFT_TREE_SYNTH_K", "0").toInt
    require(!synthOnly || synthK > 0,
      "SPARK_GRAFT_TREE_SYNTH_ONLY=1 with no SPARK_GRAFT_TREE_SYNTH_K " +
        "measures nothing — set a positive synth k (ADVICE r18)")

    val emb = Tables(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val corpus = emb
      .crossJoin(spark.range(mult.toLong).select($"id".as("__rep")))
      .select(($"vec_id" * mult + $"__rep").as("vec_id"), expr(
        "transform(embedding, (x, i) -> CASE WHEN i = 0 " +
          "THEN CAST(x + __rep * CAST(0.001 AS FLOAT) AS FLOAT) " +
          "ELSE x END)").as("embedding"))
    val nCorpus = if (synthOnly) -1L else corpus.count()
    require(synthOnly || nCorpus >= kBig,
      s"corpus ($nCorpus rows) must cover the largest codebook ($kBig)")

    // k strided corpus vectors as the codebook — deterministic, distinct
    // (the rep nudge), metadata-scale collect. The modulo pick assumes
    // the derived vec_ids are dense from 0 (true for the testdata
    // tables this main reads); on a sparse/offset id space it would
    // silently probe a smaller codebook than the k the JSON record
    // claims, so the size is ASSERTED (ADVICE r17).
    def codebook(k: Int): Seq[(Int, Array[Double])] = {
      val stride = math.max(1L, nCorpus / k)
      val picked = corpus.filter($"vec_id" % stride === 0)
        .orderBy($"vec_id").limit(k)
        .select($"embedding").as[Array[Float]].collect()
      require(picked.length == k,
        s"codebook($k): stride pick yielded ${picked.length} rows — " +
          "corpus vec_ids are not dense from 0; the artifact's k would " +
          "misstate the probed codebook")
      picked.zipWithIndex.map { case (v, i) => (i, v.map(_.toDouble)) }.toSeq
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[tree-bench] FAILED: ${e.getMessage}")
        -1.0
      }
    }
    def force(df: DataFrame): Unit = {
      df.select(bit_xor(xxhash64(df.columns.map(col).toSeq: _*))).collect()
      ()
    }
    import graft.operators.SimilarityOps
    def assign(expr: Column): DataFrame =
      corpus.select($"vec_id", expr.getField("cluster").as("cluster"))

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val hashes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // None = no synth block ran; Some(false) = ran but agreement not
    // verifiable (build-only, or a single-variant subset — ADVICE r19)
    var synthAgreementChecked: Option[Boolean] = None
    def variant(tag: String, mk: () => Column): Unit = {
      // fresh expression per pass: the adaptive router must SAMPLE in
      // the timed pass (a reused decided router would flatter it)
      val cold = timed(force(assign(mk())))
      val warm = timed(force(assign(mk())))
      results(tag + "_cold") = cold
      results(tag) = warm
      hashes(tag) = assign(mk())
        .select(bit_xor(xxhash64($"vec_id", $"cluster"))).as[Long].head()
    }

    // deterministic random UNIT vectors — pairwise distances concentrate
    // (the §10e regime: triangle-inequality bounds cannot separate
    // groups), so the tree's screen is dead by construction. This is
    // the fixture item 3's done bar is measured on: tree2_adaptive must
    // land within ~5% of flat because the router detects the dead
    // screen and falls back.
    def codebookConcentrated(k: Int): Seq[(Int, Array[Double])] =
      (0 until k).map { i =>
        val raw = Array.tabulate(64)(d => math.sin(i * 31 + d * 7))
        val norm = math.sqrt(raw.map(x => x * x).sum)
        (i, raw.map(_ / norm))
      }

    for ((k, label, cents) <- (if (synthOnly) Seq.empty else Seq(
      (kSmall, s"k$kSmall", codebook(kSmall)),
      (kSmall, s"k${kSmall}conc", codebookConcentrated(kSmall)),
      (kBig, s"k$kBig", codebook(kBig))))) {
      variant(s"${label}_flat",
        () => SimilarityOps.nearestExprFlat($"embedding", cents))
      variant(s"${label}_tree2_fixed",
        () => SimilarityOps.nearestExprTree($"embedding", cents,
          adaptiveRouting = false))
      variant(s"${label}_tree2_adaptive",
        () => SimilarityOps.nearestExprTree($"embedding", cents,
          adaptiveRouting = true))
      if (k == kBig)
        variant(s"${label}_tree3",
          () => SimilarityOps.nearestExprTree3($"embedding", cents))
      // every physical form must assign identically (bit-parity is
      // spec-pinned; this is the volume-scale restatement)
      val distinctHashes = hashes.filter(_._1.startsWith(label + "_"))
        .values.toSet
      require(distinctHashes.size == 1,
        s"$label variants disagree: $hashes")
    }

    // VERDICT r17 item 6: the scale the 3-level tree TARGETS (>= 1e5
    // cells, past Tree3AssignThreshold) never had a fixture — the k4096
    // probe priced the structure 25x below its engagement point.
    // SPARK_GRAFT_TREE_SYNTH_K=100000 builds a fully synthetic,
    // SEPARABLE regime at that scale: sqrt(k) far-apart group anchors
    // (spread 10, member jitter 0.05), a corpus drawn around the same
    // anchors (its own jitter 0.2) so the tree's group screen has real
    // separation to exploit — the clusterable case the 2-level premium
    // claim was tied to, now at the k where the SUPER level should pay.
    // Deterministic sin-hash vectors on both sides; corpus rows =
    // SPARK_GRAFT_TREE_SYNTH_N (default 20000 — flat is O(k*d) per row,
    // ~1.3e11 mul-adds per pass at the defaults).
    if (synthK > 0) {
      val synthN = sys.env.getOrElse("SPARK_GRAFT_TREE_SYNTH_N", "20000").toInt
      val g = math.ceil(math.sqrt(synthK.toDouble)).toInt
      def anchor(grp: Int, d: Int): Double =
        10.0 * math.sin(grp * 131.0 + d * 17.0)
      val synthCents: Seq[(Int, Array[Double])] = (0 until synthK).map { i =>
        (i, Array.tabulate(64)(d =>
          anchor(i % g, d) + 0.05 * math.sin(i * 31.0 + d * 7.0)))
      }
      val synthCorpus = spark.range(synthN.toLong).select(
        $"id".cast("int").as("vec_id"),
        expr(("transform(sequence(0, 63), d -> " +
          s"10.0d * sin((id % $g) * 131.0d + d * 17.0d) + " +
          "0.2d * sin(id * 997.0d + d * 13.0d))")).as("embedding"))
      def assignS(e: Column): DataFrame =
        synthCorpus.select($"vec_id", e.getField("cluster").as("cluster"))
      // At this k the DRIVER-side tree construction (single-threaded
      // Lloyd's grouping over the 1e5 centroids) costs the same order
      // as scanning a 20k-row corpus flat, so build and assignment are
      // timed SEPARATELY — conflating them (the k4096 probe's shape)
      // would report the tree at parity with flat when its per-row
      // assignment is an order faster. A production write() pays the
      // build once per codebook against a corpus-scale assignment, so
      // the per-row number is the one the 1e5-cell engagement
      // threshold must be judged on; the build cost is its own
      // finding (it grows O(k^1.5 d) on one driver thread). Fresh
      // expression per pass still: the adaptive router must SAMPLE in
      // the timed pass.
      // SPARK_GRAFT_TREE_BUILD_ONLY=1 times ONLY the tree
      // construction (two fresh builds per variant, cold + warm) and
      // skips the corpus assignment + hash agreement: the shape for
      // k >= 1e6 probes where the 0.5 GB codebook inside the
      // assignment EXPRESSION would dominate the measurement (plan
      // serialization, not the build under test)
      val buildOnly = sys.env.get("SPARK_GRAFT_TREE_BUILD_ONLY")
        .contains("1")
      // comma-subset of flat,tree2_fixed,tree2_adaptive,tree3 (default
      // all) so heavy-k probes can skip the O(k*d)-per-row flat
      // baseline; empty selections and unknown names fail loudly
      // (ADVICE r18) — shared parser, see HarnessEnv
      val variantFilter = HarnessEnv.selectedNames(
        "SPARK_GRAFT_TREE_SYNTH_VARIANTS",
        Seq("flat", "tree2_fixed", "tree2_adaptive", "tree3"))
      def variantOn(short: String): Boolean =
        variantFilter.forall(_.contains(short))
      def variantS(tag: String, mk: () => Column): Unit = {
        val b1 = System.nanoTime()
        val e1 = mk()
        val build1 = (System.nanoTime() - b1) / 1e9
        val cold = if (buildOnly) -1.0 else timed(force(assignS(e1)))
        val b2 = System.nanoTime()
        val e2 = mk()
        val build2 = (System.nanoTime() - b2) / 1e9
        val warm = if (buildOnly) -1.0 else timed(force(assignS(e2)))
        results(tag + "_build_cold") = build1
        if (!buildOnly) results(tag + "_cold") = cold
        results(tag + "_build") = build2
        if (!buildOnly) results(tag) = warm
        if (!buildOnly)
          hashes(tag) = assignS(mk())
            .select(bit_xor(xxhash64($"vec_id", $"cluster"))).as[Long].head()
      }
      val label = s"k${synthK}synth"
      if (variantOn("flat"))
        variantS(s"${label}_flat",
          () => SimilarityOps.nearestExprFlat($"embedding", synthCents))
      if (variantOn("tree2_fixed"))
        variantS(s"${label}_tree2_fixed",
          () => SimilarityOps.nearestExprTree($"embedding", synthCents,
            adaptiveRouting = false))
      if (variantOn("tree2_adaptive"))
        variantS(s"${label}_tree2_adaptive",
          () => SimilarityOps.nearestExprTree($"embedding", synthCents,
            adaptiveRouting = true))
      if (variantOn("tree3"))
        variantS(s"${label}_tree3",
          () => SimilarityOps.nearestExprTree3($"embedding", synthCents))
      if (!buildOnly) {
        val labelHashes = hashes.filter(_._1.startsWith(label + "_")).values
        require(labelHashes.toSet.size <= 1,
          s"$label variants disagree: $hashes")
        // with a single-variant SPARK_GRAFT_TREE_SYNTH_VARIANTS subset
        // the require above passes vacuously — the artifact must say
        // whether cross-variant agreement was actually verified rather
        // than let a subset probe impersonate the checked run
        // (ADVICE r19)
        synthAgreementChecked = Some(labelHashes.size >= 2)
        if (labelHashes.size < 2)
          System.err.println("[tree-bench] fewer than two synth " +
            "variants ran — cross-variant hash agreement NOT verified " +
            "this run (see hash_agreement_checked)")
      } else synthAgreementChecked = Some(false)
    }
    // join the timing fields into the field list rather than appending
    // ",$timings": a configuration that populates no variants (e.g.
    // synth-only with synth_k=0) previously emitted a trailing comma —
    // a malformed JSON artifact (ADVICE r18)
    val fields = Seq(s""""metric":"ann_tree_probe"""", """"unit":"sec"""",
      s""""sf":"$sfDir"""", s""""cpus":$cpus""", s""""mult":$mult""",
      s""""n_corpus":$nCorpus""", """"dims":64""",
      s""""synth_k":$synthK""") ++
      synthAgreementChecked.map(b =>
        s""""hash_agreement_checked":$b""").toSeq ++
      results.map { case (k, v) => s""""$k":$v""" }
    println(fields.mkString("{", ",", "}"))
    spark.stop()
  }
}
