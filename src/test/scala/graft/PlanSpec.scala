package graft

/** Physical-plan assertions: the properties that make these operators
  * scale are pinned here so a refactor that silently loses a pushdown, a
  * broadcast, or the top-k shape fails the build — on a 100 TB input
  * each of these is the difference between reading a row-group and
  * reading the table, or between a broadcast and a 600 GB shuffle.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("s1: both predicates reach the parquet scan as pushed filters") {
    val p = plan("s1_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(user_id), IsNotNull(ts), " +
      "EqualTo(user_id,7), GreaterThanOrEqual(ts,"), p)
  }

  test("s1: scan reads only the projected columns") {
    val p = plan("s1_scan_pushdown")
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("event_id"))
    assert(!scanLine.contains("props"), scanLine) // unused wide column pruned
  }

  test("j1: dimension joins broadcast, no sort-merge join") {
    val p = plan("j1_broadcast_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("v1: brute-force top-k is a TakeOrdered, not a global sort") {
    val p = plan("v1_cosine_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q1_agg")
    val firstAgg = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(firstAgg.size >= 2, p) // partial_ + final
    assert(firstAgg.exists(_.contains("partial_")), p)
  }

  test("v5: IVF cell assignment is a partial aggregation, not a window sort") {
    val p = plan("v5_ivf_ann")
    // the n x cells fan-out must collapse map-side: a partial min_by agg
    // keyed by vector id (the query-side nprobe rank keeps its window —
    // that's 1 row x cells, not the data fan-out)
    assert(p.contains("partial_min_by"), p)
  }

  test("d3: candidate pairs run on ONE MinHash lineage (no cached self-join)") {
    val p = plan("d3_minhash_pairs")
    // the in-bucket pair generation reads the banded lineage once: a single
    // scan of documents, no InMemoryTableScan (nothing persisted)
    assert(!p.contains("InMemoryTableScan"), p)
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    // the bucket cap still applies map-side before the shuffle
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("d6: posting lists are df-capped before the self-join") {
    val p = plan("d6_inverted_jaccard")
    // the document-frequency cap must sit between the df aggregate and
    // the join — without it one boilerplate shingle in f docs emits f^2
    // join rows; the df>=2 pair-pruning applies after the per-doc regroup
    assert("\\(df#\\d+L? <= 50\\)".r.findFirstIn(p).isDefined, p)
    assert("\\(x#\\d+\\.df >= 2\\)".r.findFirstIn(p).isDefined, p)
    // intersection counts partial-aggregate before their shuffle
    assert(p.contains("partial_count"), p)
  }

  test("t10: stratified sample caps map-side (WindowGroupLimit, both phases)") {
    val p = plan("t10_sample_split")
    // rank<=n must prune BEFORE the shuffle: partial + final group limits
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined, p)
    assert("WindowGroupLimit.*Final".r.findFirstIn(p).isDefined, p)
  }

  test("t13: repetition signals are a zero-exchange projection") {
    val p = plan("t13_repetition")
    // per-document statistics must never shuffle (the final orderBy is
    // the only allowed exchange — the display sort of the query surface)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 0, s"per-doc stats must not shuffle:\n$p")
    // the kit must be evaluated ONCE, behind the Generate barrier —
    // CollapseProject would otherwise re-run the pass per output column
    assert("graft_repetition_kit".r.findAllIn(p).size === 1, p)
    assert(p.contains("Generate explode"), p)
  }

  test("a7: sessionize is ONE shuffle — the session rollup reuses the " +
    "window's key partitioning, both windows share one sort") {
    val p = plan("a7_sessionize")
    // hashpartitioning(user_id) satisfies the (user_id, session_no)
    // clustering, so the aggregate adds no exchange; the display orderBy
    // adds a rangepartitioning, which is not counted here
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"sessionize must shuffle once on the key:\n$p")
    // exactly one (user_id, ts, ...) window sort — the display orderBy's
    // (user_id, session_no) range sort is a different prefix
    assert("Sort \\[user_id#\\d+L ASC NULLS FIRST, ts#".r
      .findAllIn(p).size === 1,
      s"lag + running sum + rollup must share one sorted pass:\n$p")
  }

  test("v9: per-query top-k caps map-side (WindowGroupLimit) over a " +
    "broadcast query batch") {
    val p = plan("v9_topk_batch")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t24: LM scoring partial-aggregates the vocabulary count and " +
    "broadcasts it into the token join at this SF") {
    val p = plan("t24_lm_score")
    // the token count must combine map-side before its shuffle
    assert(p.contains("partial_count"), p)
    // at bench SF the vocabulary fits the planner's broadcast threshold;
    // the join must not be a sort-merge (the unhinted operator leaves
    // the web-scale shuffle demotion to the planner)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t27: doc bigrams are built IN-ROW (zip_with over slices) — no " +
    "positional self-join of the token frame") {
    val p = plan("t27_bigram_lm")
    // the in-row construction shows as a zip_with inside the Generate;
    // a positional self-join would key a join on (doc_id, pos)
    assert(p.contains("zip_with"), p.take(1500))
    // count aggregations combine map-side before their shuffles
    assert(p.contains("partial_count"), p)
  }

  test("a25: the sketch build pre-cuts map-side — rank filters compile " +
    "to WindowGroupLimit on both the build and merge cuts") {
    val p = plan("a25_quantile_sketch")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("c5: the marginals re-aggregate the (source, token) counts " +
    "through reused exchanges at runtime, not four separate corpus aggs") {
    // exchange reuse is an EXECUTION-time property under AQE — the
    // initial adaptive plan prints each branch separately; only the
    // final plan shows the ReusedExchange nodes
    val df = SparkEntry.queries("c5_source_divergence")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("ReusedExchange"),
      s"(source, token) counts must be computed once and reused:\n$p")
  }

  test("d17: boilerplate doc-frequency combines map-side and the " +
    "threshold set anti-joins without a nested loop") {
    val p = plan("d17_boilerplate")
    // the distinct-doc count must partial-agg before its exchange
    assert(p.contains("partial_count(distinct"), p)
    // the boilerplate set joins as a hash anti-join (broadcast at this
    // SF; the unhinted shape leaves web-scale demotion to the planner)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t25: novelty's first-owner min is a partial aggregation and " +
    "the shuffle carries shingle hashes, not text") {
    val p = plan("t25_ngram_novelty")
    assert(p.contains("partial_min"), p)
    // the ownership join keys on the md5 hash column
    assert(p.contains("__h"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("c8: source overlap pairs come from an EQUI-join on token over " +
    "a distinct vocabulary frame — never a cartesian pairing") {
    val p = plan("c8_source_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the vocabulary distinct must combine map-side before its exchange
    assert(p.contains("partial"), p)
  }

  test("d16: fuzzy decontamination candidates come from a bucket " +
    "EQUI-join — never a cartesian or nested-loop pairing") {
    val p = plan("d16_fuzzy_decontaminate")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the band-bucket join keys must reach the join as an equi-condition
    assert("Join \\[band_idx#\\d+, band_key#\\d+\\]".r.findFirstIn(p)
      .isDefined || p.contains("BroadcastHashJoin [band_idx"), p)
  }

  test("v28: binary-quant ANN is two TakeOrdered heaps (Hamming cut, " +
    "cosine re-rank) — no global sort, no shuffle of vectors") {
    val p = plan("v28_binary_quant")
    assert("TakeOrderedAndProject".r.findAllIn(p).size === 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    // the 1-row query side broadcasts; the corpus never shuffles
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
  }

  test("t29: the zipf vocabulary-head cut is a TakeOrdered heap over the " +
    "partially-aggregated counts; the regression sums partial-agg too") {
    val p = plan("t29_zipf_fit")
    assert(p.contains("TakeOrderedAndProject(limit=500"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("a31: the median/MAD frames (|event_type| rows) broadcast back to " +
    "the fact side — never a sort-merge join of the event stream") {
    val p = plan("a31_mad_outliers")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("a32: islands rides ONE key exchange — boundary window, running " +
    "sum, and run aggregation all reuse the user_id partitioning") {
    val p = plan("a32_event_runs")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("a33: the per-type totals broadcast back to the daily grid; the " +
    "daily aggregation is partial") {
    val p = plan("a33_cusum_drift")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("c11: chi-square marginals and the grand total all broadcast — " +
    "the cell table never sort-merges") {
    val p = plan("c11_lang_balance")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row total
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t30: sentence stats are a pure per-row map — zero hash " +
    "exchanges, scan pruned to (doc_id, text)") {
    val p = plan("t30_sentence_stats")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("source"), scanLine) // unused columns pruned
  }

  test("t31: unigram and bigram counts partial-aggregate before their " +
    "token-key shuffles; the top-20 cut windows only the support-" +
    "filtered collocations") {
    val p = plan("t31_pmi_collocations")
    assert(p.contains("partial_count"), p)
    assert(p.contains("row_number"), p)
  }

  test("a34: both OHLC row_number windows and the bar aggregation share " +
    "ONE (event_type, hour) exchange") {
    val p = plan("a34_ohlc_bars")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("a36: unpivot compiles to ONE Expand pass — no shuffle, no join") {
    val p = plan("a36_unpivot")
    assert(p.contains("Expand"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    assert(!p.contains("Join"), p)
  }

  test("a37: rolling distinct expands the DISTINCT pair frame, not the " +
    "raw stream — the explode sits above a distinct aggregation") {
    val p = plan("a37_rolling_distinct")
    assert(p.contains("Generate explode"), p)
    assert(p.contains("partial_count"), p)
  }

  test("a39/a40: weighted median and gini each ride keyed exchanges " +
    "with broadcast totals — no sort-merge join of the event stream") {
    val p39 = plan("a39_weighted_median")
    assert(p39.contains("BroadcastHashJoin"), p39)
    assert(!p39.contains("SortMergeJoin"), p39)
    val p40 = plan("a40_gini_activity")
    assert(p40.contains("partial_count"), p40)
    assert(!p40.contains("SortMergeJoin"), p40)
  }

  test("t32: the vocabulary head is a TakeOrdered heap and broadcasts " +
    "into the membership join — the token stream never sort-merges") {
    val p = plan("t32_oov_rate")
    assert(p.contains("TakeOrderedAndProject(limit=500"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("c14: dedup savings is ONE hash-keyed window then a partial-" +
    "agged rollup — the corpus text is scanned once") {
    val p = plan("c14_dedup_savings")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("j13: the temporal anti-join is ONE equi-keyed LeftAnti hash " +
    "join — the range bound rides as a residual condition, never a " +
    "BroadcastNestedLoop pairing") {
    val p = plan("j13_temporal_antijoin")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("LeftAnti".r.findAllIn(p).size === 1, p)
    // the equi user key drives the join; the hour bound is a filter
    // within matched keys
    assert("Join \\[user_id#\\d+L?\\], \\[pu#\\d+L?\\], LeftAnti"
      .r.findFirstIn(p).isDefined, p)
  }

  test("j14: the bounded-staleness as-of runs the union as-of shape — " +
    "ONE user-keyed exchange, no join anywhere") {
    val p = plan("j14_asof_staleness")
    assert(!p.contains("Join"), p)
    val ex = "Exchange hashpartitioning\\(user_id#\\d+L?"
      .r.findAllIn(p).size
    assert(ex === 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("a41: the raw event scan partial-aggregates BEFORE any exchange " +
    "— both shuffles carry (type, week) aggregate rows, never events. " +
    "(One event_type-keyed exchange would let the window ride free but " +
    "would shuffle the raw corpus into ~4 skewed partitions — the " +
    "two-exchange plan is the scale-correct one.)") {
    val p = plan("a41_wow_change")
    assert(p.contains("partial_count"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    // the scan reads only the two columns the rollup needs
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("ReadSchema: struct<ts:"), scanLine)
    assert(!scanLine.contains("value"), scanLine)
  }

  test("a43: HLL registers partial-aggregate map-side (each task " +
    "collapses to <= 64 rows per group BEFORE the exchange) and the " +
    "corpus scans prune to the id/key columns") {
    val p = plan("a43_hll_distinct")
    assert(p.contains("partial_max"), p)
    // every events scan reads only the columns the sketch needs
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty, p)
    assert(scans.forall(s => !s.contains("value") && !s.contains("ts:")),
      scans.mkString("\n"))
  }

  test("a44: both KMV cuts pre-reduce per partition (WindowGroupLimit " +
    "Partial k-heaps below the exchange) and the algebra joins " +
    "broadcast — sketch rows, never raw data, cross the wire") {
    val p = plan("a44_kmv_algebra")
    assert("WindowGroupLimit .* Partial".r.findAllIn(p).size === 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d23: document text never shuffles — the corpus-sized exchange " +
    "carries 8-byte window hashes with map-side partial counts; the " +
    "hash-count subtree reads ONLY the text column; all duplicate-span " +
    "statistics roll up from one islands lineage (3 scans total: " +
    "count, join-back, per-doc totals)") {
    val p = plan("d23_substring_spans")
    assert(p.contains("partial_count"), p)
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size === 3, p)
    assert(scans.exists(_.contains("ReadSchema: struct<text:string>")),
      scans.mkString("\n"))
    // no exchange repartitions the raw text: every hashpartitioning is
    // on the window hash or the doc id
    val exch = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exch.forall(e => e.contains("__wh") || e.contains("doc_id")),
      exch.mkString("\n"))
  }

  test("d24: the removal form keeps d23's no-text-shuffle property — " +
    "every exchange keys on the window hash, the doc id, or the " +
    "position; ownership is a map-side partial min, never a corpus " +
    "window sort; 3 document scans") {
    val p = plan("d24_substring_dedup")
    assert(p.contains("partial_min"), p)
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size === 3, p)
    val exch = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exch.forall(e => e.contains("__wh") || e.contains("doc_id")),
      exch.mkString("\n"))
  }

  test("a45: both interpolation carrier windows ride ONE sort on the " +
    "grid's key exchange (the bucket rollup broadcasts in) — two hash " +
    "exchanges total, no extra sort per window") {
    val p = plan("a45_resample_interp")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert("Window \\[".r.findAllIn(p).size === 2, p)
    assert("Sort \\[user_id#\\d+L ASC NULLS FIRST, __b#\\d+L ASC NULLS FIRST\\], false"
      .r.findAllIn(p).size === 1, p)
  }

  test("s17: the ORC read pushes the predicate and prunes columns like " +
    "parquet") {
    val p = plan("s17_orc_roundtrip")
    assert(p.contains("Format: ORC") || p.contains("orc"), p)
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), " +
      "GreaterThanOrEqual(doc_id,0)]"), p)
  }

  test("pipeline: level chain reuses one site partitioning (no as-of " +
    "re-shuffle) and joins dims by broadcast") {
    val df = SparkEntry.queries("pl_levels_e2e")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the as-of union windows must NOT add exchanges beyond the site hash
    // partitionings of the window/join stages; count total exchanges as a
    // budget: raw lag/dedup (1 on site+cmp, 1 on site), silo/intensity
    // rollup joins, as-of, smoothing, final sort + the generator ranges.
    // observed: 2 site hashes (raw-path windows + as-of union), 2 rollup
    // grouping hashes (silo day, intensity hour), 1 final range sort.
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(exchanges <= 6, s"exchange budget blown: $exchanges\n$p")
    assert(p.contains("BroadcastHashJoin"), p) // stations join
  }

  test("pipeline under hot-site skew (one site ~60% of raw rows): every " +
    "join is broadcast or keyed composite — the hot site never " +
    "serializes a join exchange — and output equals the union of " +
    "per-site isolated runs") {
    // SCALE.md §2's 100 TB caveat made a fixture (VERDICT r12 item 4).
    // The per-site window stages (lag/dedup, as-of) MUST partition by
    // site alone — that is the sequential semantics — so the skew
    // posture rests on (a) every join keying finer than the site
    // (composite day/hour rollups) or broadcasting, and (b) the
    // documented escape hatch for the window stages themselves
    // (AsofStrategies.asOfLookupBucketed, SCALE.md §9). This pins (a)
    // structurally and the cross-site isolation functionally.
    import org.apache.spark.sql.functions._
    import graft.queries.PipelineQueries
    import graft.operators.LevelPipeline
    val raw = PipelineQueries.rawDf(spark, dir)
    // fold sites 1 and 2 onto site 0 (offsets keep (site, time) unique:
    // base grids land at +0/+360/+720 s, clone rows at +600 on top)
    val hotRaw = raw.filter(col("site_no").isin(0, 1, 2))
      .withColumn("time",
        expr("timestampadd(SECOND, site_no * 360, time)"))
      .withColumn("site_no", lit(0))
      .unionByName(raw.filter(!col("site_no").isin(0, 1, 2)))
    val counts = hotRaw.groupBy(col("site_no")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0).toDouble / counts.values.sum > 0.5,
      s"fixture lost its skew: $counts")

    val stations = PipelineQueries.stationsDf(spark)
    val silo = PipelineQueries.siloDf(spark)
    val intensity = PipelineQueries.intensityDf(spark)
    def chain(r: org.apache.spark.sql.DataFrame) =
      LevelPipeline.level3(
        LevelPipeline.level2(LevelPipeline.level1(r),
          stations, silo, intensity), stations)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("site_no"), col("time"),
        round(col("soil_moist"), 6), round(col("effective_depth"), 6),
        round(col("rainfall"), 6), col("flag"))
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

    // (b is §9's; a) the plan: every shuffled join keys composite
    val p = chain(hotRaw).queryExecution.executedPlan.toString
    val shuffledJoinKeys =
      """(?:SortMergeJoin|ShuffledHashJoin)(?:\w*)? \[([^\]]*)\]""".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
    shuffledJoinKeys.foreach { keys =>
      assert(keys.contains(","),
        s"a join shuffles on the site alone under skew: [$keys]\n$p")
    }

    // cross-site isolation: the hot site computes exactly what it would
    // compute alone, and the untouched sites are unaffected
    val whole = rows(chain(hotRaw))
    val split = rows(chain(hotRaw.filter(col("site_no") === 0))) ++
      rows(chain(hotRaw.filter(col("site_no") =!= 0)))
    assert(whole === split.sortBy(_.mkString("|")))
  }

  test("a46: OLS trend is ONE partial-aggregated key exchange") {
    val p = plan("a46_ols_trend")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("t36/t37: PII scrub and Gopher rules are pure in-row maps — " +
    "zero exchanges") {
    for (q <- Seq("t36_pii_scrub", "t37_gopher_rules")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, s"$q\n$p")
    }
  }

  test("c18: the overlap self-join shuffles hashes only — no text " +
    "column crosses an exchange") {
    val p = plan("c18_slice_overlap")
    // every hash exchange's output carries __h/__g (or the count
    // columns), never the raw text
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text"), l))
  }

  test("v36: projection apply broadcasts the loadings and folds in one " +
    "id-keyed aggregation") {
    val p = plan("v36_pca_project")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p)
    assert(p.contains("partial_sum"), p)
  }

  test("d25: Jaro-Winkler scoring is a pure projection over the blocked " +
    "pair stream — no join operator anywhere") {
    val p = plan("d25_jaro_winkler")
    assert(!p.contains("Join"), p)
    // base + borrowed-boundary branch: exactly two corpus scans
    assert("FileScan parquet".r.findAllIn(p).size === 2, p)
  }

  test("c23: every corpus-sized window is partitioned (__pid ranks or " +
    "per-source ranks) — the only single-partition stages are the 1-row " +
    "total and the parts-sized offset prefix sum") {
    val p = plan("c23_quantile_normalize")
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("__pid") || l.contains("source"), l)
    }
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 2, p)
  }

  test("v40: the refine stage broadcasts the 50-row ADC shortlist into " +
    "the vector join — no sort-merge join, corpus vectors read via " +
    "broadcast-hash only") {
    val p = plan("v40_adc_refine")
    assert(p.contains("TakeOrderedAndProject(limit=50"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("a49: burstiness is the gap window plus ONE partial-aggregated " +
    "type exchange (two hash exchanges total)") {
    val p = plan("a49_burstiness")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_sum"), p)
  }

  test("m9: the shared-patch count partial-aggregates the distinct " +
    "media per hash; no cartesian anywhere") {
    val p = plan("m9_patch_dedup")
    assert(p.contains("partial_count(distinct media_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v41: projection terms partial-sum map-side; the only nested-loop " +
    "is the broadcast 16-row j fan-out (never a cartesian)") {
    val p = plan("v41_rp_distortion")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
    // ya and yb re-derive the projection lineage, so the 16-row
    // broadcast fan-out appears once per side — both broadcast, never
    // a shuffle
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
  }

  test("t40: RAKE partitions by document everywhere — every hash " +
    "exchange is doc_id-keyed, no corpus-global key") {
    val p = plan("t40_rake_keywords")
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => assert(l.contains("doc_id"), l))
  }

  test("t41: the hamming pair stream has no join before the histogram " +
    "(the simhash IS the blocking key)") {
    val p = plan("t41_simhash_hamming")
    // the only join is the 1-row broadcast total onto the <=17-row
    // histogram — nothing pair- or corpus-sized joins anything
    assert("Join".r.findAllIn(p).size ===
      "BroadcastNestedLoopJoin".r.findAllIn(p).size, p)
  }

  test("a53: the attribution carry-forward rides ONE user-keyed " +
    "exchange; only the final tiny channel agg adds another") {
    val p = plan("a53_attribution")
    val userEx = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") &&
        l.contains("user_id")).size
    assert(userEx === 1, p)
  }

  test("v44: centroid means partial-aggregate map-side before the " +
    "(label, half, dim) exchange") {
    val p = plan("v44_centroid_drift")
    assert(p.contains("partial_sum"), p)
  }

  test("c25: the Heaps-fit shuffles carry md5 hashes, never text") {
    val p = plan("c25_heaps_fit")
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), l))
  }

  test("c25: the prefix sums are distributed-exact — the only " +
    "SinglePartition exchange feeds the parts-sized offset frame, " +
    "never doc rows") {
    val p = plan("c25_heaps_fit")
    // globalPrefixSum: doc rows range-partition; the partition-less
    // window runs over per-partition TOTALS (metadata). A global sort
    // or single-partition window over the doc stream would show as a
    // rangepartitioning(doc_id, 1) or a Window with no partition spec
    // consuming the scan side — assert the offset construction is
    // present and the doc-side carries a range exchange
    assert(p.contains("rangepartitioning(doc_id"), p)
    assert(p.toLowerCase.contains("spark_partition_id"), p)
  }

  test("d28/d29: blocked-pair containment and LPA stay free of " +
    "cartesian/nested-loop joins") {
    for (q <- Seq("d28_containment_pairs", "d29_label_propagation")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q + "\n" + p)
      assert(!p.contains("BroadcastNestedLoopJoin"), q + "\n" + p)
    }
  }

  test("t46: the native entropy kit is a pure projection — ZERO " +
    "exchanges before the output sort (t43's twin pays an " +
    "alphabet-by-docs shuffle)") {
    val p = plan("t46_char_entropy_kit")
    val pre = p.linesIterator.takeWhile(!_.contains("Sort")).toSeq
    assert(!pre.exists(_.contains("Exchange hashpartitioning")), p)
    assert(p.contains("graft_entropy_kit"), p)
  }

  test("j17: the interpolating as-of runs the union-window shape — " +
    "ONE user-keyed exchange feeds both frame passes, no join at all") {
    val p = plan("j17_interp_asof")
    val userEx = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") &&
        l.contains("user_id")).size
    assert(userEx === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("d27: linkage threshold filters BEFORE the component resolve — " +
    "the CC stage sees only >=0.9 edges, never the full pair stream") {
    // the registered query ends in connectedComponents, whose bounded
    // small-graph path materializes locally — so pin the lazy EDGE
    // stage it consumes: the thresholded pair stream must carry the
    // rounded-score filter in-plan and stay cartesian-free
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val edges = operators.DedupOps.sortedNeighborPairs(
        docs, "doc_id", substring(col("text"), 1, 24), window = 3)
      .select(col("a"), col("b"),
        round(operators.DedupOps.jaroWinklerSim(col("key_a"), col("key_b")), 6)
          .as("jw"))
      .filter(col("jw") >= 0.9)
      .select(col("a"), col("b"))
    val p = edges.queryExecution.executedPlan.toString
    // the rounded-score threshold is an in-plan Filter (Catalyst
    // collapses the jw alias into the predicate itself)
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("graft_jaro_winkler") &&
        l.contains(">= 0.9")), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
