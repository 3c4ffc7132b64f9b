package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication operators. Shapes chosen for 100 TB inputs:
  *
  *  - exact dedup is one hash-shuffle on a 16-byte key (not the document
  *    body), with the winner picked by min_by — a single partial-aggregable
  *    groupBy, no window sort;
  *  - MinHash/LSH candidate generation explodes each doc into `bands` rows
  *    keyed by a band hash and self-joins per (band, key) bucket — the join
  *    key space is uniform (md5), so the shuffle is skew-free by
  *    construction except for degenerate buckets, which are capped;
  *  - verification (exact Jaccard) runs only on the candidate pairs, i.e.
  *    cost is O(candidates), not O(n^2).
  */
object DedupOps {

  /** Exact dedup on an arbitrary key expression (e.g. md5 of normalized
    * text). Keeps the row with the minimum `idCol` per key and annotates it
    * with the group size. One shuffle on the hash key; fully partial-agg.
    */
  def exactDedupStats(
      df: DataFrame,
      keyExpr: Column,
      idCol: String,
      carryCols: Seq[String]): DataFrame = {
    val keyed = df.withColumn("__key", keyExpr)
    val aggs = Seq(
      min(col(idCol)).as(idCol),
      count(lit(1)).as("dup_count")) ++
      carryCols.map(c => min_by(col(c), col(idCol)).as(c))
    keyed
      .groupBy(col("__key").as("dup_key"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Collapse near-duplicate CLUSTERS to a canonical representative —
    * the step after candidate pairs + connected components that actually
    * shrinks the corpus (the CCNet/Dolma-style "keep the best copy"
    * policy). Every document gets its duplicate-cluster id (its own id
    * when unclustered) and a flag marking the cluster's winner: highest
    * `score`, ties to the lowest id.
    *
    * Scale shape: components come from [[connectedComponents]] (edges
    * only — unclustered docs never enter the CC computation or its
    * shuffle); the winner per cluster is a partial-aggregable
    * `min_by(id, struct(-score, id))` (map-side collapse, no window
    * sort); the join back is an equi-join on the cluster id. Nothing is
    * ever per-corpus on the driver.
    *
    * @param docs  one row per document
    * @param idCol numeric document id column name
    * @param score quality score column expression over `docs` (higher =
    *              better; e.g. [[TextOps.qualityScore]]'s "quality")
    * @param pairs candidate duplicate pairs (a, b) — e.g.
    *              [[minhashCandidatePairs]] output
    * @return (idCol, component, score, is_canonical)
    */
  def canonicalPick(
      docs: DataFrame,
      idCol: String,
      score: Column,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("component"))
    val scored = docs.select(col(idCol), score.as("score"))
    // r21: consumed by the winner agg AND the final join — materialize
    // the (id, score, component) proxy once (guide §2.4)
    val withComp = Reuse.once(scored
      .join(comp, col(idCol).cast("long") === col("__cc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("__cc_id"))
    val winners = withComp
      .groupBy(col("component"))
      .agg(min_by(col(idCol), struct((-col("score")).as("ns"), col(idCol)))
        .as("__canonical"))
    withComp.join(winners, Seq("component"))
      .select(col(idCol), col("component"), col("score"),
        (col(idCol) === col("__canonical")).as("is_canonical"))
  }

  /** Benchmark DECONTAMINATION flag: a document is contaminated when it
    * shares at least one hashed 3-token shingle with any benchmark
    * document — the n-gram-overlap check a training corpus runs against
    * eval sets before release. Returns every doc with the boolean flag.
    *
    * Scale shape: the benchmark shingle set is tiny (eval sets are
    * thousands of docs) and broadcasts; the corpus side explodes to
    * (doc, shingle-hash) longs — never text — and the left-semi join +
    * distinct collapse map-side. One corpus pass, no corpus shuffle of
    * anything wider than (id, hash64).
    */
  def flagContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol),
      explode(TextOps.hashedShingles3(
        TextOps.tokens(col(textCol)))).as("__sh"))
    val benchSet = broadcast(shingled(benchmark).select(col("__sh")).distinct())
    val flagged = shingled(docs)
      .join(benchSet, Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(1))
    docs.select(col(idCol))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol), col("__hit").isNotNull.as("is_contaminated"))
  }

  /** [[flagContaminated]] with a Bloom prefilter — EXACT same output,
    * different (corpus-scale) plan. The benchmark shingle set is folded
    * into a Bloom filter (a pure partial aggregation, no shuffle of the
    * keys — [[SketchOps.bloomBuild]]); corpus shingles probe it map-side
    * inside the scan's codegen stage, and only the passing sliver
    * (true hits + ~fpp false positives) reaches the exact confirm
    * semi-join that removes the false positives. The bulk of a 100 TB
    * corpus is cleared by the probe without ever entering a join: the
    * confirm join's probe-side input shrinks from |corpus shingles| to
    * ~|contaminated| + fpp·|corpus shingles|, and when the benchmark key
    * set is too big to broadcast as a hash relation (GBs) its ~10
    * bits/key filter still is. This is Spark's own InjectRuntimeFilter
    * pattern, made explicit and composable.
    *
    * @param expectedShingles sizing for the filter (overestimate is
    *        safe: more bits, same exactness); fpp trades filter size
    *        against confirm-join input
    */
  def bloomFlagContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      expectedShingles: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol),
      explode(TextOps.hashedShingles3(
        TextOps.tokens(col(textCol)))).as("__sh"))
    val bench = shingled(benchmark).select(col("__sh"))
    val bloom = SketchOps.bloomBuild(
      bench, xxhash64(col("__sh")), expectedShingles, fpp)
    // no broadcast hint on the confirm join: in the very regime this op
    // exists for (benchmark too big to hash-broadcast) the optimizer
    // must be free to shuffle — and the left side is already only the
    // bloom-passing sliver, so that shuffle is small
    val flagged = shingled(docs)
      .where(SketchOps.bloomMightContain(bloom, xxhash64(col("__sh"))))
      .join(bench.distinct(), Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(1))
    docs.select(col(idCol))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol), col("__hit").isNotNull.as("is_contaminated"))
  }

  /** FUZZY decontamination: flag each corpus doc whose MinHash-estimated
    * Jaccard against ANY benchmark doc clears `tau` — the near-duplicate
    * sibling of [[flagContaminated]] (which only catches verbatim
    * n-gram overlap; a lightly-paraphrased eval item slips an exact
    * check but not this one).
    *
    * Scale shape (the [[DedupStore.dedupNewBatch]] serve-join, made
    * cross-corpus): candidates come from ONE bucket equi-join of the
    * corpus's capped LSH band rows against the benchmark's on
    * (band_idx, band_key) — never an all-pairs comparison — and the
    * match verdict is an in-row fold over the two signatures already in
    * the joined row (matching-component fraction, the standard MinHash
    * estimator), so verification re-reads NO document text. The
    * benchmark side is deliberately unhinted: eval sets broadcast under
    * the planner's threshold, and a benchmark too big for that must be
    * allowed to shuffle rather than OOM a forced broadcast. Output is
    * corpus-cardinality (idCol, is_contaminated); the intermediate hit
    * set is churn-sized.
    */
  def fuzzyFlagContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      tau: Double,
      shingleK: Int = 3,
      numPerm: Int = 8,
      bands: Int = 2,
      maxBucket: Int = 1000,
      capMetric: Option[String] = None): DataFrame = {
    require(tau > 0 && tau <= 1,
      s"fuzzyFlagContaminated: tau must be in (0, 1], got $tau")
    // A corpus doc ranked past the cap in a hot bucket is silently
    // never matched — a false negative in a SAFETY gate — so the
    // metered form reports both sides' cap events (`<name>.corpus`,
    // `<name>.benchmark`); see the bandRows scaladoc for the trade.
    val corpusRows = bandRows(
      docs, idCol, textCol, shingleK, numPerm, bands, maxBucket,
      withSig = true, capMetric = capMetric.map(_ + ".corpus"))
    val benchRows = bandRows(
      benchmark, idCol, textCol, shingleK, numPerm, bands, maxBucket,
      withSig = true, capMetric = capMetric.map(_ + ".benchmark"))
      .select(col("band_idx"), col("band_key"), col("sig").as("__bsig"))
    val hits = corpusRows
      .join(benchRows, Seq("band_idx", "band_key"))
      .withColumn("sig_sim",
        round(size(filter(zip_with(col("sig"), col("__bsig"),
          (p, q) => p === q), v => v)).cast("double") / numPerm, 6))
      .where(col("sig_sim") >= tau)
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(1))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("__hit").isNotNull.as("is_contaminated"))
  }

  /** Semantic (embedding-space) dedup, SemDeDup-style: link every vector
    * to its nearest neighbor within its group when the cosine clears
    * `tau`, take connected components over those links, and keep the
    * lowest id per cluster. Complements the lexical families: rewordings
    * that share no shingles still land in one embedding cluster.
    *
    * Scale shape: the candidate stage is [[SimilarityOps.nearestInGroup]]
    * (norms once, partial-aggregable top-1 — the group bucket bounds the
    * quadratic term; swap the group for an LSH bucket at corpus scale),
    * edges are at most one per vector, and unclustered vectors never
    * enter the CC computation.
    *
    * @return (idCol, component, is_canonical) for EVERY input vector
    *         (singletons form their own cluster)
    */
  def semanticDedup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      groupCol: String,
      tau: Double): DataFrame = {
    val edges = SimilarityOps
      .nearestInGroup(embeddings, idCol, vecCol, groupCol)
      .filter(col("sim") >= tau)
      .select(col("a"), col("nn").as("b"))
    val comp = connectedComponents(edges)
      .select(col("id").as("__cc_id"), col("component"))
    embeddings.select(col(idCol))
      .join(comp, col(idCol).cast("long") === col("__cc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), col(idCol).cast("long")))
      .select(col(idCol), col("component"),
        (col(idCol).cast("long") === col("component")).as("is_canonical"))
  }

  /** MinHash signatures + band keys for every document.
    *
    * @param bands     number of LSH bands; each covers numPerm/bands sig
    *                  elements. P(candidate) = 1 - (1 - j^r)^b for Jaccard
    *                  j, r = rows per band — the standard S-curve.
    */
  def minhashBands(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      numPerm: Int,
      bands: Int): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    require(shingleK == 3, "integer shingling is specialized to k=3")
    val r = numPerm / bands
    // One md5 per TOKEN (no shingle strings — see hashedShingles3); the
    // signature fold consumes the hashed array in a single pass for all
    // permutations (see minhashSignature).
    val withSig = df.select(col(idCol),
      TextOps.minhashSignature(
        TextOps.hashedShingles3(TextOps.tokens(col(textCol))),
        numPerm).as("sig"))
    (0 until bands).foldLeft(withSig) { (d, b) =>
      d.withColumn(s"band$b", TextOps.bandKey(col("sig"), b * r, (b + 1) * r))
    }
  }

  /** The exploded LSH banding rows (id[, sig], band_idx, band_key),
    * with degenerate buckets capped: rank within bucket, drop beyond
    * `maxBucket`. row_number + filter compiles to a WindowGroupLimit,
    * so the cap applies map-side BEFORE the shuffle — a hot bucket
    * never ships more than maxBucket rows per input partition. This is
    * both [[minhashCandidatePairs]]'s candidate stage (`withSig =
    * false`, lean shuffle) and [[DedupStore]]'s persisted row format
    * (`withSig = true` — the signature rides along so store joins can
    * verify matches without ever re-reading document text).
    *
    * A capped row is a candidate the downstream match NEVER sees — in
    * a decontamination gate that is a false negative, so cap events
    * must be visible (ADVICE r12): pass `capMetric` and the query
    * reports `rows_past_cap` / `max_bucket_rank` as a named observed
    * metric (`Dataset.observe` — an accumulator piggybacked on the
    * pass, no extra job), surfaced through `QueryExecutionListener`
    * for batch and `StreamingQueryProgress.observedMetrics` for
    * streams. Names must be unique per query — callers scoring two
    * frames in one plan suffix them (see [[fuzzyFlagContaminated]]).
    * The explicit trade: counting past-cap rows means they must reach
    * the metrics node, so the metered form gives up the
    * WindowGroupLimit map-side pre-reduction and ships whole hot
    * buckets to the shuffle — metering cost is proportional to the
    * pathology being watched; leave `capMetric` off on paths where the
    * cap is a pure throughput guard and false negatives are fine.
    */
  def bandRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      numPerm: Int,
      bands: Int,
      maxBucket: Int,
      withSig: Boolean,
      capMetric: Option[String] = None): DataFrame = {
    val banded = minhashBands(df, idCol, textCol, shingleK, numPerm, bands)
    val sigCols = if (withSig) Seq(col("sig")) else Nil
    val exploded = banded.select(
      (col(idCol) +: sigCols :+
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band_idx"), col(s"band$b").as("band_key"))): _*))
          .as("band")): _*)
      .select((col(idCol) +: sigCols :+ col("band.band_idx") :+
        col("band.band_key")): _*)
    val wB = Window.partitionBy(col("band_idx"), col("band_key"))
      .orderBy(col(idCol))
    val ranked = exploded.withColumn("__rk", row_number().over(wB))
    val metered = capMetric.fold(ranked)(name => ranked.observe(name,
      sum(when(col("__rk") > maxBucket, 1L).otherwise(0L))
        .as("rows_past_cap"),
      max(col("__rk")).as("max_bucket_rank")))
    metered
      .filter(col("__rk") <= maxBucket)
      .drop("__rk")
  }

  /** LSH candidate pairs: documents sharing at least one band key.
    * Explodes to (band_idx, band_key) and self-joins within buckets,
    * capping pathological buckets at `maxBucket` rows (cap events should
    * be logged/monitored in production — a hot bucket usually means a
    * boilerplate shingle flood).
    *
    * Output: (a, b, shared_bands) with a < b.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numPerm: Int = 8,
      bands: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    val capped = bandRows(
      df, idCol, textCol, shingleK, numPerm, bands, maxBucket,
      withSig = false)
    // Pairs are generated INSIDE each bucket (collect the <= maxBucket ids,
    // emit the i<j combinations) instead of a bucket self-join. One lineage
    // pass — the MinHash computation runs once, so no persist/cache is
    // needed (a self-join reads the lineage twice and either recomputes or
    // leaks a cache); and the groupBy lands on the window's partitioning,
    // so it adds no exchange.
    val buckets = capped
      .groupBy(col("band_idx"), col("band_key"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared_bands"))
  }

  /** Connected components over a candidate-pair edge list — the final
    * clustering step of corpus dedup (keep one doc per component). Min-
    * label propagation: every node repeatedly adopts the minimum label in
    * its neighborhood; converges in O(component diameter) rounds, checked
    * by a driver-side fixpoint count (the standard iterative-algorithm
    * shape on Spark — each round is one shuffle on node id, and dedup
    * components are tiny, so rounds ≈ 2-3 in practice).
    *
    * Output: (id, component) where component = min id reachable.
    */
  /** @param maxLocalEdges edge lists at or below this size are solved by
    *   driver union-find (microseconds) instead of the iterative join
    *   loop, whose per-round cost is scheduler overhead at small scale —
    *   the same adaptive local/distributed split as a broadcast-join
    *   threshold. Post-LSH candidate lists are usually tiny relative to
    *   the corpus; raise the threshold accordingly.
    */
  def connectedComponents(
      edges: DataFrame,
      maxIter: Int = 20,
      maxLocalEdges: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    // r21: materialize once — the bounded probe (limit+count) and the
    // local-path collect (or the distributed loop's sym persist) each
    // consumed the full upstream blocking plan a second time otherwise
    val longEdges = Reuse.once(
      edges.select(col("a").cast("long"), col("b").cast("long")))
    // Cheap bounded count first — the distributed path never pulls edges
    // to the driver; only the small-graph path pays the collect.
    // clamp: maxLocalEdges >= Int.MaxValue must not overflow to a
    // negative limit() (callers effectively asking for always-local)
    val probeLimit = math.min(maxLocalEdges + 1, Int.MaxValue.toLong).toInt
    val probed = longEdges.limit(probeLimit).count()
    if (probed <= maxLocalEdges) {
      val collected = longEdges.collect()
      // driver union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      collected.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val rows = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      import spark.implicits._
      return rows.toDF("id", "component")
    }
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
    var prevCache: Option[DataFrame] = None
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("next"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = updated.filter(col("next") < col("label")).count()
      // the new cache is materialized by the count; the previous
      // iteration's cache is no longer referenced — release it
      prevCache.foreach(_.unpersist())
      prevCache = Some(updated)
      labels = updated.select(col("id"), col("next").as("label"))
      i += 1
    }
    // Cut lineage off the loop caches, then RELEASE them: an explicit
    // persist is pinned by the CacheManager until unpersist, and a
    // long-lived session (Verify/Bench run 50+ queries in one JVM) would
    // otherwise accumulate dead caches until later queries' sorts spill.
    // localCheckpoint blocks, by contrast, are reclaimed by the
    // ContextCleaner once the returned frame is unreachable.
    val out = labels.select(col("id"), col("label").as("component"))
      .localCheckpoint(true)
    prevCache.foreach(_.unpersist())
    sym.unpersist()
    out
  }

  /** Exact n-gram Jaccard for given id pairs: |A ∩ B| / |A ∪ B| over the
    * distinct shingle sets. `pairs` must have columns (a, b); the docs side
    * is joined twice (shuffle on id — at scale, broadcast `pairs` if the
    * candidate set is small, which it is after LSH).
    */
  def ngramJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int): DataFrame = {
    require(shingleK == 3, "integer shingling is specialized to k=3")
    val sh = docs.select(
      col(idCol),
      array_distinct(TextOps.hashedShingles3(TextOps.tokens(col(textCol))))
        .as("sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("sh").as("sh_a")), "a")
      .join(sh.select(col(idCol).as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jaccard",
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6))
      .drop("sh_a", "sh_b")
  }

  /** Paragraph-level exact dedup with document reassembly — the
    * RefinedWeb-style pass that removes boilerplate below document
    * granularity: split every document on the REGEX `sepRegex` (escape
    * metacharacters for a literal separator), keep only the globally
    * FIRST occurrence of each distinct paragraph (first by (id,
    * position) — within-doc repeats collapse too), and stitch each
    * document back together from its surviving paragraphs in original
    * order. Documents whose every paragraph appeared earlier come back
    * empty, not dropped.
    *
    * Scale shape: the winner pick runs on md5(paragraph) partitions
    * through a rank-1 window that compiles to WindowGroupLimit — each
    * map partition pre-reduces to one candidate per paragraph hash
    * before the exchange, so the dedup shuffle carries at most one copy
    * of each distinct paragraph per input partition, not every
    * occurrence. Reassembly is one partial-aggregable groupBy(id) with
    * a bounded per-doc sort (sort_array over that doc's kept
    * paragraphs). Nothing is ever per-corpus on the driver.
    *
    * @return (idCol, n_paras, n_kept, text_dedup) for every input doc
    */
  def paragraphDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String,
      joiner: String): DataFrame = {
    val reserved = Seq("__h", "__rk", "pos", "para", "n_paras", "n_kept",
      "text_dedup").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"paragraphDedup reserves column(s) ${reserved.mkString(", ")} — " +
        "rename them on the input")
    val paras = docs
      .select(col(idCol), posexplode(split(col(textCol), sepRegex)))
      .withColumnRenamed("col", "para")
      .withColumn("__h", md5(col("para")))
    val w = Window.partitionBy("__h").orderBy(col(idCol), col("pos"))
    val kept = paras
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")),
          joiner).as("text_dedup"))
    docs
      .select(col(idCol), size(split(col(textCol), sepRegex)).as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Frequency-threshold boilerplate removal — [[paragraphDedup]]'s
    * CCNet-style sibling: instead of keeping each distinct paragraph's
    * first occurrence, REMOVE every occurrence of any paragraph that
    * appears in >= `minDocs` DISTINCT documents (optionally counted
    * within `groupCol`, e.g. per source/domain — a nav header is
    * boilerplate for its site, not for the web). Repeats inside one
    * rare document survive: the threshold is on document frequency,
    * not occurrence count. Documents whose every paragraph is
    * boilerplate come back empty, not dropped.
    *
    * Scale shape: document frequency is one two-phase distinct
    * aggregation on md5(paragraph) (partial per map partition — the
    * shuffle carries at most one (group, hash, doc) triple per
    * partition, then re-aggs the distinct-paragraph-sized frame). The
    * boilerplate set that comes back is threshold-sized, joined to the
    * exploded corpus with an UNHINTED left-anti join — auto-broadcast
    * when small, demoted to a shuffle join when a web-scale corpus
    * yields a giant boilerplate set instead of OOMing a forced
    * broadcast. Reassembly is [[paragraphDedup]]'s partial-aggregable
    * groupBy(id) with a bounded per-doc sort. Nothing is per-corpus on
    * the driver.
    *
    * @return (idCol, n_paras, n_kept, text_clean) for every input doc
    */
  def boilerplateRemoval(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String,
      joiner: String,
      minDocs: Int,
      groupCol: Option[String] = None): DataFrame = {
    require(minDocs >= 2,
      s"minDocs must be >= 2 (got $minDocs) — a threshold of 1 removes " +
        "every paragraph")
    val reserved = Seq("__h", "pos", "para", "n_paras", "n_kept",
      "text_clean").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"boilerplateRemoval reserves column(s) ${reserved.mkString(", ")} — " +
        "rename them on the input")
    val gCols = groupCol.toSeq.map(col)
    val paras = docs
      .select(col(idCol) +: gCols :+
        posexplode(split(col(textCol), sepRegex)): _*)
      .withColumnRenamed("col", "para")
      .withColumn("__h", md5(col("para")))
    val common = paras
      .groupBy(gCols :+ col("__h"): _*)
      .agg(count_distinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .drop("__nd")
    val kept = paras.join(common,
      groupCol.toSeq :+ "__h", "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")),
          joiner).as("text_clean"))
    docs
      .select(col(idCol), size(split(col(textCol), sepRegex)).as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Bounded-iteration PageRank over the candidate-pair graph, with a
    * per-component authority pick — the centrality-based alternative to
    * [[canonicalPick]]'s quality score: in a duplicate cluster the copy
    * most linked to other near-dups is usually the original (mirrors
    * link the source; the source links everything). Fixed `iters`
    * power-iteration rounds composed as ONE lazy plan (each round is a
    * contribution join + a partial-aggregable sum on the node frame —
    * no driver loop materializes anything), undirected edges, uniform
    * init 1/N.
    *
    * Engine-portable arithmetic (the kmeansFit/logisticFit discipline):
    * per-edge contributions round 12 dp → exact decimal sums
    * (order-independent), ranks re-round 9 dp each round, and the
    * damping complement is computed 1.0 − d in IEEE doubles on both
    * engines — never a re-literalized "0.15".
    *
    * Input contract: `pairs` distinct with a < b (what the blocking
    * stages emit). Only nodes IN the graph are ranked — an isolated doc
    * has no authority question to answer.
    *
    * @return (id, component, pr, is_authority) — pr at 9 dp; exactly
    *         one authority per component (max pr, ties to lowest id)
    */
  def pagerankPick(
      pairs: DataFrame,
      damping: Double = 0.85,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"pagerankPick: iters must be >= 1 (got $iters)")
    require(damping > 0.0 && damping < 1.0,
      s"pagerankPick: damping must lie in (0, 1), got $damping")
    // r21: materialize the candidate edge list once — the unrolled
    // iteration plan references it O(iters) times and would re-run the
    // whole upstream blocking (MinHash/banding) per reference
    // (guide §2.4; post-LSH candidate lists are cap-bounded, the same
    // premise connectedComponents' local path already relies on)
    val cand = Reuse.once(pairs.select(col("a"), col("b")))
    val e = cand.union(cand.select(col("b").as("a"), col("a").as("b")))
    val deg = e.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("a", "id")
    val n1 = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(n1))
      .select(col("id"),
        round(lit(1.0) / col("n").cast("double"), 9).as("pr"))
    var i = 0
    while (i < iters) {
      val src = pr.join(deg, "id")
        .select(col("id").as("a"),
          round(col("pr") / col("deg").cast("double"), 12)
            .cast("decimal(38,12)").as("__c"))
      val sums = e.join(src, "a")
        .groupBy(col("b")).agg(sum(col("__c")).as("__s"))
        .withColumnRenamed("b", "id")
      pr = deg.select(col("id"))
        .join(sums, Seq("id"), "left")
        .crossJoin(broadcast(n1))
        .select(col("id"),
          round((lit(1.0) - lit(damping)) / col("n").cast("double") +
            lit(damping) * coalesce(col("__s").cast("double"), lit(0.0)),
            9).as("pr"))
      i += 1
    }
    val comp = connectedComponents(cand)
      .select(col("id"), col("component"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("pr").desc, col("id").asc)
    pr.join(comp, "id")
      .withColumn("is_authority", row_number().over(w) === 1)
      .select(col("id"), col("component"), col("pr"), col("is_authority"))
  }

  /** Synchronous LABEL PROPAGATION over an undirected pair graph
    * (Raghavan et al. 2007), the deterministic variant: every node
    * starts labeled with its own id; each round it adopts the label
    * most frequent among its neighbors, ties broken by SMALLEST label
    * — no randomness, so the trajectory replays identically under
    * retries and in a CTE-unrolled SQL oracle (the d21/t26
    * discipline). `iters` fixed rounds build as ONE lazy plan: per
    * round, an edge-keyed join + a partial-aggregable
    * groupBy(node, label) + one per-node row_number pick — the whole
    * thing is integer-only (no float enters at any point). Community
    * detection as the softer sibling of [[connectedComponents]]: CC
    * merges anything touching; LPA keeps weakly-bridged clusters
    * apart, which is what a near-dup resolver wants when two dup
    * clusters share one accidental candidate pair.
    */
  def labelPropagation(pairs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"labelPropagation: iters must be >= 1 (got $iters)")
    // r21: same edge-list materialization as pagerankPick — the unrolled
    // rounds reference the pairs O(iters) times (guide §2.4)
    val cand = Reuse.once(pairs.select(col("a"), col("b")))
    val e = cand.union(cand.select(col("b").as("a"), col("a").as("b")))
    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
    var i = 0
    while (i < iters) {
      val w = Window.partitionBy(col("a"))
        .orderBy(col("cnt").desc, col("label").asc)
      labels = e
        .join(labels.select(col("id").as("__n"), col("label")),
          col("b") === col("__n"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("a").as("id"), col("label"))
      i += 1
    }
    labels.select(col("id"), col("label").as("community"))
  }

  /** Sorted-neighborhood blocking — the third blocking family next to
    * LSH buckets ([[minhashCandidatePairs]]) and SimHash bands: order
    * the corpus by a blocking key (length, a fingerprint prefix, a
    * normalized title), slide a window of `window` rows, and pair each
    * row with its `window − 1` successors in that total order. Catches
    * the near-misses hash blocking splits (off-by-one lengths, prefix
    * edits) at O(n·w) pairs; the classic record-linkage complement.
    *
    * DISTRIBUTED-EXACT, no global window: the frame range-partitions on
    * (key, id) — a total order consistent across partition boundaries —
    * and each partition pairs internally under a per-partition window.
    * Cross-boundary pairs come from replicating each partition's first
    * `window − 1` rows into its predecessor ("borrowed" rows), which
    * pair only as SUCCESSORS of that partition's own rows — borrowed-to-
    * borrowed pairs are suppressed, so nothing duplicates. The only
    * global structure is the range boundaries themselves (sampled
    * metadata); no stage ever single-partitions the corpus, which is
    * what makes this shape survive 100 TB where the textbook
    * row_number-over-everything formulation dies.
    *
    * Requires every range partition to hold ≥ `window` rows (borrowing
    * reaches one partition ahead only); `validatePartitions` checks
    * this with one partition-count pass and fails fast — skip it at
    * scale when n / numParts >> window makes violation impossible.
    *
    * Output: (a, b, key_a, key_b) with a before b in (key, id) order.
    */
  def sortedNeighborPairs(
      docs: DataFrame,
      idCol: String,
      keyCol: Column,
      window: Int,
      numParts: Int = 0,
      validatePartitions: Boolean = true): DataFrame = {
    require(window >= 2,
      s"sortedNeighborPairs: window must be >= 2 (got $window) — a " +
        "window of 1 pairs nothing")
    val spark = docs.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = docs
      .select(col(idCol).as("__id"), keyCol.as("__key"))
      .repartitionByRange(parts, col("__key"), col("__id"))
      .sortWithinPartitions(col("__key"), col("__id"))
      .withColumn("__pid", spark_partition_id())
    if (validatePartitions) {
      val counts = base.groupBy(col("__pid")).count()
        .select(min(col("count"))).collect()
      val minCount = if (counts.head.isNullAt(0)) 0L else counts.head.getLong(0)
      require(counts.isEmpty || minCount >= window,
        s"sortedNeighborPairs: a range partition holds $minCount < " +
          s"$window rows — lower numParts (or pass " +
          "validatePartitions=false when n/numParts >> window)")
    }
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(col("__key"), col("__id"))
    val borrowed = base
      .withColumn("__rn", row_number().over(wIn))
      .where(col("__rn") < window && col("__pid") > 0)
      .select((col("__pid") - 1).as("__pid"), col("__id"), col("__key"),
        lit(true).as("__borrowed"))
    val frame = base
      .select(col("__pid"), col("__id"), col("__key"),
        lit(false).as("__borrowed"))
      .union(borrowed)
    // borrowed rows sort AFTER every original row of the host partition
    // (they are the next range), so ordering by (key, id) inside the
    // partition reproduces the global order across the boundary
    val wPair = Window.partitionBy(col("__pid"))
      .orderBy(col("__key"), col("__id"))
    val leads = (1 until window).map { i =>
      lead(struct(col("__id"), col("__key"), col("__borrowed")), i)
        .over(wPair).as(s"__l$i")
    }
    frame
      .select(col("__pid") +: col("__id") +: col("__key") +:
        col("__borrowed") +: leads: _*)
      .where(!col("__borrowed")) // borrowed rows never LEAD a pair
      .select(col("__id"), col("__key"),
        explode(array((1 until window).map(i => col(s"__l$i")): _*))
          .as("__nb"))
      .where(col("__nb").isNotNull)
      .select(col("__id").as("a"), col("__nb.__id").as("b"),
        col("__key").as("key_a"), col("__nb.__key").as("key_b"))
  }

  /** Within-document duplicate-segment removal — the in-row third member
    * of the sub-document dedup family ([[paragraphDedup]] dedups across
    * the corpus, [[boilerplateRemoval]] removes corpus-frequent
    * segments): split each document on `sepRegex`, keep only the FIRST
    * occurrence of each distinct segment inside that same document
    * (original order preserved), and rejoin with `joiner`. The CCNet
    * per-document line-dedup step that runs BEFORE any cross-document
    * hashing — it normalizes away internal repetition (nav menus pasted
    * twice, chat scaffolding) so corpus-level fingerprints aren't
    * dominated by it.
    *
    * Scale shape: ZERO shuffles — the whole operator is one codegen'd
    * projection (split → indexed filter → array_join); no explode, no
    * window, no join, so it composes into any ingest scan for free. The
    * kept-segment test is first-occurrence-index == own-index
    * (array_position is the first index of the value), O(L²) in-row for
    * a doc of L segments — fine for real documents (L ~ 10²); a
    * pathological mega-doc should go through [[paragraphDedup]]'s
    * exploded shape instead.
    *
    * @return (idCol, n_segments, n_kept, text_dedup) for every input doc
    */
  def lineDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String,
      joiner: String): DataFrame = {
    val reserved = Seq("n_segments", "n_kept", "text_dedup")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"lineDedup reserves column(s) ${reserved.mkString(", ")} — " +
        "rename them on the input")
    val segs = split(col(textCol), sepRegex)
    // keep a segment iff the first index its value occurs at is its own
    // 1-based position — later repeats fail the test, order survives
    val kept = filter(segs, (x, i) => array_position(segs, x) === (i + 1))
    docs.select(col(idCol),
      size(segs).as("n_segments"),
      size(kept).as("n_kept"),
      array_join(kept, joiner).as("text_dedup"))
  }

  /** Character-level edit-distance verification of a candidate pair set
    * (the post-blocking refine step record linkage runs after LSH /
    * sorted-neighborhood blocking): join the pair ids to their texts,
    * compute Levenshtein distance and the normalized similarity
    * 1 − dist/max(len) — 1.0 iff identical, 0.0 iff nothing aligns.
    *
    * O(|a|·|b|) per pair, so NEVER run it all-pairs: `pairs` must come
    * from a blocking stage that bounds candidates (minhashCandidatePairs,
    * simhashPairs, key-adjacency). `maxChars` hard-caps the DP cost per
    * pair by comparing prefixes — the standard production guard against
    * one pathological mega-doc pair stalling a task; 0 disables. The two
    * id joins broadcast when docs are small, and only (id, text-prefix)
    * is carried into the shuffle, not the full row.
    */
  def editDistanceVerify(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxChars: Int = 2000): DataFrame = {
    require(maxChars >= 0, "editDistanceVerify: maxChars must be >= 0")
    pairTexts(pairs, docs, idCol, textCol, maxChars)
      .withColumn("edit_dist", myersLevenshtein(col("t_a"), col("t_b")))
      // the lit(1) floor makes the empty-vs-empty pair well-defined:
      // dist 0 over a 0-length max would be 0/0 -> null, not the
      // documented 1.0
      .withColumn("similarity",
        round(lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("t_a")), length(col("t_b")), lit(1)), 6))
      .drop("t_a", "t_b")
  }

  /** Exact Levenshtein as a native bit-parallel expression
    * ([[graft.expressions.MyersLev]]): identical values to Spark's
    * `levenshtein` (code-point distance) at O(n·⌈m/64⌉) instead of
    * O(n·m) — the unbounded refine stage at the 2000-char cap drops
    * ~60× in DP work. Codegen-friendly: the generated code is one
    * static call, same shape as dotFold.
    */
  def myersLevenshtein(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.MyersLev(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Jaro–Winkler similarity as a native codegen'd expression
    * ([[graft.expressions.JaroWinkler]]) — the record-linkage scorer
    * for short identifier-like strings, where a shared PREFIX should
    * outweigh a tail edit (the opposite bias to Levenshtein's uniform
    * per-position cost). Byte-level semantics pinned to the
    * conventional reference implementation; see the expression's
    * scaladoc for the probed edge cases. O(n·window) per pair, zero
    * shuffle — composes into any blocked-pair refine stage exactly
    * like [[myersLevenshtein]].
    */
  def jaroWinklerSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Shared refine-stage scaffolding: join a blocked (a, b) pair set to
    * its capped text prefixes (columns `t_a`, `t_b`). Both edit-
    * distance forms build on this so the prefix/join behavior cannot
    * drift between them.
    */
  private def pairTexts(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxChars: Int): DataFrame = {
    val txt =
      if (maxChars == 0) col(textCol) else substring(col(textCol), 1, maxChars)
    val t = docs.select(col(idCol), txt.as("__t"))
    pairs
      .join(t.select(col(idCol).as("a"), col("__t").as("t_a")), "a")
      .join(t.select(col(idCol).as("b"), col("__t").as("t_b")), "b")
  }

  /** [[editDistanceVerify]] with a DISTANCE BOUND — the production form
    * of the refine step. Record linkage rarely needs the exact distance
    * of a bad pair, only "is it within k?": Spark's banded Levenshtein
    * (threshold overload) answers that in O(k·min(|a|,|b|)) instead of
    * O(|a|·|b|) — at a 2000-char cap and k=20 that is ~100× less DP
    * work per pair, which is the difference between the verify stage
    * being free and being the pipeline's bottleneck. Pairs beyond the
    * bound report `edit_dist = -1` and `is_match = false` (the Spark
    * convention, kept explicit here).
    */
  def editDistanceWithin(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int,
      maxChars: Int = 2000): DataFrame = {
    require(maxDist >= 0, "editDistanceWithin: maxDist must be >= 0")
    require(maxChars >= 0, "editDistanceWithin: maxChars must be >= 0")
    pairTexts(pairs, docs, idCol, textCol, maxChars)
      .withColumn("edit_dist",
        levenshtein(col("t_a"), col("t_b"), maxDist))
      .withColumn("is_match",
        col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .drop("t_a", "t_b")
  }

  /** SimHash near-dup candidates: 16-bit simhash per doc, pairs at Hamming
    * distance <= maxHamming among docs sharing either 8-bit half (the
    * standard multi-index trick: any pair within distance d must agree on
    * at least one of d+1 blocks; 2 blocks covers d<=1 exactly and is a
    * high-recall prefilter beyond that).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sims = df.select(
      col(idCol),
      TextOps.simhash16(array_distinct(TextOps.tokens(col(textCol))))
        .as("simhash"))
    val withBlocks = sims
      .withColumn("lo", pmod(col("simhash"), lit(256L)))
      .withColumn("hi", floor(col("simhash") / 256.0).cast("long"))
    val blocks = withBlocks.select(col(idCol), col("simhash"),
      explode(array(
        struct(lit(0).as("blk"), col("lo").as("key")),
        struct(lit(1).as("blk"), col("hi").as("key")))).as("x"))
      .select(col(idCol), col("simhash"), col("x.blk"), col("x.key"))
    val l = blocks.select(col(idCol).as("a"), col("simhash").as("sh_a"),
      col("blk"), col("key"))
    val r = blocks.select(col(idCol).as("b"), col("simhash").as("sh_b"),
      col("blk"), col("key"))
    l.join(r, Seq("blk", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", TextOps.hammingDistance(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact duplicated-substring spans (the token-window form of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22 — their ExactSubstr suffix-array pass, re-expressed for a
    * distributed engine): every length-`w` token window is hashed; a
    * window whose hash occurs ≥ 2 times ANYWHERE in the corpus
    * (including within the same document) marks its w tokens as
    * duplicated; per document, the covered positions merge into maximal
    * spans (overlapping or abutting windows form ONE span — the
    * gaps-and-islands rule `start > running_max(end) + 1` starts a new
    * one). This is the span-level statistic paragraph/line dedup (d13/
    * d18) cannot see: duplication that crosses line boundaries or sits
    * mid-paragraph.
    *
    * Output: one row per input doc — `n_tokens`, `n_windows`,
    * `n_dup_windows`, `n_dup_spans`, `dup_tokens` (covered positions),
    * `dup_frac` (6 dp). Docs shorter than w have zero windows.
    *
    * Scale shape: document text NEVER shuffles — windows reduce to
    * (hash, doc, pos) triples map-side; the corpus-sized shuffle
    * carries the 8-byte hash counts (partial-aggregated), the
    * duplicated-hash set after the ≥2 cut is small and joins back
    * against the window triples; the island merge is one window pass
    * partitioned by doc (per-doc bounded). At 100 TB the w-token
    * re-hash per position is the dominant map cost — `baseHash60` is
    * the codegen'd native expression, and w is a constant so the slice
    * never allocates beyond the window.
    */
  def substringSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"substringSpans: window must be at least 2 tokens, got $w")
    val wins = substrWindows(df, idCol, textCol, w)
    val dupHashes = wins.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("__wh"))
    substrSpanStats(df, wins.join(dupHashes, "__wh"), idCol, textCol, w)
  }

  /** Islands + rollup back-half shared by [[substringSpans]] and
    * [[substringSpansAgainst]]: merge the duplicated-window coverage
    * into maximal spans per doc and join the per-doc statistics back.
    * n_dup_spans / dup_tokens / n_dup_windows all roll up from the ONE
    * islands lineage, and n_windows is pure per-row arithmetic
    * (n − w + 1, floored at 0) — the hashed-window subtree is built
    * exactly twice (the count and the join-back), never per-statistic.
    */
  private def substrSpanStats(
      df: DataFrame,
      dupWins: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    val dup = dupWins.select(col(idCol), col("__pos"))
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val spans = dup
      .withColumn("__brk",
        when(col("__pos") >
          coalesce(max(col("__pos") + (w - 1)).over(wPrev), lit(-1)) + 1,
          1).otherwise(0))
      .withColumn("__g", sum(col("__brk")).over(wCum))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("__pos")).as("__s"),
        (max(col("__pos")) + (w - 1)).as("__e"),
        count(lit(1)).as("__nd"))
    val per = spans.groupBy(col(idCol)).agg(
      count(lit(1)).cast("int").as("n_dup_spans"),
      sum(col("__e") - col("__s") + 1).as("dup_tokens"),
      sum(col("__nd")).cast("int").as("n_dup_windows"))
    df.select(col(idCol),
      size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - (w - 1), lit(0)))
      .join(per, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0)).as("n_dup_windows"),
        coalesce(col("n_dup_spans"), lit(0)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_frac"))
  }

  /** Max tokens per document for [[substringDedup]]'s composite
    * ownership key (doc_id · 2^21 + pos must stay injective).
    */
  val SubstringDedupMaxTokens: Int = 1 << 21

  /** (idCol, __pos, __wh, __key) for every w-token window — the shared
    * front of the ExactSubstr family. __key is the composite ownership
    * key (doc_id · 2^21 + pos); the token-cap assert rides inside __n
    * so column pruning can never drop it.
    */
  private def substrWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    // the ownership key is id·2^21 + pos: a non-integral id would CAST
    // to null (null __key/minkey nulls every __owner comparison,
    // silently keeping/removing the wrong tokens) and a negative id
    // inverts the global-first-occurrence order — reject statically,
    // and ride the runtime bound into the plan like the token cap
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType |
          _: org.apache.spark.sql.types.ShortType |
          _: org.apache.spark.sql.types.IntegerType |
          _: org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"ExactSubstr: id column '$idCol' must be an integral type " +
          s"(the ownership key is id*2^21+pos), got $other")
    }
    val base = df.select(col(idCol),
      split(col(textCol), " ").as("__toks"))
      .withColumn("__n",
        size(col("__toks")) + coalesce(
          assert_true(size(col("__toks")) < lit(SubstringDedupMaxTokens),
            lit(s"ExactSubstr: document exceeds the 2^21 token cap"))
            .cast("int"),
          lit(0)))
    // the id assert rides inside __key — the very expression it protects
    // — NOT inside __n: the hash-COUNT lineage consumes only __wh, and
    // hanging the assert on __n would drag idCol into that subtree and
    // break its text-only ReadSchema (the d23 PlanSpec pin). Every
    // ownership consumer (__key/minkey) gets the validation; the
    // count-only path prunes it away together with the key it validates.
    // The assert is the FIRST coalesce branch, not an added term: binary
    // arithmetic codegen short-circuits on a null left operand, so
    // `null_id * K + assert` would skip the assert exactly on the null
    // ids it exists to reject. assert_true passes -> null -> coalesce
    // falls through to the real key; fails -> throws before any key is
    // built.
    base.filter(col("__n") >= w)
      .select(col(idCol),
        explode(sequence(lit(1), col("__n") - (w - 1))).as("__pos"),
        col("__toks"))
      .select(col(idCol), col("__pos"),
        TextOps.baseHash60(
          concat_ws(" ", slice(col("__toks"), col("__pos"), lit(w))))
          .as("__wh"),
        (coalesce(
          assert_true(col(idCol).isNotNull && col(idCol) >= lit(0),
            lit(s"ExactSubstr: id column '$idCol' must be non-null and " +
              "non-negative (ownership key id*2^21+pos)")).cast("long"),
          col(idCol).cast("long") * SubstringDedupMaxTokens.toLong) +
          col("__pos")).as("__key"))
  }

  /** The corpus's window-hash summary — the MERGEABLE state that makes
    * ExactSubstr incremental: per distinct window hash, its occurrence
    * count and its minimum ownership key. Counts add and min-keys min,
    * so per-batch / per-partition summaries fold losslessly
    * ([[substrIndexMerge]]) — the same algebra every sketch in
    * SketchOps carries, which is what lets a streaming ingest keep one
    * summary per micro-batch and a reader fold them
    * ([[graft.streaming.StreamingOps.substrIngest]]). O(distinct
    * windows) rows of three longs; text never leaves the map side.
    */
  def substrIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"substrIndex: window must be at least 2 tokens, got $w")
    substrWindows(df, idCol, textCol, w)
      .groupBy(col("__wh").as("wh"))
      .agg(count(lit(1)).as("cnt"), min(col("__key")).as("minkey"))
  }

  /** Fold many summary frames into the summary of their union: counts
    * add, ownership keys min. Exactly the index a single pass over the
    * combined corpus would build.
    */
  def substrIndexMerge(parts: DataFrame): DataFrame =
    parts.groupBy(col("wh"))
      .agg(sum(col("cnt")).as("cnt"), min(col("minkey")).as("minkey"))

  /** [[substringSpans]] for a BATCH against an existing corpus summary:
    * a batch window is duplicated when its corpus-wide total — batch
    * occurrences plus the index's count — reaches 2. With
    * `index = substrIndex(A)` this equals `substringSpans(A ∪ batch)`
    * restricted to the batch's docs (the equality the spec pins), but
    * touches only the batch's text plus the summary — the corpus is
    * never re-read, the [[DedupStore]] contract for exact substrings.
    */
  def substringSpansAgainst(
      index: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w >= 2,
      s"substringSpansAgainst: window must be at least 2 tokens, got $w")
    val wins = substrWindows(df, idCol, textCol, w)
    val dupHashes = wins.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__bc"))
      .join(index.select(col("wh").as("__wh"), col("cnt").as("__ic")),
        Seq("__wh"), "left")
      .filter(col("__bc") + coalesce(col("__ic"), lit(0L)) >= 2)
      .select(col("__wh"))
    substrSpanStats(df, wins.join(dupHashes, "__wh"), idCol, textCol, w)
  }

  /** [[substringDedup]] for a BATCH against an existing corpus summary:
    * ownership is the minimum composite key across the index AND the
    * batch, so a window whose first occurrence lives in the indexed
    * corpus removes ALL batch copies, while a window new to this batch
    * keeps its earliest batch copy. With `index = substrIndex(A)` this
    * equals `substringDedup(A ∪ batch)` restricted to the batch (ids
    * must be globally unique across corpus and batch — the composite
    * key's contract).
    */
  def substringDedupAgainst(
      index: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w >= 2,
      s"substringDedupAgainst: window must be at least 2 tokens, got $w")
    val wins = substrWindows(df, idCol, textCol, w)
    val cnt = wins.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__bc"), min(col("__key")).as("__bmin"))
      .join(index.select(col("wh").as("__wh"), col("cnt").as("__ic"),
        col("minkey").as("__imin")), Seq("__wh"), "left")
      .filter(col("__bc") + coalesce(col("__ic"), lit(0L)) >= 2)
      .select(col("__wh"),
        least(col("__bmin"), coalesce(col("__imin"), col("__bmin")))
          .as("__minkey"))
    substrRemoval(df, wins, cnt, idCol, textCol, w)
  }

  /** The REMOVAL form of [[substringSpans]] — Lee et al.'s ExactSubstr
    * dedup as a transform, not a report: every duplicated w-token
    * window keeps exactly its GLOBAL first occurrence (minimum
    * (doc_id, pos), encoded as the integer doc_id·2^21 + pos so
    * ownership is a partial-aggregable `min`, never a window sort over
    * the corpus); positions covered only by non-owner duplicate
    * windows are removed, positions covered by an owner window always
    * survive (the kept copy can never be destroyed by overlapping
    * duplicates), and each document reassembles in-row from its kept
    * tokens. Documents with no duplicated windows pass through
    * byte-identical.
    *
    * Output: idCol, `n_tokens`, `n_removed`, `n_kept`, `text_dedup`.
    *
    * Scale shape: same as [[substringSpans]] — text never shuffles
    * (hash-count + min-key exchange, join-back on the duplicated-hash
    * sliver, per-position fan-out of DUP windows only), plus one
    * doc-keyed exchange carrying removal-position lists (bounded per
    * doc). Preconditions: `idCol` is an integral column and documents
    * have < 2^21 tokens (the composite-key capacity; enforced).
    */
  def substringDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"substringDedup: window must be at least 2 tokens, got $w")
    val wins = substrWindows(df, idCol, textCol, w)
    val cnt = wins.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__c"), min(col("__key")).as("__minkey"))
      .filter(col("__c") >= 2)
      .select(col("__wh"), col("__minkey"))
    substrRemoval(df, wins, cnt, idCol, textCol, w)
  }

  /** Coverage + reassembly back-half shared by [[substringDedup]] and
    * [[substringDedupAgainst]]: positions covered only by non-owner
    * duplicate windows are removed (owner coverage immune), each doc
    * rebuilds in-row from its kept tokens. `cnt` carries (__wh,
    * __minkey) for the duplicated hashes.
    */
  private def substrRemoval(
      df: DataFrame,
      wins: DataFrame,
      cnt: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    val cov = wins.join(cnt, "__wh")
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + (w - 1))).as("__p"),
        (col("__key") === col("__minkey")).as("__owner"))
      .groupBy(col(idCol), col("__p"))
      .agg(max(when(col("__owner"), 1).otherwise(0)).as("__anyowner"))
    val rm = cov.filter(col("__anyowner") === 0)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__rm0"))
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .join(rm, Seq(idCol), "left")
      .withColumn("__rm",
        coalesce(col("__rm0"), array().cast("array<int>")))
      .select(col(idCol), col("__n").as("n_tokens"),
        size(col("__rm")).as("n_removed"),
        (col("__n") - size(col("__rm"))).as("n_kept"),
        concat_ws(" ", expr(
          "filter(__toks, (t, i) -> NOT array_contains(__rm, i + 1))"))
          .as("text_dedup"))
  }
}
