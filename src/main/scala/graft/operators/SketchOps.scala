package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketches: per group, keep the k
  * smallest distinct 60-bit md5 hashes of the value; the k-th smallest
  * hash estimates the cardinality as (k−1) / U(k) with U(k) the hash
  * normalized to [0, 1). Unlike HLL registers, a KMV sketch built from a
  * DETERMINISTIC hash is bit-reproducible across engines and runs — the
  * property that makes it oracle-checkable here — while keeping HLL's
  * operational virtues: fixed size (k longs), mergeable by union+re-cut,
  * and ~1/√(k−2) relative error.
  *
  * Scale shape: the sketch is two shuffles — distinct (group, hash) with
  * map-side partial aggregation (the corpus-scale one; only distinct
  * hashes survive the map side), then the per-group k-cut, where the
  * rank filter compiles to WindowGroupLimit (per-partition k-heap
  * before the exchange), so the second shuffle carries ≤ k rows per
  * group. Merging never touches raw data: union the sketch rows and
  * re-cut — the algebra a 1000-executor rollup (per-day sketches folded
  * into monthly) needs.
  */
object SketchOps {

  private def guard(df: DataFrame, op: String): Unit = {
    val hit = Seq("__h", "__rn").filter(df.columns.contains)
    require(hit.isEmpty,
      s"$op reserves column(s) ${hit.mkString(", ")} — rename them on " +
        "the input")
  }

  /** Per-group k smallest distinct hashes of `valueCol` (stringified,
    * md5-hashed to 60 bits). Output: keys..., `kmv` array<long> sorted
    * ascending, length ≤ k.
    */
  def kmvSketch(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "kmvSketch: k must be at least 2 (the estimator " +
      "divides by the k-th smallest hash)")
    guard(df, "kmvSketch")
    kSmallest(
      df.select((keys.map(col) :+
        TextOps.baseHash60(col(valueCol).cast("string")).as("__h")): _*)
        .distinct(),
      keys, k)
  }

  /** Fold many sketch rows per group (e.g. one per day, or one per
    * partition of a distributed build) into one: union the retained
    * hashes, drop duplicates, re-take the k smallest. Exactly the sketch
    * of the union of the inputs — KMV's merge is lossless by
    * construction (the k smallest of a union are among the per-part k
    * smallest).
    */
  def kmvMerge(
      sketches: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, "kmvMerge: k must be at least 2")
    kSmallest(
      sketches
        .select((keys.map(col) :+ explode(col("kmv")).as("__h")): _*)
        .distinct(),
      keys, k)
  }

  /** Estimate per-group distinct counts from sketch rows: exact when the
    * group retained fewer than k hashes (the sketch saw every distinct
    * value), else (k−1) · 2^60 / h(k). Output: keys..., `n_retained`,
    * `n_distinct_est` (rounded to 4 dp, engine-portable: every operand
    * is an exactly-represented double).
    */
  def kmvEstimate(
      sketches: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, "kmvEstimate: k must be at least 2")
    val est = when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
      .otherwise(
        (lit((k - 1).toDouble) * lit(math.pow(2.0, 60.0))) /
          element_at(col("kmv"), k).cast("double"))
    sketches.select((keys.map(col) :+
      size(col("kmv")).as("n_retained") :+
      round(est, 4).as("n_distinct_est")): _*)
  }

  /** HyperLogLog register file — the cardinality sketch the big-data
    * literature actually deploys at 100 TB (Flajolet et al. 2007;
    * Heule et al. "HLL in practice", EDBT'13): m = 64 registers of
    * 6 bits beat KMV's k longs by ~8× at equal error (~1.04/√m ≈ 13%
    * here; production would raise p — the layout is p-generic, the
    * constant is pinned so the oracle can restate it). Built from the
    * SAME deterministic 60-bit md5 hash as every other sketch in this
    * file, so — unlike `approx_count_distinct`'s opaque register
    * layout — the registers themselves are bit-reproducible across
    * engines, which is what lets an HLL be oracle-checked at all:
    * bucket = top 6 hash bits, rho = leading zeros of the remaining
    * 54 + 1 (rank-of-first-one), register = max rho seen.
    *
    * Output: keys..., `regs` array<int> of length 64 (0 = bucket never
    * hit). Scale shape: one partial-aggregated (keys, bucket) max
    * shuffle — map-side combine collapses each task to ≤ 64 rows per
    * group before the exchange — then a keys-exchange over ≤ 64 rows
    * per group to assemble the array. Merge ([[hllMerge]]) is
    * register-wise max: per-day / per-partition sketches fold into
    * global ones without re-reading data, and the fold is idempotent
    * (max), so replays are free — the algebra KMV/CMS/Bloom/bottom-k/MG
    * here all share.
    */
  def hllSketch(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String): DataFrame = {
    guardHll(df, "hllSketch")
    val h = TextOps.baseHash60(col(valueCol).cast("string"))
    assembleHll(
      df.select((keys.map(col) :+
        shiftright(h, HllRemBits).cast("int").as("__b") :+
        h.bitwiseAND(lit((1L << HllRemBits) - 1)).as("__rem")): _*)
        .withColumn("__rho",
          when(col("__rem") === 0, lit(HllRemBits + 1))
            .otherwise(lit(HllRemBits + 1) - length(bin(col("__rem"))))
            .cast("int"))
        .groupBy((keys.map(col) :+ col("__b")): _*)
        .agg(max(col("__rho")).as("__reg")),
      keys)
  }

  /** Fold many HLL rows per group into the sketch of the union of their
    * inputs: register-wise max. Exactly the sketch a single pass over
    * the combined data would have built — HLL's merge is lossless by
    * construction, so rollups (hourly → daily → monthly) and
    * distributed builds (one sketch per partition) commute.
    */
  def hllMerge(sketches: DataFrame, keys: Seq[String]): DataFrame =
    assembleHll(
      sketches
        .select((keys.map(col) :+
          posexplode(col("regs")).as(Seq("__b", "__reg"))): _*)
        .groupBy((keys.map(col) :+ col("__b")): _*)
        .agg(max(col("__reg")).as("__reg")),
      keys)

  /** Per-group cardinality estimate from the registers — the classic
    * two-regime estimator: raw = α₆₄·m²/Σ 2^(−reg), switched to linear
    * counting m·ln(m/V) when raw ≤ 2.5m and V (= zero registers) > 0.
    * Engine-portable arithmetic: the register sum is assembled as the
    * INTEGER Σ 2^(55−reg) (exact in a long — dyadic doubles of spread
    * > 52 bits would round, and then summation ORDER would matter),
    * with ONE double division at the end; ties in the regime test
    * compare exactly-derived doubles. Output: keys..., `n_zero_regs`,
    * `n_distinct_est` (4 dp).
    */
  def hllEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    val sumInt = expr(
      s"aggregate(regs, CAST(0 AS BIGINT), " +
        s"(a, r) -> a + shiftleft(CAST(1 AS BIGINT), ${HllRemBits + 1} - r))")
    val zeros = expr("size(filter(regs, r -> r = 0))")
    val raw = lit(HllAlpha) * lit(HllM * HllM.toDouble) *
      lit(math.pow(2.0, (HllRemBits + 1).toDouble)) / sumInt.cast("double")
    val est = when(raw <= lit(2.5 * HllM) && zeros > 0,
      round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros.cast("double")), 4))
      .otherwise(round(raw, 4))
    sketches.select((keys.map(col) :+
      zeros.as("n_zero_regs") :+ est.as("n_distinct_est")): _*)
  }

  /** θ-sketch set algebra over two KMV sketch frames (Beyer et al.
    * SIGMOD'07; the Theta Sketch Framework): join per-group sketch rows,
    * re-cut the union of retained hashes to k (its k-th value is the
    * threshold θ), and estimate
    *   union    = (k−1)·2^60/θ        (exact when < k survive),
    *   jaccard  = |both ∩ cut| / |cut|  (the cut is a uniform sample
    *              of the union's distinct values — membership in both
    *              originals marks intersection members),
    *   intersection = jaccard · union.
    * This is the piece plain [[kmvMerge]] (union only) lacks: overlap /
    * containment questions — "how many eval-set docs did the crawl
    * re-collect", "what fraction of day-N users are new" — answered
    * from two k-long summaries without touching raw data. Inner join:
    * groups present in only one input have no defined overlap.
    *
    * Output: keys..., `n_union_retained`, `union_est` (4 dp),
    * `jaccard_est` (6 dp), `intersect_est` (4 dp).
    */
  def kmvAlgebra(
      skA: DataFrame,
      skB: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, "kmvAlgebra: k must be at least 2")
    val a = skA.withColumnRenamed("kmv", "__ka")
    val b = skB.withColumnRenamed("kmv", "__kb")
    val joined =
      if (keys.isEmpty) a.crossJoin(b)
      else a.join(b, keys)
    val u = array_sort(array_distinct(concat(col("__ka"), col("__kb"))))
    val cut = slice(u, 1, k)
    val unionEst = when(size(u) < k, size(u).cast("double"))
      .otherwise((lit((k - 1).toDouble) * lit(math.pow(2.0, 60.0))) /
        element_at(u, k).cast("double"))
    val both = size(expr(
      "filter(__cut, h -> array_contains(__ka, h) AND array_contains(__kb, h))"))
    val jac = both.cast("double") / size(col("__cut")).cast("double")
    joined
      .withColumn("__cut", cut)
      .withColumn("__uest", unionEst)
      .withColumn("__jac", jac)
      .select((keys.map(col) :+
        size(col("__cut")).as("n_union_retained") :+
        round(col("__uest"), 4).as("union_est") :+
        round(col("__jac"), 6).as("jaccard_est") :+
        round(col("__jac") * col("__uest"), 4).as("intersect_est")): _*)
  }

  /** Mergeable quantile sketch — the bottom-k row sample: retain, per
    * group, the k (hash, value) pairs with the smallest deterministic
    * hashes of a ROW-UNIQUE identity column. A bottom-k-by-hash cut of
    * unique row ids is a uniform row sample, so quantiles of the
    * retained values estimate the group's quantiles with the usual
    * O(1/√k) sample error; hashing the IDENTITY (never the value)
    * preserves duplicate-value mass, which a distinct-value sample
    * ([[kmvSketch]]'s cut) would collapse. Deterministic md5 hashing
    * makes the sketch — and every estimate — bit-reproducible across
    * engines and retries, the property that lets a sampler be
    * oracle-checked at all.
    *
    * Output: keys..., `qsk` = array of struct(h, v) sorted by h.
    * Scale shape: one WindowGroupLimit-reduced shuffle (each map
    * partition pre-cuts to its own bottom-k before the exchange);
    * sketch rows are O(k) forever after.
    *
    * @param idCol row-unique identity (a doc/event id); duplicate ids
    *              collapse in the merge algebra and bias the sample
    */
  def qSketch(
      df: DataFrame,
      keys: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "qSketch: k must be at least 2")
    guard(df, "qSketch")
    qCut(
      df.select((keys.map(col) :+
        TextOps.baseHash60(col(idCol).cast("string")).as("__h") :+
        col(valueCol).cast("double").as("__v")): _*),
      keys, k)
  }

  /** Fold many quantile-sketch rows per group (per-day, per-partition
    * builds) into one: union the retained pairs, dedup by hash (the
    * same row seen twice is one sample point), re-cut to the k smallest.
    * Exactly the sketch of the union — bottom-k's merge is lossless for
    * the same reason KMV's is.
    */
  def qMerge(
      sketches: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, "qMerge: k must be at least 2")
    qCut(
      sketches
        .select((keys.map(col) :+ explode(col("qsk")).as("__p")): _*)
        .select((keys.map(col) :+ col("__p.h").as("__h") :+
          col("__p.v").as("__v")): _*)
        .dropDuplicates(keys :+ "__h"),
      keys, k)
  }

  /** Per-group quantile estimates from sketch rows: for each requested
    * q, the Type-1 (lower) sample quantile — the element at 1-based
    * index max(1, ceil(q·n)) of the retained values sorted ascending.
    * An element PICK, not an interpolation: the output is one of the
    * input doubles untouched, so there is no cross-engine arithmetic to
    * disagree on. Output: keys..., `n_retained`, `q`, `est`.
    */
  def qEstimate(
      sketches: DataFrame,
      keys: Seq[String],
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "qEstimate: quantiles must lie in [0, 1]")
    val vals = array_sort(transform(col("qsk"), x => x.getField("v")))
    sketches
      .select((keys.map(col) :+
        size(col("qsk")).as("n_retained") :+
        vals.as("__vals") :+
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .withColumn("est",
        element_at(col("__vals"),
          greatest(lit(1), ceil(col("q") * col("n_retained")).cast("int"))))
      .drop("__vals")
  }

  private def qCut(
      hashed: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col("__h").as("h"), col("__v").as("v")))).as("qsk"))
  }

  /** Count-min sketch build: d×w counters where counter (p, b) is the
    * number of input rows whose value hashes to bucket b under depth-p's
    * hash. Depth p's bucket function is the MinHash affine family
    * ((2p+3)·(h mod P) + 7p+1) mod P, cut to [0, w) — deterministic, so
    * the whole sketch (and every point estimate) is bit-reproducible and
    * oracle-checkable, unlike a seeded-murmur CMS. Output rows:
    * keys..., `depth_no`, `bucket`, `cnt` — sparse (zero counters are
    * absent; estimate treats absent as 0).
    *
    * Scale shape: the d-way posexplode happens map-side and partial
    * aggregation collapses each task's contribution to ≤ d·w counter
    * rows before the exchange — the shuffle carries sketch-sized data
    * regardless of input size. Merge is counter addition ([[cmsMerge]]),
    * so per-partition / per-day sketches fold into global ones without
    * touching raw rows.
    */
  def cmsSketch(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      depth: Int,
      width: Int): DataFrame = {
    requireDims(depth, width, "cmsSketch")
    guardCms(df, "cmsSketch")
    df.select((keys.map(col) :+
      posexplode(cmsBuckets(col(valueCol), depth, width))
        .as(Seq("depth_no", "bucket"))): _*)
      .groupBy((keys.map(col) ++ Seq(col("depth_no"), col("bucket"))): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold sketches built over disjoint row sets (per day, per partition)
    * into the sketch of their union: counters add. Same (depth, width)
    * on every input is the caller's contract — mixed widths would add
    * counters from different hash ranges silently.
    */
  def cmsMerge(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches
      .groupBy((keys.map(col) ++ Seq(col("depth_no"), col("bucket"))): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Equi-join SIZE estimate from two CMS sketches over the join key
    * (Cormode & Muthukrishnan 2005 §4.2): per depth the inner product
    * Σ_b cntA[b]·cntB[b] never underestimates |A ⋈ B| (every true join
    * pair lands in the same bucket; collisions only add), and the min
    * across depths is the estimate. This is the cardinality oracle a
    * planner wants BEFORE committing to a shuffle strategy at 100 TB —
    * two d·w-sized summaries answer "how big is this join" without
    * touching either table again, and because sketches of disjoint
    * row sets merge ([[cmsMerge]]), the per-partition summaries fold
    * up for free. Both sketches must share (depth, width) and the
    * same value canonicalization — that is the caller's contract, as
    * with [[cmsMerge]].
    *
    * @return (keys..., est_join_size) — one row per key group.
    */
  def cmsJoinSize(
      sketchA: DataFrame,
      sketchB: DataFrame,
      keys: Seq[String]): DataFrame = {
    val a = sketchA.withColumnRenamed("cnt", "__ca")
    val b = sketchB.withColumnRenamed("cnt", "__cb")
    a.join(b, keys ++ Seq("depth_no", "bucket"))
      .groupBy((keys.map(col) :+ col("depth_no")): _*)
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("__ip")).as("est_join_size"))
  }

  /** Point-estimate the frequency of each (keys, value) row in `queries`:
    * min over the d depths of that depth's counter (absent counter = 0).
    * Classic CMS guarantee: never an underestimate, overestimate bounded
    * by collisions (ε ≈ e/w of total count at confidence 1−e^−d).
    * The sketch side is ≤ groups·d·w rows — broadcast it; the join adds
    * no shuffle on the (arbitrarily large) query side.
    */
  def cmsEstimate(
      queries: DataFrame,
      sketch: DataFrame,
      keys: Seq[String],
      valueCol: String,
      depth: Int,
      width: Int): DataFrame = {
    requireDims(depth, width, "cmsEstimate")
    guardCms(queries, "cmsEstimate")
    val q = queries.select((keys.map(col) :+ col(valueCol) :+
      posexplode(cmsBuckets(col(valueCol), depth, width))
        .as(Seq("depth_no", "bucket"))): _*)
    q.join(broadcast(sketch), keys ++ Seq("depth_no", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy((keys.map(col) :+ col(valueCol)): _*)
      .agg(min(col("cnt")).as("est_freq"))
  }

  /** The d bucket positions of one value: affine-permute the 60-bit base
    * hash per depth, cut to [0, width). Pure column expression — stays
    * inside whole-stage codegen.
    */
  private def cmsBuckets(value: Column, depth: Int, width: Int): Column = {
    val p = TextOps.MinhashPrime
    val h = TextOps.baseHash60(value.cast("string")) % p
    array((0 until depth).map(d =>
      ((lit(2L * d + 3) * h + lit(7L * d + 1)) % p % width)
        .cast("int")): _*)
  }

  /** Distributed Bloom-filter build over a 64-bit key-hash column (use
    * `xxhash64(...)` — the probe side must hash identically): Spark's own
    * `BloomFilterAggregate` (the engine's runtime-filter aggregate,
    * reused as a first-class library surface). The build is pure
    * partial aggregation — every task folds its rows into a local
    * filter, the merge ORs fixed-size bit arrays — so a corpus-scale
    * build moves numBits/8 bytes per task, never the keys. No
    * `distinct` is needed (inserts are idempotent), which is what makes
    * this strictly cheaper than materializing the key set: zero
    * shuffles of key data.
    *
    * Returns the serialized filter (readable by
    * [[bloomMightContain]] and by Spark's own `BloomFilter.readFrom`),
    * sized `optimalNumOfBits(expectedItems, fpp)` — at the classic 1%
    * fpp that is ~9.6 bits/key, so 100 M contamination keys ≈ 115 MB:
    * broadcastable where the raw key set (GBs) is not. An empty input
    * yields a filter that contains nothing.
    *
    * `expectedItems`/`numBits` are capped by Spark's runtime-filter
    * confs (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits`, defaults 4 M / 64 Mbit) — raise those for bigger
    * builds.
    */
  def bloomBuild(
      keys: DataFrame,
      keyHash: Column,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(expectedItems > 0,
      s"bloomBuild: expectedItems must be positive (got $expectedItems)")
    require(fpp > 0 && fpp < 1, s"bloomBuild: fpp must be in (0, 1), got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        ColumnBridge.expression(keyHash),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression()
    val row = keys.select(ColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) { // empty input: a filter with no insertions
      val empty = org.apache.spark.util.sketch.BloomFilter
        .create(expectedItems, numBits)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Membership probe against a [[bloomBuild]] filter: embeds the
    * serialized filter as a literal (one deserialization per task, via
    * Spark's codegen'd `BloomFilterMightContain`) and tests the 64-bit
    * key hash. `keyHash` must be the same `xxhash64(...)` expression
    * family used at build time. False positives at ~fpp, never false
    * negatives — so `!bloomMightContain(...)` rows are DEFINITELY clean
    * and can skip any exact confirm join entirely; only the passing
    * sliver needs one. A null hash probes as false.
    */
  def bloomMightContain(bloom: Array[Byte], keyHash: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(bloom != null && bloom.nonEmpty,
      "bloomMightContain: empty filter bytes")
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloom, org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(keyHash)))
  }

  private def requireDims(depth: Int, width: Int, op: String): Unit = {
    require(depth >= 1 && depth <= 16,
      s"$op: depth must be in [1, 16] (got $depth)")
    require(width >= 2, s"$op: width must be at least 2 (got $width)")
  }

  private def guardCms(df: DataFrame, op: String): Unit = {
    val hit = Seq("depth_no", "bucket", "cnt").filter(df.columns.contains)
    require(hit.isEmpty,
      s"$op reserves column(s) ${hit.mkString(", ")} — rename them on " +
        "the input")
  }

  /** Per-group k smallest of a distinct (keys, __h) frame: the rank
    * filter compiles to WindowGroupLimit (k-heap per partition, pushed
    * below the exchange), the final collect_list is bounded by k.
    */
  /** Misra-Gries heavy-hitter summary per group: at most k−1 retained
    * (item, est) counters with the classic deterministic guarantee
    *   true_count − mg_err  ≤  est  ≤  true_count,   mg_err ≤ mg_n / k,
    * and every item whose true count exceeds mg_err IS retained. The
    * streaming side ([[graft.streaming.StreamingOps.heavyHittersStream]])
    * folds items one at a time; THIS is its batch/merge algebra — the
    * piece every other sketch here already had (KMV/CMS/Bloom/bottom-k
    * all merge) and MG was missing (ADVICE r14 task list).
    *
    * Batch build (Agarwal et al., "Mergeable Summaries", PODS'12): from
    * EXACT per-item counts, keep the k−1 largest and subtract the k-th
    * largest count c(k) from each (drop ≤ 0); the subtraction is the
    * summary's error bound, and k·c(k) ≤ n gives c(k) ≤ n/k.
    *
    * Output: keys..., `mg` array<struct<item string, est long>> sorted
    * by item, `mg_err` long (max undercount), `mg_n` long (rows folded).
    * Scale shape: one partial-aggregated count shuffle (the only
    * corpus-sized one), then ONE keys-exchange carrying the rank / c(k)
    * / total windows AND the final groupBy — HashPartitioning(keys)
    * satisfies all four, so the trim adds no second shuffle.
    */
  def mgSketch(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "mgSketch: k must be at least 2")
    guardMg(df, "mgSketch")
    val counts = df
      .groupBy((keys.map(col) :+
        col(valueCol).cast("string").as("__item")): _*)
      .agg(count(lit(1)).as("__cnt"))
    mgTrim(counts, keys, k)
      .select((keys.map(col) :+ col("mg") :+
        col("__ck").as("mg_err") :+ col("__tot").as("mg_n")): _*)
  }

  /** Fold many MG summary rows per group (per-day, per-partition
    * builds) into one summary of the UNION: add retained counters
    * item-wise, re-trim to k−1 (subtract the combined k-th largest
    * c(k), drop ≤ 0), and sum the error bounds:
    *   mg_err' = Σ mg_err_i + c(k)  — still ≤ (Σ mg_n_i) / k
    * (the mergeability theorem), so merged summaries keep the absolute
    * n/k guarantee no matter how many levels of rollup fold in. Groups
    * whose inputs were all-empty summaries survive with mg = [].
    */
  def mgMerge(
      sketches: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, "mgMerge: k must be at least 2")
    val tot = sketches.groupBy(keys.map(col): _*)
      .agg(sum(col("mg_err")).as("__err0"), sum(col("mg_n")).as("mg_n"))
    val items = sketches
      .select((keys.map(col) :+ explode(col("mg")).as("__p")): _*)
      .select((keys.map(col) :+ col("__p.item").as("__item") :+
        col("__p.est").as("__cnt")): _*)
      .groupBy((keys.map(col) :+ col("__item")): _*)
      .agg(sum(col("__cnt")).as("__cnt"))
    val emptyMg = array().cast("array<struct<item:string,est:bigint>>")
    tot
      .join(mgTrim(items, keys, k), keys, "left")
      .select((keys.map(col) :+
        coalesce(col("mg"), emptyMg).as("mg") :+
        (col("__err0") + coalesce(col("__ck"), lit(0L))).as("mg_err") :+
        col("mg_n")): _*)
  }

  /** One row per retained item with its deterministic frequency
    * bracket: est_lo ≤ true count ≤ est_hi (= est_lo + mg_err). Any
    * item NOT retained has true count ≤ mg_err — the completeness half
    * of the guarantee a top-k report needs to state.
    */
  def mgEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches
      .select((keys.map(col) :+ col("mg_err") :+ col("mg_n") :+
        explode(col("mg")).as("__p")): _*)
      .select((keys.map(col) :+ col("__p.item").as("item") :+
        col("__p.est").as("est_lo") :+
        (col("__p.est") + col("mg_err")).as("est_hi") :+
        col("mg_n")): _*)

  /** The MG trim: rank per group by (count desc, item asc), c(k) = the
    * k-th count (0 when the group has < k items — nothing subtracted,
    * the summary is exact), retain rank ≤ k−1 with est = count − c(k)
    * > 0. Returns keys..., mg, __ck, __tot (= Σ count). Every group
    * survives, even fully-trimmed ones (collect_list skips the
    * when()'s nulls but the group row remains).
    */
  private def mgTrim(
      counts: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    val wOrd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__cnt").desc, col("__item").asc)
    val wAll = Window.partitionBy(keys.map(col): _*)
    counts
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__ck", coalesce(
        max(when(col("__rn") === k, col("__cnt"))).over(wAll), lit(0L)))
      .withColumn("__tot", sum(col("__cnt")).over(wAll))
      .groupBy(keys.map(col): _*)
      .agg(
        array_sort(collect_list(
          when(col("__rn") <= k - 1 && col("__cnt") > col("__ck"),
            struct(col("__item").as("item"),
              (col("__cnt") - col("__ck")).as("est"))))).as("mg"),
        first(col("__ck")).as("__ck"),
        first(col("__tot")).as("__tot"))
  }

  /** HLL layout constants — fixed (p = 6, m = 64 registers over a
    * 60-bit hash → 54 remainder bits, rho ∈ [1, 55]) so oracle SQL can
    * restate the registers verbatim. α₆₄ = 0.709 is the standard m = 64
    * bias constant (Flajolet et al. 2007, Fig. 3).
    */
  private[graft] val HllP = 6
  private[graft] val HllM = 1 << HllP
  private[graft] val HllRemBits = 60 - HllP
  private[graft] val HllAlpha = 0.709

  /** (keys, __b, __reg) max-rows → (keys, regs array<int>[m]): map the
    * hit buckets, then fill the length-m array with 0 for never-hit
    * ones. The groupBy input is ≤ m rows per group — sketch-sized.
    */
  private def assembleHll(maxed: DataFrame, keys: Seq[String]): DataFrame =
    maxed
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(
        collect_list(struct(col("__b"), col("__reg")))).as("__m"))
      .select((keys.map(col) :+
        transform(sequence(lit(0), lit(HllM - 1)),
          b => coalesce(element_at(col("__m"), b), lit(0))).as("regs")): _*)

  private def guardHll(df: DataFrame, op: String): Unit = {
    val hit = Seq("__b", "__rem", "__rho", "__reg", "__m", "regs")
      .filter(df.columns.contains)
    require(hit.isEmpty,
      s"$op reserves column(s) ${hit.mkString(", ")} — rename them on " +
        "the input")
  }

  private def guardMg(df: DataFrame, op: String): Unit = {
    val hit = Seq("__item", "__cnt", "__rn", "__ck", "__tot", "__p",
      "mg", "mg_err", "mg_n").filter(df.columns.contains)
    require(hit.isEmpty,
      s"$op reserves column(s) ${hit.mkString(", ")} — rename them on " +
        "the input")
  }

  private def kSmallest(
      hashed: DataFrame,
      keys: Seq[String],
      k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }
}
