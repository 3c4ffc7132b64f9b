package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset-curation operators: sampling, splitting, and
  * sequence packing for training-data assembly. Everything here is
  * HASH-ordered rather than rng-ordered — `rand()` gives a different
  * sample every run/partitioning, which destroys reproducibility and
  * can't be restated by an independent engine; md5-of-id order is
  * uniform-ish, stable across runs, engines, and partition counts, and
  * each row's placement is decidable locally (no global coordination).
  */
object SampleOps {

  private def hashOrder(idCol: String): Seq[Column] =
    Seq(md5(col(idCol).cast("string")), col(idCol))

  /** Per-group deterministic sample of `n` rows: rank by md5(id) within
    * the group, keep the first n. row_number + filter compiles to
    * WindowGroupLimit, so the cap prunes map-side BEFORE the shuffle —
    * a group with 10^9 rows ships ~n per input partition, not 10^9.
    */
  def stratifiedSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(hashOrder(idCol): _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic train/holdout split: 60-bit md5 of the id mod 100
    * against the percentage. Purely per-row (no shuffle, no state) and
    * stable under any re-partitioning or re-run — the property that
    * matters when the split must agree across pipeline stages.
    */
  def hashSplit(
      idCol: Column,
      trainPct: Int,
      trainLabel: String = "train",
      holdoutLabel: String = "holdout"): Column =
    when(pmod(TextOps.baseHash60(idCol.cast("string")), lit(100)) < trainPct,
      lit(trainLabel)).otherwise(lit(holdoutLabel))

  /** Deterministic MIXTURE sampling — the pretraining-mix operator: keep
    * each row with its group's target rate, decided by the row's own id
    * hash (per-myriad resolution). Purely per-row like [[hashSplit]]:
    * no shuffle, stable under re-partitioning/re-runs, and the kept set
    * for one group never changes when another group's rate does (each
    * group consumes a prefix of the same hash order). Rates are
    * converted to integer per-myriad thresholds ONCE here, so an
    * engine-portable restatement uses identical integer comparisons.
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      s"mixture rates must be in [0,1], got $rates default=$defaultRate")
    // Salt the hash per-operator: the RAW id hash is what hashSplit
    // buckets on (mod 100), so an unsalted mixture at a sub-1% rate
    // would keep only ids whose hash % 100 < threshold — forcing every
    // survivor into one side of a later train/holdout split. The salt
    // makes the two decisions independent.
    val h = pmod(TextOps.baseHash60(
      concat(col(idCol).cast("string"), lit("/mix"))), lit(10000))
    // flat map lookup, not a nested when-chain: a realistic mix has
    // hundreds of groups and a CaseWhen that deep strains analysis and
    // codegen while evaluating sequentially per row
    val thresholds = typedlit(
      rates.map { case (g, r) => g -> math.round(r * 10000).toInt })
    df.filter(h < coalesce(element_at(thresholds, col(groupCol)),
      lit(math.round(defaultRate * 10000).toInt)))
  }

  /** Per-ROW weighted sampling: keep each row with probability equal to
    * its own `weight` column (clamped to [0, 1]) — quality-weighted
    * corpus thinning, where better documents survive more often.
    * [[mixtureSample]]'s per-row generalization: a salted per-myriad id
    * hash decides, so keeps are deterministic, a row kept at weight w
    * stays kept at any weight >= w (monotone — raising quality never
    * drops survivors), and the operator is pure per-row: no shuffle, no
    * state, restatable by any engine. The salt ("/wt") is DISTINCT from
    * mixtureSample's ("/mix"): this is an independent sampling stage,
    * so composing the two must thin multiplicatively (~w·r), not take
    * min(w, r) as a shared hash would.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weight: Column): DataFrame = {
    val thr = floor(
      least(lit(1.0), greatest(lit(0.0), weight)) * 10000).cast("long")
    val h = pmod(TextOps.baseHash60(
      concat(col(idCol).cast("string"), lit("/wt"))), lit(10000))
    df.filter(h < thr)
  }

  /** Deterministic NEGATIVE sampling over a contiguous id space
    * [0, n): each anchor gets `k` pseudo-random partner ids, never
    * itself — the contrastive-pairs generator. Negative j of anchor a
    * is (a + 1 + H(a, j) mod (n−1)) mod n: the offset is drawn from
    * [1, n−1], so self-pairs are impossible BY CONSTRUCTION, the
    * distribution over others is uniform-ish (md5), and every engine
    * re-derives the same pairs (seeded-rng sampling can't be restated
    * and breaks on retries). Pure per-row explode — no shuffle, no
    * join against the corpus to "check existence": contiguity makes
    * existence arithmetic.
    */
  def negativeSample(
      df: DataFrame,
      idCol: String,
      k: Int,
      n: Long): DataFrame = {
    require(k >= 1, s"negativeSample: k must be >= 1 (got $k)")
    require(n >= 2, s"negativeSample: need at least 2 ids (got $n)")
    df.select(col(idCol), explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("neg_id",
        pmod(col(idCol) + 1 + pmod(TextOps.baseHash60(
          concat(col(idCol).cast("string"), lit(":"), col("j"))),
          lit(n - 1)), lit(n)))
  }

  /** Token-BUDGET mix planning — [[mixtureSample]] with rates DERIVED
    * from the data: given a per-group token budget, each group's keep
    * rate is min(1, budget / its total tokens), so the expected kept
    * token mass per group is its budget (groups under budget keep
    * everything). This is the epoch-planning operator: "2B tokens of
    * web, 500M of code" becomes per-group thresholds in one pass.
    *
    * One partial-aggregable groupBy over (group, tokens) — a
    * distinct-group-sized frame — broadcast back as integer per-myriad
    * thresholds against the SAME salted id hash as [[mixtureSample]]
    * (a row kept at rate r stays kept at any rate >= r, and the
    * thresholds restate in SQL exactly). Per-row decisions remain
    * shuffle-free on the corpus side.
    *
    * @param budgets target token mass per group value; absent groups
    *        get `defaultBudget` (0 = drop). Budgets above ~9e14 tokens
    *        would overflow the per-myriad scaling — split such groups.
    */
  def planMixture(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokens: Column,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    require((budgets.values.toSeq :+ defaultBudget).forall(b =>
      b >= 0 && b <= (Long.MaxValue / 10000)),
      s"planMixture: budgets must be in [0, ${Long.MaxValue / 10000}]")
    for (c <- Seq("__tok", "__thr", "__grp"))
      require(!df.columns.contains(c),
        s"planMixture reserves column $c — rename it on the input")
    val bl = typedlit(budgets)
    val budget = coalesce(element_at(bl, col(groupCol)), lit(defaultBudget))
    val thresholds = df
      .groupBy(col(groupCol))
      .agg(sum(tokens.cast("long")).as("__tok"))
      .select(col(groupCol).as("__grp"),
        // a group with no countable tokens has nothing to budget:
        // any positive budget keeps it whole, zero drops it (the
        // null-token sum must NOT slip past least() as "keep all")
        when(coalesce(col("__tok"), lit(0L)) > 0,
          least(lit(10000L), floor(lit(10000.0) * budget / col("__tok"))
            .cast("long")))
          .otherwise(when(budget > 0, lit(10000L)).otherwise(lit(0L)))
          .as("__thr"))
    val h = pmod(TextOps.baseHash60(
      concat(col(idCol).cast("string"), lit("/mix"))), lit(10000))
    // null-safe group match: a NULL group gets its own threshold row
    // (mixtureSample's default-rate contract), not silent removal
    df.join(broadcast(thresholds), col(groupCol) <=> col("__grp"))
      .filter(h < col("__thr"))
      .drop("__thr", "__grp")
  }

  /** Mixture PLAN REPORT — the sizing step upstream of [[planMixture]]:
    * given target mixture fractions and a total token budget, derive
    * per group the available token mass, the required token count,
    * the sampling rate, and the implied EPOCHS (ceil of the rate —
    * rate > 1 means the source must repeat, the data-constrained
    * regime a curriculum designer needs to see BEFORE committing to a
    * mix). Complements c15's mix AUDIT (achieved-vs-target after the
    * fact) with the plan before it.
    *
    * Exactness: token masses are BIGINT sums; required = round(frac ×
    * budget) — both engines round the identical IEEE product;
    * rate is ONE division rounded 6 dp and epochs ceils that rounded
    * value, so the integer can't flip on a last-ulp disagreement.
    * One partial-aggregable groupBy; targets join as a broadcast
    * literal frame. Groups without a target row are dropped (they are
    * not part of the plan); a target naming an absent group is a
    * caller error surfaced by the inner join's empty row.
    */
  def mixtureReport(
      df: DataFrame,
      groupCol: String,
      tokens: Column,
      targets: Seq[(String, Double)],
      budget: Long): DataFrame = {
    require(targets.nonEmpty, "mixtureReport: empty target list")
    require(targets.map(_._1).distinct.size == targets.size,
      "mixtureReport: duplicate target group")
    require(targets.forall(_._2 > 0), "mixtureReport: fractions must be > 0")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      s"mixtureReport: fractions must sum to 1, got ${targets.map(_._2).sum}")
    require(budget > 0 && budget <= (Long.MaxValue / 10000),
      "mixtureReport: budget out of range")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = broadcast(targets.toDF(groupCol, "target_frac"))
    df.groupBy(col(groupCol))
      .agg(sum(tokens.cast("long")).as("tokens"))
      .join(tgt, groupCol)
      .withColumn("required_tokens",
        round(col("target_frac") * lit(budget.toDouble), 0).cast("bigint"))
      .withColumn("rate",
        round(col("required_tokens").cast("double") /
          col("tokens").cast("double"), 6))
      .withColumn("epochs", ceil(col("rate")).cast("int"))
      .orderBy(col(groupCol))
  }

  /** Temperature-scaled mixture resampling — the standard multilingual/
    * multi-source flattening: group weights q_i ∝ (token mass)^alpha
    * (alpha in (0,1]; 1 = proportional, smaller = flatter head/tail),
    * per-group keep rate = min(1, budget·q_i / tokens_i), applied with
    * the same deterministic per-myriad id-hash as [[planMixture]] (salt
    * '/temp', so the two samplers draw independently). One distinct-
    * group aggregation + a 1-row weight total — no corpus-scale second
    * pass; thresholds broadcast.
    *
    * Hash-comparability discipline: the pow() weights round to 9 dp and
    * total as exact decimals before the rate math derives in double —
    * pow is within 1 ulp on any IEEE libm, and the rounding absorbs
    * that before it can flip a floor().
    */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokens: Column,
      totalBudget: Long,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"temperatureMixture: alpha must be in (0, 1], got $alpha")
    require(totalBudget >= 0 && totalBudget <= (Long.MaxValue / 10000),
      s"temperatureMixture: budget must be in [0, ${Long.MaxValue / 10000}]")
    for (c <- Seq("__tok", "__thr", "__grp", "__w", "__wsum"))
      require(!df.columns.contains(c),
        s"temperatureMixture reserves column $c — rename it on the input")
    val sums = df.groupBy(col(groupCol))
      .agg(coalesce(sum(tokens.cast("long")), lit(0L)).as("__tok"))
      .select(col(groupCol).as("__grp"), col("__tok"),
        round(pow(col("__tok").cast("double"), lit(alpha)), 9)
          .cast("decimal(28,9)").as("__w"))
    val tot = sums.agg(sum(col("__w")).as("__wsum"))
    val thresholds = sums.crossJoin(broadcast(tot))
      .select(col("__grp"),
        when(col("__tok") > 0,
          least(lit(10000L),
            floor(lit(10000.0) * lit(totalBudget.toDouble) *
              (col("__w").cast("double") / col("__wsum").cast("double")) /
              col("__tok").cast("double")).cast("long")))
          .otherwise(lit(0L)).as("__thr"))
    val h = pmod(TextOps.baseHash60(
      concat(col(idCol).cast("string"), lit("/temp"))), lit(10000))
    df.join(broadcast(thresholds), col(groupCol) <=> col("__grp"))
      .filter(h < col("__thr"))
      .drop("__thr", "__grp")
  }

  /** Greedy sequence-packing approximation: stream each shard's docs in
    * hash order, keep a running length cumsum, and place each doc in the
    * bin where its first token lands when the stream is concatenated
    * (bin = floor(start / maxLen)). One window per shard — O(1) state
    * per row, no quadratic bin search; bins can overflow by at most one
    * document tail, the standard concat-then-chunk packing used for
    * pretraining batches (documents spanning a boundary are split
    * downstream at tokenization, not here).
    *
    * Output adds: `shard_pos` (start offset in the shard's concatenated
    * stream), `bin` (the pack id within the shard).
    */
  def packSequences(
      df: DataFrame,
      shardCol: String,
      idCol: String,
      lenCol: String,
      maxLen: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(hashOrder(idCol): _*)
    val cum = sum(col(lenCol)).over(w)
    df.withColumn("shard_pos", (cum - col(lenCol)).cast("long"))
      .withColumn("bin",
        floor(col("shard_pos") / lit(maxLen.toDouble)).cast("long"))
  }
}
