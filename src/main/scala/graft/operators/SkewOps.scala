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
      topK: Int = 20): DataFrame = {
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
          .as("skew")): _*)
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
    val top = skewProfile(df.select(keys.map(col): _*), keys, topK = 1)
      .select(col("share")).collect()
    if (top.isEmpty) 0.0 else top(0).getDouble(0)
  }
}
