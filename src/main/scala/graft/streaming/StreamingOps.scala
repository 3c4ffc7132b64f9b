package graft.streaming

import graft.operators.IntensityOps
import graft.operators.IntensityOps.{IntensityPoint, ValidatedPoint}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the ingest-side operators (SURVEY.md
  * §2.7): the reference is scheduled micro-batch, so these are the
  * always-on equivalents — same per-site semantics, state kept in the
  * streaming state store instead of re-querying the sink.
  *
  * Scale notes: all state is keyed by site_no, so it shards across
  * executors with the shuffle; per-key state is O(1) (validation) or
  * O(window occupancy) (dedup buffer), and the dedup buffer is pruned
  * every batch — no unbounded growth. Watermarks bound late data exactly
  * like the reference's backprocess window bounds reprocessing.
  */
object StreamingOps {

  /** Raw telemetry point for streaming dedup (29-min near-dup window on
    * the comparison fingerprint, `pipeline/cosmoz_process_levels.py:375-390`).
    */
  final case class RawPoint(site_no: Int, time: java.sql.Timestamp,
      fingerprint: String)

  /** Stateful ±20% validation (E11) as a streaming flatMapGroupsWithState:
    * state per site = (epoch millis, value) of the last valid point.
    * Within a batch, points are processed in time order; across batches,
    * state carries — identical to the reference's incremental catch-up
    * walk (`nmdb/entrypoint.py:68-99`) with the DB round-trip removed.
    */
  def validatedIntensityStream(
      points: Dataset[IntensityPoint],
      tolerance: Double = 0.2,
      maxGapSeconds: Long = 24 * 3600): Dataset[ValidatedPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.site_no)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[IntensityPoint],
         state: GroupState[(Long, Double)]) => {
          val ordered = it.toSeq.sortBy(_.time.getTime).iterator
          val (out, newState) = IntensityOps.validateOrdered(
            ordered, state.getOption, tolerance, maxGapSeconds)
          newState.foreach(state.update)
          out.iterator
        })
  }

  /** Streaming 29-minute near-duplicate suppression (J6): per-site state
    * buffers (time, fingerprint) of recent points; a new point equal to a
    * buffered one within the trailing window is dropped. The buffer is
    * pruned to the window width each batch, so state is bounded by the
    * window occupancy (~1 row/30 min per site in the reference network).
    */
  def dedupStream(
      points: Dataset[RawPoint],
      windowSeconds: Long = 29 * 60): Dataset[RawPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.site_no)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[RawPoint],
         state: GroupState[List[(Long, String)]]) => {
          var buffer = state.getOption.getOrElse(Nil)
          val kept = scala.collection.mutable.ListBuffer[RawPoint]()
          it.toSeq.sortBy(_.time.getTime).foreach { p =>
            val tMs = p.time.getTime
            val winLo = tMs - windowSeconds * 1000L
            val isDup = buffer.exists { case (bt, bf) =>
              bt >= winLo && bt < tMs && bf == p.fingerprint
            }
            if (!isDup) kept += p
            // even duplicates join the buffer: the reference compares
            // against ALL raw rows, including earlier duplicates
            buffer = (tMs, p.fingerprint) :: buffer.filter(_._1 >= winLo)
          }
          state.update(buffer)
          kept.iterator
        })
  }

  /** Streaming embedding ingestion into a persisted
    * [[graft.operators.IvfIndex]]: plug into
    * `writeStream.foreachBatch(StreamingOps.indexIngest(path, streamId))` and
    * every micro-batch of (id, vector) rows is assigned to the frozen
    * coarse codebook and appended under the touched cell directories
    * ([[graft.operators.IvfIndex.append]] — PQ codes included when the
    * index has a PQ layout; column names come from the index's _meta),
    * so ANN serving sees new embeddings within one trigger interval
    * without any retrain.
    *
    * Replay discipline: foreachBatch re-delivers a batch after failure,
    * and a parquet append is not idempotent — so each applied batch id
    * leaves a marker under `<path>/_appended/<streamId>/`, and a
    * replayed id is skipped (same contract SinkSpec pins for the
    * point-upsert sink). Markers are NAMESPACED by `streamId`, and the
    * parameter is deliberately REQUIRED with no default: batch ids
    * restart at 0 with every fresh checkpoint, so two stream
    * incarnations sharing a marker space silently skip each other's
    * batches (ADVICE r9) — a default would recreate exactly that
    * collision. Give each (checkpoint, index) pairing its own
    * streamId; `IvfIndex.write` clears `_appended` entirely on
    * rebuild, so a rebuilt index never inherits stale markers. A crash BETWEEN the data write and the marker write
    * re-appends that one batch on replay — the documented
    * vanilla-parquet limitation (no multi-file transaction); the
    * reference pipeline accepts the same window on its scheduled
    * re-runs, and a transactional table format closes it without
    * changing this surface.
    */
  def indexIngest(
      path: String,
      streamId: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val marker = new org.apache.hadoop.fs.Path(
        s"$path/_appended/$streamId/batch-$batchId")
      val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        graft.operators.IvfIndex.append(spark, path, batch)
        fs.mkdirs(marker)
      }
    }

  /** Streaming continuous dedup — each micro-batch is flagged against
    * the persisted [[graft.operators.DedupStore]] (corpus + every
    * earlier admitted batch), the decision log lands in `flagsPath`
    * (parquet, stamped with the batch id), and the batch's CLEAN rows
    * are admitted to the store so the next micro-batch sees them. The
    * same replay contract as [[indexIngest]]: applied batch ids leave a
    * marker under `<storePath>/_ingested/<streamId>/` and are skipped
    * on checkpoint replay; `streamId` is required for the same
    * collision reason; `DedupStore.write` clears `_ingested` on
    * rebuild. A crash between the flag/append writes and the marker
    * re-runs that one batch — dedup verdicts are deterministic, so the
    * re-run appends the same clean rows; only the flag log may carry a
    * duplicate (batch_id, doc) row for that batch, which downstream
    * readers dedup on (batch_id, id) if they care.
    */
  def dedupIngest(
      storePath: String,
      flagsPath: String,
      streamId: String,
      tau: Double): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val marker = new org.apache.hadoop.fs.Path(
        s"$storePath/_ingested/$streamId/batch-$batchId")
      val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        val m = graft.operators.DedupStore.readMeta(spark, storePath)
        val flags = graft.operators.DedupStore
          .dedupNewBatch(spark, storePath, batch, tau)
          .cache() // read twice below; batch-sized, released in finally
        try {
          flags.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(flagsPath)
          graft.operators.DedupStore.append(spark, storePath, batch,
            flags.filter(!col("is_dup")).select(col(m.idCol)))
        } finally flags.unpersist()
        fs.mkdirs(marker)
      }
    }

  /** Streaming fuzzy decontamination — each micro-batch of documents is
    * near-dup-matched against a STATIC benchmark/eval frame
    * ([[graft.operators.DedupOps.fuzzyFlagContaminated]]: one LSH
    * bucket equi-join + in-row signature verify) and the verdicts land
    * in `flagsPath` stamped with the batch id — the continuous form of
    * the ingest gate that keeps eval leakage out of a training corpus
    * as it arrives. Unlike [[dedupIngest]] there is no store to mutate:
    * the benchmark is fixed, so batches are independent and the only
    * replay concern is the flag log itself. Each batch's verdicts land
    * in their OWN partition directory (`<flagsPath>/batch_id=<id>`,
    * overwrite) — a checkpoint replay rewrites that directory instead
    * of appending a second copy, so the log is exactly-once even
    * across a crash mid-batch (ADVICE r12: the previous flat append +
    * marker pair left a duplicate-flags window between the two steps).
    * The `_applied` marker remains as a replay fast-path (skip the LSH
    * join entirely), not as the correctness mechanism. Readers
    * `spark.read.parquet(flagsPath)` and get `batch_id` back through
    * partition discovery.
    *
    * The signature knobs mirror
    * [[graft.operators.DedupOps.fuzzyFlagContaminated]] (ADVICE r12:
    * they were hard-coded here) — in particular `maxBucket`, whose
    * default cap silently drops hot-bucket candidates (false negatives
    * in a safety gate); raise it for decontamination-grade runs (the
    * batch query d16 passes 100000) and set `capMetric` to surface
    * cap events as observed metrics on the per-batch executions.
    */
  def decontaminateIngest(
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      flagsPath: String,
      tau: Double,
      shingleK: Int = 3,
      numPerm: Int = 8,
      bands: Int = 2,
      maxBucket: Int = 1000,
      capMetric: Option[String] = None): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val marker = new org.apache.hadoop.fs.Path(
        s"$flagsPath/_applied/batch-$batchId")
      val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        graft.operators.DedupOps
          .fuzzyFlagContaminated(batch, benchmark, idCol, textCol, tau,
            shingleK, numPerm, bands, maxBucket,
            capMetric = capMetric.map(m => s"$m.batch$batchId"))
          .write.mode("overwrite")
          .parquet(s"$flagsPath/batch_id=$batchId")
        fs.mkdirs(marker)
      }
    }

  /** Streaming EXACT dedup with bounded state — the built-in
    * `dropDuplicatesWithinWatermark` surface ([[dedupStream]]'s
    * near-dup sibling handles value-equality within a trailing window
    * via custom state; this is the simpler contract: drop any row whose
    * exact `keys` were already seen, with the engine expiring seen-keys
    * state once the watermark passes — the state-boundedness guarantee
    * a plain streaming `dropDuplicates(keys)` does NOT have, its state
    * grows with every key ever seen). Duplicates arriving within the
    * watermark of the original are dropped even across micro-batches;
    * a re-arrival later than the watermark delay may survive — that is
    * the documented trade for bounded state, and the downstream
    * idempotent upsert sink absorbs it.
    */
  /** Streaming quantile-sketch maintenance — the live profiling twin of
    * the a25 rollup: each micro-batch writes its own PARTIAL bottom-k
    * sketch ([[graft.operators.SketchOps.qSketch]]) into a per-batch
    * partition directory (`<path>/batch_id=<id>`, overwrite), and
    * [[readSketch]] folds all partials with the lossless union+recut
    * merge. No swap protocol, no mutable store, no marker bookkeeping:
    * a checkpoint replay REWRITES its own partition (idempotent by
    * construction), partials are O(groups × k) rows each, and the
    * read-side fold is exactly the distributed-rollup algebra the
    * sketch family exists for. This is the shape to prefer whenever an
    * aggregate has a merge algebra — the mutable-store choreography
    * ([[dedupIngest]], [[indexIngest]]) is only for state that does
    * NOT merge.
    */
  def sketchIngest(
      sketchPath: String,
      keys: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      graft.operators.SketchOps.qSketch(batch, keys, idCol, valueCol, k)
        .write.mode("overwrite")
        .parquet(s"$sketchPath/batch_id=$batchId")
    }

  /** Fold the per-batch partial sketches under `sketchPath` into the
    * whole-stream sketch — identical to having sketched every row seen
    * so far in one batch (the merge is lossless). Partition discovery
    * surfaces `batch_id`; it is dropped before the merge. A returned
    * plan holds the file listing of the moment it resolved: a replay
    * overwriting a partition afterwards fails that reader TRANSIENTLY
    * (missing-file, never a half-merged result) — re-invoke after
    * ingest activity, the stores' reader contract.
    */
  def readSketch(
      spark: org.apache.spark.sql.SparkSession,
      sketchPath: String,
      keys: Seq[String],
      k: Int): DataFrame =
    graft.operators.SketchOps.qMerge(
      spark.read.parquet(sketchPath).drop("batch_id"), keys, k)

  /** Streaming HLL maintenance — the cardinality twin of
    * [[sketchIngest]]: each micro-batch writes its own register file
    * ([[graft.operators.SketchOps.hllSketch]], O(groups × 64) rows)
    * into a per-batch partition, and [[readHllSketch]] folds them by
    * register-wise max. HLL's fold is IDEMPOTENT (max), so this layout
    * is safe against a strictly larger failure class than the additive
    * sketches: not just a replay overwriting its own partition, but
    * rows double-delivered across DIFFERENT batch ids (at-least-once
    * sources, overlapping backfills) leave the merged registers — and
    * every estimate — unchanged.
    */
  def hllIngest(
      sketchPath: String,
      keys: Seq[String],
      valueCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      graft.operators.SketchOps.hllSketch(batch, keys, valueCol)
        .write.mode("overwrite")
        .parquet(s"$sketchPath/batch_id=$batchId")
    }

  /** Streaming CENTROID-STATE maintenance — the embedding-monitoring
    * twin of [[sketchIngest]]: each micro-batch writes its per-label
    * centroid summary ([[graft.operators.SimilarityOps
    * .centroidSummarize]], O(labels × dims) rows) into a per-batch
    * partition; [[readCentroid]] folds them with `centroidMerge`
    * (decimal sums add, counts add — lossless). Replay-safe the
    * additive way (a replayed batch overwrites its own partition);
    * drift between the streamed state and any reference summary
    * answers from summary rows without scanning vector history.
    */
  def centroidIngest(
      sketchPath: String,
      labelCol: String,
      vecCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      graft.operators.SimilarityOps
        .centroidSummarize(batch, labelCol, vecCol)
        .write.mode("overwrite")
        .parquet(s"$sketchPath/batch_id=$batchId")
    }

  /** Fold the per-batch centroid partials under `sketchPath` into the
    * whole-stream summary — identical to one summarize over every row
    * seen so far. Same reader contract as [[readSketch]].
    */
  def readCentroid(
      spark: org.apache.spark.sql.SparkSession,
      sketchPath: String): DataFrame =
    graft.operators.SimilarityOps.centroidMerge(
      spark.read.parquet(sketchPath).drop("batch_id"))

  /** Streaming count-min maintenance — [[sketchIngest]]'s frequency
    * twin: each micro-batch writes its own (depth, bucket, cnt)
    * partial ([[graft.operators.SketchOps.cmsSketch]], O(groups·d·w)
    * rows) into a per-batch partition; [[readCmsSketch]] folds by
    * counter addition ([[graft.operators.SketchOps.cmsMerge]]).
    * Replay-safe the additive way (a replayed batch overwrites its own
    * partition). The payoff beyond point estimates: TWO streamed
    * sketches feed [[graft.operators.SketchOps.cmsJoinSize]] directly,
    * so "how big would joining these two streams' keys be" is
    * answerable from resident state without ever scanning either
    * stream's history.
    */
  def cmsIngest(
      sketchPath: String,
      keys: Seq[String],
      valueCol: String,
      depth: Int,
      width: Int): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      graft.operators.SketchOps.cmsSketch(batch, keys, valueCol, depth, width)
        .write.mode("overwrite")
        .parquet(s"$sketchPath/batch_id=$batchId")
    }

  /** Fold the per-batch CMS partials under `sketchPath` into the
    * whole-stream sketch (counter addition — lossless). Same reader
    * contract as [[readSketch]]: a plan holds the listing of the
    * moment it resolved; re-invoke after ingest activity.
    */
  def readCmsSketch(
      spark: org.apache.spark.sql.SparkSession,
      sketchPath: String,
      keys: Seq[String]): DataFrame =
    graft.operators.SketchOps.cmsMerge(
      spark.read.parquet(sketchPath).drop("batch_id"), keys)

  /** Fold the per-batch HLL partials under `sketchPath` into the
    * whole-stream register file — identical to one sketch over every
    * row seen so far. Same reader contract as [[readSketch]]: a plan
    * holds the listing of the moment it resolved.
    */
  def readHllSketch(
      spark: org.apache.spark.sql.SparkSession,
      sketchPath: String,
      keys: Seq[String]): DataFrame =
    graft.operators.SketchOps.hllMerge(
      spark.read.parquet(sketchPath).drop("batch_id"), keys)

  /** Streaming ExactSubstr maintenance — the window-hash summary
    * ([[graft.operators.DedupOps.substrIndex]]: per-hash count +
    * min ownership key) is a mergeable summary like the sketches
    * (counts add, min-keys min), so it takes the [[sketchIngest]]
    * layout verbatim: each micro-batch writes its own partial into a
    * per-batch partition (replay overwrites itself — idempotent), and
    * [[readSubstrIndex]] folds them into the corpus-so-far summary.
    * Flag an arriving batch with
    * [[graft.operators.DedupOps.substringSpansAgainst]] /
    * [[substringDedupAgainst]] BEFORE ingesting it — the corpus text is
    * never re-read, only its O(distinct windows) summary.
    */
  def substrIngest(
      indexPath: String,
      idCol: String,
      textCol: String,
      w: Int): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      graft.operators.DedupOps.substrIndex(batch, idCol, textCol, w)
        .write.mode("overwrite")
        .parquet(s"$indexPath/batch_id=$batchId")
    }

  /** Fold the per-batch window-hash partials under `indexPath` into
    * the whole-corpus summary — identical to one
    * [[graft.operators.DedupOps.substrIndex]] pass over every row seen
    * so far. Same reader contract as [[readSketch]].
    */
  def readSubstrIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame =
    graft.operators.DedupOps.substrIndexMerge(
      spark.read.parquet(indexPath).drop("batch_id"))

  /** Streaming OLS-trend maintenance — the regression twin of
    * [[sketchIngest]]: each micro-batch writes its own moment-sum
    * summary file ([[graft.operators.TimeSeriesOps.olsSummarize]] —
    * five exact integer/decimal sums + n per key), and
    * [[readTrend]] folds them by plain addition into the identical
    * state a one-shot pass over the whole stream computes (exact:
    * the sums are associative), then estimates. Continuous drift
    * monitoring over an unbounded stream costs O(keys) state on disk
    * and never re-reads history.
    */
  def trendIngest(
      trendPath: String,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      yScale: Int = 100,
      origin: String = "2024-01-01 00:00:00"): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      graft.operators.TimeSeriesOps
        .olsSummarize(batch, keys, tsCol, valueCol, yScale, origin)
        .write.mode("overwrite")
        .parquet(s"$trendPath/batch_id=$batchId")
    }

  /** Fold the per-batch trend summaries under `trendPath` and estimate
    * — identical to [[graft.operators.TimeSeriesOps.olsTrend]] over
    * every row seen so far. Same reader contract as [[readSketch]].
    */
  def readTrend(
      spark: org.apache.spark.sql.SparkSession,
      trendPath: String,
      keys: Seq[String],
      yScale: Int = 100): DataFrame =
    graft.operators.TimeSeriesOps.olsEstimate(
      graft.operators.TimeSeriesOps.olsMerge(
        spark.read.parquet(trendPath).drop("batch_id"), keys),
      keys, yScale)

  def exactDedupStream(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    require(keys.nonEmpty, "exactDedupStream: at least one key column")
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Stream-stream interval join — each left event enriched with the
    * same key's right events inside [leftTs − before, leftTs + after].
    * BOTH sides carry watermarks and the join condition bounds event
    * time in both directions, which is what lets Spark expire buffered
    * state: without the time bound (or with only one watermark) the
    * join must keep every row ever seen on both sides forever — the
    * unbounded-state trap. With them, state is O(keys × window), the
    * cluster-safe shape. Inner join ⇒ append-mode output.
    *
    * The two timestamp column names must differ (both survive into the
    * output for match-distance auditing).
    */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      before: String = "1 hour",
      after: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    require(leftTs != rightTs,
      "intervalJoinStream: left and right timestamp columns must be named " +
        "differently (both survive into the output)")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
      .withColumnRenamed(keyCol, "__rkey")
    l.join(r,
      col(keyCol) === col("__rkey") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after"))
      .drop("__rkey")
  }

  /** Stream-static dimension enrichment — the most common production
    * streaming shape: every micro-batch of facts joins a slowly-changing
    * dimension table by key. STATELESS: no watermark, no streaming
    * state. SNAPSHOT semantics, stated honestly: a path-based static
    * DataFrame pins its file LISTING at creation, so dimension rows
    * appended (or overwritten) after the query starts are NOT seen by
    * later micro-batches — re-execution per batch re-scans the same
    * files (the spec pins this). For an always-fresh dimension use
    * [[enrichForeachBatch]], which re-reads the path per batch.
    *
    * The dimension broadcasts — facts never shuffle, the only sane
    * shape when the stream side is the big one. Left join by default so
    * an unknown key surfaces as nulls (auditable) instead of silently
    * dropping the fact row.
    *
    * 100 TB posture: the broadcast is per-executor O(|dim|); a
    * dimension too big to broadcast belongs in a store-backed lookup
    * (dedupIngest's shape), not this operator.
    */
  def enrichStream(
      stream: DataFrame,
      dim: DataFrame,
      keyCol: String,
      joinType: String = "left"): DataFrame = {
    val clash = dim.columns.toSet
      .intersect(stream.columns.toSet) - keyCol
    require(clash.isEmpty,
      s"enrichStream: dimension columns ${clash.mkString(", ")} collide " +
        "with stream columns — rename or prune the dimension first")
    stream.join(broadcast(dim), Seq(keyCol), joinType)
  }

  /** Always-fresh dimension enrichment: a `foreachBatch` body that
    * re-reads the dimension parquet at EVERY micro-batch, enriches via
    * [[enrichStream]], and hands the result to `write`. This is the
    * SCD-1 refresh pattern a fixed static DataFrame cannot express
    * (its file listing is pinned at creation — see [[enrichStream]]):
    * an in-place dimension overwrite between batches is visible on the
    * very next batch, no query restart. The per-batch listing RPC is
    * O(dim files) against the namenode — fine for the broadcast-sized
    * dimensions this targets.
    */
  def enrichForeachBatch(
      dimPath: String,
      keyCol: String,
      joinType: String = "left")(
      write: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val dim = batch.sparkSession.read.parquet(dimPath)
      write(enrichStream(batch, dim, keyCol, joinType), batchId)
    }

  /** Hourly per-site windowed aggregation of a value column with a
    * watermark — the streaming form of the scheduled per-level rollups.
    */
  def hourlyStats(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      watermark: String = "29 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col("site_no"), window(col(tsCol), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("avg_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col("site_no"), col("window.start").as("hour_start"),
        col("n"), col("avg_value"), col("min_value"), col("max_value"))

  /** Streaming gap-based sessionization — the continuous twin of
    * [[graft.operators.TimeSeriesOps.sessionize]], on Spark's native
    * `session_window` state: a session extends while events keep
    * arriving within `gap` of the last one, and EMITS exactly once the
    * watermark passes its close (late events inside the watermark still
    * extend/merge their session; events later than the watermark drop —
    * the deliberate completeness/latency trade a batch re-run repairs).
    * State size is O(open sessions per key), bounded by the watermark —
    * the shape that holds on an unbounded 100 TB/day event stream,
    * where the batch operator's "sort each key's full history" cannot
    * even be stated. Output mirrors the batch operator minus the
    * session counter (an unbounded running count has no streaming
    * analogue; the session's identity is its start time).
    *
    * Boundary convention: `session_window` intervals are [start,
    * last + gap), so an event arriving EXACTLY `gap` after its
    * predecessor opens a new session here, where the batch operator's
    * strict `> gapSeconds` rule extends the old one. Both sides compare
    * at full microsecond timestamp precision (the batch operator works
    * in epoch micros), so the two agree on every gap not exactly equal
    * to the threshold — an exact-to-the-microsecond hit, which is
    * measure-zero in real event time.
    */
  /** One item observation for [[heavyHittersStream]]; `seq` fixes the
    * within-batch processing order (deterministic summaries).
    */
  final case class ItemEvent(key: Long, seq: Long, item: String)

  /** A heavy-hitter estimate emitted after each batch: `est` is the
    * Misra-Gries counter (true_count − processed/k ≤ est ≤ true_count),
    * `processed` the items folded into this key's summary so far.
    */
  final case class HeavyHitter(key: Long, item: String, est: Long,
      processed: Long)

  /** Streaming heavy hitters per key via Misra-Gries: at most k−1
    * counters of state per key — O(k), NOT O(distinct items) — with the
    * classic deterministic guarantee that every item whose true
    * frequency exceeds processed/k is present in the summary, and
    * every counter underestimates by at most processed/k. The CMS
    * query (a15) answers "how often did X occur" probabilistically;
    * this answers "what are the frequent items" with a deterministic
    * bound and bounded state — the right shape for per-key trending
    * items over an unbounded stream. Update output mode: each batch
    * re-emits the key's current summary (estimates are evolving facts,
    * not append-only events); within a batch, items fold in `seq`
    * order so summaries are reproducible.
    */
  def heavyHittersStream(
      events: Dataset[ItemEvent],
      k: Int): Dataset[HeavyHitter] = {
    require(k >= 2, s"heavyHittersStream needs k >= 2, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[ItemEvent],
         state: GroupState[(Map[String, Long], Long)]) => {
          var (ctr, n) =
            state.getOption.getOrElse((Map.empty[String, Long], 0L))
          it.toSeq.sortBy(_.seq).foreach { e =>
            n += 1
            if (ctr.contains(e.item))
              ctr = ctr.updated(e.item, ctr(e.item) + 1)
            else if (ctr.size < k - 1)
              ctr = ctr.updated(e.item, 1L)
            else
              ctr = ctr.map { case (i, c) => i -> (c - 1) }
                .filter(_._2 > 0)
          }
          state.update((ctr, n))
          ctr.toSeq.sortBy { case (i, c) => (-c, i) }
            .map { case (i, c) => HeavyHitter(key, i, c, n) }.iterator
        })
  }

  /** One event for the streaming run detector ([[runStream]]). */
  final case class RunEvent(key: Long, ts: java.sql.Timestamp,
      value: String)

  /** The open run per key — [[runStream]]'s O(1) state record. */
  final case class OpenRun(runId: Long, value: Option[String],
      startMs: Long, endMs: Long, n: Long)

  /** A completed run emitted by [[runStream]]. */
  final case class CompletedRun(key: Long, run_id: Long,
      value: Option[String], run_len: Long,
      run_start: java.sql.Timestamp, run_end: java.sql.Timestamp)

  /** Streaming gaps-and-islands — the online twin of
    * `TimeSeriesOps.islands` and the always-on stuck-at / retry-storm
    * alarm: per key, consecutive equal values accumulate into the open
    * run; the first differing value EMITS the completed run and opens
    * the next. State per key is O(1) — (run_id, value, span, count) —
    * regardless of run length, so a sensor stuck for a month costs the
    * state store one row. Within a batch rows process in time order
    * (the validatedIntensityStream convention); run ids are sequential
    * per key across batches, and a run spanning many batches emits
    * once, with the full span. The tail run stays open (unemitted)
    * until a different value arrives — Append semantics can never
    * retract, so only COMPLETED runs are facts. Null values are runs
    * of their own, matching the batch operator's null-safe boundary.
    */
  def runStream(events: Dataset[RunEvent]): Dataset[CompletedRun] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[RunEvent],
         state: GroupState[OpenRun]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[CompletedRun]
          var st = state.getOption
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val v = Option(e.value)
            st match {
              case Some(s) if s.value == v =>
                st = Some(s.copy(endMs = e.ts.getTime, n = s.n + 1))
              case Some(s) =>
                out += CompletedRun(key, s.runId, s.value, s.n,
                  new java.sql.Timestamp(s.startMs),
                  new java.sql.Timestamp(s.endMs))
                st = Some(OpenRun(s.runId + 1, v, e.ts.getTime,
                  e.ts.getTime, 1L))
              case None =>
                st = Some(OpenRun(1L, v, e.ts.getTime, e.ts.getTime, 1L))
            }
          }
          st.foreach(state.update)
          out.iterator
        })
  }

  def sessionStream(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"))
}
