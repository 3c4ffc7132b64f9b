package graft.operators


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MinHash/LSH dedup store — the incremental form of corpus
  * dedup. A one-time [[write]] indexes the corpus as capped LSH banding
  * rows WITH signatures ([[DedupOps.bandRows]]); from then on each
  * arriving batch is checked by [[dedupNewBatch]] with one bucket
  * equi-join of the batch's rows against the store — the corpus is
  * never re-shingled, re-hashed, or even re-read beyond this index, and
  * match verification runs on the stored signatures (estimated Jaccard
  * = matching-component fraction, the standard MinHash estimator), so
  * the store needs no access to original document text at serve time.
  * [[append]] then admits the batch's surviving rows, keeping the store
  * current for the next batch — the ingest loop a 100 TB corpus
  * actually runs (reprocessing the corpus per batch is the cost this
  * store exists to delete).
  *
  * Layout: `<path>/rows` parquet (id, sig, band_idx, band_key) and a
  * `<path>/_meta` JSON sidecar pinning the signature configuration —
  * batch rows are only comparable to store rows built with identical
  * (shingleK, numPerm, bands), so every entry point re-validates
  * against the sidecar (the same self-description contract as
  * [[IvfIndex]]).
  *
  * The first-occurrence policy: a batch doc is a duplicate iff it
  * matches any STORED doc or an earlier (lower-id) doc of its own
  * batch; ids are expected to grow monotonically across batches.
  *
  * Concurrency contract (ADVICE r11): AT MOST ONE MUTATOR at a time
  * per store path — [[append]]/[[delete]]/[[compact]]/[[write]] must
  * be serialized by the caller (the ingest loop they serve is
  * naturally sequential). Only mutators run [[recoverRows]]; the
  * read-only entry points ([[dedupNewBatch]], [[stats]]) never rename
  * or delete anything — they resolve the one complete generation
  * visible at call time ([[resolveRowsForRead]]) and read it, so a
  * reader racing a writer's swap can no longer roll the swap forward
  * underneath the writer and fail its rename.
  */
object DedupStore {

  /** The persisted self-description of a store (`<path>/_meta`). */
  case class Meta(
      idCol: String,
      textCol: String,
      shingleK: Int,
      numPerm: Int,
      bands: Int,
      maxBucket: Int)

  private def hadoopPath(s: String) = new org.apache.hadoop.fs.Path(s)

  private def fsFor(spark: SparkSession, s: String) =
    hadoopPath(s).getFileSystem(spark.sessionState.newHadoopConf())


  /** Build the store at `path` from the current corpus (overwrites). */
  def write(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      shingleK: Int = 3,
      numPerm: Int = 8,
      bands: Int = 2,
      maxBucket: Int = 1000): Unit = {
    val meta = Meta(idCol, textCol, shingleK, numPerm, bands, maxBucket)
    DedupOps.bandRows(docs, idCol, textCol, shingleK, numPerm, bands,
      maxBucket, withSig = true)
      .withColumnRenamed(idCol, "id")
      .write.mode("overwrite").parquet(s"$path/rows")
    // a rebuilt store must not inherit a previous incarnation's
    // streaming replay markers (same contract as IvfIndex.write)
    val spark = docs.sparkSession
    fsFor(spark, path).delete(hadoopPath(s"$path/_ingested"), true)
    writeMeta(spark, path, meta)
  }

  /** Read the `<path>/_meta` sidecar. */
  // Sidecar protocol (I/O, version gate, escaping) is [[MetaSidecar]] —
  // shared with IvfIndex; only the field layout is this store's.
  def readMeta(spark: SparkSession, path: String): Meta = {
    val node = MetaSidecar.read(spark, path, "dedup store",
      "build with DedupStore.write")
    Meta(node.get("idCol").asText, node.get("textCol").asText,
      node.get("shingleK").asInt, node.get("numPerm").asInt,
      node.get("bands").asInt, node.get("maxBucket").asInt)
  }

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    import MetaSidecar.jstr
    MetaSidecar.write(spark, path,
      s""""idCol":${jstr(m.idCol)},""" +
        s""""textCol":${jstr(m.textCol)},"shingleK":${m.shingleK},""" +
        s""""numPerm":${m.numPerm},"bands":${m.bands},""" +
        s""""maxBucket":${m.maxBucket}""")
  }

  /** Crash recovery for the [[swapRows]] protocol, run by every
    * reader/writer of `<path>/rows`. The protocol's invariant: the
    * staging dir is only ever COMPLETE and validated when the live dir
    * has been moved aside — so a missing live dir with staging present
    * must roll FORWARD (activate the new generation). Rolling back
    * would be semantics-preserving for [[compact]] but would silently
    * undo a [[delete]]'s intent — the ghosts the deletion removed
    * would resurrect with no error anywhere. A missing live dir with
    * only `rows_old` present (staging lost) restores the old
    * generation: the only complete one; the interrupted op must
    * re-run. With the live dir present, stale aside/staging dirs are
    * garbage from completed or abandoned swaps and are dropped.
    */
  private def recoverRows(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val rows = hadoopPath(s"$path/rows")
    val old = hadoopPath(s"$path/rows_old")
    val next = hadoopPath(s"$path/rows_next")
    if (!fs.exists(rows)) {
      if (fs.exists(next)) {
        require(fs.rename(next, rows),
          s"recovery: cannot activate staged $next")
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        require(fs.rename(old, rows),
          s"recovery: cannot restore $old")
      }
    } else {
      fs.delete(old, true)
      fs.delete(next, true)
    }
  }

  /** The shared rename-aside swap: stage `transform(live rows)` next to
    * the live dir, validate, move live aside, activate the stage, drop
    * the aside copy. One choreography for [[compact]] and [[delete]] —
    * the swap and its recovery rules cannot drift between them.
    *
    * @param emptyError when Some, refuse to activate an empty staged
    *        generation with this message (the staging dir is cleaned
    *        before the refusal propagates)
    */
  /** Read-side resolution of the [[swapRows]] state — which directory
    * holds a COMPLETE generation right now — with no renames or
    * deletes (readers must not mutate; see the concurrency contract).
    * Precedence mirrors [[recoverRows]]: live `rows` wins; a missing
    * live dir with staging present means the swap passed the point of
    * no return, so the staged generation is the current one; otherwise
    * the aside copy is the only complete generation.
    *
    * What this does and does not give a reader racing a mutator
    * (ADVICE r12): the directory resolves here but the parquet scan
    * executes LATER (lazily), and a mutator finishing a swap in
    * between can rename or delete the resolved directory (e.g.
    * `rows_old` dropped after roll-forward) — the read then fails
    * TRANSIENTLY with a missing-path error. It never silently reads a
    * half-written generation (staging only becomes visible complete),
    * so the failure mode is clean and a retry — which re-resolves the
    * post-swap state — is always safe. Readers that cannot tolerate
    * even transient failures must serialize with mutators, same as
    * the single-mutator contract above.
    */
  private def resolveRowsForRead(spark: SparkSession, path: String): String = {
    val fs = fsFor(spark, path)
    val candidates = Seq(s"$path/rows", s"$path/rows_next", s"$path/rows_old")
    candidates.find(p => fs.exists(hadoopPath(p))).getOrElse(
      throw new IllegalStateException(
        s"no row generation at $path (checked ${candidates.mkString(", ")})" +
          " — build the store with DedupStore.write"))
  }

  private def swapRows(
      spark: SparkSession, path: String, emptyError: Option[String])(
      transform: DataFrame => DataFrame): Unit = {
    recoverRows(spark, path)
    val fs = fsFor(spark, path)
    val rows = hadoopPath(s"$path/rows")
    val old = hadoopPath(s"$path/rows_old")
    val next = hadoopPath(s"$path/rows_next")
    transform(spark.read.parquet(rows.toString))
      .write.parquet(next.toString)
    emptyError.foreach { msg =>
      if (spark.read.parquet(next.toString).limit(1).count() == 0) {
        fs.delete(next, true)
        throw new IllegalArgumentException(msg)
      }
    }
    require(fs.rename(rows, old), s"swap: cannot move $rows aside")
    require(fs.rename(next, rows), s"swap: cannot activate $next")
    fs.delete(old, true)
  }

  /** Flag each batch doc against the store and its own batch: `is_dup`
    * iff some stored doc or lower-id batch doc shares an LSH bucket AND
    * the signature-estimated Jaccard (matching-component fraction)
    * clears `tau`; `dup_of` is the smallest such partner id (null when
    * clean).
    *
    * One bucket equi-join (store rows ∪ batch rows) ⨝ batch rows on
    * (band_idx, band_key) — the store side arrives pre-capped from
    * disk, the batch side is capped on the fly, and verification is an
    * inline map over the two signatures already in the joined row: no
    * second join, no text. The batch side carries an explicit broadcast
    * hint (DedupStoreSpec pins the plan): the store must reach the join
    * with NO exchange regardless of the batch's size estimate — a batch
    * too large to broadcast should be split by the caller, not silently
    * demoted to a corpus-wide sort-merge shuffle. Cost then scales with
    * the BATCH size and its bucket overlap, never with the corpus.
    *
    * The batch's banding is deliberately referenced twice (union side +
    * broadcast side) and recomputed rather than cached: the recompute
    * is one extra batch-sized shingling pass (native codegen'd), which
    * is cheaper to accept per serve call than managing cache/checkpoint
    * lifetimes under a lazily-consumed return value.
    */
  def dedupNewBatch(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"dedupNewBatch: tau must be in (0, 1], got $tau")
    val m = readMeta(spark, path)
    val rowsDir = resolveRowsForRead(spark, path)
    val batchRows = DedupOps.bandRows(newDocs, m.idCol, m.textCol,
      m.shingleK, m.numPerm, m.bands, m.maxBucket, withSig = true)
      .withColumnRenamed(m.idCol, "id")
    val all = spark.read.parquet(rowsDir).unionByName(batchRows)
    val pairs = all.as("x")
      .join(broadcast(batchRows.as("y")),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("x.sig").as("sig_a"),
        col("y.id").as("b"), col("y.sig").as("sig_b"))
      // a pair sharing several bands is still one pair (sigs are
      // functions of the ids, so first() is exact)
      .groupBy(col("a"), col("b"))
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
    val matches = pairs
      .withColumn("sig_sim",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (p, q) => p === q), v => v)).cast("double") / m.numPerm, 6))
      .where(col("sig_sim") >= tau)
      .groupBy(col("b"))
      .agg(min(col("a")).as("dup_of"))
    newDocs.select(col(m.idCol))
      .join(matches, col(m.idCol) === col("b"), "left")
      .select(col(m.idCol), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"))
  }

  /** Admit a batch into the store: append the banding rows of `keepIds`
    * (pass [[dedupNewBatch]]'s clean ids to keep the store duplicate-
    * free — the usual policy — or every batch id to index everything).
    * Parameters come from the sidecar, so appended rows are comparable
    * with the stored ones by construction.
    *
    * The bucket cap applies to each batch INDEPENDENTLY: a degenerate
    * bucket (e.g. the near-empty-signature bucket of shingle-less
    * docs) can grow by up to maxBucket rows per admitted batch. Run
    * [[compact]] periodically to re-impose the global cap — the same
    * write-amplification-for-serve-cost trade as small-file
    * compaction.
    */
  def append(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      keepIds: DataFrame): Unit = {
    val m = readMeta(spark, path)
    recoverRows(spark, path)
    val keep = keepIds.select(col(m.idCol))
    // no broadcast hint on the keep set (ADVICE r11): a routine batch's
    // ids auto-broadcast under the planner's threshold anyway, while a
    // backfill-sized keep set must be allowed to shuffle-join instead
    // of OOMing a forced broadcast — the same reasoning [[delete]]
    // documents for its id set
    DedupOps.bandRows(
      newDocs.join(keep, Seq(m.idCol), "left_semi"),
      m.idCol, m.textCol, m.shingleK, m.numPerm, m.bands, m.maxBucket,
      withSig = true)
      .withColumnRenamed(m.idCol, "id")
      .write.mode("append").parquet(s"$path/rows")
  }

  /** Store observability: the bucket-occupancy profile of the persisted
    * band rows ([[SkewOps.skewProfile]] over (band_idx, band_key)) plus
    * totals — the numbers that decide when [[compact]] is due (a
    * heaviest-bucket occupancy approaching maxBucket × generations
    * means per-batch caps have been composing) and whether a hot
    * boilerplate bucket is distorting serve-join cost.
    */
  def stats(spark: SparkSession, path: String, topK: Int = 20)
      : (Long, Long, DataFrame) = {
    readMeta(spark, path) // fail fast on a non-store path
    val rows = spark.read.parquet(resolveRowsForRead(spark, path))
    val totals = rows.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("id")).as("docs")).head()
    (totals.getLong(0), totals.getLong(1),
      SkewOps.skewProfile(
        rows.select(col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"), topK))
  }

  /** Point delete: remove every band row of the given doc ids — run
    * when documents leave the corpus, or future batches keep matching
    * ghosts and get dropped against text that no longer exists. The
    * store has no per-doc partitioning (its layout serves bucket
    * joins), so delete is an anti-join rewrite of the row set behind
    * the same rename-aside swap as [[compact]]; batch deletions
    * together rather than calling this per document. Refuses to empty
    * the store entirely (that is [[write]]'s job, stated explicitly).
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val m = readMeta(spark, path)
    // no broadcast hint on the id set: this op ENCOURAGES batched
    // deletions, and a retention-sweep-sized id list must be allowed to
    // fall back to a shuffle anti-join instead of OOMing a forced
    // broadcast — the planner picks
    swapRows(spark, path, Some(
      "delete would remove every stored row — rebuild with write() " +
        "instead of deleting the whole corpus")) { rows =>
      rows.join(ids.select(col(m.idCol).as("id")), Seq("id"), "left_anti")
    }
  }

  /** Re-impose the GLOBAL bucket cap across everything admitted so far
    * (appends cap per batch — see [[append]]) and rewrite the row set
    * as one compacted generation. Keeps the `maxBucket` lowest-id rows
    * per bucket — the same winners a from-scratch [[write]] over the
    * full corpus would keep, so serve results after compact match a
    * fresh build's. Same safe-swap discipline as `IvfIndex.compact`:
    * write aside, rename the old generation away, rename the new one
    * in, drop the old — see [[swapRows]]/[[recoverRows]] for the
    * crash contract (staged generations roll FORWARD).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val m = readMeta(spark, path)
    swapRows(spark, path, emptyError = None) { rows =>
      val w = Window.partitionBy(col("band_idx"), col("band_key"))
        .orderBy(col("id"))
      rows
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= m.maxBucket)
        .drop("__rk")
    }
  }
}
