package graft

import graft.operators.DedupStore
import org.apache.spark.sql.functions._

/** The incremental dedup lifecycle: corpus indexed once, batches flagged
  * against the store + themselves, admitted rows visible to the NEXT
  * batch — and the config sidecar guards comparability.
  */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store(tag: String): String = {
    val d = tempDirFile(tag)
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("batch flags: store dup detected, within-batch dup points to the " +
    "earlier batch doc, clean doc passes; append makes batch-1 visible " +
    "to batch 2") {
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((1L, corpusText), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val p = store("graft_dedup_store_")
    DedupStore.write(corpus, "doc_id", "text", p)
    assert(DedupStore.readMeta(spark, p).numPerm === 8)

    val freshText = "red orange yellow green blue indigo violet"
    val batch1 = Seq(
      (10L, corpusText),  // exact dup of stored doc 1
      (11L, freshText),   // clean
      (12L, freshText))   // dup of 11 within the batch
      .toDF("doc_id", "text")
    val flags1 = DedupStore.dedupNewBatch(spark, p, batch1, tau = 0.5)
      .as[(Long, Boolean, Option[Long])].collect().sortBy(_._1).toSeq
    assert(flags1 === Seq(
      (10L, true, Some(1L)),
      (11L, false, None),
      (12L, true, Some(11L))))

    // admit only the clean rows, then a batch-2 copy of 11 must flag
    DedupStore.append(spark, p, batch1,
      Seq(Tuple1(11L)).toDF("doc_id"))
    val batch2 = Seq((20L, freshText), (21L, "wholly new words here now"))
      .toDF("doc_id", "text")
    val flags2 = DedupStore.dedupNewBatch(spark, p, batch2, tau = 0.5)
      .as[(Long, Boolean, Option[Long])].collect().sortBy(_._1).toSeq
    assert(flags2 === Seq(
      (20L, true, Some(11L)),
      (21L, false, None)))
    // 12 was refused admission, so nothing points at it
    assert(!flags2.exists(_._3.contains(12L)))
  }

  test("dedupNewBatch plan: the bucket join BROADCASTS the batch — the " +
    "corpus-side store scan reaches the join with no exchange") {
    val corpus = (0L until 50L)
      .map(i => (i, s"w$i x$i y$i z$i a$i b$i")).toDF("doc_id", "text")
    val p = store("graft_dedup_plan_")
    DedupStore.write(corpus, "doc_id", "text", p)
    val batch = Seq((100L, "w1 x1 y1 z1 a1 b1")).toDF("doc_id", "text")
    val flags = DedupStore.dedupNewBatch(spark, p, batch, tau = 0.5)
    flags.collect() // finalize the adaptive plan
    val lines = flags.queryExecution.executedPlan.toString.linesIterator.toSeq
    val join = lines.indexWhere(_.contains("BroadcastHashJoin [band_idx"))
    assert(join >= 0, "bucket join must be a broadcast join:\n" +
      lines.mkString("\n"))
    // the streamed (printed-first) branch under the join is the store
    // scan; nothing between them may re-partition the corpus
    val storeScan = lines.indexWhere(
      l => l.contains("FileScan parquet") && l.contains("/rows"), join)
    assert(storeScan > join, lines.mkString("\n"))
    val between = lines.slice(join + 1, storeScan)
    assert(!between.exists(_.contains("Exchange")),
      "exchange on the store side of the serve join:\n" +
        lines.mkString("\n"))
  }

  test("compact: re-imposes the global bucket cap across appends and " +
    "serve results match a fresh build; rows_old recovery rolls forward") {
    // maxBucket 2: three same-text docs admitted over two generations
    // overfill the shared bucket (write caps its 2, append adds 1 more)
    val txt = "same words every time here"
    val p = store("graft_dedup_compact_")
    DedupStore.write(
      Seq((1L, txt), (2L, txt)).toDF("doc_id", "text"),
      "doc_id", "text", p, maxBucket = 2)
    DedupStore.append(spark, p,
      Seq((3L, txt)).toDF("doc_id", "text"),
      Seq(Tuple1(3L)).toDF("doc_id"))
    def bucketMax(): Long = spark.read.parquet(s"$p/rows")
      .groupBy($"band_idx", $"band_key").count()
      .agg(max($"count")).as[Long].head()
    assert(bucketMax() === 3) // per-batch caps composed: over the cap
    DedupStore.compact(spark, p)
    assert(bucketMax() === 2) // global cap re-imposed, lowest ids win
    val ids = spark.read.parquet(s"$p/rows")
      .select($"id").distinct().as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L)) // the fresh-build winners
    // crash recovery: simulate a swap that lost the live dir
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$p/rows"),
      new org.apache.hadoop.fs.Path(s"$p/rows_old"))
    DedupStore.compact(spark, p) // must roll forward, not crash
    assert(bucketMax() === 2)
    // observability: totals + the heaviest buckets, skew ratios included
    val (rowsN, docsN, profile) = DedupStore.stats(spark, p)
    assert(docsN === 2) // post-compact winners
    assert(rowsN === profile.agg(sum($"n")).as[Long].head())
    val top = profile.select($"n").as[Long].collect()
    assert(top.nonEmpty && top.max === 2)
  }

  test("mid-swap crash with a COMPLETE staged generation rolls FORWARD " +
    "— a crashed delete must not resurrect its ghosts") {
    val p = store("graft_dedup_fwd_")
    DedupStore.write(
      Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
        .toDF("doc_id", "text"), "doc_id", "text", p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def P(n: String) = new org.apache.hadoop.fs.Path(s"$p/$n")
    // fabricate the post-rename1 crash state of delete(1): staged
    // generation (doc 2 only) fully written, live dir moved aside
    spark.read.parquet(s"$p/rows").filter($"id" === 2L)
      .write.parquet(s"$p/rows_next")
    fs.rename(P("rows"), P("rows_old"))
    // a reader must SEE the staged generation (rolling back would
    // resurrect the deleted doc) but must not touch the swap state —
    // recovery renames belong to mutators alone (ADVICE r11: a reader
    // racing a writer's swap must not rename underneath it)
    val (_, docs, _) = DedupStore.stats(spark, p)
    assert(docs === 1, "rollback would have resurrected the deleted doc")
    assert(fs.exists(P("rows_next")) && fs.exists(P("rows_old")) &&
      !fs.exists(P("rows")), "read-only stats mutated the swap state")
    // the next MUTATOR rolls the swap forward and cleans up
    DedupStore.compact(spark, p)
    assert(fs.exists(P("rows")) &&
      !fs.exists(P("rows_next")) && !fs.exists(P("rows_old")))
    assert(DedupStore.stats(spark, p)._2 === 1)
    // staging lost entirely -> readers fall back to the old generation
    fs.rename(P("rows"), P("rows_old"))
    assert(DedupStore.stats(spark, p)._2 === 1)
    assert(fs.exists(P("rows_old")), "reader restored the old generation")
  }

  test("delete: a removed doc stops matching future batches, survivors " +
    "unaffected, emptying the store is refused") {
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val otherText = "one two three four five six seven eight"
    val p = store("graft_dedup_delete_")
    DedupStore.write(
      Seq((1L, corpusText), (2L, otherText)).toDF("doc_id", "text"),
      "doc_id", "text", p)
    val batch = Seq((10L, corpusText), (11L, otherText))
      .toDF("doc_id", "text")
    // before: both batch docs flag against the store
    assert(DedupStore.dedupNewBatch(spark, p, batch, 0.5)
      .filter($"is_dup").count() === 2)
    DedupStore.delete(spark, p, Seq(Tuple1(1L)).toDF("doc_id"))
    val after = DedupStore.dedupNewBatch(spark, p, batch, 0.5)
      .as[(Long, Boolean, Option[Long])].collect().sortBy(_._1).toSeq
    assert(after === Seq(
      (10L, false, None),      // ghost gone: no longer matches doc 1
      (11L, true, Some(2L))))  // survivor still matches
    intercept[IllegalArgumentException] {
      DedupStore.delete(spark, p, Seq(Tuple1(2L)).toDF("doc_id"))
    }
    // the refused delete must leave the store intact and live
    assert(DedupStore.stats(spark, p)._2 === 1)
  }

  test("guards: missing sidecar, bad tau") {
    val p = store("graft_dedup_store_empty_")
    intercept[IllegalArgumentException] {
      DedupStore.readMeta(spark, p)
    }
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    DedupStore.write(corpus, "doc_id", "text", p)
    intercept[IllegalArgumentException] {
      DedupStore.dedupNewBatch(spark, p, corpus, tau = 0.0)
    }
  }

  test("a reader holding a pre-swap generation across compact/delete " +
    "completes or fails CLEANLY (missing files, retry-safe) — never a " +
    "wrong or partial answer; a re-resolved retry always succeeds") {
    // At 100 TB compaction and serving overlap: the documented contract
    // (resolveRowsForRead scaladoc, ADVICE r12) is that a reader whose
    // lazily-executed scan loses its generation to a swap fails with a
    // clean missing-path error — it must never silently read a
    // half-written generation — and re-resolving picks up the new one.
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((1L, corpusText), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val p = store("graft_dedup_race_")
    DedupStore.write(corpus, "doc_id", "text", p)
    val batch = Seq((30L, corpusText)).toDF("doc_id", "text")
    val expected = Seq((30L, true, Some(1L)))

    def collectFlags(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Boolean, Option[Long])].collect().sortBy(_._1).toSeq

    def cleanFailure(e: Throwable): Boolean = {
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .take(10).toSeq
      chain.exists(t => t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(m =>
          m.contains("does not exist") || m.contains("FileNotFound")))
    }

    // -- compact swap (content-preserving): a surviving reader must
    //    return exactly the same flags; a failing one fails cleanly
    val preCompact = DedupStore.dedupNewBatch(spark, p, batch, tau = 0.5)
    DedupStore.compact(spark, p)
    scala.util.Try(collectFlags(preCompact)) match {
      case scala.util.Success(got) => assert(got === expected)
      case scala.util.Failure(e) => assert(cleanFailure(e), e.toString)
    }
    assert(collectFlags(DedupStore.dedupNewBatch(spark, p, batch, 0.5))
      === expected)

    // -- delete swap (semantics-changing): a surviving reader answers
    //    for the complete generation it resolved (pre- or post-delete,
    //    both are consistent states); a failing one fails cleanly
    val preDelete = DedupStore.dedupNewBatch(spark, p, batch, tau = 0.5)
    DedupStore.delete(spark, p, Seq(Tuple1(1L)).toDF("doc_id"))
    val postDeleteExpected = Seq((30L, false, None))
    scala.util.Try(collectFlags(preDelete)) match {
      case scala.util.Success(got) =>
        assert(got === expected || got === postDeleteExpected, got.toString)
      case scala.util.Failure(e) => assert(cleanFailure(e), e.toString)
    }
    assert(collectFlags(DedupStore.dedupNewBatch(spark, p, batch, 0.5))
      === postDeleteExpected)
  }
}
