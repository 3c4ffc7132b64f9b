package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume spike for the round-14 ExactSubstr family (d23
  * [[graft.operators.DedupOps.substringSpans]] / d24
  * [[graft.operators.DedupOps.substringDedup]]) — the LevelsBench/
  * AsofBench discipline applied to the window-hash shuffle: documents
  * multiplied `SPARK_GRAFT_DEDUP_MULT`× under three duplication
  * regimes, because the operator's cost is governed by the DUPLICATED
  * fraction, not the corpus size alone:
  *
  *  - `dup_light`: every replica gets a unique token spliced into each
  *    8-token stride, so almost every window is unique — the typical
  *    crawl shape; the ≥2 cut leaves a tiny join-back side.
  *  - `dup_heavy`: replicas differ only in one leading token — ~all
  *    windows duplicated mult×; the join-back side IS the corpus and
  *    the removal pass fans out every window. The worst case the
  *    operator can meet (a mirror-site crawl).
  *  - `hot_boiler`: dup_light plus one 16-token boilerplate sentence
  *    appended to HALF the docs — a single hot window family whose
  *    per-window counts are ~N/2. Stresses the hot-__wh partial-agg
  *    claim (map-side combine must collapse the hot hash per task
  *    before the exchange); the embedded a18 skewProfile of the
  *    window-hash key cites the measured skew.
  *
  * Two timed passes per (fixture × operator), warm pass first-class,
  * one JSON line — Bench.scala's discipline.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MULT", "50").toInt
    val w = 8
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

    val docs = Tables(spark, sfDir, "documents").select($"doc_id", $"text")
    val rep = docs
      .crossJoin(spark.range(mult.toLong).select($"id".as("__rep")))
      .withColumn("doc_id", $"doc_id" * mult + $"__rep")

    // dup_heavy: one replica-unique LEADING token; every interior
    // window of every replica collides with its mult-1 siblings
    val dupHeavy = rep
      .withColumn("text", concat(lit("r"), $"__rep", lit(" "), $"text"))
      .drop("__rep")

    // dup_light: a replica-unique token spliced into each 8-token
    // stride breaks (almost) every cross-replica window
    val dupLight = rep
      .withColumn("text", concat_ws(" ", expr(
        "flatten(transform(split(text, ' '), " +
          "(t, i) -> CASE WHEN i % 8 = 0 THEN array(concat('u', __rep, 'x', i), t) " +
          "ELSE array(t) END))")))
      .drop("__rep")

    val boiler = "the quick brown fox jumps over the lazy dog again and " +
      "again every single day"
    val hotBoiler = dupLight.withColumn("text",
      when(pmod($"doc_id", lit(2)) === 0, concat($"text", lit(" " + boiler)))
        .otherwise($"text"))

    def force(df: DataFrame): Unit = {
      df.select(bit_xor(xxhash64(df.columns.map(col).toSeq: _*))).collect()
      ()
    }
    import graft.operators.DedupOps
    val allCases: Seq[(String, () => DataFrame)] = Seq(
      "light_spans" -> (() => DedupOps.substringSpans(dupLight, "doc_id", "text", w)),
      "light_dedup" -> (() => DedupOps.substringDedup(dupLight, "doc_id", "text", w)),
      "heavy_spans" -> (() => DedupOps.substringSpans(dupHeavy, "doc_id", "text", w)),
      "heavy_dedup" -> (() => DedupOps.substringDedup(dupHeavy, "doc_id", "text", w)),
      "hot_spans" -> (() => DedupOps.substringSpans(hotBoiler, "doc_id", "text", w)),
      "hot_dedup" -> (() => DedupOps.substringDedup(hotBoiler, "doc_id", "text", w)))
    // VERDICT r14 item 3: at mult=200 the six-case × two-pass single-JVM
    // run died of session pressure (~13 min of accumulated shuffle state
    // before pass2). SPARK_GRAFT_DEDUP_CASES selects a subset so
    // scripts/dedup_spike_forked.sh can give each case its own JVM —
    // warm numbers with cluster-honest isolation (a real deployment is
    // one app per job anyway) — while the default stays the all-cases
    // single-JVM shape for the lighter mults.
    val caseFilter = sys.env.get("SPARK_GRAFT_DEDUP_CASES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cases = caseFilter match {
      case Some(sel) =>
        val unknown = sel -- allCases.map(_._1).toSet
        require(unknown.isEmpty, s"unknown dedup-bench cases: $unknown")
        allCases.filter(c => sel(c._1))
      case None => allCases
    }

    // a18 signal on the hot fixture's shuffle key (the window hash):
    // top-1 window-hash share of all windows. Skipped in forked
    // single-case runs that don't touch the hot fixture — the merge
    // script takes the fields from the hot_* runs.
    val wantProfile = cases.exists(_._1.startsWith("hot_"))
    val prof =
      if (!wantProfile) (-1.0, -1.0)
      else {
        val hotWins = hotBoiler
          .select(explode(expr(
            s"transform(sequence(1, greatest(size(split(text, ' ')) - ${w - 1}, 0)), " +
              s"i -> concat_ws(' ', slice(split(text, ' '), i, $w)))"))
            .as("win"))
          .select(graft.operators.TextOps.baseHash60($"win").as("h"))
        graft.operators.SkewOps
          .skewProfile(hotWins, Seq("h"), topK = 1)
          .select($"share", $"skew").as[(Double, Double)].head()
      }
    val nDocs = if (wantProfile || caseFilter.isEmpty) dupLight.count() else -1L

    try force(cases.head._2()) catch { case _: Throwable => () } // warm-up
    def pass(): Seq[(String, Double)] = cases.map { case (name, mk) =>
      val t0 = System.nanoTime()
      val ok = try { force(mk()); true } catch { case e: Throwable =>
        System.err.println(s"[dedup-bench] $name FAILED: ${e.getMessage}")
        false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = pass()
    val p2 = pass()
    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"dedup_spike","unit":"sec","sf":"$sfDir","mult":$mult,"w":$w,"cpus":$cpus,"n_docs":$nDocs,"hot_top_share":${prof._1},"hot_top_skew":${prof._2},"pass2":${fmt(p2)},"pass1":${fmt(p1)}}""")
    spark.stop()
  }
}
