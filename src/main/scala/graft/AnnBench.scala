package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r14 item 4: the ANN index volume spike — the one extension
  * family that had no mult-scaled artifact (ASOF/LEVELS/DEDUP/GRAPH all
  * carry one). The embeddings table is replicated
  * `SPARK_GRAFT_ANN_MULT`× (each replica perturbed in dim 0 so PQ/SQ8
  * codes differ — replicas must not collapse to identical codes), the
  * first mult−1 replicas become the corpus and the last the append
  * batch, and the full [[graft.operators.IvfIndex]] serving lifecycle is
  * timed: build (`write(trainPct = 40, pq = residual, sq8 = true)` — the
  * 100 TB build shape), append under the frozen codebook, `queryBatch`
  * (exact rank over probed cells) and `queryAdcBatch` (ADC + refine)
  * for a fixed 64-query batch at nprobe = 2.
  *
  * Two kCells policies run side by side at every mult — `fixed` (32
  * cells, the shape the small-SF queries use) and `sqrt` (⌈√n⌉ cells,
  * FAISS practice) — because the growth-law question the spike answers
  * is exactly whether kCells must scale with the corpus: with k fixed,
  * rows/cell grow mult×, so probed-cell scan cost grows mult× per query
  * even though the probe itself stays O(kCells); with k ~ √n both the
  * probe table and the per-cell scan grow ~√mult. Query phases run two
  * timed passes (warm second), build/append once per layout —
  * Bench.scala's discipline, one JSON line.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_ANN_MULT", "10").toInt
    require(mult >= 2, s"ANN spike needs mult >= 2 (corpus + append), got $mult")
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_ANN_NPROBE", "2").toInt
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

    val emb = Tables(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    // mult× replicas with globally-unique ids; the dim-0 nudge keeps
    // every replica's codes distinct (stay in FLOAT so the layout schema
    // matches the base table's array<float>)
    val all = emb
      .crossJoin(spark.range(mult.toLong).select($"id".as("__rep")))
      .select(($"vec_id" * mult + $"__rep").as("vec_id"), expr(
        "transform(embedding, (x, i) -> CASE WHEN i = 0 " +
          "THEN CAST(x + __rep * CAST(0.001 AS FLOAT) AS FLOAT) " +
          "ELSE x END)").as("embedding"),
        $"__rep")
    val corpus = all.filter($"__rep" < mult - 1).drop("__rep")
    val batch = all.filter($"__rep" === mult - 1).drop("__rep")
    // queries: 64 base vectors from replica 0, strided over the base
    // vec_id range (ADVICE r15: the 64 SMALLEST remapped ids were all
    // replicas of the first few base vectors — near-identical probes,
    // and a distribution that CHANGED with mult, confounding the
    // cross-mult growth-law readout). Replica 0 carries no dim-0 nudge,
    // so the query set is geometrically identical at every mult.
    val nBase = emb.count()
    val stride = math.max(1L, nBase / 64L)
    val queries = all.filter($"__rep" === 0).drop("__rep")
      .filter(expr(s"(vec_id div $mult) % $stride = 0"))
      .orderBy($"vec_id").limit(64)
    val nCorpus = corpus.count()
    val kSqrt = math.max(4, math.round(math.sqrt(nCorpus.toDouble)).toInt)

    def force(df: DataFrame): Unit = {
      df.select(bit_xor(xxhash64(df.columns.map(col).toSeq: _*))).collect()
      ()
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[ann-bench] FAILED: ${e.getMessage}")
        -1.0
      }
    }
    import graft.operators.IvfIndex
    import graft.operators.IvfIndex.Pq
    val root = java.nio.file.Files.createTempDirectory("ann_spike").toString

    def runVariant(tag: String, kCells: Int): String = {
      val path = s"$root/$tag"
      val build = timed(IvfIndex.write(corpus, "vec_id", "embedding",
        kCells = kCells, trainIters = 2, path = path,
        pq = Some(Pq(numSub = 8, kCodes = 16, iters = 2, residual = true)),
        sq8 = true, trainPct = 40))
      val append = timed(IvfIndex.append(spark, path, batch))
      def qb(): Unit =
        force(IvfIndex.queryBatch(spark, path, queries, nprobe, k = 10))
      def adc(): Unit =
        force(IvfIndex.queryAdcBatch(spark, path, queries, nprobe, k = 10,
          refine = 50))
      val qb1 = timed(qb()); val qb2 = timed(qb())
      val adc1 = timed(adc()); val adc2 = timed(adc())
      s""""$tag":{"kcells":$kCells,"build":$build,"append":$append,""" +
        s""""query_batch":$qb2,"query_batch_cold":$qb1,""" +
        s""""query_adc":$adc2,"query_adc_cold":$adc1}"""
    }

    val fixed = runVariant("fixed", 32)
    val sqrt = runVariant("sqrt", kSqrt)
    println(s"""{"metric":"ann_spike","unit":"sec","sf":"$sfDir","mult":$mult,"n_corpus":$nCorpus,"n_queries":64,"nprobe":$nprobe,"variants":{$fixed,$sqrt}}""")
    spark.stop()
  }
}
