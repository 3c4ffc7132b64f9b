package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume spike for the GRAPH resolve family (d7
  * [[graft.operators.DedupOps.connectedComponents]], d21
  * [[graft.operators.DedupOps.pagerankPick]], d29
  * [[graft.operators.DedupOps.labelPropagation]]) — the
  * LevelsBench/AsofBench discipline applied to the iterative-join
  * shapes, because iteration × edges is where a graph op's scale
  * story actually lives (every round is a shuffle over the edge set,
  * and CC's distributed path loops to convergence):
  *
  *  - `replicated`: the corpus multiplied SPARK_GRAFT_GRAPH_MULT×
  *    with a replica-unique token prepended, so MinHash bands stay
  *    replica-local and the component structure replicates —
  *    edges grow linearly, diameters stay small. The typical shard
  *    shape; CC should converge in few rounds.
  *  - `hub`: the same corpus, but every 4th doc additionally carries
  *    ONE shared 12-token boilerplate sentence — its shingles
  *    dominate the MinHash minima, so band keys collide CORPUS-WIDE
  *    and a giant component forms across replicas. Stresses the
  *    per-bucket candidate caps (the pair stream must stay bounded,
  *    never bucket²) and the convergence loop on a high-degree hub
  *    graph — the mirror-site/boilerplate crawl case.
  *
  * Reports edge counts, component counts per algorithm, and two
  * timed passes per (fixture × operator) — Bench.scala's warm-pass
  * discipline, one JSON line plus a bench/ file.
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_GRAPH_MULT", "20").toInt
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

    val replicated = rep
      .withColumn("text", concat(lit("r"), $"__rep", lit(" "), $"text"))
      .drop("__rep")
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val hub = rep
      .withColumn("text",
        when(pmod($"doc_id", lit(4)) === 0,
          concat(lit("r"), $"__rep", lit(" "), $"text",
            lit(" " + boiler)))
          .otherwise(concat(lit("r"), $"__rep", lit(" "), $"text")))
      .drop("__rep")

    def edgesOf(corpus: DataFrame): DataFrame =
      operators.DedupOps.minhashCandidatePairs(
        corpus, "doc_id", "text", shingleK = 3, numPerm = 8, bands = 2)
        .select($"a", $"b")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    for ((name, corpus) <- Seq("replicated" -> replicated, "hub" -> hub)) {
      val e = edgesOf(corpus)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tEdges, nEdges) = time(e.count())
      out(s"${name}_n_edges") = nEdges
      out(s"${name}_edge_build_s") = tEdges
      for (pass <- 1 to 2) {
        val (tLpa, nLpaComm) = time(
          operators.DedupOps.labelPropagation(e, iters = 3)
            .select($"community").distinct().count())
        val (tCc, nCcComp) = time(
          operators.DedupOps.connectedComponents(e)
            .select($"component").distinct().count())
        val (tPr, nAuth) = time(
          operators.DedupOps.pagerankPick(e, damping = 0.85, iters = 3)
            .filter($"is_authority").count())
        out(s"${name}_pass${pass}_lpa3_s") = tLpa
        out(s"${name}_pass${pass}_cc_s") = tCc
        out(s"${name}_pass${pass}_pagerank3_s") = tPr
        if (pass == 2) {
          out(s"${name}_lpa_communities") = nLpaComm
          out(s"${name}_cc_components") = nCcComp
          out(s"${name}_authorities") = nAuth
        }
      }
      e.unpersist()
    }
    def j(v: Any): String = v match {
      case d: Double => f"$d%.3f"
      case x => x.toString
    }
    val json = out.map { case (k, v) => s"\"$k\":${j(v)}" }
      .mkString(
        s"""{"metric":"graph_spike","unit":"sec","sf":"$sfDir","mult":$mult,"cpus":$cpus,""",
        ",", "}")
    println(json)
    try {
      val p = java.nio.file.Paths.get("bench",
        s"GRAPH_SPIKE_r14_mult$mult.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[graphbench] persist failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
