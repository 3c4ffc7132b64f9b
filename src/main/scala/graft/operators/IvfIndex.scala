package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index: build once (k-means codebook + vectors laid out
  * cell-partitioned on disk), query many — the ANN serving shape at
  * corpus scale. The payoff is in the LAYOUT: a query probes its
  * `nprobe` closest cells as LITERAL partition filters, so the vector
  * scan is partition-PRUNED to nprobe/kCells of the corpus before any
  * IO happens (pinned in IvfIndexSpec), instead of scanning everything
  * and filtering. The codebook (kCells x dims doubles) is metadata: it
  * rides the driver exactly as in [[SimilarityOps.kmeansFit]].
  *
  * Determinism discipline matches kmeansFit: probe-side cosines are
  * strict index-order left folds in double (computed on the driver over
  * the collected codebook — same fold order, same bits as the
  * distributed expression), so a rebuilt index probes identical cells.
  */
object IvfIndex {

  /** Train on the corpus and write `<path>/codebook` (cell, dim, c) and
    * `<path>/vectors` partitioned by cell.
    */
  def write(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      kCells: Int,
      trainIters: Int,
      path: String): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (assign, cent) = SimilarityOps.kmeansFit(
      embeddings, idCol, vecCol, kCells, trainIters)
    cent.toDF("cell", "dim", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
    embeddings
      .join(assign.select(col(idCol), col("cluster").as("cell")), Seq(idCol))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Query a persisted index with one vector: probe the `nprobe` closest
    * cells (cosine against the collected codebook, ties -> lowest cell),
    * then rank ONLY those cells' vectors — the isin(cells) filter prunes
    * partitions before IO. Output matches [[SimilarityOps.ivfTopKLearned]]:
    * (idCol, cell, sim, rank).
    */
  def query(
      spark: SparkSession,
      path: String,
      queryVec: Array[Double],
      excludeId: Option[Long],
      idCol: String,
      vecCol: String,
      nprobe: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val codebook = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1)
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_._2).map(_._3)
      }
    // driver-side strict left folds — identical order to the DotFold
    // expression, so cell choice matches the distributed formulation
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // NaN/Infinity pass through exactly as Spark's round() does (a
    // zero-norm vector yields NaN; BigDecimal would throw), and the
    // probe sort uses Double.compare so NaN orders LARGEST — matching
    // the distributed formulation's `csim DESC` (Spark sorts NaN above
    // every double), not Scala's default tuple sort.
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val r = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      if (r.isNaN || r.isInfinite) r
      else BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val probed = codebook.toSeq
      .map { case (cell, c) => (cell, cosine(queryVec, c)) }
      .sortWith { case ((c1, s1), (c2, s2)) =>
        val cmp = java.lang.Double.compare(s1, s2)
        if (cmp != 0) cmp > 0 else c1 < c2
      }
      .take(nprobe).map(_._1)
    val qv = typedlit(queryVec)
    val vectors = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probed: _*))
    excludeId.fold(vectors)(id => vectors.filter(col(idCol) =!= id))
      .select(col(idCol), col("cell"),
        SimilarityOps.cosine(col(vecCol), qv).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col(idCol).asc)))
  }
}
