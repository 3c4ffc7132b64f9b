package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stateful intensity validation (E11): a point is invalid when it drifts
  * more than ±`tolerance` from the PREVIOUS VALID point and the gap to it
  * is <= `maxGapSeconds` (`nmdb/entrypoint.py:122-134`,
  * `nmdb/influx_db.py:255-298`). Invalid points do not become the
  * reference point, so validity is a sequential fold per site — not
  * window-expressible.
  *
  * Batch shape: repartition by site + sortWithinPartitions (a secondary
  * sort — Spark's sort-based shuffle streams each partition in key+time
  * order, nothing is materialized per group), then one pass of
  * mapPartitions carrying (site -> last valid) state. Scales linearly:
  * state is O(1) per site, the pass is pipelined, and sites are spread
  * across partitions by the hash repartition.
  */
object IntensityOps {

  final case class IntensityPoint(site_no: Int, time: java.sql.Timestamp,
      intensity: Double)
  final case class ValidatedPoint(site_no: Int, time: java.sql.Timestamp,
      intensity: Double, bad_data_flag: Int)

  /** One step of the per-site fold (strict — safe to thread state through
    * lazy iterators). A point is invalid when the gap to the last valid
    * point is <= maxGap (inclusive: `if not (diff) > MAX`) and the value
    * drifts beyond ±tolerance; only valid points advance the state.
    */
  def validateOne(
      p: IntensityPoint,
      lastValid: Option[(Long, Double)],
      tolerance: Double,
      maxGapSeconds: Long): (ValidatedPoint, Option[(Long, Double)]) = {
    val tMillis = p.time.getTime
    val invalid = lastValid.exists { case (lvT, lvV) =>
      (tMillis - lvT) <= maxGapSeconds * 1000L &&
        (p.intensity < (1.0 - tolerance) * lvV ||
          p.intensity > (1.0 + tolerance) * lvV)
    }
    val out = ValidatedPoint(p.site_no, p.time, p.intensity,
      if (invalid) 1 else 0)
    (out, if (invalid) lastValid else Some((tMillis, p.intensity)))
  }

  /** Strict fold over an ordered batch (used by the streaming path, where
    * each micro-batch is small); returns outputs plus the carried state.
    */
  def validateOrdered(
      points: Iterator[IntensityPoint],
      initial: Option[(Long, Double)],
      tolerance: Double,
      maxGapSeconds: Long): (Seq[ValidatedPoint], Option[(Long, Double)]) = {
    var lastValid = initial
    val out = points.map { p =>
      val (v, st) = validateOne(p, lastValid, tolerance, maxGapSeconds)
      lastValid = st
      v
    }.toVector
    (out, lastValid)
  }

  /** Batch validation over (site_no, time, intensity). */
  def flagDrift(
      df: DataFrame,
      tolerance: Double = 0.2,
      maxGapSeconds: Long = 24 * 3600): Dataset[ValidatedPoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("site_no").cast("int"), col("time"),
        col("intensity").cast("double"))
      .as[IntensityPoint]
      .repartition(col("site_no"))
      .sortWithinPartitions(col("site_no"), col("time"))
      .mapPartitions { it =>
        // sites are contiguous after the secondary sort; reset state on
        // site change. One O(1)-state lazy pass per partition (validateOne
        // is strict, so threading the vars through map is sound).
        var currentSite = Int.MinValue
        var lastValid: Option[(Long, Double)] = None
        it.map { p =>
          if (p.site_no != currentSite) { currentSite = p.site_no; lastValid = None }
          val (v, st) = validateOne(p, lastValid, tolerance, maxGapSeconds)
          lastValid = st
          v
        }
      }
  }
}
