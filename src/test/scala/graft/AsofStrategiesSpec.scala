package graft

import graft.operators.{AsofStrategies, TimeSeriesOps}
import org.apache.spark.sql.functions._

/** The bucketed range-join as-of (the VERDICT r12 spike) must be
  * answer-identical to the production union+window form on every edge
  * the contract names — across bucket widths from "every row its own
  * bucket" to "one bucket holds everything", since the cross-bucket
  * carry logic degenerates differently at each extreme.
  */
class AsofStrategiesSpec extends SparkSpec {
  import spark.implicits._

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  test("bucketed == union+window on the contract edges, at every bucket " +
    "width (within-bucket pick, cross-bucket carry, forward fallback, " +
    "keyless series, exact-tie inclusivity)") {
    val left = Seq(
      (1L, T("2024-01-01 00:30:00")), // before key 1's first right row
      (1L, T("2024-01-01 10:00:00")), // exact coincident tie (inclusive)
      (1L, T("2024-01-03 07:00:00")), // several empty buckets back
      (2L, T("2024-01-01 05:00:00")), // key with no right rows -> null
      (3L, T("2024-01-01 01:00:00"))  // right only later: forward tier
    ).toDF("site", "t")
    val right = Seq(
      (1L, T("2024-01-01 10:00:00"), 10.0),
      (1L, T("2024-01-02 09:00:00"), 11.0),
      (3L, T("2024-01-05 00:00:00"), 30.0)
    ).toDF("site", "rt", "v")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"site", $"t", $"v_asof")
        .as[(Long, java.sql.Timestamp, Option[Double])]
        .collect().sortBy(r => (r._1, r._2.getTime)).toSeq

    val base = rows(TimeSeriesOps.asOfLookup(
      left, right, Seq("site"), "t", "rt", Seq("v")))
    assert(base === Seq(
      (1L, T("2024-01-01 00:30:00"), Some(10.0)), // forward fallback
      (1L, T("2024-01-01 10:00:00"), Some(10.0)), // tie -> backward
      (1L, T("2024-01-03 07:00:00"), Some(11.0)), // backward carry
      (2L, T("2024-01-01 05:00:00"), None),
      (3L, T("2024-01-01 01:00:00"), Some(30.0))))
    for (w <- Seq(60L, 3600L, 86400L, 1000000000L)) {
      val got = rows(AsofStrategies.asOfLookupBucketed(
        left, right, Seq("site"), "t", "rt", Seq("v"), bucketSeconds = w))
      assert(got === base, s"bucketSeconds=$w diverged")
    }
  }

  test("bucketed == union+window over the events table (bulk randomized " +
    "agreement, two widths)") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val left = ev.select($"user_id", $"ts", $"event_id")
    val right = ev.filter(pmod(xxhash64($"event_id"), lit(7)) === 0)
      .select($"user_id", $"ts".as("rt"), $"value")
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Seq[Any]) = {
      val out = df.orderBy($"event_id")
      (out.count(),
        out.select(bit_xor(xxhash64($"user_id", $"event_id",
          round($"value_asof", 9)))).collect().toSeq.map(_.get(0)))
    }
    val base = sig(TimeSeriesOps.asOfLookup(
      left, right, Seq("user_id"), "ts", "rt", Seq("value")))
    for (w <- Seq(3600L, 86400L)) {
      assert(sig(AsofStrategies.asOfLookupBucketed(
        left, right, Seq("user_id"), "ts", "rt", Seq("value"),
        bucketSeconds = w)) === base, s"bucketSeconds=$w diverged")
    }
  }
}
