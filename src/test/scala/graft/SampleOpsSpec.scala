package graft

import graft.operators.SampleOps
import org.apache.spark.sql.functions._

/** Dataset-curation operators: the property that matters is DETERMINISM
  * under re-partitioning and re-runs — a sample/split/packing that moves
  * when the cluster layout changes poisons every downstream stage.
  */
class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 200L).map(i =>
    (i, s"lang${i % 3}", (i % 37 + 1).toInt)).toDF("id", "lang", "len")

  test("mixtureSample: rate-1 keeps all, rate-0 drops all, and one " +
    "group's kept set ignores the others' rates") {
    def kept(rates: Map[String, Double]): Map[String, Set[Long]] =
      SampleOps.mixtureSample(docs, "id", "lang", rates)
        .select("id", "lang").as[(Long, String)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val all = kept(Map("lang0" -> 1.0, "lang1" -> 0.5, "lang2" -> 0.0))
    assert(all("lang0").size === docs.filter($"lang" === "lang0").count())
    assert(!all.contains("lang2"))
    assert(all("lang1").nonEmpty &&
      all("lang1").size < docs.filter($"lang" === "lang1").count())
    // independence: lang1's kept ids are identical when lang0's rate moves
    val again = kept(Map("lang0" -> 0.1, "lang1" -> 0.5, "lang2" -> 1.0))
    assert(again("lang1") === all("lang1"))
    // determinism under repartition
    val repart = SampleOps.mixtureSample(
      docs.repartition(7), "id", "lang", Map("lang1" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(repart === all("lang1"))
    // composition with hashSplit: the mixture hash is salted, so the
    // survivors of a low rate still split into BOTH labels (an unsalted
    // hash would alias with the split's mod-100 buckets and empty one side)
    val many = (0L until 2000L).map(i => (i, "g")).toDF("id", "lang")
    val splits = SampleOps.mixtureSample(many, "id", "lang", Map("g" -> 0.05))
      .select(SampleOps.hashSplit(col("id"), 50).as("split"))
      .as[String].collect()
    assert(splits.toSet === Set("train", "holdout"), splits.toSet.toString)
  }

  test("stratifiedSample: exact n per group, stable under repartition") {
    val a = SampleOps.stratifiedSample(docs, "lang", "id", 10)
      .select("id").as[Long].collect().toSet
    val b = SampleOps.stratifiedSample(docs.repartition(7), "lang", "id", 10)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    val sizes = SampleOps.stratifiedSample(docs, "lang", "id", 10)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet === Set(10L))
  }

  test("hashSplit: stable per id, roughly the requested ratio") {
    val out = docs.select(col("id"),
      SampleOps.hashSplit(col("id"), 90).as("split"))
      .as[(Long, String)].collect().toMap
    val out2 = docs.repartition(5).select(col("id"),
      SampleOps.hashSplit(col("id"), 90).as("split"))
      .as[(Long, String)].collect().toMap
    assert(out === out2)
    val train = out.values.count(_ == "train")
    assert(train > 150 && train < 200, s"train=$train of 200")
  }

  test("packSequences: contiguous offsets per shard, bins chunk at maxLen") {
    val packed = SampleOps.packSequences(docs, "lang", "id", "len", maxLen = 64)
      .select("lang", "id", "len", "shard_pos", "bin")
      .as[(String, Long, Int, Long, Long)].collect()
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._4)
      // offsets tile the concatenated stream exactly
      assert(ordered.head._4 === 0L)
      ordered.sliding(2).foreach {
        case Array(p, q) => assert(q._4 === p._4 + p._3)
        case _ =>
      }
      // bin = floor(start / maxLen)
      ordered.foreach(r => assert(r._5 === r._4 / 64))
    }
    // deterministic under repartition
    val again = SampleOps.packSequences(
      docs.repartition(9), "lang", "id", "len", maxLen = 64)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(packed.map(r => r._2 -> r._5).toMap === again)
  }

  test("weightedSample: weight 1 keeps all, 0 keeps none, keeps are " +
    "monotone in the weight; negativeSample: k per anchor, never self, " +
    "deterministic, guards") {
    val docs = (0L until 300L).map(i => (i, i.toDouble / 300)).toDF("id", "w")
    assert(SampleOps.weightedSample(docs, "id", lit(1.0)).count() === 300)
    assert(SampleOps.weightedSample(docs, "id", lit(0.0)).count() === 0)
    assert(SampleOps.weightedSample(docs, "id", lit(5.0)).count() === 300)
    val at03 = SampleOps.weightedSample(docs, "id", lit(0.3))
      .select($"id").as[Long].collect().toSet
    val at07 = SampleOps.weightedSample(docs, "id", lit(0.7))
      .select($"id").as[Long].collect().toSet
    assert(at03.subsetOf(at07)) // monotone: raising weight never drops
    assert(at03.size > 50 && at03.size < 130) // ~30% of 300
    // per-row weights: heavier rows keep more often
    val perRow = SampleOps.weightedSample(docs, "id", $"w")
      .select($"id").as[Long].collect()
    assert(perRow.count(_ >= 150) > perRow.count(_ < 150))

    val negs = SampleOps.negativeSample(docs, "id", k = 4, n = 300)
      .as[(Long, Int, Long)].collect().toSeq
    assert(negs.size === 1200)
    assert(negs.forall { case (a, _, neg) => neg != a && neg >= 0 && neg < 300 })
    assert(negs.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(0, 1, 2, 3)))
    val again = SampleOps.negativeSample(
      docs.repartition(7), "id", 4, 300).as[(Long, Int, Long)].collect().toSet
    assert(again === negs.toSet) // partitioning-independent
    intercept[IllegalArgumentException] {
      SampleOps.negativeSample(docs, "id", 0, 300)
    }
    intercept[IllegalArgumentException] {
      SampleOps.negativeSample(docs, "id", 4, 1)
    }
  }

  test("planMixture: under-budget groups keep everything, over-budget " +
    "groups keep ~the budgeted token fraction, kept sets are a subset " +
    "of mixtureSample at the same rate, guards") {
    val docs = (0L until 400L).map { i =>
      (i, if (i % 2 == 0) "big" else "small", 10L)
    }.toDF("doc_id", "grp", "tok") // 200 docs x 10 tokens per group
    val kept = SampleOps.planMixture(
      docs, "doc_id", "grp", $"tok",
      budgets = Map("big" -> 500L), defaultBudget = 100000L)
      .select($"doc_id", $"grp").as[(Long, String)].collect().toSeq
    // small: budget 100000 >= 2000 tokens -> rate 1, all 200 kept
    assert(kept.count(_._2 == "small") === 200)
    // big: rate 500/2000 = 0.25 -> threshold 2500 per-myriad; the kept
    // count follows the hash, so assert the band and the exact rule
    val bigKept = kept.filter(_._2 == "big").map(_._1).toSet
    assert(bigKept.size > 20 && bigKept.size < 80,
      s"~25% of 200 expected, got ${bigKept.size}")
    // a doc kept at rate r must also be kept by mixtureSample(r)
    val mix = SampleOps.mixtureSample(
      docs.filter($"grp" === "big"), "doc_id", "grp",
      Map("big" -> 0.25))
      .select($"doc_id").as[Long].collect().toSet
    assert(bigKept === mix)
    intercept[IllegalArgumentException] {
      SampleOps.planMixture(docs, "doc_id", "grp", $"tok",
        Map("big" -> -1L))
    }
    intercept[IllegalArgumentException] {
      SampleOps.planMixture(docs.withColumnRenamed("tok", "__tok"),
        "doc_id", "grp", $"__tok", Map.empty)
    }
  }

  test("temperatureMixture: alpha < 1 up-samples the tail source " +
    "relative to proportional, rates cap at 1, guards fire") {
    // big: 200 docs x 10 tokens; tail: 20 docs x 10 tokens
    val docs = ((1L to 200L).map((_, "big", 10)) ++
      (201L to 220L).map((_, "tail", 10)))
      .toDF("doc_id", "grp", "tok")
    def kept(alpha: Double): Map[String, Long] =
      SampleOps.temperatureMixture(
        docs, "doc_id", "grp", $"tok", totalBudget = 1000L, alpha = alpha)
        .groupBy($"grp").count()
        .as[(String, Long)].collect().toMap.withDefaultValue(0L)
    val flat = kept(0.5)
    val prop = kept(1.0)
    // alpha=0.5: tail rate = budget·q/200 = 1.2 -> capped at 1.0,
    // every tail doc survives; proportional keeps tail at ~45%
    assert(flat("tail") === 20L)
    assert(prop("tail") < 20L)
    assert(flat("tail") > prop("tail"), s"flat=$flat prop=$prop")
    // the flattening takes FROM the head
    assert(flat("big") < prop("big"), s"flat=$flat prop=$prop")
    intercept[IllegalArgumentException] {
      SampleOps.temperatureMixture(docs, "doc_id", "grp", $"tok", 100L, 0.0)
    }
    intercept[IllegalArgumentException] {
      SampleOps.temperatureMixture(
        docs.withColumnRenamed("tok", "__tok"),
        "doc_id", "grp", $"__tok", 100L, 0.5)
    }
  }

  test("mixtureReport: required/rate/epochs per group, rate > 1 surfaces " +
    "the data-constrained regime, untargeted groups drop, guards") {
    // A has 200 tokens, B has 50, C untargeted; budget 400 at 75/25:
    // A needs 300 of 200 -> rate 1.5, epochs 2; B needs 100 of 50 ->
    // rate 2.0, epochs 2
    val docs = Seq(("A", 120L), ("A", 80L), ("B", 50L), ("C", 10L))
      .toDF("grp", "tok")
    val out = SampleOps.mixtureReport(docs, "grp", $"tok",
      Seq("A" -> 0.75, "B" -> 0.25), budget = 400L)
      .as[(String, Long, Double, Long, Double, Int)].collect().toSeq
    assert(out === Seq(
      ("A", 200L, 0.75, 300L, 1.5, 2),
      ("B", 50L, 0.25, 100L, 2.0, 2)))
    intercept[IllegalArgumentException] {
      SampleOps.mixtureReport(docs, "grp", $"tok", Nil, 1L)
    }
    intercept[IllegalArgumentException] {
      SampleOps.mixtureReport(docs, "grp", $"tok",
        Seq("A" -> 0.6, "B" -> 0.6), 1L)
    }
  }
}
