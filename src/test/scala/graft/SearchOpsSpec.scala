package graft

import graft.operators.SearchOps
import org.apache.spark.sql.functions._

/** BM25 + RRF: hand-computed scores on a tiny corpus, ranking behavior
  * (tf monotone, length-normalized), persisted-index parity with the
  * partition pruning pinned, and fusion arithmetic.
  */
class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def bm25Ref(
      tf: Long, df: Long, n: Long, dl: Long, avgdl: Double,
      k1: Double = 1.5, b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
  }

  test("bm25TopK matches the hand-computed Okapi formula on a " +
    "three-document corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),        // dl 3, tf(cat)=2
      (2L, "cat fish"),           // dl 2, tf(cat)=1
      (3L, "dog dog dog fish"))   // dl 4, no cat
      .toDF("doc_id", "text")
    val got = SearchOps.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 3)
      .select($"doc_id", $"bm25", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    val avgdl = 9.0 / 3
    val exp1 = bm25Ref(tf = 2, df = 2, n = 3, dl = 3, avgdl = avgdl)
    val exp2 = bm25Ref(tf = 1, df = 2, n = 3, dl = 2, avgdl = avgdl)
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    assert(math.abs(got(0)._2 - exp1) < 1e-6, s"${got(0)._2} vs $exp1")
    assert(math.abs(got(1)._2 - exp2) < 1e-6, s"${got(1)._2} vs $exp2")
  }

  test("bm25 ranking behavior: more occurrences outrank fewer at equal " +
    "length; equal tf is length-normalized; absent terms contribute " +
    "nothing") {
    val docs = Seq(
      (1L, "term term term pad"),
      (2L, "term pad pad pad"),
      (3L, "term pad pad pad pad pad pad pad"),
      (4L, "pad pad pad pad"))
      .toDF("doc_id", "text")
    val r = SearchOps.bm25TopK(docs, "doc_id", "text",
      Seq("term", "missing"), k = 4)
      .select($"doc_id", $"rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1).toSeq
    // doc 4 never mentions the term: not returned at all
    assert(r === Seq(1L, 2L, 3L))
  }

  test("bm25QueryIndex == bm25TopK over the same corpus, and the " +
    "postings scan is partition-pruned to the query terms' buckets") {
    val docs = Tables(spark, dir, "documents")
    val d = tempDirFile("graft_bm25_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    SearchOps.bm25IndexWrite(docs, "doc_id", "text", path, numBuckets = 16)
    val terms = Seq("vector", "join")
    val fromIndex = SearchOps.bm25QueryIndex(spark, path, terms, k = 10)
    val adHoc = SearchOps.bm25TopK(docs, "doc_id", "text", terms, k = 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"bm25", $"rank")
        .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(rows(fromIndex) === rows(adHoc))
    // the layout payoff: bucket partition filters + pushed term filter
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*bkt.*(IN|in)".r.findFirstIn(plan)
      .isDefined, s"postings scan not partition-pruned:\n$plan")
    assert("PushedFilters: \\[.*In\\(term".r.findFirstIn(plan)
      .isDefined, s"term filter not pushed to the scan:\n$plan")
  }

  test("rrfFuse matches hand-computed reciprocal-rank sums, counts list " +
    "membership, and breaks score ties by id") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = SearchOps.rrfFuse(Seq(a, b), "id", "rank", k = 4)
      .select($"id", $"rrf", $"n_lists", $"rank")
      .as[(Long, Double, Long, Int)].collect().sortBy(_._4)
    def c(r: Int) = BigDecimal(1.0 / (60.0 + r))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val exp = Map(
      10L -> c(1), 20L -> (c(2) + c(1)), 30L -> c(3), 40L -> c(2))
    // 20 leads (two lists); 10 and 40 tie EXACTLY (1/61 each) -> id order
    assert(got.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
    for ((id, rrf, n, _) <- got) {
      val e = exp(id).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(rrf) === e, s"id $id: $rrf vs $e")
      assert(n === (if (id == 20L) 2L else 1L))
    }
  }

  test("guards: reserved columns, duplicate terms, and empty term lists " +
    "fail fast") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopK(docs.withColumn("__dl", lit(1)),
        "doc_id", "text", Seq("a"), k = 1)
    }
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopK(docs, "doc_id", "text", Seq("a", "a"), k = 1)
    }
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopK(docs, "doc_id", "text", Nil, k = 1)
    }
    intercept[IllegalArgumentException] {
      SearchOps.bm25IndexWrite(docs.withColumn("tf", lit(1)),
        "doc_id", "text", "/tmp/never")
    }
    intercept[IllegalArgumentException] {
      SearchOps.rrfFuse(Nil, "id", "rank", k = 1)
    }
  }

  test("rankEval: hand-computed dcg/idcg/ndcg/mrr, k cuts the system " +
    "list, a query the system never answers scores 0, zero-relevance " +
    "queries are dropped, k guard") {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val log2_3 = math.log(3.0) / math.log(2.0)
    // q1 truth: 10→rel3, 11→rel2, 12→rel1; system: 11,99,10 then 12 cut
    // by k=3. dcg = 3/log2(2) + 0 + 7/log2(4) = 3 + 3.5 = 6.5;
    // idcg = 7 + r9(3/log2(3)) + 0.5; mrr = 1 (rank-1 hit is relevant).
    // q2 has truth but no system rows → all-zero scores, idcg intact.
    // q3 has only rel=0 truth → dropped.
    val truth = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1),
      (2L, 20L, 2), (3L, 30L, 0)).toDF("qid", "id", "rel")
    val system = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3),
      (1L, 12L, 4)).toDF("qid", "id", "rank")
    val out = SearchOps.rankEval(system, truth, "qid", "id", "rank", "rel",
      k = 3).as[(Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L), "q3 dropped, order by qid")
    val q1 = out.head
    val idcg1 = 7.0 + r9(3.0 / log2_3) + 0.5
    assert(q1._2 === 3L)
    assert(q1._3 === 1.0, "mrr: first system hit is relevant")
    assert(q1._4 === 6.5, q1.toString)
    assert(q1._5 === r9(idcg1), q1.toString)
    assert(q1._6 === r6(6.5 / idcg1), q1.toString)
    val q2 = out(1)
    assert(q2._2 === 1L && q2._3 === 0.0 && q2._4 === 0.0 &&
      q2._5 === 3.0 && q2._6 === 0.0, q2.toString)
    intercept[IllegalArgumentException] {
      SearchOps.rankEval(system, truth, "qid", "id", "rank", "rel", 0)
    }
  }
}
