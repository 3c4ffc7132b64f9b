package graft

import graft.expressions.{DotFold, HashedShingles3, Md5Hash64, MinhashSig}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: registers the library's native expressions as SQL
  * functions so `spark.sql("SELECT graft_md5hash64(x) ...")` works and the
  * DataFrame API can reach them by name. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // `WHERE levenshtein(a, b) <= k` -> the banded O(k·n) form; see
    // graft.plans.BandedLevenshteinRule
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
    ext.injectFunction((
      new FunctionIdentifier("graft_md5hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "graft_md5hash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_md5hash64 takes one argument")
        Md5Hash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[HashedShingles3].getName, "graft_shingles3"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_shingles3 takes one argument")
        HashedShingles3(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_minhash_sig(shingles, numPerm)")
        val numPerm = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig numPerm must be an int literal, got $other")
        }
        MinhashSig(children.head, numPerm)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[graft.expressions.Simhash16].getName,
        "graft_simhash16"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash16 takes one argument")
        graft.expressions.Simhash16(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc_normalize"),
      new ExpressionInfo(classOf[graft.expressions.NfcNormalize].getName,
        "graft_nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_nfc_normalize takes one argument")
        graft.expressions.NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_boundaries"),
      new ExpressionInfo(classOf[graft.expressions.CdcBoundaries].getName,
        "graft_cdc_boundaries"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_cdc_boundaries(text, window, avgChunk)")
        def intLit(e: Expression, n: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_cdc_boundaries $n must be an int literal, got $other")
        }
        graft.expressions.CdcBoundaries(children.head,
          intLit(children(1), "window"), intLit(children(2), "avgChunk"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_mg_top1"),
      new ExpressionInfo(classOf[graft.expressions.MgTopOne].getName,
        "graft_mg_top1"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_mg_top1(value, k)")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_mg_top1 k must be an int literal, got $other")
        }
        graft.expressions.MgTopOne(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_mg_topk"),
      new ExpressionInfo(classOf[graft.expressions.MgTopK].getName,
        "graft_mg_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_mg_topk(value, k, topN)")
        def intLit(e: Expression, n: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_mg_topk $n must be an int literal, got $other")
        }
        graft.expressions.MgTopK(children.head,
          intLit(children(1), "k"), intLit(children(2), "topN"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dotfold"),
      new ExpressionInfo(classOf[DotFold].getName, "graft_dotfold"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dotfold takes two array arguments")
        DotFold(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lshbucket"),
      new ExpressionInfo(classOf[graft.expressions.LshBucket].getName,
        "graft_lshbucket"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_lshbucket(vec, numPlanes)")
        val numPlanes = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_lshbucket numPlanes must be an int literal, got $other")
        }
        graft.expressions.LshBucket(children.head, numPlanes)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_profile_counts"),
      new ExpressionInfo(classOf[graft.expressions.NgramProfileCounts].getName,
        "graft_ngram_profile_counts"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_ngram_profile_counts(text, n, array(array(ngrams)...))")
        val n = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_ngram_profile_counts n must be an int literal, got $other")
        }
        require(children(2).foldable,
          "graft_ngram_profile_counts profiles must be a literal array of arrays")
        val profiles = children(2).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType))
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.toString).toSeq).toSeq
        graft.expressions.NgramProfileCounts(children.head, n, profiles)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_repetition_kit"),
      new ExpressionInfo(classOf[graft.expressions.RepetitionKit].getName,
        "graft_repetition_kit"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_repetition_kit takes one array<string> argument")
        graft.expressions.RepetitionKit(children.head)
      }))
    // Spark's runtime-filter Bloom expressions, surfaced as SQL
    // functions: build with a scalar subquery and probe map-side —
    //   WHERE graft_bloom_might_contain(
    //     (SELECT graft_bloom_agg(xxhash64(k), 1000000, 9585059) FROM s),
    //     xxhash64(key))
    // — the fully-lazy one-plan form of SketchOps.bloomBuild/MightContain.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_bloom_agg(keyHash, expectedItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "graft_bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_bloom_might_contain(bloom, keyHash)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_myers_lev"),
      new ExpressionInfo(classOf[graft.expressions.MyersLev].getName,
        "graft_myers_lev"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_myers_lev takes two arguments")
        graft.expressions.MyersLev(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[graft.expressions.JaroWinkler].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_jaro_winkler takes two arguments")
        graft.expressions.JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_min_shingle_md5"),
      new ExpressionInfo(classOf[graft.expressions.MinShingleMd5].getName,
        "graft_min_shingle_md5"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_min_shingle_md5(text, k)")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_min_shingle_md5 k must be an int literal, got $other")
        }
        graft.expressions.MinShingleMd5(children.head, k)
      }))
  }
}
