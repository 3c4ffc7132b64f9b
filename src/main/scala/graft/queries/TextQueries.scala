package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.{DedupOps, DedupStore, SearchOps, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators over the `documents` corpus —
  * the training-data-pipeline surface (token stats, language ID, quality
  * scoring, fingerprinting, exact/MinHash/SimHash/Jaccard dedup). Every
  * query pairs the Spark plan with a structurally-mirrored DuckDB oracle:
  * all hashes are md5-derived and all float outputs rounded, so the two
  * engines agree bit-for-bit.
  */
object TextQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // ---- shared DuckDB fragments (mirror TextOps exactly) ----
  private val toksSql = "string_split(text, ' ')"
  // 3-word shingles, 1-based inclusive slicing.
  private val sh3Sql =
    s"list_transform(generate_series(1, len($toksSql) - 2), " +
      s"i -> array_to_string(($toksSql)[i:i+2], ' '))"
  private val sh5Sql =
    s"list_transform(generate_series(1, len($toksSql) - 4), " +
      s"i -> array_to_string(($toksSql)[i:i+4], ' '))"
  // 60-bit base hash per shingle (fold of the first 15 md5 hex digits),
  // then 8 affine MinHash permutations mod 2^31-1 — mirrors
  // TextOps.baseHash60/minhashSignature exactly.
  private[queries] val baseHashSql =
    "list_reduce(list_transform(generate_series(1, 15), __i -> " +
      "CAST(ord(substr(md5(s), CAST(__i AS INT), 1)) - " +
      "CASE WHEN substr(md5(s), CAST(__i AS INT), 1) >= 'a' THEN 87 ELSE 48 END " +
      "AS BIGINT)), (__a, __d) -> __a * 16 + __d)"
  // integer 3-shingle hashes from per-token hashes (mirror of
  // TextOps.hashedShingles3: one md5 per token, triples combined as
  // ((h1*B + h2) mod M * B + h3) mod M).
  private val tokHashesSql =
    s"list_transform($toksSql, s -> $baseHashSql % 1000000007)"
  private val hashedShSql =
    "list_transform(generate_series(1, len(th) - 2), " +
      "__i -> ((th[__i] * 1000003 + th[__i+1]) % 1000000007 " +
      "* 1000003 + th[__i+2]) % 1000000007)"
  private val hashedCteSql =
    s"""hashed AS (
       |  SELECT doc_id, $hashedShSql AS hs
       |  FROM (SELECT doc_id, $tokHashesSql AS th FROM documents))""".stripMargin
  private val sigsSql =
    s"""$hashedCteSql,
       |sigs AS (
       |  SELECT doc_id, list_transform(generate_series(0, 7),
       |    p -> list_min(list_transform(hs,
       |      x -> ((p * 2 + 3) * (x % 2147483647) + (p * 7 + 1)) % 2147483647))) AS mh
       |  FROM hashed)""".stripMargin
  private def bandKeySql(fromIdx: Int, untilIdx: Int): String =
    s"md5(array_to_string(list_transform(mh[$fromIdx:$untilIdx], " +
      s"__v -> CAST(__v AS VARCHAR)), ''))"
  private val bandsSql =
    s"""$sigsSql,
       |bands AS (
       |  SELECT doc_id, 0 AS band_idx, ${bandKeySql(1, 4)} AS band_key FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 1 AS band_idx, ${bandKeySql(5, 8)} AS band_key FROM sigs)""".stripMargin
  // 16-bit simhash over distinct tokens (ascii/floor/pow arithmetic only).
  private val simhashSql =
    """CAST(list_sum(list_transform(generate_series(0, 15), j ->
      |  CASE WHEN list_sum(list_transform(list_distinct(string_split(text, ' ')), tk ->
      |    CASE WHEN CAST(floor(
      |           (ord(substr(md5(tk), CAST(floor(j / 4) + 1 AS INT), 1))
      |             - CASE WHEN substr(md5(tk), CAST(floor(j / 4) + 1 AS INT), 1) >= 'a' THEN 87 ELSE 48 END)
      |           / pow(2.0, 3 - (j % 4))) AS BIGINT) % 2 = 1
      |    THEN 1 ELSE -1 END)) > 0
      |  THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** Shared by t43 (explode→groupBy) and t46 (native one-pass kit):
    * the hash match of both against this ONE oracle is the
    * equivalence proof between the shuffled and in-row forms.
    */
  private val charEntropyOracleSql = """
        WITH ch AS (
          SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
          FROM documents),
        cc AS (
          SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
          FROM ch WHERE ch <> '' GROUP BY 1, 2),
        n AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k
          FROM cc GROUP BY 1),
        terms AS (
          SELECT cc.doc_id, n.n, n.k,
                 CAST(round((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 12)
                   AS DECIMAL(24,12)) AS term
          FROM cc JOIN n USING (doc_id)),
        s AS (
          SELECT doc_id, n, k, sum(term) AS s
          FROM terms GROUP BY 1, 2, 3)
        SELECT doc_id, n AS n_chars, k AS n_distinct,
               round(-CAST(s AS DOUBLE), 6) AS entropy,
               CASE WHEN k > 1
                    THEN round(-CAST(s AS DOUBLE)
                           / ln(CAST(k AS DOUBLE)), 6)
                    ELSE 0.0 END AS entropy_norm
        FROM s ORDER BY doc_id"""

  private val markers = Seq(
    "en" -> Seq("the", "a"),
    "db" -> Seq("table", "row", "column"),
    "qq" -> Seq("query", "filter", "join"))
  private val stopwords = Seq("the", "a", "of", "to")

  private def markerSql(ws: Seq[String]): String =
    s"round(len(list_filter($toksSql, w -> ${ws.map(w => s"w = '$w'").mkString(" OR ")})) " +
      s"/ CAST(greatest(len($toksSql), 1) AS DOUBLE), 6)"

  val queries: Map[String, Q] = Map(
    // T1 — token counting: whitespace tokens + BPE-ish subword segments +
    // char/byte stats. One narrow projection, no shuffle.
    "t1_token_stats" -> Q(
      fn = (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).as("n_ws_tokens"),
            size(TextOps.subwordTokens(col("text"))).as("n_subword_tokens"),
            length(col("text")).as("n_chars_calc"),
            round((length(col("text")) - (size(toks) - 1)).cast("double") /
              greatest(size(toks), lit(1)), 6).as("mean_tok_len"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        SELECT doc_id,
               len($toksSql) AS n_ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subword_tokens,
               CAST(length(text) AS INT) AS n_chars_calc,
               round(CAST(length(text) - (len($toksSql) - 1) AS DOUBLE)
                     / greatest(len($toksSql), 1), 6) AS mean_tok_len
        FROM documents
        ORDER BY doc_id""")),

    // T2 — language ID by marker-ngram scoring: per-language marker-word
    // density, argmax with deterministic tie-break (first marker set wins).
    "t2_lang_id" -> Q(
      fn = (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val (scores, pred) = TextOps.langScores(toks, markers)
        t(s, dir, "documents")
          .select(col("doc_id") +:
            scores.map { case (l, c) => c.as(s"s_$l") } :+
            pred.as("pred_lang"): _*)
          .orderBy(col("doc_id"))
      },
      oracle = Some {
        val sc = markers.map { case (l, ws) => s"${markerSql(ws)} AS s_$l" }
        val best = s"greatest(${markers.map(m => s"s_${m._1}").mkString(", ")})"
        val cases = markers.map { case (l, _) =>
          s"WHEN s_$l = __best AND __best > 0 THEN '$l'"
        }.mkString(" ")
        s"""
        WITH scored AS (
          SELECT doc_id, ${sc.mkString(", ")} FROM documents),
        withbest AS (
          SELECT *, $best AS __best FROM scored)
        SELECT doc_id, ${markers.map(m => s"s_${m._1}").mkString(", ")},
               CASE $cases ELSE 'und' END AS pred_lang
        FROM withbest
        ORDER BY doc_id"""
      }),

    // T9 — char-trigram profile language ID (Cavnar-Trenkle shape): the
    // fraction of the text's trigrams found in each language's profile,
    // argmax with first-wins tie-break.
    "t9_langid_ngram" -> Q(
      fn = (s, dir) => {
        val profiles = Seq(
          "en" -> Seq("the", "he ", " th", "ing", "nd "),
          "db" -> Seq("row", "tab", "col", "que", "joi"),
          "io" -> Seq("sca", "str", "eam", "lin", "bat"))
        val (scores, pred) = TextOps.ngramLangScores(col("text"), 3, profiles)
        t(s, dir, "documents")
          .select(col("doc_id") +:
            scores.map { case (l, c) => c.as(s"g_$l") } :+
            pred.as("pred_lang"): _*)
          .orderBy(col("doc_id"))
      },
      oracle = Some {
        val profiles = Seq(
          "en" -> Seq("the", "he ", " th", "ing", "nd "),
          "db" -> Seq("row", "tab", "col", "que", "joi"),
          "io" -> Seq("sca", "str", "eam", "lin", "bat"))
        val gramsSql =
          "list_transform(generate_series(1, CAST(length(text) AS INT) - 2), " +
            "__i -> substr(text, CAST(__i AS INT), 3))"
        val sc = profiles.map { case (l, ps) =>
          val cond = ps.map(p => s"g = '${p.replace("'", "''")}'").mkString(" OR ")
          s"round(len(list_filter($gramsSql, g -> $cond)) / " +
            s"CAST(greatest(len($gramsSql), 1) AS DOUBLE), 6) AS g_$l"
        }
        val names = profiles.map(p => s"g_${p._1}")
        val cases = profiles.map { case (l, _) =>
          s"WHEN g_$l = __best AND __best > 0 THEN '$l'"
        }.mkString(" ")
        s"""
        WITH scored AS (SELECT doc_id, ${sc.mkString(", ")} FROM documents),
        wb AS (SELECT *, greatest(${names.mkString(", ")}) AS __best FROM scored)
        SELECT doc_id, ${names.mkString(", ")},
               CASE $cases ELSE 'und' END AS pred_lang
        FROM wb
        ORDER BY doc_id"""
      }),

    // T3 — quality scoring: length score, lexical diversity, stopword load,
    // mean token length -> composite [0,1] score + keep flag.
    "t3_quality_score" -> Q(
      fn = (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val m = TextOps.qualityScore(col("text"), toks, stopwords)
        t(s, dir, "documents")
          .select(col("doc_id"),
            m("n_tok").as("n_tok"),
            m("distinct_ratio").as("distinct_ratio"),
            m("stop_ratio").as("stop_ratio"),
            m("len_score").as("len_score"),
            m("quality").as("quality"),
            (m("quality") >= 0.5 && m("n_tok") >= 10).as("keep"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT doc_id,
                 len($toksSql) AS n_tok,
                 round(len(list_distinct($toksSql))
                       / CAST(greatest(len($toksSql), 1) AS DOUBLE), 6) AS distinct_ratio,
                 ${markerSql(stopwords)} AS stop_ratio,
                 round(least(1.0, CAST(length(text) AS DOUBLE) / 400.0), 6) AS len_score
          FROM documents),
        q AS (
          SELECT *, round(0.3 * len_score + 0.4 * distinct_ratio
                          + 0.3 * (1.0 - least(1.0, stop_ratio * 4)), 6) AS quality
          FROM b)
        SELECT doc_id, n_tok, distinct_ratio, stop_ratio, len_score, quality,
               quality >= 0.5 AND n_tok >= 10 AS keep
        FROM q
        ORDER BY doc_id""")),

    // T4 — document fingerprinting: full-content md5, 16-way shard key from
    // its first hex digit, min-shingle hash (1-perm MinHash over 5-grams),
    // and an 8-token prefix blocking key.
    "t4_fingerprint" -> Q(
      fn = (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val f = TextOps.fingerprint(col("text"), toks, shingleK = 5)
        t(s, dir, "documents")
          .select(col("doc_id"),
            f("md5_full").as("md5_full"),
            f("shard").as("shard"),
            f("min_shingle_hash").as("min_shingle_hash"),
            f("prefix_key").as("prefix_key"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        SELECT doc_id,
               md5(text) AS md5_full,
               ord(substr(md5(text), 1, 1))
                 - CASE WHEN substr(md5(text), 1, 1) >= 'a' THEN 87 ELSE 48 END AS shard,
               list_min(list_transform($sh5Sql, s -> md5(s))) AS min_shingle_hash,
               md5(array_to_string(($toksSql)[1:8], ' ')) AS prefix_key
        FROM documents
        ORDER BY doc_id""")),

    // D1 — exact deduplication by content key (here: md5 of the 8-token
    // prefix, which has real collisions in the corpus): one hash-shuffle on
    // the 16-byte key, min-id winner, group size annotated.
    "d1_exact_dedup" -> Q(
      fn = (s, dir) =>
        DedupOps.exactDedupStats(
          t(s, dir, "documents"),
          md5(array_join(slice(TextOps.tokens(col("text")), 1, 8), " ")),
          "doc_id", carryCols = Seq("source"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        SELECT md5(array_to_string(($toksSql)[1:8], ' ')) AS dup_key,
               min(doc_id) AS doc_id,
               count(*) AS dup_count,
               arg_min(source, doc_id) AS source
        FROM documents
        GROUP BY 1
        ORDER BY doc_id"""),
      bench = true),

    // D2 — MinHash signatures + LSH band keys (8 perms, 2 bands of 4) for
    // every document; pure per-row compute, no shuffle.
    "d2_minhash_sig" -> Q(
      fn = (s, dir) => {
        val banded = DedupOps.minhashBands(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2)
        banded.select(
          col("doc_id") +:
            (0 until 8).map(i => col("sig")(i).as(s"mh$i")) :+
            col("band0") :+ col("band1"): _*)
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $sigsSql
        SELECT doc_id,
               ${(0 until 8).map(i => s"CAST(mh[${i + 1}] AS BIGINT) AS mh$i").mkString(", ")},
               ${bandKeySql(1, 4)} AS band0,
               ${bandKeySql(5, 8)} AS band1
        FROM sigs
        ORDER BY doc_id"""),
      bench = true),

    // D3 — LSH candidate pairs: docs sharing >=1 band bucket. The join key
    // is a uniform md5, so the shuffle is skew-free; degenerate buckets are
    // capped inside the operator (no-op here, load-bearing at 100 TB).
    "d3_minhash_pairs" -> Q(
      fn = (s, dir) =>
        DedupOps.minhashCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2)
          .orderBy(col("a"), col("b")),
      oracle = Some(s"""
        WITH $bandsSql
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared_bands
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
        WHERE x.doc_id < y.doc_id
        GROUP BY 1, 2
        ORDER BY a, b""")),

    // D4 — exact n-gram Jaccard verification over a banded pair set (here:
    // id-adjacency pairs a < b <= a+3, the post-LSH verify shape): distinct
    // 3-shingle sets, |intersect|/|union|.
    "d4_ngram_jaccard" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = docs
          .select(col("doc_id").as("a"),
            explode(sequence(lit(1), lit(3))).as("d"))
          .select(col("a"), (col("a") + col("d")).as("b"))
        DedupOps.ngramJaccard(pairs, docs, "doc_id", "text", shingleK = 3)
          .select(col("a"), col("b"), col("jaccard"))
          .orderBy(col("a"), col("b"))
      },
      oracle = Some(s"""
        WITH sh AS (
          SELECT doc_id, list_distinct($hashedShSql) AS s
          FROM (SELECT doc_id, $tokHashesSql AS th FROM documents))
        SELECT a.doc_id AS a, b.doc_id AS b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id BETWEEN a.doc_id + 1 AND a.doc_id + 3
        ORDER BY a, b"""),
      bench = true),

    // D6 — exact n-gram Jaccard at corpus scale: inverted-index (posting
    // list) join on the shingle itself with a min-shared-count prefilter.
    // Unlike the pairwise array-intersect shape (d4), this never forms
    // non-overlapping pairs: cost is sum over shingles of occupancy^2,
    // the classic similarity-join bound. That bound is only safe when the
    // occupancies are bounded, so shingles whose document frequency
    // exceeds dfCap are DROPPED before the self-join (a boilerplate
    // shingle shared by f docs otherwise emits f^2 join rows — the
    // scale-killer). Jaccard is then exact over the SURVIVING shingle
    // sets: sizes and intersections both count only df<=dfCap shingles,
    // so the ratio stays internally consistent; pairs similar ONLY via
    // boilerplate are the (intended) recall loss — see SCALE.md.
    "d6_inverted_jaccard" -> Q(
      fn = (s, dir) => {
        val dfCap = 50
        val docs = t(s, dir, "documents")
        val arr = docs.select(col("doc_id"),
          array_distinct(
            TextOps.hashedShingles3(TextOps.tokens(col("text")))).as("arr"))
        val sh = arr.select(col("doc_id"), explode(col("arr")).as("s"))
        // Posting-list frequency cap: df per shingle, keep df <= dfCap.
        val kept = sh.groupBy(col("s"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap)
        // Re-group the SURVIVING postings per doc so the set size rides
        // along with every posting row — this kills the two separate
        // `sizes` branches (each of which re-scanned the corpus and
        // re-shingled it) and, at scale, the per-doc exchange below and
        // the df exchange above are each computed once and reused across
        // the self-join's two sides (canonically identical subplans).
        // Sizes count surviving shingles only (post-cap set semantics);
        // df=1 shingles can't pair, so they're dropped from the join
        // input AFTER being counted into sz.
        val shP = sh.join(kept, "s")
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("s"), col("df"))).as("sd"))
          .select(col("doc_id"), size(col("sd")).as("sz"),
            explode(col("sd")).as("x"))
          .filter(col("x.df") >= 2)
          .select(col("doc_id"), col("sz"), col("x.s").as("s"))
        shP.select(col("doc_id").as("a"), col("sz").as("sza"), col("s"))
          .join(shP.select(col("doc_id").as("b"), col("sz").as("szb"),
            col("s")), "s")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"),
            any_value(col("sza")).as("sza"), any_value(col("szb")).as("szb"))
          .filter(col("inter") >= 5)
          .select(col("a"), col("b"), col("inter"),
            round(col("inter").cast("double") /
              (col("sza") + col("szb") - col("inter")), 6).as("jaccard"))
          .orderBy(col("a"), col("b"))
      },
      oracle = Some(s"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct($hashedShSql)) AS s
          FROM (SELECT doc_id, $tokHashesSql AS th FROM documents)),
        kept AS (SELECT s, count(*) AS df FROM sh GROUP BY 1 HAVING count(*) <= 50),
        shk AS (SELECT sh.doc_id, sh.s, kept.df FROM sh JOIN kept USING (s)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM shk GROUP BY 1),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM shk x JOIN shk y ON x.s = y.s
          WHERE x.doc_id < y.doc_id AND x.df >= 2 AND y.df >= 2
          GROUP BY 1, 2
          HAVING count(*) >= 5)
        SELECT p.a, p.b, p.inter,
               round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 6) AS jaccard
        FROM pairs p
        JOIN sizes sa ON p.a = sa.doc_id
        JOIN sizes sb ON p.b = sb.doc_id
        ORDER BY a, b"""),
      bench = true),

    // D20 — asymmetric shingle CONTAINMENT over the inverted index
    // (d6's one-sided sibling): containment(A→B) = |S(A)∩S(B)|/|S(A)|
    // catches quote-inclusion — a short doc fully embedded in a long
    // one scores ~1.0 on its own side while Jaccard (normalized by the
    // union) stays low and misses it. Same posting-list shape as d6:
    // df-capped inverted join, set sizes riding the posting rows, one
    // partial-agged pair reduction — cost is O(candidate pairs), never
    // O(n²), and both directions come from the SAME pair row.
    "d20_containment" -> Q(
      fn = (s, dir) => {
        val dfCap = 50
        val docs = t(s, dir, "documents")
        val sh = docs.select(col("doc_id"),
          explode(array_distinct(
            TextOps.hashedShingles3(TextOps.tokens(col("text"))))).as("s"))
        val kept = sh.groupBy(col("s"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap)
        val shP = sh.join(kept, "s")
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("s"), col("df"))).as("sd"))
          .select(col("doc_id"), size(col("sd")).as("sz"),
            explode(col("sd")).as("x"))
          .filter(col("x.df") >= 2)
          .select(col("doc_id"), col("sz"), col("x.s").as("s"))
        shP.select(col("doc_id").as("a"), col("sz").as("sza"), col("s"))
          .join(shP.select(col("doc_id").as("b"), col("sz").as("szb"),
            col("s")), "s")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"),
            any_value(col("sza")).as("sza"), any_value(col("szb")).as("szb"))
          .filter(col("inter") >= 3)
          .select(col("a"), col("b"), col("inter"),
            round(col("inter").cast("double") / col("sza"), 6)
              .as("containment_a"),
            round(col("inter").cast("double") / col("szb"), 6)
              .as("containment_b"))
          .orderBy(col("a"), col("b"))
      },
      oracle = Some(s"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct($hashedShSql)) AS s
          FROM (SELECT doc_id, $tokHashesSql AS th FROM documents)),
        kept AS (SELECT s, count(*) AS df FROM sh GROUP BY 1 HAVING count(*) <= 50),
        shk AS (SELECT sh.doc_id, sh.s, kept.df FROM sh JOIN kept USING (s)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM shk GROUP BY 1),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM shk x JOIN shk y ON x.s = y.s
          WHERE x.doc_id < y.doc_id AND x.df >= 2 AND y.df >= 2
          GROUP BY 1, 2
          HAVING count(*) >= 3)
        SELECT p.a, p.b, p.inter,
               round(CAST(p.inter AS DOUBLE) / sa.sz, 6) AS containment_a,
               round(CAST(p.inter AS DOUBLE) / sb.sz, 6) AS containment_b
        FROM pairs p
        JOIN sizes sa ON p.a = sa.doc_id
        JOIN sizes sb ON p.b = sb.doc_id
        ORDER BY a, b""")),

    // D22 — MEASURED LSH dedup recall as a similarity curve: for every
    // TRUE near-dup pair (exact df-capped inverted-index Jaccard ≥ 0.2,
    // d6's machinery with the support floor at 2), did the d3 MinHash
    // band join (8 perms, 2 bands) surface it as a candidate? Bucketed
    // by Jaccard decile this is the textbook LSH S-curve, measured on
    // the corpus and hash-checked — the dedup family's answer to the
    // v25/v26/v29/v30 ANN recall queries, and the quantified basis for
    // choosing bands/rows at 100 TB (low-similarity deciles are MEANT
    // to be missed; a dip in a high decile is a config bug).
    "d22_lsh_recall" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val sh = docs.select(col("doc_id"),
          explode(array_distinct(
            TextOps.hashedShingles3(TextOps.tokens(col("text")))))
            .as("s"))
        val kept = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50)
        val shP = sh.join(kept, "s")
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("s"), col("df"))).as("sd"))
          .select(col("doc_id"), size(col("sd")).as("sz"),
            explode(col("sd")).as("x"))
          .filter(col("x.df") >= 2)
          .select(col("doc_id"), col("sz"), col("x.s").as("s"))
        val truth = shP
          .select(col("doc_id").as("a"), col("sz").as("sza"), col("s"))
          .join(shP.select(col("doc_id").as("b"), col("sz").as("szb"),
            col("s")), "s")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"),
            any_value(col("sza")).as("sza"),
            any_value(col("szb")).as("szb"))
          .filter(col("inter") >= 2)
          .select(col("a"), col("b"),
            round(col("inter").cast("double") /
              (col("sza") + col("szb") - col("inter")), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.2)
        val cand = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2)
          .select(col("a"), col("b")).withColumn("__c", lit(1))
        truth.join(cand, Seq("a", "b"), "left")
          .withColumn("bucket",
            least(floor(col("jaccard") * 10), lit(9)).cast("bigint"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_true"), count(col("__c")).as("n_caught"))
          .withColumn("recall",
            round(col("n_caught").cast("double") / col("n_true"), 6))
          .orderBy(col("bucket"))
      },
      bench = true,
      oracle = Some(s"""
        WITH $bandsSql,
        cand AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        sh AS (
          SELECT doc_id, unnest(list_distinct($hashedShSql)) AS s
          FROM (SELECT doc_id, $tokHashesSql AS th FROM documents)),
        kept AS (SELECT s, count(*) AS df FROM sh GROUP BY 1
                 HAVING count(*) <= 50),
        shk AS (SELECT sh.doc_id, sh.s, kept.df FROM sh JOIN kept USING (s)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM shk GROUP BY 1),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM shk x JOIN shk y ON x.s = y.s
          WHERE x.doc_id < y.doc_id AND x.df >= 2 AND y.df >= 2
          GROUP BY 1, 2
          HAVING count(*) >= 2),
        truth AS (
          SELECT a, b, jaccard FROM (
            SELECT p.a, p.b,
                   round(CAST(p.inter AS DOUBLE) /
                     (sa.sz + sb.sz - p.inter), 6) AS jaccard
            FROM pairs p
            JOIN sizes sa ON p.a = sa.doc_id
            JOIN sizes sb ON p.b = sb.doc_id)
          WHERE jaccard >= 0.2),
        m AS (
          SELECT t.jaccard,
                 CASE WHEN c.a IS NULL THEN 0 ELSE 1 END AS caught
          FROM truth t LEFT JOIN cand c ON c.a = t.a AND c.b = t.b)
        SELECT CAST(least(floor(jaccard * 10), 9) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(caught) AS BIGINT) AS n_caught,
               round(CAST(sum(caught) AS DOUBLE) / count(*), 6) AS recall
        FROM m
        GROUP BY 1
        ORDER BY bucket""")),

    // C13 — population stability index (PSI) of the length distribution
    // per source vs the whole corpus: the standard production drift
    // metric (PSI < 0.1 stable, > 0.25 drifted), here as per-(source,
    // bin) terms over ten 50-char bins with +1 Laplace smoothing so
    // empty cells stay defined. The dense grid cross-joins the source
    // list with the literal bin range (both tiny frames); every ratio
    // assembles in BIGINT with ONE division before the ln (the c11
    // discipline), so both engines agree bit-for-bit.
    "c13_psi_drift" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val binned = docs.select(col("source"),
          least(floor(col("n_chars") / lit(50)), lit(9)).cast("bigint")
            .as("bin"))
        val cs = binned.groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("cs"))
        val ca = binned.groupBy(col("bin")).agg(count(lit(1)).as("ca"))
        val ns = binned.groupBy(col("source")).agg(count(lit(1)).as("ns"))
        val na = binned.agg(count(lit(1)).as("na"))
        val grid = docs.select(col("source")).distinct()
          .crossJoin(s.range(0, 10).select(col("id").as("bin")))
        val p = (lit(1) + col("cs")).cast("double") / (col("ns") + 10)
        val q = (lit(1) + col("ca")).cast("double") / (col("na") + 10)
        val lnRatio = round(log(
          ((col("cs") + 1) * (col("na") + 10)).cast("double") /
            ((col("ca") + 1) * (col("ns") + 10)).cast("double")), 9)
        grid
          .join(cs, Seq("source", "bin"), "left")
          .withColumn("cs", coalesce(col("cs"), lit(0L)))
          .join(broadcast(ca), Seq("bin"), "left")
          .withColumn("ca", coalesce(col("ca"), lit(0L)))
          .join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(na))
          .withColumn("psi_term", round((p - q) * lnRatio, 6))
          .select(col("source"), col("bin"), col("cs"), col("ca"),
            col("psi_term"))
          .orderBy(col("source"), col("bin"))
      },
      bench = true,
      oracle = Some("""
        WITH b AS (
          SELECT source,
                 CAST(least(floor(n_chars / 50), 9) AS BIGINT) AS bin
          FROM documents),
        cs AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cs
               FROM b GROUP BY 1, 2),
        ca AS (SELECT bin, CAST(count(*) AS BIGINT) AS ca
               FROM b GROUP BY 1),
        ns AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
               FROM b GROUP BY 1),
        na AS (SELECT CAST(count(*) AS BIGINT) AS na FROM b),
        grid AS (
          SELECT DISTINCT source, g.bin
          FROM documents, (SELECT CAST(range AS BIGINT) AS bin
                           FROM range(0, 10)) g)
        SELECT g.source, g.bin,
               coalesce(cs.cs, 0) AS cs,
               coalesce(ca.ca, 0) AS ca,
               round((CAST(1 + coalesce(cs.cs, 0) AS DOUBLE) / (ns.ns + 10)
                      - CAST(1 + coalesce(ca.ca, 0) AS DOUBLE) / (na.na + 10))
                 * round(ln(
                     CAST((coalesce(cs.cs, 0) + 1) * (na.na + 10) AS DOUBLE) /
                     CAST((coalesce(ca.ca, 0) + 1) * (ns.ns + 10) AS DOUBLE)),
                   9), 6) AS psi_term
        FROM grid g
        LEFT JOIN cs ON cs.source = g.source AND cs.bin = g.bin
        LEFT JOIN ca ON ca.bin = g.bin
        JOIN ns ON ns.source = g.source
        CROSS JOIN na
        ORDER BY g.source, g.bin""")),

    // T32 — tokenizer vocabulary coverage (OOV rate) per source: the
    // fraction of token occurrences outside the top-500 corpus
    // vocabulary — the readout that decides whether a tokenizer's vocab
    // fits a new source before training on it. The head cut is t29's
    // TakeOrdered-over-partial-agg shape (never a global vocabulary
    // sort); the membership join broadcasts the 500-row head and the
    // per-source rollup partial-aggs in the same pass.
    "t32_oov_rate" -> Q(
      fn = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(500)
          .select(col("tok")).withColumn("__v", lit(1))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            count(when(col("__v").isNull, 1)).as("n_oov"))
          .withColumn("oov_rate",
            round(col("n_oov").cast("double") / col("n_tokens"), 6))
          .orderBy(col("source"))
      },
      bench = true,
      oracle = Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        vocab AS (
          SELECT tok FROM (
            SELECT tok, count(*) AS c FROM toks GROUP BY 1
            ORDER BY c DESC, tok LIMIT 500)),
        j AS (
          SELECT t.source,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM toks t LEFT JOIN vocab v USING (tok))
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
        FROM j GROUP BY 1
        ORDER BY source""")),

    // C14 — dedup savings report: per source, how many documents and
    // characters exact dedup would reclaim (non-canonical members of
    // each md5(text) group, keep-lowest-doc_id winners — d1/d8's
    // convention). THE number a storage/training-budget conversation
    // starts from. One hash-keyed window ranks group members; the
    // per-source rollup partial-aggs; nothing touches text twice.
    "c14_dedup_savings" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .withColumn("h", md5(col("text")))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            count(when(col("rn") > 1, 1)).as("n_dups"),
            sum(when(col("rn") > 1, col("n_chars")).otherwise(lit(0L)))
              .as("chars_saved"))
          .withColumn("savings_pct",
            round(col("chars_saved").cast("double") / col("total_chars"),
              6))
          .orderBy(col("source"))
      },
      bench = true,
      oracle = Some("""
        WITH h AS (
          SELECT source, n_chars,
                 row_number() OVER (PARTITION BY md5(text)
                   ORDER BY doc_id) AS rn
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(CASE WHEN rn > 1 THEN 1 END) AS BIGINT)
                 AS n_dups,
               CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END)
                 AS BIGINT) AS chars_saved,
               round(CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END)
                 AS DOUBLE) / sum(n_chars), 6) AS savings_pct
        FROM h GROUP BY 1
        ORDER BY source""")),

    // T34 — code-vs-prose heuristic: symbol density, code-keyword hits,
    // and an integer-compare verdict (n_sym·20 > n_chars) — the
    // curation signal that routes documents to a code pipeline or
    // strips code blocks from a prose corpus; orthogonal to t3's
    // prose-quality score. Pure per-row regexp counters (RE2-subset
    // patterns shared verbatim by both engines), zero shuffles, scan
    // pruned to (doc_id, text, n_chars).
    "t34_code_score" -> Q(
      fn = (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            regexp_count(col("text"), lit("[{}();=<>\\[\\]]"))
              .cast("bigint").as("n_sym"),
            regexp_count(col("text"),
              lit("\\b(def|class|return|import|void|int)\\b"))
              .cast("bigint").as("n_kw"))
          .withColumn("sym_ratio",
            round(col("n_sym").cast("double") /
              greatest(col("n_chars"), lit(1L)), 6))
          .withColumn("is_codeish", col("n_sym") * 20 > col("n_chars"))
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some("""
        SELECT doc_id, n_chars,
               CAST(len(regexp_extract_all(text, '[{}();=<>\[\]]'))
                 AS BIGINT) AS n_sym,
               CAST(len(regexp_extract_all(text,
                 '\b(def|class|return|import|void|int)\b')) AS BIGINT)
                 AS n_kw,
               round(CAST(len(regexp_extract_all(text, '[{}();=<>\[\]]'))
                 AS DOUBLE) / greatest(n_chars, 1), 6) AS sym_ratio,
               CAST(len(regexp_extract_all(text, '[{}();=<>\[\]]'))
                 AS BIGINT) * 20 > n_chars AS is_codeish
        FROM documents
        ORDER BY doc_id""")),

    // C16 — duplicate-cluster size histogram: how many md5 groups have
    // 1, 2, 3… members and how many documents each size class holds —
    // the shape that distinguishes pervasive boilerplate (many small
    // clusters) from mirror dumps (few huge ones), which decide
    // different dedup strategies. Two partial-agged groupBys, the
    // second over cluster-count-sized data.
    "c16_cluster_sizes" -> Q(
      fn = (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("sz")).as("n_docs"))
          .orderBy(col("sz")),
      bench = true,
      oracle = Some("""
        WITH g AS (
          SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz
          FROM documents GROUP BY 1)
        SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(sz) AS BIGINT) AS n_docs
        FROM g GROUP BY 1
        ORDER BY sz""")),

    // T35 — lexical diversity (type-token ratio) per source: distinct
    // tokens over total tokens, plus the corpus-global share of each
    // source's vocabulary — low TTR flags templated/generated text the
    // way t13's repetition signals do within a document, but at source
    // granularity. Distinct-aggregation over the token stream; the
    // division is the only float.
    "t35_ttr" -> Q(
      fn = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("source"),
            explode(split(col("text"), " ")).as("tok"))
        toks.groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_types"))
          .withColumn("ttr",
            round(col("n_types").cast("double") / col("n_tokens"), 6))
          .orderBy(col("source"))
      },
      bench = true,
      oracle = Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
               round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6)
                 AS ttr
        FROM toks GROUP BY 1
        ORDER BY source""")),

    // C11 — language × source balance audit: the observed contingency
    // table with per-cell chi-square contributions — the standard
    // independence test a corpus curator runs before fixing a sampling
    // mix (a cell with a large contribution is a source over/under-
    // serving a language). EXACT integer arithmetic end to end:
    // contribution = (n·o − rt·ct)² / (n·rt·ct) evaluates both products
    // in BIGINT and casts once to double for the division, so both
    // engines produce the identical IEEE result. Marginals broadcast
    // (|langs| and |sources| are tiny at any corpus scale); the cell
    // table itself is one partial-agged groupBy over the scan.
    "c11_lang_balance" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val o = docs.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o"))
        val rt = o.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
        val ct = o.groupBy(col("source")).agg(sum(col("o")).as("ct"))
        val n = docs.agg(count(lit(1)).as("n"))
        val num = col("n") * col("o") - col("rt") * col("ct")
        o.join(broadcast(rt), "lang")
          .join(broadcast(ct), "source")
          .crossJoin(broadcast(n))
          .withColumn("chi2_term",
            round((num * num).cast("double") /
              (col("n") * col("rt") * col("ct")).cast("double"), 6))
          .select(col("lang"), col("source"), col("o"), col("rt"),
            col("ct"), col("chi2_term"))
          .orderBy(col("lang"), col("source"))
      },
      bench = true,
      oracle = Some("""
        WITH o AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS o
          FROM documents GROUP BY 1, 2),
        rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt
               FROM o GROUP BY 1),
        ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
               FROM o GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        SELECT o.lang, o.source, o.o, rt.rt, ct.ct,
               round(CAST((n * o.o - rt.rt * ct.ct) *
                          (n * o.o - rt.rt * ct.ct) AS DOUBLE) /
                     CAST(n * rt.rt * ct.ct AS DOUBLE), 6) AS chi2_term
        FROM o JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN nn
        ORDER BY o.lang, o.source""")),

    // T30 — sentence-level shape statistics: sentences counted as runs
    // of terminal punctuation ([.!?]+ via regexp_count — identical RE2-
    // subset semantics on both engines, no split-trailing-empty
    // ambiguity), words as the t28 whitespace convention, and the
    // words-per-sentence readout a quality filter thresholds on (the
    // wall-of-text / chopped-fragment detectors). Pure per-row map —
    // no shuffle at all; the scan prunes to (doc_id, text).
    "t30_sentence_stats" -> Q(
      fn = (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(col("text"), lit("[.!?]+")).cast("bigint")
              .as("n_sent"),
            size(split(col("text"), " ")).cast("bigint").as("n_words"))
          .withColumn("wps",
            round(col("n_words").cast("double") /
              greatest(col("n_sent"), lit(1L)), 6))
          .orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some("""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
                 AS n_sent,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               round(CAST(len(string_split(text, ' ')) AS DOUBLE) /
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1), 6)
                 AS wps
        FROM documents
        ORDER BY doc_id""")),

    // T31 — PMI collocation mining: top-20 adjacent token pairs by
    // pointwise mutual information, ln(c(xy)·N_uni² / (N_big·c(x)·c(y))),
    // the classic multi-word-expression detector ("new york") a
    // tokenizer-merge or stop-phrase list is built from. The ratio
    // assembles in exact BIGINT before ONE double division + ln (t28's
    // rounding discipline); the c(xy) ≥ 5 support floor is what keeps
    // the statistic meaningful and the ranked set small. Unigram and
    // bigram counts are partial-agged token-key shuffles; the
    // count-attach joins are deliberately UNHINTED — broadcast-sized
    // here, shuffle joins when a 100 TB vocabulary demands (the t24
    // argument). The final top-20 window runs over only the support-
    // filtered collocation set.
    "t31_pmi_collocations" -> Q(
      fn = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(split(col("text"), " ").as("t"))
        val uni = toks.select(explode(col("t")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val nUni = uni.agg(sum(col("c")).as("n_uni"))
        val big = toks.filter(size(col("t")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(t) - 1), " +
              "i -> struct(element_at(t, i) AS x, " +
              "element_at(t, i + 1) AS y))")).as("p"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
        val nBig = big.agg(sum(col("cxy")).as("n_big"))
        val w = Window.orderBy(col("pmi").desc, col("x"), col("y"))
        big.filter(col("cxy") >= 5)
          .join(uni.select(col("tok").as("x"), col("c").as("cx")), "x")
          .join(uni.select(col("tok").as("y"), col("c").as("cy")), "y")
          .crossJoin(broadcast(nUni))
          .crossJoin(broadcast(nBig))
          .withColumn("pmi",
            round(log((col("cxy") * col("n_uni") * col("n_uni"))
              .cast("double") /
              (col("n_big") * col("cx") * col("cy")).cast("double")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 20)
          .select(col("rnk"), col("x"), col("y"), col("cxy"), col("cx"),
            col("cy"), col("pmi"))
          .orderBy(col("rnk"))
      },
      bench = true,
      oracle = Some("""
        WITH toks AS (
          SELECT string_split(text, ' ') AS t FROM documents),
        uc AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uc),
        bxy AS (
          SELECT t[CAST(i AS INT)] AS x, t[CAST(i AS INT) + 1] AS y
          FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 2)),
        bc AS (
          SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
          FROM bxy GROUP BY 1, 2),
        nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS n_big FROM bc),
        j AS (
          SELECT bc.x, bc.y, bc.cxy, ux.c AS cx, uy.c AS cy,
                 round(ln(CAST(bc.cxy * nu.n_uni * nu.n_uni AS DOUBLE) /
                   CAST(nb.n_big * ux.c * uy.c AS DOUBLE)), 6) AS pmi
          FROM bc
          JOIN uc ux ON bc.x = ux.tok
          JOIN uc uy ON bc.y = uy.tok
          CROSS JOIN nu CROSS JOIN nb
          WHERE bc.cxy >= 5),
        r AS (
          SELECT *, row_number() OVER (ORDER BY pmi DESC, x, y) AS rnk
          FROM j)
        SELECT rnk, x, y, cxy, cx, cy, pmi
        FROM r WHERE rnk <= 20
        ORDER BY rnk""")),

    // C9 — train/holdout split-leakage report: after the t10 hash
    // split, how much of each holdout document's shingle set already
    // sits in the train split — the audit that catches a split done
    // AFTER imperfect dedup (the silent eval-inflation bug). The train
    // shingle set is a distinct aggregation (vocab-scale, partial-
    // agged); the holdout side joins it UNHINTED — broadcast at this
    // SF, demoted to shuffle when a 100 TB train vocabulary demands
    // it. n_leaked sums as BIGINT on both engines (the a24 lesson).
    // C10 — curation funnel report: the per-stage survivor counts of the
    // canonical filter chain (language → length band → exact dedup →
    // min-token quality). THE operational readout of a curation run —
    // "where did my corpus go" — and the first thing to audit when a
    // training mix shrinks. One scan computes the stage-1/2 predicates as
    // booleans (conjunction counts, partial-aggable); only the survivors
    // enter the dedup window (keep-first by doc_id within an md5(text)
    // group). Counts are count(CASE …) → BIGINT on both engines (no
    // HUGEINT sums, the a24 lesson); stage rows assemble from two 1-row
    // aggregate frames, driver-side-free.
    "c10_filter_funnel" -> Q(
      fn = (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
          .withColumn("p1", col("lang") === "en")
          .withColumn("p12",
            col("lang") === "en" && col("n_chars").between(100, 400))
        val b = base.agg(
          count(lit(1)).as("total"),
          count(when(col("p1"), 1)).as("c1"),
          count(when(col("p12"), 1)).as("c2"))
        val surv = base.filter(col("p12"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .withColumn("q", size(TextOps.tokens(col("text"))) >= 25)
        val sv = surv.agg(
          count(when(col("rn") === 1, 1)).as("c3"),
          count(when(col("rn") === 1 && col("q"), 1)).as("c4"))
        b.crossJoin(sv)
          .select(explode(array(
            struct(lit(1).as("stage"), lit("lang_en").as("name"),
              col("total").as("docs_in"), col("c1").as("docs_out")),
            struct(lit(2).as("stage"), lit("len_100_400").as("name"),
              col("c1").as("docs_in"), col("c2").as("docs_out")),
            struct(lit(3).as("stage"), lit("exact_dedup").as("name"),
              col("c2").as("docs_in"), col("c3").as("docs_out")),
            struct(lit(4).as("stage"), lit("min_tokens_25").as("name"),
              col("c3").as("docs_in"), col("c4").as("docs_out"))))
            .as("st"))
          .select(col("st.stage").as("stage"), col("st.name").as("name"),
            col("st.docs_in").as("docs_in"),
            col("st.docs_out").as("docs_out"),
            (col("st.docs_in") - col("st.docs_out")).as("dropped"))
          .orderBy(col("stage"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT doc_id, text,
                 (lang = 'en') AS p1,
                 (lang = 'en' AND n_chars BETWEEN 100 AND 400) AS p12
          FROM documents),
        b AS (
          SELECT count(*) AS total,
                 count(CASE WHEN p1 THEN 1 END) AS c1,
                 count(CASE WHEN p12 THEN 1 END) AS c2
          FROM base),
        surv AS (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS rn,
                 len(string_split(text, ' ')) >= 25 AS q
          FROM base WHERE p12),
        sv AS (
          SELECT count(CASE WHEN rn = 1 THEN 1 END) AS c3,
                 count(CASE WHEN rn = 1 AND q THEN 1 END) AS c4
          FROM surv),
        stages AS (
          SELECT 1 AS stage, 'lang_en' AS name,
                 total AS docs_in, c1 AS docs_out FROM b, sv
          UNION ALL SELECT 2, 'len_100_400', c1, c2 FROM b, sv
          UNION ALL SELECT 3, 'exact_dedup', c2, c3 FROM b, sv
          UNION ALL SELECT 4, 'min_tokens_25', c3, c4 FROM b, sv)
        SELECT stage, name, docs_in, docs_out,
               docs_in - docs_out AS dropped
        FROM stages
        ORDER BY stage""")),

    // T29 — Zipf law fit over the vocabulary head: log-log least-squares
    // of frequency vs rank for the top-500 tokens — slope ≈ -1 is the
    // natural-language signature, and a drifting slope is a cheap canary
    // for generated/boilerplate contamination of a source. The top-500
    // cut is orderBy+limit (TakeOrderedAndProject — per-partition k-heap,
    // no global sort over a web-scale vocabulary); the row_number window
    // then ranks 500 rows. ln() values round to 9 dp (last-ulp libm
    // divergence rounds away), products round to 12 dp in double, and
    // the regression sums accumulate as exact decimals — order-
    // independent, so the fit hash-matches bit for bit.
    "t29_zipf_fit" -> Q(
      fn = (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(500)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("n").desc, col("token"))))
        val xy = tf.select(
          round(log(col("rn").cast("double")), 9).as("x"),
          round(log(col("n").cast("double")), 9).as("y"))
        val dec = (c: Column) => c.cast("decimal(38,12)")
        xy.agg(
          count(lit(1)).as("n_terms"),
          sum(dec(col("x"))).as("sx"),
          sum(dec(col("y"))).as("sy"),
          sum(dec(round(col("x") * col("x"), 12))).as("sxx"),
          sum(dec(round(col("y") * col("y"), 12))).as("syy"),
          sum(dec(round(col("x") * col("y"), 12))).as("sxy"))
          .select(col("n_terms"),
            col("n_terms").cast("double").as("m"),
            col("sx").cast("double").as("sx"),
            col("sy").cast("double").as("sy"),
            col("sxx").cast("double").as("sxx"),
            col("syy").cast("double").as("syy"),
            col("sxy").cast("double").as("sxy"))
          .select(col("n_terms"),
            round((col("m") * col("sxy") - col("sx") * col("sy")) /
              (col("m") * col("sxx") - col("sx") * col("sx")), 6)
              .as("slope"),
            round(col("sy") / col("m") -
              ((col("m") * col("sxy") - col("sx") * col("sy")) /
                (col("m") * col("sxx") - col("sx") * col("sx"))) *
                (col("sx") / col("m")), 6).as("intercept"),
            round(((col("m") * col("sxy") - col("sx") * col("sy")) *
              (col("m") * col("sxy") - col("sx") * col("sy"))) /
              ((col("m") * col("sxx") - col("sx") * col("sx")) *
                (col("m") * col("syy") - col("sy") * col("sy"))), 6)
              .as("r2"))
      },
      oracle = Some("""
        WITH tf AS (
          SELECT token, count(*) AS n
          FROM (SELECT unnest(string_split(text, ' ')) AS token
                FROM documents)
          GROUP BY token
          ORDER BY n DESC, token
          LIMIT 500),
        rk AS (
          SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rn
          FROM tf),
        xy AS (
          SELECT round(ln(CAST(rn AS DOUBLE)), 9) AS x,
                 round(ln(CAST(n AS DOUBLE)), 9) AS y
          FROM rk),
        sums AS (
          SELECT count(*) AS n_terms,
                 CAST(count(*) AS DOUBLE) AS m,
                 CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS sxx,
                 CAST(sum(CAST(round(y * y, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS syy,
                 CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS sxy
          FROM xy)
        SELECT n_terms,
               round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
                 AS slope,
               round(sy / m - ((m * sxy - sx * sy) /
                 (m * sxx - sx * sx)) * (sx / m), 6) AS intercept,
               round(((m * sxy - sx * sy) * (m * sxy - sx * sy)) /
                 ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
        FROM sums""")),

    "c9_split_leakage" -> Q(
      fn = (s, dir) => {
        val sh = t(s, dir, "documents")
          .select(col("doc_id"),
            graft.operators.SampleOps.hashSplit(col("doc_id"), 90)
              .as("split"),
            explode(array_distinct(
              TextOps.hashedShingles3(TextOps.tokens(col("text")))))
              .as("s"))
        val trainSh = sh.filter(col("split") === "train")
          .select(col("s")).distinct()
          .withColumn("in_train", lit(1))
        sh.filter(col("split") === "holdout")
          .join(trainSh, Seq("s"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("in_train"), lit(0)).cast("long"))
              .as("n_leaked"))
          .select(col("doc_id"), col("n_shingles"), col("n_leaked"),
            round(col("n_leaked").cast("double") / col("n_shingles"), 6)
              .as("leak_pct"))
          .orderBy(col("doc_id"))
      },
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)", "md5(CAST(doc_id AS VARCHAR))")
        s"""
        WITH base AS (
          SELECT doc_id, text,
                 CASE WHEN ($h60) % 100 < 90 THEN 'train' ELSE 'holdout'
                 END AS split
          FROM documents),
        sh AS (
          SELECT doc_id, split, unnest(list_distinct($hashedShSql)) AS s
          FROM (SELECT doc_id, split, $tokHashesSql AS th FROM base)),
        tr AS (SELECT DISTINCT s FROM sh WHERE split = 'train')
        SELECT doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN s IN (SELECT s FROM tr) THEN 1 ELSE 0
                        END) AS BIGINT) AS n_leaked,
               round(CAST(sum(CASE WHEN s IN (SELECT s FROM tr) THEN 1
                                 ELSE 0 END) AS DOUBLE) / count(*), 6)
                 AS leak_pct
        FROM sh WHERE split = 'holdout'
        GROUP BY doc_id
        ORDER BY doc_id"""
      }),

    // T5 — exact interpolated quantiles of document length per language
    // (data-quality profiling; Spark percentile == SQL quantile_cont).
    "t5_length_quantiles" -> Q(
      fn = (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            round(percentile(col("n_chars"), lit(0.25)), 6).as("p25"),
            round(percentile(col("n_chars"), lit(0.5)), 6).as("p50"),
            round(percentile(col("n_chars"), lit(0.9)), 6).as("p90"))
          .orderBy(col("lang")),
      oracle = Some("""
        SELECT lang, count(*) AS n,
               round(quantile_cont(n_chars, 0.25), 6) AS p25,
               round(quantile_cont(n_chars, 0.5), 6) AS p50,
               round(quantile_cont(n_chars, 0.9), 6) AS p90
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // D7 — dedup clustering: connected components over the LSH candidate
    // pairs (min-label propagation; the oracle walks reachability with a
    // recursive CTE). Keep-one-per-component is the last dedup step.
    "d7_dup_clusters" -> Q(
      fn = (s, dir) => {
        val pairs = DedupOps.minhashCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2)
          .select(col("a"), col("b"))
        DedupOps.connectedComponents(pairs)
          .withColumn("keep", col("id") === col("component"))
          .orderBy(col("id"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $bandsSql,
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        e AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM e
          UNION
          SELECT e.a AS id, walk.label
          FROM e JOIN walk ON e.b = walk.id)
        SELECT id, min(label) AS component, id = min(label) AS keep
        FROM walk
        GROUP BY id
        ORDER BY id""")),

    // D21 — PageRank authority pick over the LSH pair graph (d8's
    // centrality-based alternative: the most-linked copy in a dup
    // cluster is usually the original — mirrors link the source). 3
    // power-iteration rounds composed as ONE lazy plan; per-edge
    // contributions round 12 dp and sum as decimals, ranks re-round
    // 9 dp per round, and the damping complement is 1.0 − 0.85 in IEEE
    // doubles on BOTH engines (never a "0.15" literal — DuckDB would
    // parse it as an exact DECIMAL and diverge). The oracle unrolls
    // the three rounds as CTEs over d7's band-join pair prefix.
    "d21_pagerank_pick" -> Q(
      fn = (s, dir) => {
        val pairs = DedupOps.minhashCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2)
          .select(col("a"), col("b"))
        DedupOps.pagerankPick(pairs, damping = 0.85, iters = 3)
          .orderBy(col("id"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $bandsSql,
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        e AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        deg AS (SELECT a AS id, count(*) AS deg FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        p0 AS (
          SELECT id, round(CAST(1.0 AS DOUBLE) / CAST(n AS DOUBLE), 9) AS pr
          FROM deg CROSS JOIN nn),
        c1 AS (
          SELECT e.b AS id,
                 sum(CAST(round(p.pr / CAST(d.deg AS DOUBLE), 12)
                   AS DECIMAL(38,12))) AS s
          FROM e JOIN p0 p ON p.id = e.a JOIN deg d ON d.id = e.a
          GROUP BY 1),
        p1 AS (
          SELECT d.id,
                 round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) /
                     CAST(n AS DOUBLE) +
                   CAST(0.85 AS DOUBLE) *
                     coalesce(CAST(c.s AS DOUBLE), CAST(0.0 AS DOUBLE)), 9)
                   AS pr
          FROM deg d LEFT JOIN c1 c ON c.id = d.id CROSS JOIN nn),
        c2 AS (
          SELECT e.b AS id,
                 sum(CAST(round(p.pr / CAST(d.deg AS DOUBLE), 12)
                   AS DECIMAL(38,12))) AS s
          FROM e JOIN p1 p ON p.id = e.a JOIN deg d ON d.id = e.a
          GROUP BY 1),
        p2 AS (
          SELECT d.id,
                 round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) /
                     CAST(n AS DOUBLE) +
                   CAST(0.85 AS DOUBLE) *
                     coalesce(CAST(c.s AS DOUBLE), CAST(0.0 AS DOUBLE)), 9)
                   AS pr
          FROM deg d LEFT JOIN c2 c ON c.id = d.id CROSS JOIN nn),
        c3 AS (
          SELECT e.b AS id,
                 sum(CAST(round(p.pr / CAST(d.deg AS DOUBLE), 12)
                   AS DECIMAL(38,12))) AS s
          FROM e JOIN p2 p ON p.id = e.a JOIN deg d ON d.id = e.a
          GROUP BY 1),
        p3 AS (
          SELECT d.id,
                 round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) /
                     CAST(n AS DOUBLE) +
                   CAST(0.85 AS DOUBLE) *
                     coalesce(CAST(c.s AS DOUBLE), CAST(0.0 AS DOUBLE)), 9)
                   AS pr
          FROM deg d LEFT JOIN c3 c ON c.id = d.id CROSS JOIN nn),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM e
          UNION
          SELECT e.a AS id, walk.label
          FROM e JOIN walk ON e.b = walk.id),
        comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id),
        j AS (
          SELECT p3.id, comp.component, p3.pr
          FROM p3 JOIN comp ON comp.id = p3.id)
        SELECT id, component, pr,
               id = first_value(id) OVER
                 (PARTITION BY component ORDER BY pr DESC, id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS is_authority
        FROM j
        ORDER BY id""")),

    // D8 — canonical pick: the step after pairs + connected components
    // that actually shrinks the corpus — every doc gets its duplicate
    // cluster (own id when unclustered) and the cluster's winner by
    // quality (ties -> lowest id) is flagged canonical.
    "d8_canonical_pick" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = DedupOps.minhashCandidatePairs(
          docs, "doc_id", "text", shingleK = 3, numPerm = 8, bands = 2)
          .select(col("a"), col("b"))
        val quality = TextOps.qualityScore(
          col("text"), TextOps.tokens(col("text")), stopwords)("quality")
        DedupOps.canonicalPick(docs, "doc_id", quality, pairs)
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $bandsSql,
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        e AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM e
          UNION
          SELECT e.a AS id, walk.label
          FROM e JOIN walk ON e.b = walk.id),
        comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id),
        qual AS (
          SELECT doc_id,
                 round(0.3 * round(least(1.0, CAST(length(text) AS DOUBLE) / 400.0), 6)
                     + 0.4 * round(len(list_distinct($toksSql))
                         / CAST(greatest(len($toksSql), 1) AS DOUBLE), 6)
                     + 0.3 * (1.0 - least(1.0, ${markerSql(stopwords)} * 4)), 6) AS score
          FROM documents),
        j AS (
          SELECT q.doc_id, coalesce(c.component, q.doc_id) AS component, q.score
          FROM qual q LEFT JOIN comp c ON c.id = q.doc_id)
        SELECT doc_id, component, score,
               doc_id = first_value(doc_id) OVER
                 (PARTITION BY component ORDER BY score DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS is_canonical
        FROM j
        ORDER BY doc_id""")),

    // C1 — the curation chain end-to-end, one plan: quality gate (t3) →
    // exact dedup (d1, min-id winner carries its text/quality) → MinHash
    // near-dup pairs (d3) → connected components (d7) → canonical pick by
    // quality (d8). The LLM-data counterpart of pl_levels_e2e: what a
    // corpus release actually runs, checked against a single SQL oracle.
    // T21 — sliding context windows: 120-char chunks at stride 100
    // (overlapping), the model-input materializer. Chunk geometry is
    // pure integer/floor arithmetic both engines restate; every doc
    // yields >= 1 chunk, short tails stay short.
    "t21_sliding_chunks" -> Q(
      fn = (s, dir) => {
        val (idx, chunks) = TextOps.slidingChunks(col("text"), 120, 100)
        t(s, dir, "documents")
          .select(col("doc_id"), arrays_zip(idx, chunks).as("z"))
          .select(col("doc_id"), explode(col("z")).as("c"))
          .select(col("doc_id"), col("c.0").cast("int").as("chunk_no"),
            col("c.1").as("chunk"), length(col("c.1")).as("chunk_len"))
          .orderBy(col("doc_id"), col("chunk_no"))
      },
      oracle = Some("""
        WITH n AS (
          SELECT doc_id, text,
                 1 + greatest(CAST(floor((length(text) - 120 + 99) / 100.0)
                              AS INT), 0) AS n_chunks
          FROM documents),
        c AS (
          SELECT doc_id, CAST(i AS INT) AS chunk_no,
                 substr(text, CAST(i AS INT) * 100 + 1, 120) AS chunk
          FROM n, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1))
                           AS i))
        SELECT doc_id, chunk_no, chunk, length(chunk) AS chunk_len
        FROM c
        ORDER BY doc_id, chunk_no""")),

    // C3 — token-budget mix planning: per-source keep rates derived from
    // the data (rate = min(1, budget / source tokens)), applied with the
    // same salted per-myriad id hash as t15. Sources under budget keep
    // everything; the rest keep the budgeted fraction. Both engines
    // derive thresholds as floor(10000 * budget / tokens) over identical
    // integer operands.
    "c3_mix_plan" -> Q(
      fn = (s, dir) =>
        graft.operators.SampleOps.planMixture(
          t(s, dir, "documents"), "doc_id", "source",
          tokens = size(split(col("text"), " ")),
          budgets = Map("src0" -> 3000L, "src1" -> 800L, "src2" -> 100L),
          defaultBudget = 400L)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || '/mix')")
        s"""
        WITH tot AS (
          SELECT source, sum(len(string_split(text, ' '))) AS tok
          FROM documents GROUP BY source),
        thr AS (
          SELECT source,
                 least(10000, CAST(floor(10000.0 *
                   CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 800
                               WHEN 'src2' THEN 100 ELSE 400 END
                   / tok) AS BIGINT)) AS t
          FROM tot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN thr ON thr.source = d.source
        WHERE ($h60) % 10000 < thr.t
        ORDER BY d.doc_id"""
      }),

    // C6 — temperature-scaled mixture (alpha = 0.5): source weights
    // ∝ sqrt(token mass) — the standard multilingual flattening that
    // up-samples tail sources relative to proportional sampling —
    // against a 20k-token budget, drawn with the deterministic
    // '/temp'-salted id hash. pow weights round to 9 dp and total as
    // exact decimals before the rate math, so both engines floor the
    // same thresholds.
    "c6_temperature_mix" -> Q(
      fn = (s, dir) =>
        graft.operators.SampleOps.temperatureMixture(
          t(s, dir, "documents"), "doc_id", "source",
          tokens = size(split(col("text"), " ")),
          totalBudget = 20000L, alpha = 0.5)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || '/temp')")
        s"""
        WITH tot AS (
          SELECT source,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
          FROM documents GROUP BY source),
        w AS (
          SELECT source, tok,
                 CAST(round(pow(CAST(tok AS DOUBLE), 0.5), 9)
                      AS DECIMAL(28,9)) AS w
          FROM tot),
        ws AS (SELECT sum(w) AS wsum FROM w),
        thr AS (
          SELECT source,
                 least(10000, CAST(floor(10000.0 * 20000 *
                   (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE))
                   / CAST(tok AS DOUBLE)) AS BIGINT)) AS t
          FROM w CROSS JOIN ws)
        SELECT d.doc_id, d.source
        FROM documents d JOIN thr ON thr.source = d.source
        WHERE ($h60) % 10000 < thr.t
        ORDER BY d.doc_id"""
      }),

    // C15 — achieved-vs-target mix audit: after the c6 temperature
    // sampler runs, did each source actually land its α=0.5-weighted
    // token share? Per source: total and sampled token mass, achieved
    // share, the temperature target share, and the relative error —
    // the closure of the sampling loop (c3 plans, c6 executes, c15
    // AUDITS; thresholded per-doc hashing only approximates the target,
    // and this query is the measured gap). Shares round before the
    // error division on both engines, so the readout hash-matches.
    "c15_mix_audit" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("ntok",
            size(split(col("text"), " ")).cast("long"))
        val sampled = graft.operators.SampleOps.temperatureMixture(
          docs, "doc_id", "source",
          tokens = size(split(col("text"), " ")),
          totalBudget = 20000L, alpha = 0.5)
          .select(col("doc_id")).withColumn("__s", lit(1))
        val bySrc = docs.join(sampled, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(sum(col("ntok")).as("tok_total"),
            sum(when(col("__s").isNotNull, col("ntok"))
              .otherwise(lit(0L))).as("tok_sampled"))
        val w = bySrc.withColumn("w",
          round(pow(col("tok_total").cast("double"), 0.5), 9)
            .cast("decimal(28,9)"))
        val ws = w.agg(sum(col("w")).as("wsum"),
          sum(col("tok_sampled")).as("tot_sampled"))
        w.crossJoin(broadcast(ws))
          .withColumn("achieved_share",
            round(col("tok_sampled").cast("double") /
              col("tot_sampled"), 6))
          .withColumn("target_share",
            round(col("w").cast("double") / col("wsum").cast("double"),
              6))
          .withColumn("rel_err",
            round((col("achieved_share") - col("target_share")) /
              col("target_share"), 6))
          .select(col("source"), col("tok_total"), col("tok_sampled"),
            col("achieved_share"), col("target_share"), col("rel_err"))
          .orderBy(col("source"))
      },
      bench = true,
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || '/temp')")
        s"""
        WITH tot AS (
          SELECT source,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
          FROM documents GROUP BY source),
        w AS (
          SELECT source, tok,
                 CAST(round(pow(CAST(tok AS DOUBLE), 0.5), 9)
                      AS DECIMAL(28,9)) AS w
          FROM tot),
        ws AS (SELECT sum(w) AS wsum FROM w),
        thr AS (
          SELECT source,
                 least(10000, CAST(floor(10000.0 * 20000 *
                   (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE))
                   / CAST(tok AS DOUBLE)) AS BIGINT)) AS t
          FROM w CROSS JOIN ws),
        samp AS (
          SELECT d.source,
                 CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
                   AS tok_sampled
          FROM documents d JOIN thr ON thr.source = d.source
          WHERE ($h60) % 10000 < thr.t
          GROUP BY d.source),
        tots AS (
          SELECT CAST(sum(tok_sampled) AS BIGINT) AS tot_sampled
          FROM samp)
        SELECT w.source, w.tok AS tok_total,
               coalesce(samp.tok_sampled, 0) AS tok_sampled,
               round(CAST(coalesce(samp.tok_sampled, 0) AS DOUBLE)
                 / tots.tot_sampled, 6) AS achieved_share,
               round(CAST(w.w AS DOUBLE) / CAST(ws.wsum AS DOUBLE), 6)
                 AS target_share,
               round((round(CAST(coalesce(samp.tok_sampled, 0) AS DOUBLE)
                       / tots.tot_sampled, 6)
                      - round(CAST(w.w AS DOUBLE)
                        / CAST(ws.wsum AS DOUBLE), 6))
                 / round(CAST(w.w AS DOUBLE) / CAST(ws.wsum AS DOUBLE),
                     6), 6) AS rel_err
        FROM w CROSS JOIN ws CROSS JOIN tots
        LEFT JOIN samp ON samp.source = w.source
        ORDER BY w.source"""
      }),

    // C2 — per-source corpus health report, one plan: doc counts, exact-
    // duplicate rate (beyond-first copies by text md5 — the d1 rule),
    // language spread, and token/char mass. Ratios divide exact integer
    // sums in double, so they hash-match. The report is what an ingest
    // run publishes per batch — and the shape is one groupBy over a
    // window-marked frame, no per-metric re-scan.
    "c2_corpus_report" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .withColumn("__h", md5(col("text")))
          .withColumn("__rk", row_number().over(w))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("__rk") > 1, 1L).otherwise(0L)).as("n_dups"),
            round(sum(when(col("__rk") > 1, 1L).otherwise(0L)) /
              count(lit(1)), 6).as("dup_rate"),
            countDistinct(col("lang")).as("n_langs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
            round(sum(size(split(col("text"), " ")).cast("long")) /
              count(lit(1)), 6).as("mean_tokens"),
            sum(col("n_chars")).as("n_chars"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("source"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT source, lang, n_chars, doc_id,
                 len(string_split(text, ' ')) AS tok,
                 row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS rk
          FROM documents)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dups,
               round(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) / count(*), 6)
                 AS dup_rate,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(tok) AS BIGINT) AS n_tokens,
               round(sum(tok) / count(*), 6) AS mean_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               min(doc_id) AS first_doc
        FROM f
        GROUP BY source
        ORDER BY source""")),

    // C5 — per-source distribution drift: KL(source ‖ corpus) over
    // unigram token distributions — catches a source going
    // off-distribution (scraper regression, boilerplate injection)
    // before it pollutes a training mix. Source ⊆ corpus, so no
    // smoothing; per-token terms round then sum as exact decimals.
    "c5_source_divergence" -> Q(
      fn = (s, dir) =>
        TextOps.sourceDivergence(t(s, dir, "documents"), "source", "text")
          .orderBy(col("source")),
      oracle = Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS token
          FROM documents),
        st AS (
          SELECT source, token, count(*) AS n_st FROM tok GROUP BY 1, 2),
        s AS (
          SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s
          FROM st GROUP BY source),
        g AS (
          SELECT token, CAST(sum(n_st) AS BIGINT) AS n_t
          FROM st GROUP BY token),
        tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM g),
        terms AS (
          SELECT st.source, s.n_s,
                 CAST(round(
                   (CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)) *
                   ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)) /
                      (CAST(n_t AS DOUBLE) / CAST(n AS DOUBLE))), 9)
                   AS DECIMAL(28,9)) AS term
          FROM st JOIN g USING (token) JOIN s USING (source)
          CROSS JOIN tot)
        SELECT source, min(n_s) AS n_tokens, count(*) AS vocab,
               round(CAST(sum(term) AS DOUBLE), 6) AS kl
        FROM terms
        GROUP BY source
        ORDER BY source""")),

    // C8 — pairwise source vocabulary overlap (c5's two-sided sibling):
    // Jaccard of token vocabularies for every source pair a < b — the
    // redundancy diagnostic that catches one feed registered under two
    // names. One distinct-agg builds (source, token); the intersection
    // is a self-join ON TOKEN (m sources sharing a token contribute
    // m(m-1)/2 pairs — never a doc cross product), partial-agg counted
    // into a sources²-sized frame.
    "c8_source_overlap" -> Q(
      fn = (s, dir) =>
        TextOps.sourceOverlap(t(s, dir, "documents"), "source", "text")
          .orderBy(col("src_a"), col("src_b")),
      oracle = Some("""
        WITH v AS (
          SELECT DISTINCT source AS g, tok FROM (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)),
        sz AS (SELECT g, CAST(count(*) AS INT) AS nv FROM v GROUP BY g),
        c AS (
          SELECT x.g AS src_a, y.g AS src_b, CAST(count(*) AS INT) AS n_common
          FROM v x JOIN v y ON x.tok = y.tok AND x.g < y.g
          GROUP BY x.g, y.g)
        SELECT c.src_a, c.src_b, sa.nv AS vocab_a, sb.nv AS vocab_b,
               c.n_common,
               round(CAST(c.n_common AS DOUBLE) /
                     (sa.nv + sb.nv - c.n_common), 6) AS jaccard
        FROM c JOIN sz sa ON sa.g = c.src_a
               JOIN sz sb ON sb.g = c.src_b
        ORDER BY src_a, src_b""")),

    // T25 — per-document n-gram novelty vs the earlier corpus: the
    // fraction of a doc's DISTINCT 3-word shingles that no lower-id doc
    // contains — the is-this-crawl-batch-new signal. Shingles dedup
    // in-row before the explode; the shuffle carries md5 hashes, never
    // text; first-owner is one partial-aggregable min.
    "t25_ngram_novelty" -> Q(
      fn = (s, dir) =>
        TextOps.ngramNovelty(t(s, dir, "documents"), "doc_id", "text", 3)
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some(s"""
        WITH s AS (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id, unnest($sh3Sql) AS sh FROM documents)),
        f AS (SELECT sh, min(doc_id) AS first_doc FROM s GROUP BY sh),
        per AS (
          SELECT s.doc_id, CAST(count(*) AS INT) AS n_shingles,
                 CAST(sum(CASE WHEN f.first_doc = s.doc_id
                               THEN 1 ELSE 0 END) AS INT) AS n_novel
          FROM s JOIN f ON f.sh = s.sh GROUP BY s.doc_id)
        SELECT d.doc_id,
               coalesce(per.n_shingles, 0) AS n_shingles,
               coalesce(per.n_novel, 0) AS n_novel,
               CASE WHEN per.n_shingles > 0 THEN
                 round(CAST(per.n_novel AS DOUBLE) / per.n_shingles, 6)
               END AS novelty_frac
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // C4 — the COMPLETE training-data chain as ONE lazy plan (the LLM
    // twin of pl_levels_e2e): quality gate → exact dedup → benchmark
    // decontamination → paragraph dedup with reassembly → language-mix
    // sampling → sliding context windows. Every stage is an operator
    // with its own oracle elsewhere (t3/d1/d10/d13/t15/t21); this row
    // proves they COMPOSE — same winners, same thresholds, same hash
    // orders — because a pipeline that only works stage-by-stage isn't
    // a pipeline. Deliberately ONE lazy plan here (the oracle needs a
    // single deterministic dataflow); a production run of this chain
    // persists the kept/clean stage boundaries instead — lazy
    // composition re-derives shared subtrees per consumer, which is
    // re-read amplification at corpus scale.
    "c4_pipeline_e2e" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val m = TextOps.qualityScore(
          col("text"), TextOps.tokens(col("text")), stopwords)
        val gated = docs.select(col("doc_id"), col("text"), col("lang"),
          m("n_tok").as("n_tok"), m("quality").as("quality"))
          .filter(col("quality") >= 0.5 && col("n_tok") >= 10)
        val kept = DedupOps.exactDedupStats(gated, md5(col("text")),
          "doc_id", carryCols = Seq("text", "lang"))
          .select(col("doc_id"), col("text"), col("lang"))
        val flags = DedupOps.flagContaminated(
          kept, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text")
        val clean = kept.join(
          flags.filter(!col("is_contaminated")).select(col("doc_id")),
          Seq("doc_id"))
        val rebuilt = DedupOps.paragraphDedup(
          clean, "doc_id", "text", sepRegex = " the ", joiner = " the ")
          .join(clean.select(col("doc_id"), col("lang")), Seq("doc_id"))
        val sampled = graft.operators.SampleOps.mixtureSample(
          rebuilt, "doc_id", "lang",
          Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25), defaultRate = 0.1)
        val (idx, chunks) = TextOps.slidingChunks(col("text_dedup"), 120, 100)
        sampled
          .select(col("doc_id"), col("lang"),
            arrays_zip(idx, chunks).as("z"))
          .select(col("doc_id"), col("lang"), explode(col("z")).as("c"))
          .select(col("doc_id"), col("lang"),
            col("c.0").cast("int").as("chunk_no"), col("c.1").as("chunk"))
          .orderBy(col("doc_id"), col("chunk_no"))
      },
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || '/mix')")
        val hb = hashedCteSql.replace("hashed AS", "hb AS")
        val hk = hashedCteSql.replace("hashed AS", "hk AS")
          .replace("FROM documents", "FROM kept")
        s"""
        WITH qual AS (
          SELECT doc_id, text, lang,
                 len($toksSql) AS n_tok,
                 round(0.3 * round(least(1.0, CAST(length(text) AS DOUBLE) / 400.0), 6)
                     + 0.4 * round(len(list_distinct($toksSql))
                         / CAST(greatest(len($toksSql), 1) AS DOUBLE), 6)
                     + 0.3 * (1.0 - least(1.0, ${markerSql(stopwords)} * 4)), 6)
                   AS quality
          FROM documents),
        kept0 AS (
          SELECT doc_id, text, lang FROM qual
          WHERE quality >= 0.5 AND n_tok >= 10),
        kept AS (
          SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
                 arg_min(lang, doc_id) AS lang
          FROM kept0 GROUP BY md5(text)),
        $hb,
        bench AS (
          SELECT DISTINCT unnest(hs) AS sh FROM hb WHERE doc_id % 50 = 0),
        $hk,
        docsh AS (SELECT doc_id, unnest(hs) AS sh FROM hk),
        contaminated AS (
          SELECT DISTINCT docsh.doc_id
          FROM docsh JOIN bench ON docsh.sh = bench.sh),
        clean AS (
          SELECT k.* FROM kept k
          LEFT JOIN contaminated c ON c.doc_id = k.doc_id
          WHERE c.doc_id IS NULL),
        p AS (
          SELECT doc_id, i, para
          FROM (SELECT doc_id, string_split(text, ' the ') AS ps
                FROM clean),
               LATERAL (SELECT unnest(ps) AS para,
                               generate_subscripts(ps, 1) AS i)),
        w AS (
          SELECT doc_id, i, para,
                 row_number() OVER (PARTITION BY para
                                    ORDER BY doc_id, i) AS rk
          FROM p),
        r AS (
          SELECT doc_id, string_agg(para, ' the ' ORDER BY i) AS text_dedup
          FROM w WHERE rk = 1 GROUP BY doc_id),
        rebuilt AS (
          SELECT cl.doc_id, cl.lang,
                 coalesce(r.text_dedup, '') AS text_dedup
          FROM clean cl LEFT JOIN r ON r.doc_id = cl.doc_id),
        sampled AS (
          SELECT * FROM rebuilt
          WHERE ($h60) % 10000 <
                CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 5000
                          WHEN 'fr' THEN 2500 ELSE 1000 END),
        n AS (
          SELECT doc_id, lang, text_dedup,
                 1 + greatest(CAST(floor((length(text_dedup) - 120 + 99)
                              / 100.0) AS INT), 0) AS n_chunks
          FROM sampled),
        ck AS (
          SELECT doc_id, lang, CAST(i AS INT) AS chunk_no,
                 substr(text_dedup, CAST(i AS INT) * 100 + 1, 120) AS chunk
          FROM n, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1))
                           AS i))
        SELECT doc_id, lang, chunk_no, chunk
        FROM ck
        ORDER BY doc_id, chunk_no"""
      },
      bench = true),

    "c1_curate_e2e" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val m = TextOps.qualityScore(
          col("text"), TextOps.tokens(col("text")), stopwords)
        val kept0 = docs.select(col("doc_id"), col("text"),
          m("n_tok").as("n_tok"), m("quality").as("quality"))
          .filter(col("quality") >= 0.5 && col("n_tok") >= 10)
        // r21: the kept stage feeds blocking, canonical pick AND the final
        // dup_count join — materialize it once, the persisted stage
        // boundary a production curation chain writes anyway (guide §2.4)
        val kept = DedupOps.exactDedupStats(kept0, md5(col("text")), "doc_id",
          carryCols = Seq("text", "quality"))
          .select(col("doc_id"), col("text"), col("quality"), col("dup_count"))
          .transform(graft.operators.Reuse.once)
        val pairs = DedupOps.minhashCandidatePairs(kept, "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2).select(col("a"), col("b"))
        DedupOps.canonicalPick(kept, "doc_id", col("quality"), pairs)
          .join(kept.select(col("doc_id"), col("dup_count")), Seq("doc_id"))
          .select(col("doc_id"), col("component"), col("score").as("quality"),
            col("dup_count"), col("is_canonical"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH RECURSIVE qual AS (
          SELECT doc_id, text,
                 len($toksSql) AS n_tok,
                 round(0.3 * round(least(1.0, CAST(length(text) AS DOUBLE) / 400.0), 6)
                     + 0.4 * round(len(list_distinct($toksSql))
                         / CAST(greatest(len($toksSql), 1) AS DOUBLE), 6)
                     + 0.3 * (1.0 - least(1.0, ${markerSql(stopwords)} * 4)), 6)
                   AS quality
          FROM documents),
        kept0 AS (
          SELECT doc_id, text, quality FROM qual
          WHERE quality >= 0.5 AND n_tok >= 10),
        kept AS (
          SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
                 arg_min(quality, doc_id) AS quality, count(*) AS dup_count
          FROM kept0 GROUP BY md5(text)),
        ${bandsSql.replace("FROM documents", "FROM kept")},
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        e AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM e
          UNION
          SELECT e.a AS id, walk.label
          FROM e JOIN walk ON e.b = walk.id),
        comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id),
        j AS (
          SELECT k.doc_id, coalesce(c.component, k.doc_id) AS component,
                 k.quality, k.dup_count
          FROM kept k LEFT JOIN comp c ON c.id = k.doc_id)
        SELECT doc_id, component, quality, dup_count,
               doc_id = first_value(doc_id) OVER
                 (PARTITION BY component ORDER BY quality DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS is_canonical
        FROM j
        ORDER BY doc_id"""),
      bench = true),

    // T13 — repetition signals (Gopher-style boilerplate/degeneration
    // filters): modal token and bigram shares + duplicate-3-gram
    // instance fraction.
    "t13_repetition" -> Q(
      fn = (s, dir) =>
        TextOps.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH w AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
          GROUP BY 1, 2),
        tw AS (
          SELECT doc_id, tok AS top_word,
                 round(CAST(c AS DOUBLE) / n, 6) AS top_word_frac
          FROM (SELECT doc_id, tok, c, sum(c) OVER (PARTITION BY doc_id) AS n,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY c DESC, tok) AS rn
                FROM w) WHERE rn = 1),
        b2 AS (
          SELECT doc_id, bg, count(*) AS c
          FROM (SELECT doc_id,
                       unnest(list_transform(generate_series(1, len($toksSql) - 1),
                         i -> array_to_string(($toksSql)[i:i+1], ' '))) AS bg
                FROM documents)
          GROUP BY 1, 2),
        tb AS (
          SELECT doc_id, bg AS top_bigram,
                 round(CAST(c AS DOUBLE) / n, 6) AS top_bigram_frac
          FROM (SELECT doc_id, bg, c, sum(c) OVER (PARTITION BY doc_id) AS n,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY c DESC, bg) AS rn
                FROM b2) WHERE rn = 1),
        base AS (
          SELECT doc_id, len($toksSql) AS n_tok,
                 round(CAST(len($sh3Sql) - len(list_distinct($sh3Sql)) AS DOUBLE)
                       / greatest(len($sh3Sql), 1), 6) AS dup_3gram_frac
          FROM documents)
        SELECT base.doc_id, n_tok, top_word, top_word_frac,
               coalesce(top_bigram, '') AS top_bigram,
               coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
               dup_3gram_frac
        FROM base
        LEFT JOIN tw ON tw.doc_id = base.doc_id
        LEFT JOIN tb ON tb.doc_id = base.doc_id
        ORDER BY base.doc_id""")),

    // T14 — column profiling: the data-quality pass before any curation
    // (row/null/distinct counts + min/max per column, one agg job).
    "t14_profile" -> Q(
      fn = (s, dir) =>
        graft.operators.ProfileOps.profileColumns(
          t(s, dir, "documents"),
          Seq("doc_id", "text", "lang", "source", "n_chars"))
          .orderBy(col("col_name")),
      oracle = Some(Seq("doc_id", "text", "lang", "source", "n_chars")
        .map(c => s"""
          SELECT '$c' AS col_name, count(*) AS n_rows,
                 count(*) - count($c) AS n_null,
                 count(DISTINCT $c) AS n_distinct,
                 CAST(min($c) AS VARCHAR) AS min_val,
                 CAST(max($c) AS VARCHAR) AS max_val
          FROM documents""")
        .mkString(" UNION ALL ") + " ORDER BY col_name")),

    // T7 — PII redaction: pattern scrubbing with redaction counts (emails
    // and IPv4 here; the pattern set is pluggable). Runs on a derived
    // pii-bearing column so the branch is exercised deterministically.
    "t7_redact" -> Q(
      fn = (s, dir) => {
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        val pii = concat(
          lit("contact user"), col("doc_id"), lit("@example.com from 10.0."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") % 100).cast("string"), lit(" re: "),
          substring(col("text"), lit(1), lit(40)))
        t(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(pii, lit(emailRe)).as("n_emails"),
            regexp_count(pii, lit(ipRe)).as("n_ips"),
            regexp_replace(regexp_replace(pii, emailRe, "<EMAIL>"),
              ipRe, "<IP>").as("redacted"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id,
                 'contact user' || doc_id || '@example.com from 10.0.' ||
                 (doc_id % 256) || '.' || (doc_id % 100) || ' re: ' ||
                 substr(text, 1, 40) AS pii
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(pii, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
               regexp_replace(
                 regexp_replace(pii, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
        FROM p
        ORDER BY doc_id""")),

    // D10 — benchmark decontamination: flag every doc sharing a hashed
    // 3-shingle with the (stand-in) benchmark set doc_id % 50 == 0 —
    // the n-gram-overlap check a corpus runs against eval sets.
    "d10_decontaminate" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.flagContaminated(
          docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $hashedCteSql,
        bench AS (
          SELECT DISTINCT unnest(hs) AS sh FROM hashed WHERE doc_id % 50 = 0),
        docsh AS (SELECT doc_id, unnest(hs) AS sh FROM hashed),
        flagged AS (SELECT DISTINCT docsh.doc_id
                    FROM docsh JOIN bench ON docsh.sh = bench.sh)
        SELECT h.doc_id, f.doc_id IS NOT NULL AS is_contaminated
        FROM hashed h LEFT JOIN flagged f ON f.doc_id = h.doc_id
        ORDER BY h.doc_id""")),

    // D12 — Bloom-prefiltered decontamination: same contract as d10 (and
    // the SAME oracle — the Bloom pass is exact end-to-end because the
    // prefilter only ever admits a superset and the confirm semi-join
    // removes the false positives). The plan is the 100 TB shape: the
    // benchmark set becomes a ~10-bits/key filter with a shuffle-free
    // partial-agg build, corpus shingles probe it inside the scan stage,
    // and only the passing sliver reaches the confirm join.
    "d12_bloom_decontaminate" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.bloomFlagContaminated(
          docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
          expectedShingles = 1L << 16)
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $hashedCteSql,
        bench AS (
          SELECT DISTINCT unnest(hs) AS sh FROM hashed WHERE doc_id % 50 = 0),
        docsh AS (SELECT doc_id, unnest(hs) AS sh FROM hashed),
        flagged AS (SELECT DISTINCT docsh.doc_id
                    FROM docsh JOIN bench ON docsh.sh = bench.sh)
        SELECT h.doc_id, f.doc_id IS NOT NULL AS is_contaminated
        FROM hashed h LEFT JOIN flagged f ON f.doc_id = h.doc_id
        ORDER BY h.doc_id""")),

    // D16 — FUZZY decontamination: near-dup match of every corpus doc
    // against the benchmark set (doc_id % 50 == 0) via one LSH bucket
    // equi-join + in-row signature verification (estimated Jaccard =
    // matching-component fraction >= 0.5) — catches the paraphrased
    // eval leakage d10's exact n-gram check misses, without ever
    // re-reading text at verify time. maxBucket set provably inert
    // (the oracle's band join is uncapped).
    "d16_fuzzy_decontaminate" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.fuzzyFlagContaminated(
          docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
          tau = 0.5, maxBucket = 100000)
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $bandsSql,
        hit AS (
          SELECT DISTINCT c.doc_id
          FROM bands c
          JOIN bands b ON c.band_idx = b.band_idx
            AND c.band_key = b.band_key AND b.doc_id % 50 = 0
          JOIN sigs cs ON cs.doc_id = c.doc_id
          JOIN sigs bs ON bs.doc_id = b.doc_id
          WHERE round(CAST(len(list_filter(generate_series(1, 8),
                  __i -> cs.mh[__i] = bs.mh[__i])) AS DOUBLE) / 8, 6) >= 0.5)
        SELECT d.doc_id, h.doc_id IS NOT NULL AS is_contaminated
        FROM documents d LEFT JOIN hit h ON h.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // D14 — incremental dedup against a PERSISTED store: index doc_id <
    // 400 once, then flag the 400+ batch with one bucket join + stored-
    // signature verification (matching-component fraction >= 0.5) — the
    // corpus is never re-shingled. The oracle replays the identical
    // minhash/banding pipeline over the union and applies the same
    // first-occurrence rule, so flags and dup_of partners hash-match.
    "d14_incremental_dedup" -> Q(
      fn = (s, dir) => {
        val tmp = freshTmpDir("d14_dedup_store_")
        val docs = t(s, dir, "documents")
        // maxBucket high enough to be provably inert at ANY scale factor
        // — the oracle's band join is uncapped, so the cap must not bite
        DedupStore.write(
          docs.filter(col("doc_id") < 400), "doc_id", "text", tmp,
          maxBucket = 1 << 30)
        // r21: flags feeds the append's clean-row filter AND the returned
        // frame — materialize the serve join once (guide §2.4)
        val flags = graft.operators.Reuse.once(DedupStore.dedupNewBatch(
          s, tmp, docs.filter(col("doc_id") >= 400), tau = 0.5))
        // lifecycle smoke inside the same query: admitting the clean
        // rows must not change the store's verdict on the same batch
        DedupStore.append(s, tmp, docs.filter(col("doc_id") >= 400),
          flags.filter(!col("is_dup")).select(col("doc_id")))
        flags.orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $bandsSql,
        cand AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id AND y.doc_id >= 400),
        sim AS (
          SELECT c.a, c.b,
                 round(CAST(len(list_filter(generate_series(1, 8),
                   i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / 8, 6) AS sig_sim
          FROM cand c
          JOIN sigs sa ON sa.doc_id = c.a
          JOIN sigs sb ON sb.doc_id = c.b),
        m AS (
          SELECT b, min(a) AS dup_of FROM sim
          WHERE sig_sim >= 0.5 GROUP BY b)
        SELECT d.doc_id, m.dup_of IS NOT NULL AS is_dup, m.dup_of
        FROM documents d LEFT JOIN m ON m.b = d.doc_id
        WHERE d.doc_id >= 400
        ORDER BY d.doc_id""")),

    // D13 — paragraph-level dedup with reassembly (the RefinedWeb pass):
    // split on ' the ', keep each distinct paragraph's globally first
    // occurrence, stitch documents back in order. The winner window
    // compiles to WindowGroupLimit (one candidate per paragraph hash per
    // map partition crosses the exchange). Both engines pick winners by
    // the same total order (doc_id, position), so the rebuilt texts are
    // byte-identical.
    "d13_paragraph_dedup" -> Q(
      fn = (s, dir) =>
        DedupOps.paragraphDedup(
          t(s, dir, "documents"), "doc_id", "text",
          sepRegex = " the ", joiner = " the ")
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH p AS (
          SELECT doc_id, i, para
          FROM (SELECT doc_id, string_split(text, ' the ') AS ps
                FROM documents),
               LATERAL (SELECT unnest(ps) AS para,
                               generate_subscripts(ps, 1) AS i)),
        w AS (
          SELECT doc_id, i, para,
                 row_number() OVER (PARTITION BY para
                                    ORDER BY doc_id, i) AS rk
          FROM p),
        r AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
                 string_agg(para, ' the ' ORDER BY i) AS text_dedup
          FROM w WHERE rk = 1 GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' the ')) AS INT) AS n_paras,
               coalesce(r.n_kept, 0) AS n_kept,
               coalesce(r.text_dedup, '') AS text_dedup
        FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // D17 — frequency-threshold boilerplate removal (the CCNet pass,
    // d13's sibling): a paragraph appearing in >= 2 distinct documents
    // is boilerplate and EVERY occurrence goes; within-doc repeats of
    // rare paragraphs survive. Document frequency is one two-phase
    // distinct agg on md5(paragraph); the threshold-sized common set
    // anti-joins the exploded corpus unhinted (broadcast here, shuffle
    // at web scale). Reassembly is byte-identical across engines
    // because both restitch by the same (doc, position) order.
    "d17_boilerplate" -> Q(
      fn = (s, dir) =>
        DedupOps.boilerplateRemoval(
          t(s, dir, "documents"), "doc_id", "text",
          sepRegex = " the ", joiner = " the ", minDocs = 2)
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some("""
        WITH p AS (
          SELECT doc_id, i, para
          FROM (SELECT doc_id, string_split(text, ' the ') AS ps
                FROM documents),
               LATERAL (SELECT unnest(ps) AS para,
                               generate_subscripts(ps, 1) AS i)),
        common AS (
          SELECT para FROM p
          GROUP BY para HAVING count(DISTINCT doc_id) >= 2),
        k AS (
          SELECT p.doc_id, p.i, p.para FROM p
          WHERE p.para NOT IN (SELECT para FROM common)),
        r AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
                 string_agg(para, ' the ' ORDER BY i) AS text_clean
          FROM k GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' the ')) AS INT) AS n_paras,
               coalesce(r.n_kept, 0) AS n_kept,
               coalesce(r.text_clean, '') AS text_clean
        FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // D18 — within-document duplicate-segment removal (the CCNet
    // per-doc line-dedup pass that runs BEFORE any corpus hashing;
    // d13/d17's in-row sibling): first occurrence of each distinct
    // pseudo-paragraph inside its own document survives, later repeats
    // go, order preserved. The Spark side is ONE codegen'd projection —
    // zero shuffles, no explode — which is the point: this composes
    // into a 100 TB ingest scan for free. The oracle restates it as
    // unnest + first-occurrence window (d13's shape, scoped per doc).
    "d18_line_dedup" -> Q(
      fn = (s, dir) =>
        DedupOps.lineDedup(
          t(s, dir, "documents"), "doc_id", "text",
          sepRegex = " the ", joiner = " the ")
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH p AS (
          SELECT doc_id, i, seg
          FROM (SELECT doc_id, string_split(text, ' the ') AS ps
                FROM documents),
               LATERAL (SELECT unnest(ps) AS seg,
                               generate_subscripts(ps, 1) AS i)),
        w AS (
          SELECT doc_id, i, seg,
                 row_number() OVER (PARTITION BY doc_id, seg
                                    ORDER BY i) AS rk
          FROM p),
        r AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
                 string_agg(seg, ' the ' ORDER BY i) AS text_dedup
          FROM w WHERE rk = 1 GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' the ')) AS INT)
                 AS n_segments,
               r.n_kept, r.text_dedup
        FROM documents d JOIN r ON r.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // D19 — sorted-neighborhood blocking: corpus ordered by a blocking
    // key (document length here), each row paired with its 2 successors
    // in that total order — the record-linkage complement that catches
    // near-misses hash blocking splits. The Spark side is the
    // DISTRIBUTED-EXACT shape: range-partition on (key, id), pair under
    // per-partition windows, replicate each partition's head rows into
    // its predecessor for the boundary pairs — no stage ever
    // single-partitions the corpus. The oracle is the textbook global
    // row_number + rank-band self-join, which is exactly the
    // formulation that does NOT scale and exists here only to prove
    // the distributed one equals it.
    "d19_sorted_neighbors" -> Q(
      fn = (s, dir) =>
        DedupOps.sortedNeighborPairs(
          t(s, dir, "documents"), "doc_id", col("n_chars"), window = 3)
          .orderBy(col("a"), col("b")),
      oracle = Some("""
        WITH r AS (
          SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY n_chars, doc_id) AS rn
          FROM documents)
        SELECT a.doc_id AS a, b.doc_id AS b,
               a.n_chars AS key_a, b.n_chars AS key_b
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2
        ORDER BY a, b""")),

    // D25 — Jaro–Winkler scoring over sorted-neighborhood candidates:
    // the classic record-linkage refine stage (Winkler 1990) composed
    // from d19's distributed-exact blocking. Sorting on the 24-char
    // text prefix puts near-identical openings adjacent; each candidate
    // pair is then scored by the native byte-level JaroWinkler
    // expression — prefix-weighted, so "same start, divergent tail"
    // (the scraper-mirror signature Levenshtein underweights) scores
    // high. Zero extra shuffle beyond the blocking sort: the score is
    // a codegen'd projection over the pair stream, and the oracle is
    // DuckDB's OWN jaro_winkler_similarity — an independent
    // implementation agreeing to 6 dp pins the byte/window/
    // transposition/boost semantics, not just our own mirror.
    "d25_jaro_winkler" -> Q(
      fn = (s, dir) =>
        DedupOps.sortedNeighborPairs(
          t(s, dir, "documents"), "doc_id",
          substring(col("text"), 1, 24), window = 3)
          .select(col("a"), col("b"),
            round(DedupOps.jaroWinklerSim(col("key_a"), col("key_b")), 6)
              .as("jw"))
          .orderBy(col("a"), col("b")),
      oracle = Some("""
        WITH r AS (
          SELECT doc_id, substring(text, 1, 24) AS k,
                 row_number() OVER (ORDER BY substring(text, 1, 24),
                                    doc_id) AS rn
          FROM documents)
        SELECT a.doc_id AS a, b.doc_id AS b,
               round(jaro_winkler_similarity(a.k, b.k), 6) AS jw
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2
        ORDER BY a, b""")),

    // D27 — record-linkage END-TO-END: d25's block-and-score chain
    // (sorted-neighborhood on the 24-char prefix, byte-level
    // Jaro–Winkler) thresholded at 0.9 and resolved into entities by
    // connected components — block → score → threshold → resolve, the
    // full Fellegi-Sunter-style pipeline as ONE lazy plan. The
    // threshold compares the ROUNDED score (6 dp) so the edge set is
    // engine-exact at the boundary; the resolve stage is the same CC
    // the dedup family uses (bounded collect, limit-probed). Output =
    // every linked record with its entity id and survivor flag.
    "d27_linkage_e2e" -> Q(
      fn = (s, dir) => {
        val pairs = DedupOps.sortedNeighborPairs(
          t(s, dir, "documents"), "doc_id",
          substring(col("text"), 1, 24), window = 3)
          .select(col("a"), col("b"),
            round(DedupOps.jaroWinklerSim(col("key_a"), col("key_b")), 6)
              .as("jw"))
          .filter(col("jw") >= 0.9)
          .select(col("a"), col("b"))
        DedupOps.connectedComponents(pairs)
          .withColumn("keep", col("id") === col("component"))
          .orderBy(col("id"))
      },
      oracle = Some("""
        WITH RECURSIVE r AS (
          SELECT doc_id, substring(text, 1, 24) AS k,
                 row_number() OVER (ORDER BY substring(text, 1, 24),
                                    doc_id) AS rn
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2
          WHERE round(jaro_winkler_similarity(a.k, b.k), 6) >= 0.9),
        e AS (SELECT a, b FROM pairs
              UNION ALL SELECT b AS a, a AS b FROM pairs),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM e
          UNION
          SELECT e.a AS id, walk.label
          FROM e JOIN walk ON e.b = walk.id)
        SELECT id, min(label) AS component, id = min(label) AS keep
        FROM walk
        GROUP BY id
        ORDER BY id""")),

    // D23 — exact duplicated-substring spans (Lee et al. ACL'22
    // ExactSubstr, token-window form, w = 8): windows whose hash occurs
    // ≥ 2 times corpus-wide mark their tokens duplicated; per doc the
    // covered positions merge into maximal spans by the islands rule
    // (start > running max(end) + 1 breaks). The span statistic — not
    // the pair — is the output: d13/d18 dedup whole paragraphs/lines,
    // this catches duplication that CROSSES those boundaries. Text
    // never shuffles: the corpus-sized exchange carries 8-byte window
    // hashes; the oracle restates windows via inclusive list slicing,
    // the same md5-fold hash, and the identical islands window.
    "d23_substring_spans" -> Q(
      fn = (s, dir) =>
        DedupOps.substringSpans(t(s, dir, "documents"), "doc_id", "text", 8)
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, $toksSql AS toks,
                 CAST(len($toksSql) AS INT) AS n_tokens
          FROM documents),
        win AS (
          SELECT doc_id, i AS pos,
                 list_transform([array_to_string(toks[i:i+7], ' ')],
                   s -> $baseHashSql)[1] AS wh
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 7)) AS i
                FROM tok WHERE len(toks) >= 8)),
        cnt AS (SELECT wh FROM win GROUP BY wh HAVING count(*) >= 2),
        dup AS (
          SELECT w.doc_id, w.pos FROM win w JOIN cnt ON cnt.wh = w.wh),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > coalesce(max(pos + 7) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                      THEN 1 ELSE 0 END AS brk
          FROM dup),
        grp AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
          FROM isl),
        spans AS (
          SELECT doc_id, g, min(pos) AS s, max(pos) + 7 AS e
          FROM grp GROUP BY 1, 2),
        per AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_dup_spans,
                 CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
          FROM spans GROUP BY 1),
        nw AS (SELECT doc_id, CAST(count(*) AS INT) AS n_windows
               FROM win GROUP BY 1),
        nd AS (SELECT doc_id, CAST(count(*) AS INT) AS n_dup_windows
               FROM dup GROUP BY 1)
        SELECT t.doc_id, t.n_tokens,
               coalesce(nw.n_windows, 0) AS n_windows,
               coalesce(nd.n_dup_windows, 0) AS n_dup_windows,
               coalesce(per.n_dup_spans, 0) AS n_dup_spans,
               coalesce(per.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
               round(CAST(coalesce(per.dup_tokens, 0) AS DOUBLE)
                 / t.n_tokens, 6) AS dup_frac
        FROM tok t
        LEFT JOIN nw ON nw.doc_id = t.doc_id
        LEFT JOIN nd ON nd.doc_id = t.doc_id
        LEFT JOIN per ON per.doc_id = t.doc_id
        ORDER BY t.doc_id""")),

    // D24 — ExactSubstr REMOVAL (d23's transform form): each duplicated
    // 8-token window keeps its global first occurrence — ownership is
    // min(doc_id·2^21 + pos), a partial-aggregable integer min, never a
    // corpus window sort — and positions covered only by non-owner
    // duplicates are cut, with owner coverage immune so the kept copy
    // survives overlapping dups. Docs reassemble IN-ROW from kept
    // tokens; the dedup'd text itself is hash-checked (the d13/d18
    // reassembly discipline), so the oracle proves byte-identical
    // output, not just matching counts. Spark's filter() lambda index
    // is 0-based, DuckDB's is 1-based — both sides test membership of
    // the same 1-based removal set.
    "d24_substring_dedup" -> Q(
      fn = (s, dir) =>
        DedupOps.substringDedup(t(s, dir, "documents"), "doc_id", "text", 8)
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, $toksSql AS toks,
                 CAST(len($toksSql) AS INT) AS n_tokens
          FROM documents),
        win AS (
          SELECT doc_id, i AS pos,
                 list_transform([array_to_string(toks[i:i+7], ' ')],
                   s -> $baseHashSql)[1] AS wh,
                 doc_id * 2097152 + i AS key
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 7)) AS i
                FROM tok WHERE len(toks) >= 8)),
        cnt AS (
          SELECT wh, min(key) AS mk FROM win
          GROUP BY wh HAVING count(*) >= 2),
        cov AS (
          SELECT doc_id, CAST(p AS INT) AS p,
                 max(CASE WHEN key = mk THEN 1 ELSE 0 END) AS ao
          FROM (SELECT w.doc_id, w.key, c.mk,
                       unnest(generate_series(w.pos, w.pos + 7)) AS p
                FROM win w JOIN cnt c ON c.wh = w.wh)
          GROUP BY 1, 2),
        rm AS (
          SELECT doc_id, list_sort(list(p)) AS rml
          FROM cov WHERE ao = 0 GROUP BY 1)
        SELECT t.doc_id, t.n_tokens,
               CAST(coalesce(len(rm.rml), 0) AS INT) AS n_removed,
               CAST(t.n_tokens - coalesce(len(rm.rml), 0) AS INT)
                 AS n_kept,
               coalesce(array_to_string(list_filter(t.toks, (x, i) ->
                 NOT list_contains(coalesce(rm.rml, []), i)), ' '), '')
                 AS text_dedup
        FROM tok t LEFT JOIN rm ON rm.doc_id = t.doc_id
        ORDER BY t.doc_id""")),

    // D26 — the ExactSubstr SERVE path, oracle-gated (VERDICT r14 item
    // 7): index the even half of the corpus (substrIndex's mergeable
    // (wh, cnt, minkey) summary), then flag AND dedup the odd half
    // against it in-query. The theorem the spec already pins —
    // spansAgainst(index(A), B) == spans(A ∪ B)↾B, ownership = the
    // union's min key — is here hash-checked through DuckDB: the oracle
    // replays d23's span construction and d24's removal over ALL
    // documents (the union) and restricts every statistic to the batch
    // half. The corpus text is never re-read on the Spark side — only
    // the batch text plus the three-long summary cross the serve path.
    "d26_substr_against" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
        val idx = DedupOps.substrIndex(corpus, "doc_id", "text", 8)
        val spans = DedupOps
          .substringSpansAgainst(idx, batch, "doc_id", "text", 8)
        val dedup = DedupOps
          .substringDedupAgainst(idx, batch, "doc_id", "text", 8)
          .select(col("doc_id"), col("n_removed"), col("n_kept"),
            col("text_dedup"))
        spans.join(dedup, Seq("doc_id")).orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, $toksSql AS toks,
                 CAST(len($toksSql) AS INT) AS n_tokens
          FROM documents),
        win AS (
          SELECT doc_id, i AS pos,
                 list_transform([array_to_string(toks[i:i+7], ' ')],
                   s -> $baseHashSql)[1] AS wh,
                 doc_id * 2097152 + i AS key
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 7)) AS i
                FROM tok WHERE len(toks) >= 8)),
        cnt AS (
          SELECT wh, min(key) AS mk FROM win
          GROUP BY wh HAVING count(*) >= 2),
        dup AS (
          SELECT w.doc_id, w.pos, w.key, c.mk
          FROM win w JOIN cnt c ON c.wh = w.wh),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > coalesce(max(pos + 7) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                      THEN 1 ELSE 0 END AS brk
          FROM dup WHERE doc_id % 2 = 1),
        grp AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
          FROM isl),
        spans AS (
          SELECT doc_id, g, min(pos) AS s, max(pos) + 7 AS e
          FROM grp GROUP BY 1, 2),
        per AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_dup_spans,
                 CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
          FROM spans GROUP BY 1),
        nw AS (SELECT doc_id, CAST(count(*) AS INT) AS n_windows
               FROM win WHERE doc_id % 2 = 1 GROUP BY 1),
        nd AS (SELECT doc_id, CAST(count(*) AS INT) AS n_dup_windows
               FROM dup WHERE doc_id % 2 = 1 GROUP BY 1),
        cov AS (
          SELECT doc_id, CAST(p AS INT) AS p,
                 max(CASE WHEN key = mk THEN 1 ELSE 0 END) AS ao
          FROM (SELECT d.doc_id, d.key, d.mk,
                       unnest(generate_series(d.pos, d.pos + 7)) AS p
                FROM dup d WHERE d.doc_id % 2 = 1)
          GROUP BY 1, 2),
        rm AS (
          SELECT doc_id, list_sort(list(p)) AS rml
          FROM cov WHERE ao = 0 GROUP BY 1)
        SELECT t.doc_id, t.n_tokens,
               coalesce(nw.n_windows, 0) AS n_windows,
               coalesce(nd.n_dup_windows, 0) AS n_dup_windows,
               coalesce(per.n_dup_spans, 0) AS n_dup_spans,
               coalesce(per.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
               round(CAST(coalesce(per.dup_tokens, 0) AS DOUBLE)
                 / t.n_tokens, 6) AS dup_frac,
               CAST(coalesce(len(rm.rml), 0) AS INT) AS n_removed,
               CAST(t.n_tokens - coalesce(len(rm.rml), 0) AS INT)
                 AS n_kept,
               coalesce(array_to_string(list_filter(t.toks, (x, i) ->
                 NOT list_contains(coalesce(rm.rml, []), i)), ' '), '')
                 AS text_dedup
        FROM tok t
        LEFT JOIN nw ON nw.doc_id = t.doc_id
        LEFT JOIN nd ON nd.doc_id = t.doc_id
        LEFT JOIN per ON per.doc_id = t.doc_id
        LEFT JOIN rm ON rm.doc_id = t.doc_id
        WHERE t.doc_id % 2 = 1
        ORDER BY t.doc_id""")),

    // D11 — character-level edit-distance verification of a blocked pair
    // set (the record-linkage refine step after LSH/sorted-neighborhood
    // blocking): Levenshtein distance + normalized similarity
    // 1 − dist/max(len) over id-adjacency pairs. Both engines implement
    // textbook Levenshtein over characters, so the distances (ints) and
    // the derived similarity (one division from int operands, rounded)
    // hash-match exactly. Never all-pairs: O(|a|·|b|) per pair is the
    // cost the blocking stage exists to bound.
    "d11_edit_distance" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = docs
          .select(col("doc_id").as("a"),
            explode(sequence(lit(1), lit(2))).as("d"))
          .select(col("a"), (col("a") + col("d")).as("b"))
        DedupOps.editDistanceVerify(pairs, docs, "doc_id", "text")
          .select(col("a"), col("b"), col("edit_dist"), col("similarity"))
          .orderBy(col("a"), col("b"))
      },
      oracle = Some("""
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(levenshtein(substr(x.text, 1, 2000),
                                substr(y.text, 1, 2000)) AS INT)
                 AS edit_dist,
               round(1.0 - CAST(levenshtein(substr(x.text, 1, 2000),
                                            substr(y.text, 1, 2000))
                                AS DOUBLE) /
                 greatest(length(substr(x.text, 1, 2000)),
                          length(substr(y.text, 1, 2000)), 1), 6)
                 AS similarity
        FROM documents x JOIN documents y
          ON y.doc_id BETWEEN x.doc_id + 1 AND x.doc_id + 2
        ORDER BY a, b""")),

    // T22 — per-row weighted sampling: keep probability = each doc's own
    // quality proxy (length/400, clamped) — better docs survive more
    // often, decided by the same salted per-myriad hash as t15, so the
    // keep set is deterministic and monotone in the weight.
    "t22_weighted_sample" -> Q(
      fn = (s, dir) =>
        graft.operators.SampleOps.weightedSample(
          t(s, dir, "documents"), "doc_id",
          weight = col("n_chars") / 400.0)
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id")),
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || '/wt')")
        s"""
        SELECT doc_id, n_chars
        FROM documents
        WHERE ($h60) % 10000 <
              CAST(floor(least(1.0, greatest(0.0, n_chars / 400.0))
                   * 10000) AS BIGINT)
        ORDER BY doc_id"""
      }),

    // T23 — deterministic negative sampling over the contiguous id
    // space: 4 contrastive partners per anchor, self-pairs impossible
    // by construction (offset drawn from [1, n-1]), every engine
    // re-derives the same pairs. n comes from the corpus itself via a
    // scalar count on both sides.
    "t23_negative_sample" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val n = docs.count()
        graft.operators.SampleOps.negativeSample(docs, "doc_id", 4, n)
          .orderBy(col("doc_id"), col("j"))
      },
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || ':' || j)")
        s"""
        SELECT doc_id, CAST(j AS INT) AS j,
               (doc_id + 1 + (($h60) % (cnt - 1))) % cnt AS neg_id
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0, 3)) AS j),
             (SELECT count(*) AS cnt FROM documents)
        ORDER BY doc_id, j"""
      }),

    // D15 — BOUNDED edit-distance verify: the banded O(k·n) Levenshtein
    // (is the pair within 40 edits?) instead of d11's full O(n²) DP —
    // at scale the refine stage's cost cap. Spark's threshold overload
    // reports -1 beyond the bound; the oracle computes the full
    // distance and applies the same convention.
    "d15_bounded_edit" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = docs
          .select(col("doc_id").as("a"),
            explode(sequence(lit(1), lit(2))).as("d"))
          .select(col("a"), (col("a") + col("d")).as("b"))
        DedupOps.editDistanceWithin(pairs, docs, "doc_id", "text",
          maxDist = 40)
          .select(col("a"), col("b"), col("edit_dist"), col("is_match"))
          .orderBy(col("a"), col("b"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(levenshtein(substr(x.text, 1, 2000),
                                  substr(y.text, 1, 2000)) AS INT) AS fd
          FROM documents x JOIN documents y
            ON y.doc_id BETWEEN x.doc_id + 1 AND x.doc_id + 2)
        SELECT a, b,
               CASE WHEN fd <= 40 THEN fd ELSE -1 END AS edit_dist,
               fd <= 40 AS is_match
        FROM d
        ORDER BY a, b""")),

    // T15 — mixture sampling: per-language keep rates decided by each
    // row's own id hash (per-myriad thresholds) — the pretraining-mix
    // operator; one group's kept set is invariant to the others' rates.
    "t15_mixture" -> Q(
      fn = (s, dir) =>
        graft.operators.SampleOps.mixtureSample(
          t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1,
            "zh" -> 0.05))
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id")),
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)",
          "md5(CAST(doc_id AS VARCHAR) || '/mix')")
        s"""
        SELECT doc_id, lang
        FROM documents
        WHERE ($h60) % 10000 <
              CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 5000
                        WHEN 'fr' THEN 2500 WHEN 'es' THEN 1000
                        WHEN 'zh' THEN 500 ELSE 0 END
        ORDER BY doc_id"""
      }),

    // T8 — vocabulary statistics: global top-20 tokens by frequency
    // (explode -> partial-agg count -> TakeOrdered; the profiling pass
    // that sizes tokenizer vocab / stopword lists).
    // T10 — deterministic stratified sampling + hash train/holdout split
    // (dataset curation): per-language 40-doc sample in md5-of-id order
    // (reproducible across engines/runs — rand() is neither), split by
    // 60-bit id hash mod 100. The sample rank compiles to a map-side
    // WindowGroupLimit; the split is a pure per-row column.
    "t10_sample_split" -> Q(
      fn = (s, dir) =>
        graft.operators.SampleOps
          .stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", n = 40)
          .select(col("doc_id"), col("lang"),
            graft.operators.SampleOps.hashSplit(col("doc_id"), 90).as("split"))
          .orderBy(col("doc_id")),
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)", "md5(CAST(doc_id AS VARCHAR))")
        s"""
        WITH ranked AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        SELECT doc_id, lang,
               CASE WHEN ($h60) % 100 < 90 THEN 'train' ELSE 'holdout' END AS split
        FROM ranked
        WHERE rn <= 40
        ORDER BY doc_id"""
      }),

    // T11 — greedy sequence packing (pretraining batch assembly): shard
    // by id hash, stream each shard in hash order, place each doc at its
    // cumulative offset, bin = floor(offset / maxLen) — the concat-then-
    // chunk packing, one running-sum window per shard.
    "t11_pack_sequences" -> Q(
      fn = (s, dir) => {
        val sharded = t(s, dir, "documents")
          .withColumn("shard",
            pmod(graft.operators.TextOps.baseHash60(
              col("doc_id").cast("string")), lit(8)))
        graft.operators.SampleOps
          .packSequences(sharded, "shard", "doc_id", "n_chars", maxLen = 2048)
          .select(col("doc_id"), col("shard"), col("shard_pos"), col("bin"))
          .orderBy(col("doc_id"))
      },
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)", "md5(CAST(doc_id AS VARCHAR))")
        s"""
        WITH sharded AS (
          SELECT doc_id, n_chars, ($h60) % 8 AS shard FROM documents),
        packed AS (
          SELECT doc_id, shard,
                 CAST(sum(n_chars) OVER (PARTITION BY shard
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   - n_chars AS BIGINT) AS shard_pos
          FROM sharded)
        SELECT doc_id, shard,shard_pos,
               CAST(floor(shard_pos / 2048.0) AS BIGINT) AS bin
        FROM packed
        ORDER BY doc_id"""
      }),

    "t8_vocab_topk" -> Q(
      fn = (s, dir) =>
        t(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      oracle = Some("""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20""")),

    // T28 — TF-IDF keyword extraction: each document's top-3 terms by
    // tf · ln((N+1)/(df+1)) — BM25's query-less sibling, the corpus-
    // grounded "what is this document about" signal (tag generation,
    // near-dup explanation, topic drift audits). The idf rounds to
    // 9 dp BEFORE the tf multiply so both engines agree bit-for-bit;
    // the top-3 rank filter compiles to WindowGroupLimit (map-side
    // pre-cut). df comes from the tf frame — already one row per
    // (doc, token) — so no second distinct pass over the corpus.
    "t28_tfidf_topk" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token"))
        tf.join(df, "token")
          .crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf") *
              round(log((col("n") + 1).cast("double") /
                (col("df") + 1).cast("double")), 9), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("token"), col("tf"),
            col("score"))
          .orderBy(col("doc_id"), col("rnk"))
      },
      bench = true,
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM documents),
        sc AS (
          SELECT tf.doc_id, tf.token, tf.tf,
                 round(tf.tf * round(ln(CAST(n + 1 AS DOUBLE) /
                   CAST(df.df + 1 AS DOUBLE)), 9), 6) AS score
          FROM tf JOIN df USING (token) CROSS JOIN nn),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, token) AS rnk
          FROM sc)
        SELECT doc_id, rnk, token, tf, score
        FROM r WHERE rnk <= 3
        ORDER BY doc_id, rnk""")),

    // T6 — content-defined chunking (Rabin-Karp rolling hash, 8-char
    // window, ~64-char expected chunks): boundaries depend only on local
    // content, so an edit reshifts only the chunks it touches — the CDC
    // dedup primitive for near-identical large documents.
    "t6_cdc_chunks" -> Q(
      fn = (s, dir) => {
        val (frame, md5s) = TextOps.cdcChunks(col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            (size(frame) - 1).as("n_chunks"),
            round(length(col("text")).cast("double") /
              greatest(size(frame) - 1, lit(1)), 6).as("mean_chunk_len"),
            array_min(md5s).as("min_chunk_md5"),
            element_at(frame, 2).as("first_boundary"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT doc_id, text, length(text) AS len,
            list_filter(
              list_transform(
                CASE WHEN length(text) >= 8
                     THEN generate_series(8, CAST(length(text) AS INT))
                     ELSE [] END,
                i -> CASE WHEN list_reduce(
                       list_transform(generate_series(i - 7, i),
                         j -> CAST(ord(substr(text, CAST(j AS INT), 1)) AS BIGINT)),
                       (acc, cx) -> (acc * 257 + cx) % 1000000007) % 64 = 0
                     THEN i END),
              p -> p IS NOT NULL) AS bpos
          FROM documents),
        f AS (
          SELECT doc_id, text, len,
            list_concat(list_concat([CAST(0 AS BIGINT)],
              list_transform(bpos, b -> CAST(b AS BIGINT))),
              CASE WHEN len(bpos) > 0 AND bpos[-1] = len
                   THEN [] ELSE [CAST(len AS BIGINT)] END) AS frame
          FROM h)
        SELECT doc_id,
               CAST(len(frame) - 1 AS INT) AS n_chunks,
               round(CAST(len AS DOUBLE) / greatest(len(frame) - 1, 1), 6)
                 AS mean_chunk_len,
               list_min(list_transform(generate_series(1, len(frame) - 1),
                 j -> md5(substr(text, CAST(frame[CAST(j AS INT)] + 1 AS INT),
                   CAST(frame[CAST(j AS INT) + 1] - frame[CAST(j AS INT)] AS INT)))))
                 AS min_chunk_md5,
               CAST(frame[2] AS INT) AS first_boundary
        FROM f
        ORDER BY doc_id"""),
      bench = true),

    // D5 — 16-bit SimHash per document over distinct tokens (bit votes from
    // md5-derived token hashes; same formula widens to 64-bit).
    "d5_simhash" -> Q(
      fn = (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.simhash16(array_distinct(TextOps.tokens(col("text"))))
              .as("simhash"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id, $simhashSql AS simhash
        FROM documents
        ORDER BY doc_id""")),

    // T41 — SimHash HAMMING-DISTANCE histogram over sorted-neighborhood
    // candidates: the calibration data behind a SimHash dedup
    // threshold — "hamming ≤ h means near-dup" is a policy, and this
    // emits the observed pair-count per distance so h is chosen from
    // the corpus's own separation, not folklore. The 16-bit simhash is
    // ITSELF the blocking key (numeric sort puts shared-high-bit
    // hashes adjacent), so the pair stream needs ZERO joins — hamming
    // is bit_count(xor(key_a, key_b)) as a pure projection, computed
    // by two independent engines. d19's distributed-exact blocking; a
    // G-row histogram with one broadcast total.
    "t41_simhash_hamming" -> Q(
      fn = (s, dir) => {
        val pairs = DedupOps.sortedNeighborPairs(
          t(s, dir, "documents"), "doc_id",
          TextOps.simhash16(array_distinct(TextOps.tokens(col("text")))),
          window = 3)
          .select(bit_count(col("key_a").bitwiseXOR(col("key_b")))
            .as("hamming"))
        val tot = pairs.agg(count(lit(1)).as("__t"))
        pairs.groupBy(col("hamming"))
          .agg(count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(tot))
          .select(col("hamming"), col("n_pairs"),
            round(col("n_pairs").cast("double") / col("__t").cast("double"),
              6).as("frac"))
          .orderBy(col("hamming"))
      },
      oracle = Some(s"""
        WITH r AS (
          SELECT doc_id, $simhashSql AS k,
                 row_number() OVER (ORDER BY $simhashSql, doc_id) AS rn
          FROM documents),
        p AS (
          SELECT bit_count(xor(a.k, b.k)) AS hamming
          FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2),
        t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM p)
        SELECT CAST(hamming AS INT) AS hamming,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(count(*) AS DOUBLE) / CAST(min(t.t) AS DOUBLE), 6)
                 AS frac
        FROM p CROSS JOIN t
        GROUP BY 1
        ORDER BY 1""")),

    // T18 — Unicode NFC normalization (native expression vs DuckDB's
    // nfc_normalize — two independent Unicode-conformant
    // implementations must agree byte for byte). The corpus is ASCII
    // (NFC already), so the query CONSTRUCTS the hard cases per row:
    // a decomposed suffix (e + U+0301 must compose to U+00E9), a
    // precomposed one (must pass through untouched), and a combining
    // char with no composition partner (must survive as-is). The md5
    // of the normalized result makes any byte difference a hash
    // mismatch; dedup keys of composed vs decomposed spellings must
    // collide after normalization (the operator's whole point).
    "t18_nfc_normalize" -> Q(
      fn = (s, dir) => {
        val norm = graft.operators.TextOps.nfcNormalize _
        t(s, dir, "documents")
          .select(col("doc_id"),
            md5(norm(concat(col("text"), lit("e"), lit("\u0301"))))
              .as("h_decomposed"),
            md5(norm(concat(col("text"), lit("\u00e9")))).as("h_precomposed"),
            md5(norm(concat(col("text"), lit("\u0301")))).as("h_orphan"),
            (md5(norm(concat(col("text"), lit("e"), lit("\u0301")))) ===
              md5(norm(concat(col("text"), lit("\u00e9")))))
              .as("spellings_collide"),
            length(norm(concat(col("text"), lit("e"), lit("\u0301"))))
              .as("len_nfc"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id,
               md5(nfc_normalize(text || 'e' || chr(769))) AS h_decomposed,
               md5(nfc_normalize(text || chr(233))) AS h_precomposed,
               md5(nfc_normalize(text || chr(769))) AS h_orphan,
               md5(nfc_normalize(text || 'e' || chr(769))) =
                 md5(nfc_normalize(text || chr(233))) AS spellings_collide,
               length(nfc_normalize(text || 'e' || chr(769))) AS len_nfc
        FROM documents
        ORDER BY doc_id""")),

    // T16 — TRAINED byte-pair encoding (t1's "BPE-ish" tokenization is a
    // fixed regex; this LEARNS the merge table from the corpus). The
    // Spark side trains on the (word, count) vocabulary table — one
    // corpus scan, then one tiny aggregation per merge round — and the
    // oracle unrolls the SAME get_stats/merge loop in SQL CTE rounds:
    // overlapping adjacent symbol pairs weighted by word count, argmax
    // with (count desc, pair asc) ties, literal leftmost replace to a
    // private-use merge char. Output: the merge table with each merge's
    // surface form recursively expanded, hash-checked per round.
    "t16_bpe_train" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val merges = graft.operators.TextOps.bpeTrain(
          t(s, dir, "documents"), "text", numMerges = 4)
        val surfaces = graft.operators.TextOps.bpeSurfaceForms(merges)
        merges.map { case (r, p, n) => (r, surfaces(r), n) }
          .toDF("rank", "token", "n")
          .orderBy(col("rank"))
      },
      oracle = Some(bpeTrainOracle(4))),

    // T17 — tokenize WITH the trained merges: corpus token frequencies
    // after 4 BPE rounds (the vocabulary histogram a tokenizer report
    // shows). Spark tokenizes per document map-side (literal replace
    // chain + surface expansion); the oracle counts symbol occurrences
    // over the merged vocabulary table weighted by word count — the same
    // totals by construction, so the top-20 hash-checks.
    "t17_bpe_tokens" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.TextOps.bpeTrain(docs, "text", 4)
        docs
          .select(explode(
            graft.operators.TextOps.bpeTokens(col("text"), merges))
            .as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc)
          .limit(20)
      },
      oracle = Some(bpeTokensOracle(4, 20))),

    // T33 — BPE fertility per source: subword tokens per whitespace
    // word under the t16-trained merge table — THE tokenizer-fit metric
    // (fertility near 1 = vocabulary matches the source; high fertility
    // = the source fragments, inflating sequence lengths and training
    // cost). Consumes the same corpus-global merges as t17; the oracle
    // re-derives each DISTINCT word's post-merge symbol length through
    // the same replace chain, then rolls up per source — so tokenizer
    // training AND its per-source consequence are both hash-checked.
    "t33_bpe_fertility" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.TextOps.bpeTrain(docs, "text", 4)
        docs
          .select(col("source"),
            size(graft.operators.TextOps.bpeTokens(col("text"), merges))
              .cast("long").as("nsub"),
            size(filter(split(col("text"), "\\s+"),
              w => length(w) > 0)).cast("long").as("nw"))
          .groupBy(col("source"))
          .agg(sum(col("nw")).as("n_words"),
            sum(col("nsub")).as("n_subwords"))
          .withColumn("fertility",
            round(col("n_subwords").cast("double") / col("n_words"), 6))
          .orderBy(col("source"))
      },
      bench = true,
      oracle = Some {
        val rounds = 4
        val folded = (1 to rounds).foldLeft("word") { (acc, r) =>
          s"replace($acc, (SELECT pair FROM m$r), chr(${0xE000 + r - 1}))"
        }
        s"""
        WITH ${bpeRoundsCte(rounds)},
        sw AS (
          SELECT source, word, count(*) AS cnt FROM (
            SELECT source,
                   unnest(string_split_regex(text, '\\s+')) AS word
            FROM documents) t
          WHERE length(word) > 0
          GROUP BY 1, 2),
        wm AS (
          SELECT word, CAST(length($folded) AS BIGINT) AS n_sub
          FROM (SELECT DISTINCT word FROM sw) t)
        SELECT sw.source,
               CAST(sum(sw.cnt) AS BIGINT) AS n_words,
               CAST(sum(sw.cnt * wm.n_sub) AS BIGINT) AS n_subwords,
               round(CAST(sum(sw.cnt * wm.n_sub) AS DOUBLE)
                 / sum(sw.cnt), 6) AS fertility
        FROM sw JOIN wm USING (word)
        GROUP BY 1
        ORDER BY sw.source"""
      }),

    // T19 — Okapi BM25 lexical top-k (k1=1.5, b=0.75, Lucene idf): the
    // keyword-retrieval half of hybrid search. The Spark plan filters the
    // exploded token stream to the query terms map-side (only matching
    // rows ever shuffle), broadcasts per-term df and the 1-row corpus
    // stats back in, and k-cuts with TakeOrdered. The oracle restates
    // the identical statistics pipeline; per-(doc, term) contributions
    // round at 9 dp into a decimal sum, so scores are order-independent
    // and the top-k cut agrees bit-for-bit. Terms mix df extremes
    // ('dup' df≈25 vs 'scan' df≈398 at sf0.01) so idf ordering is
    // actually exercised.
    "t19_bm25" -> Q(
      fn = (s, dir) =>
        SearchOps.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("dup", "vector", "scan"), k = 10)
          .orderBy(col("rank")),
      oracle = Some(bm25Oracle(Seq("dup", "vector", "scan"), 10)),
      bench = true),

    // T20 — BM25 served from a PERSISTED postings index: build writes
    // (term, doc, dl, tf) partitioned by pmod(xxhash64(term), 16), query
    // reads only the query terms' bucket partitions (pruned before IO —
    // SearchOpsSpec pins the PartitionFilters) and re-derives df from
    // the pruned read (exact: a term's postings all live in its bucket).
    // Same oracle construction as t19 — the index is a layout, not a
    // different algorithm.
    "t20_bm25_index" -> Q(
      fn = (s, dir) => {
        val path = freshTmpDir("t20_bm25_idx_") + "/index"
        SearchOps.bm25IndexWrite(
          t(s, dir, "documents"), "doc_id", "text", path, numBuckets = 16)
        SearchOps.bm25QueryIndex(
          s, path, Seq("dup", "key", "batch"), k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some(bm25Oracle(Seq("dup", "key", "batch"), 10))),

    // T24 — unigram LM quality score: mean token log-probability under
    // the corpus's own unigram distribution (the cheap LM filter that
    // catches rare/garbled-token docs before an expensive model sees
    // them). Token log-probs round to 6 dp and sum as exact DECIMAL so
    // the mean hashes identically on both engines; the token-count join
    // is unhinted (vocab broadcasts when small, shuffles when not).
    "t24_lm_score" -> Q(
      fn = (s, dir) =>
        TextOps.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents),
        cnt AS (
          SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cnt),
        lp AS (
          SELECT t.doc_id,
                 CAST(round(ln(CAST(c.cnt AS DOUBLE) /
                               CAST(n_total AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS lp
          FROM tok t JOIN cnt c USING (token) CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_tokens,
               round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
        FROM lp
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // T27 — interpolated bigram LM scoring (Jelinek-Mercer, λ=0.7):
    // t24's context-sensitive sibling — p(w2|w1) = λ·c(w1w2)/c(w1) +
    // (1−λ)·c(w2)/N under the corpus's own counts, mean log per doc.
    // Doc bigrams build IN-ROW (zip_with over two slices, no positional
    // self-join); the oracle has no slice-zip so it restates them as a
    // positional self-join. The complement weight is 1.0 − 0.7 in IEEE
    // doubles on BOTH sides — a "0.3" literal is a different double and
    // would hash-mismatch every row.
    "t27_bigram_lm" -> Q(
      fn = (s, dir) =>
        TextOps.bigramLogProb(t(s, dir, "documents"), "doc_id", "text",
          lambda = 0.7)
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, i, token
          FROM (SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents),
               LATERAL (SELECT unnest(ts) AS token,
                               generate_subscripts(ts, 1) AS i)),
        uni AS (
          SELECT token, count(*) AS c1 FROM tok GROUP BY token),
        tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM uni),
        bg AS (
          SELECT t1.doc_id, t1.token AS w1, t2.token AS w2
          FROM tok t1 JOIN tok t2
            ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1),
        bi AS (
          SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        lp AS (
          SELECT bg.doc_id,
                 CAST(round(ln(
                   0.7 * (CAST(bi.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE)) +
                   (1.0 - 0.7) * (CAST(u2.c1 AS DOUBLE) /
                                  CAST(n_total AS DOUBLE))), 6)
                   AS DECIMAL(18,6)) AS lp
          FROM bg
          JOIN bi ON bi.w1 = bg.w1 AND bi.w2 = bg.w2
          JOIN uni u1 ON u1.token = bg.w1
          JOIN uni u2 ON u2.token = bg.w2
          CROSS JOIN tot),
        sc AS (
          SELECT doc_id, count(*) AS n_bigrams,
                 round(CAST(sum(lp) AS DOUBLE) / count(*), 6)
                   AS avg_logprob
          FROM lp GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(sc.n_bigrams, 0) AS n_bigrams,
               sc.avg_logprob
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // T39 — interpolated KNESER-NEY bigram scoring (D = 3/4): t27's
    // production-grade sibling — the backoff weight is earned per
    // history (D·N₁₊(w₁·)/c(w₁)) and the backoff distribution is the
    // CONTINUATION count N₁₊(·w₂)/B, not raw frequency, so
    // frequent-but-predictable tokens stop leaking probability into
    // new contexts. Both probability terms are BIGINT-ratio doubles
    // (one division each: (4c₂−3)/(4c₁) and 3·N₁₊N₁₊/(4c₁B)), added
    // once, ln'd, rounded — no float-summation order anywhere before
    // the decimal per-doc mean.
    "t39_kn_bigram" -> Q(
      fn = (s, dir) =>
        TextOps.knBigramLogProb(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, i, token
          FROM (SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents),
               LATERAL (SELECT unnest(ts) AS token,
                               generate_subscripts(ts, 1) AS i)),
        uni AS (
          SELECT token, count(*) AS c1 FROM tok GROUP BY token),
        bg AS (
          SELECT t1.doc_id, t1.token AS w1, t2.token AS w2
          FROM tok t1 JOIN tok t2
            ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1),
        bi AS (
          SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        c1s AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1w
                FROM bi GROUP BY w1),
        c2s AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncw
                FROM bi GROUP BY w2),
        bt AS (SELECT CAST(count(*) AS BIGINT) AS b_types FROM bi),
        lp AS (
          SELECT bg.doc_id,
                 CAST(round(ln(
                   CAST(4 * bi.c2 - 3 AS DOUBLE)
                     / CAST(4 * u1.c1 AS DOUBLE) +
                   CAST(3 * c1s.n1w * c2s.ncw AS DOUBLE)
                     / CAST(4 * u1.c1 * bt.b_types AS DOUBLE)), 6)
                   AS DECIMAL(18,6)) AS lp
          FROM bg
          JOIN bi ON bi.w1 = bg.w1 AND bi.w2 = bg.w2
          JOIN uni u1 ON u1.token = bg.w1
          JOIN c1s ON c1s.w1 = bg.w1
          JOIN c2s ON c2s.w2 = bg.w2
          CROSS JOIN bt),
        sc AS (
          SELECT doc_id, count(*) AS n_bigrams,
                 round(CAST(sum(lp) AS DOUBLE) / count(*), 6)
                   AS avg_kn_logprob
          FROM lp GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(sc.n_bigrams, 0) AS n_bigrams,
               sc.avg_kn_logprob
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // T40 — RAKE keyword extraction (Rose et al. 2010): stopword-free
    // token runs are the candidate phrases; word score = deg/freq over
    // the doc's candidates, phrase score = Σ word scores, top-3 per
    // doc. The unsupervised "what is this document about" layer —
    // BM25 (t19) ranks docs for a query, this names the query-worthy
    // phrases. Everything partitions by doc (one islands window + two
    // doc-keyed groupBys); per-word terms round-9 then sum as exact
    // decimals so rank ties break identically in both engines.
    "t40_rake_keywords" -> Q(
      fn = (s, dir) =>
        TextOps.rakeKeywords(t(s, dir, "documents"), "doc_id", "text",
          stopwords, k = 3)
          .orderBy(col("doc_id"), col("rank")),
      bench = true,
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, i AS pos, token,
                 (token IN (${stopwords.map(w => s"'$w'").mkString(", ")})
                   OR token = '') AS brk
          FROM (SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents),
               LATERAL (SELECT unnest(ts) AS token,
                               generate_subscripts(ts, 1) AS i)),
        g AS (
          SELECT *, sum(CASE WHEN brk THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM tok),
        ph AS (
          SELECT doc_id, grp,
                 array_to_string(list(token ORDER BY pos), ' ') AS phrase,
                 CAST(count(*) AS BIGINT) AS plen
          FROM g WHERE NOT brk GROUP BY 1, 2),
        w AS (
          SELECT doc_id, grp, plen,
                 unnest(string_split(phrase, ' ')) AS word
          FROM ph),
        ws AS (
          SELECT doc_id, word, CAST(count(*) AS BIGINT) AS freq,
                 CAST(sum(plen) AS BIGINT) AS deg
          FROM w GROUP BY 1, 2),
        sc AS (
          SELECT w.doc_id, w.grp,
                 sum(CAST(round(CAST(ws.deg AS DOUBLE)
                   / CAST(ws.freq AS DOUBLE), 9) AS DECIMAL(28,9)))
                   AS gscore
          FROM w JOIN ws ON ws.doc_id = w.doc_id AND ws.word = w.word
          GROUP BY 1, 2),
        d AS (
          SELECT DISTINCT ph.doc_id, ph.phrase, ph.plen, sc.gscore
          FROM ph JOIN sc ON sc.doc_id = ph.doc_id AND sc.grp = ph.grp),
        r AS (
          SELECT doc_id, phrase, plen, gscore,
                 CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY gscore DESC, phrase) AS INT) AS rank
          FROM d)
        SELECT doc_id, rank, phrase, plen AS n_words,
               round(CAST(gscore AS DOUBLE), 6) AS score
        FROM r WHERE rank <= 3
        ORDER BY doc_id, rank""")),

    // T26 — in-engine trained quality classifier: full-batch logistic
    // regression (3 GD steps, lr=0.5) over two cheap scaled features
    // (chars/400, tokens/100), target lang='en', then every doc scored
    // by the trained model. The whole trajectory is deterministic
    // cross-engine: per-row gradient terms round to 9 dp and sum as
    // decimals, weights re-round to 9 dp each step (kmeansFit's
    // discipline applied to GD), so the oracle can replay training as
    // three unrolled CTE rounds and the final sigmoid scores hash-match
    // at 6 dp. One full scan per step, weights are O(features) driver
    // metadata — the Lloyd's shape.
    "t26_lr_quality" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val feats = Seq(
          col("n_chars") / 400.0,
          size(split(col("text"), " ")) / lit(100.0))
        val w = graft.operators.ClassifierOps.logisticFit(
          docs, feats, col("lang") === "en", iters = 3, lr = 0.5)
        docs.select(col("doc_id"),
          round(graft.operators.ClassifierOps.logisticScore(feats, w), 6)
            .as("score"))
          .withColumn("pred", col("score") >= 0.5)
          .orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some {
        def z(w: String) = s"1.0*${w}a + x1*${w}b + x2*${w}c"
        def err(w: String) = s"(1.0/(1.0+exp(-(${z(w)}))) - y)"
        def gradCte(g: String, w: String) =
          s"""$g AS (
             |  SELECT
             |    CAST(sum(CAST(round(${err(w)} * 1.0, 9) AS DECIMAL(38,9)))
             |         AS DOUBLE) / count(*) AS ga,
             |    CAST(sum(CAST(round(${err(w)} * x1, 9) AS DECIMAL(38,9)))
             |         AS DOUBLE) / count(*) AS gb,
             |    CAST(sum(CAST(round(${err(w)} * x2, 9) AS DECIMAL(38,9)))
             |         AS DOUBLE) / count(*) AS gc
             |  FROM f CROSS JOIN $w)""".stripMargin
        def stepCte(wNew: String, wOld: String, g: String) =
          s"""$wNew AS (
             |  SELECT round(${wOld}a - 0.5*ga, 9) AS ${wNew}a,
             |         round(${wOld}b - 0.5*gb, 9) AS ${wNew}b,
             |         round(${wOld}c - 0.5*gc, 9) AS ${wNew}c
             |  FROM $wOld CROSS JOIN $g)""".stripMargin
        s"""
        WITH f AS (
          SELECT doc_id,
                 CAST(n_chars AS DOUBLE) / 400.0 AS x1,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS x2,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents),
        w0 AS (SELECT 0.0 AS w0a, 0.0 AS w0b, 0.0 AS w0c),
        ${gradCte("g1", "w0")},
        ${stepCte("w1", "w0", "g1")},
        ${gradCte("g2", "w1")},
        ${stepCte("w2", "w1", "g2")},
        ${gradCte("g3", "w2")},
        ${stepCte("w3", "w2", "g3")}
        SELECT doc_id,
               round(1.0/(1.0+exp(-(${z("w3")}))), 6) AS score,
               round(1.0/(1.0+exp(-(${z("w3")}))), 6) >= 0.5 AS pred
        FROM f CROSS JOIN w3
        ORDER BY doc_id"""
      }),

    // C17 — calibration audit (reliability diagram + ECE) of the t26
    // classifier: BEFORE a score is used as a filter threshold, the
    // per-bin confidence-vs-accuracy gap says what p≥0.9 actually
    // buys. Training replays t26's three unrolled GD rounds verbatim;
    // scores (6 dp — exact as decimal) bin into 10 equal-width
    // buckets; conf/acc are one division each, the gap subtracts two
    // 6-dp values, ece folds round(n·gap, 6) decimals with one final
    // division. One ~10-group exchange + a broadcast 1-row total.
    "c17_calibration_ece" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val feats = Seq(
          col("n_chars") / 400.0,
          size(split(col("text"), " ")) / lit(100.0))
        val w = graft.operators.ClassifierOps.logisticFit(
          docs, feats, col("lang") === "en", iters = 3, lr = 0.5)
        val scored = docs.select(
          round(graft.operators.ClassifierOps.logisticScore(feats, w), 6)
            .as("score"),
          (col("lang") === "en").as("y"))
        graft.operators.ClassifierOps.calibrationBins(
          scored, col("score"), col("y"), bins = 10)
      },
      bench = true,
      oracle = Some {
        def z(w: String) = s"1.0*${w}a + x1*${w}b + x2*${w}c"
        def err(w: String) = s"(1.0/(1.0+exp(-(${z(w)}))) - y)"
        def gradCte(g: String, w: String) =
          s"""$g AS (
             |  SELECT
             |    CAST(sum(CAST(round(${err(w)} * 1.0, 9) AS DECIMAL(38,9)))
             |         AS DOUBLE) / count(*) AS ga,
             |    CAST(sum(CAST(round(${err(w)} * x1, 9) AS DECIMAL(38,9)))
             |         AS DOUBLE) / count(*) AS gb,
             |    CAST(sum(CAST(round(${err(w)} * x2, 9) AS DECIMAL(38,9)))
             |         AS DOUBLE) / count(*) AS gc
             |  FROM f CROSS JOIN $w)""".stripMargin
        def stepCte(wNew: String, wOld: String, g: String) =
          s"""$wNew AS (
             |  SELECT round(${wOld}a - 0.5*ga, 9) AS ${wNew}a,
             |         round(${wOld}b - 0.5*gb, 9) AS ${wNew}b,
             |         round(${wOld}c - 0.5*gc, 9) AS ${wNew}c
             |  FROM $wOld CROSS JOIN $g)""".stripMargin
        s"""
        WITH f AS (
          SELECT doc_id,
                 CAST(n_chars AS DOUBLE) / 400.0 AS x1,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS x2,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents),
        w0 AS (SELECT 0.0 AS w0a, 0.0 AS w0b, 0.0 AS w0c),
        ${gradCte("g1", "w0")},
        ${stepCte("w1", "w0", "g1")},
        ${gradCte("g2", "w1")},
        ${stepCte("w2", "w1", "g2")},
        ${gradCte("g3", "w2")},
        ${stepCte("w3", "w2", "g3")},
        scored AS (
          SELECT round(1.0/(1.0+exp(-(${z("w3")}))), 6) AS score,
                 CAST(y AS BIGINT) AS yy
          FROM f CROSS JOIN w3),
        b AS (
          SELECT CAST(least(floor(score * 10.0), 9.0) AS INT) AS bin,
                 score, yy
          FROM scored),
        pb AS (
          SELECT bin, count(*) AS n,
                 round(CAST(sum(CAST(score AS DECIMAL(38,6))) AS DOUBLE)
                   / count(*), 6) AS conf,
                 round(CAST(sum(yy) AS DOUBLE) / count(*), 6) AS acc
          FROM b GROUP BY 1),
        pb2 AS (
          SELECT bin, n, conf, acc, round(abs(conf - acc), 6) AS gap
          FROM pb),
        tot AS (
          SELECT round(CAST(sum(CAST(round(gap * n, 6) AS DECIMAL(38,6)))
                   AS DOUBLE) / CAST(sum(n) AS DOUBLE), 9) AS ece
          FROM pb2)
        SELECT bin, n, conf, acc, gap, ece
        FROM pb2 CROSS JOIN tot
        ORDER BY bin"""
      }),

    // C18 — cross-slice contamination matrix: exact pairwise shingle-
    // set overlap (|A|, |B|, |A∩B|, Jaccard, containment) between the
    // corpus's language slices — the audit a pipeline runs before
    // mixing sources, and the slice-level train-vs-benchmark overlap
    // check; the exact ground truth the a44 KMV algebra estimates.
    // Shuffles md5 hashes only; empty-intersection pairs are omitted
    // on both sides; counts are BIGINT with one division per ratio.
    "c18_slice_overlap" -> Q(
      fn = (s, dir) =>
        TextOps.groupOverlap(t(s, dir, "documents"), "lang", "text", 3),
      bench = true,
      oracle = Some(s"""
        WITH s AS (
          SELECT DISTINCT lang AS g, md5(sh) AS h FROM (
            SELECT lang, unnest($sh3Sql) AS sh FROM documents)),
        z AS (SELECT g, count(*) AS sz FROM s GROUP BY 1),
        i AS (
          SELECT a.g AS group_a, b.g AS group_b, count(*) AS intersection
          FROM s a JOIN s b ON a.h = b.h AND a.g < b.g
          GROUP BY 1, 2)
        SELECT i.group_a, i.group_b,
               z1.sz AS size_a, z2.sz AS size_b, i.intersection,
               round(CAST(i.intersection AS DOUBLE) /
                 CAST(z1.sz + z2.sz - i.intersection AS DOUBLE), 6)
                 AS jaccard,
               round(CAST(i.intersection AS DOUBLE) /
                 CAST(least(z1.sz, z2.sz) AS DOUBLE), 6) AS containment
        FROM i JOIN z z1 ON z1.g = i.group_a
               JOIN z z2 ON z2.g = i.group_b
        ORDER BY i.group_a, i.group_b""")),

    // T36 — PII scrub (detect + redact): emails, IPv4s, long digit
    // runs counted per doc and replaced by typed tags, the scrubbed
    // TEXT itself hash-checked byte-identical (the d24 discipline).
    // The corpus is synthetic word salad, so the query INJECTS
    // deterministic spans in-engine first (every doc an email, every
    // 5th an IP, every 7th a card number — the identical construction
    // restated in SQL); patterns stay in the Java-regex ∩ RE2 subset
    // so both engines see the same matches. Pure in-row map work.
    "t36_pii_scrub" -> Q(
      fn = (s, dir) => {
        val aug = t(s, dir, "documents").select(col("doc_id"),
          concat(
            col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"),
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(lit(" from 10."),
                pmod(col("doc_id"), lit(256)).cast("string"),
                lit(".0.7"))).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(7)) === 0,
              lit(" card 4111111111111111")).otherwise(lit("")))
            .as("text"))
        TextOps.piiScrub(aug, "doc_id", "text").orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some(s"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com'
                   || CASE WHEN doc_id % 5 = 0 THEN
                        ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.0.7'
                      ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN
                        ' card 4111111111111111'
                      ELSE '' END AS text
          FROM documents),
        p AS (
          SELECT doc_id, text,
                 regexp_replace(text, '${TextOps.EmailRe}', '<EMAIL>',
                   'g') AS t1
          FROM aug),
        p2 AS (
          SELECT doc_id, text, t1,
                 regexp_replace(t1, '${TextOps.Ipv4Re}', '<IP>', 'g') AS t2
          FROM p)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '${TextOps.EmailRe}')) AS INT) AS n_email,
               CAST(len(regexp_extract_all(t1,
                 '${TextOps.Ipv4Re}')) AS INT) AS n_ip,
               CAST(len(regexp_extract_all(t2,
                 '${TextOps.LongNumRe}')) AS INT) AS n_num,
               regexp_replace(t2, '${TextOps.LongNumRe}', '<NUM>', 'g')
                 AS clean_text
        FROM p2 ORDER BY doc_id""")),

    // T37 — Gopher rule flags (Rae et al. 2021): the named-threshold
    // quality heuristics as per-rule booleans + the conjunction, so a
    // curation report can attribute every drop to the rule that fired
    // (t3's composite score says HOW good; this says WHY dropped).
    // Integer counts, one rounded division per ratio, all in-row.
    "t37_gopher_rules" -> Q(
      fn = (s, dir) =>
        TextOps.gopherRules(t(s, dir, "documents"), "doc_id", "text",
          stopwords).orderBy(col("doc_id")),
      bench = true,
      oracle = Some(s"""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                   x -> len(x) > 0)) AS INT) AS n_words,
                 len(regexp_replace(text, '[ \n]', '', 'g')) AS n_wchars,
                 len(text) - len(replace(text, '#', '')) AS n_hash,
                 (len(text) - len(replace(text, '...', ''))) // 3 AS n_ell,
                 len(list_filter(string_split(text, chr(10)),
                   l -> l LIKE '-%' OR l LIKE '*%')) AS n_bullet,
                 len(string_split(text, chr(10))) AS n_lines,
                 CAST(len(list_filter(string_split(text, ' '),
                   x -> x IN (${stopwords.map(w => s"'$w'")
                     .mkString(", ")}))) AS INT) AS stop_hits
          FROM documents),
        r AS (
          SELECT doc_id, n_words,
                 round(CAST(n_wchars AS DOUBLE)
                   / greatest(n_words, 1), 6) AS mean_word_len,
                 round(CAST(n_hash + n_ell AS DOUBLE)
                   / greatest(n_words, 1), 6) AS symbol_ratio,
                 round(CAST(n_bullet AS DOUBLE) / n_lines, 6)
                   AS bullet_frac,
                 stop_hits
          FROM w)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
               stop_hits,
               n_words BETWEEN 50 AND 100000 AS r_words,
               mean_word_len BETWEEN 3.0 AND 10.0 AS r_mean_len,
               symbol_ratio <= 0.1 AS r_symbol,
               bullet_frac <= 0.9 AS r_bullet,
               stop_hits >= 2 AS r_stop,
               (n_words BETWEEN 50 AND 100000)
                 AND (mean_word_len BETWEEN 3.0 AND 10.0)
                 AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
                 AND stop_hits >= 2 AS keep
        FROM r ORDER BY doc_id""")),

    // C19 — mixture PLAN report (the sizing step BEFORE c15's audit):
    // target language fractions + a 1M-token budget → per-lang token
    // mass, required tokens, sampling rate, implied EPOCHS (rate > 1 =
    // the source must repeat — the data-constrained regime made
    // visible before committing to a mix). BIGINT token sums, one
    // rounded division for the rate, epochs ceils the ROUNDED rate so
    // the integer can't flip on a last-ulp disagreement.
    "c19_mix_plan" -> Q(
      fn = (s, dir) => {
        val words = filter(split(col("text"), " "), w => length(w) > 0)
        graft.operators.SampleOps.mixtureReport(
          t(s, dir, "documents"), "lang", size(words),
          Seq("de" -> 0.15, "en" -> 0.5, "es" -> 0.05, "fr" -> 0.1,
            "zh" -> 0.2),
          budget = 1000000L)
      },
      bench = true,
      oracle = Some("""
        WITH tok AS (
          SELECT lang,
                 CAST(sum(len(list_filter(string_split(text, ' '),
                   x -> len(x) > 0))) AS BIGINT) AS tokens
          FROM documents GROUP BY 1),
        t AS (SELECT * FROM (VALUES
                ('de', CAST(0.15 AS DOUBLE)), ('en', CAST(0.5 AS DOUBLE)),
                ('es', CAST(0.05 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
                ('zh', CAST(0.2 AS DOUBLE))) AS v(lang, target_frac)),
        p AS (
          SELECT tok.lang, tok.tokens, t.target_frac,
                 CAST(round(t.target_frac * 1000000.0, 0) AS BIGINT)
                   AS required_tokens
          FROM tok JOIN t USING (lang)),
        r AS (
          SELECT lang, tokens, target_frac, required_tokens,
                 round(CAST(required_tokens AS DOUBLE)
                   / CAST(tokens AS DOUBLE), 6) AS rate
          FROM p)
        SELECT lang, tokens, target_frac, required_tokens, rate,
               CAST(ceil(rate) AS INT) AS epochs
        FROM r ORDER BY lang""")),

    // C20 — language-ID CONFUSION MATRIX: t2's marker classifier
    // evaluated against the labeled lang column — per (true, predicted)
    // cell count, row fraction within the true language, hit flag, and
    // overall accuracy (one division, broadcast back). Completes the
    // classifier-eval layer (c17 calibration, v37 ranking, c20
    // confusion); on this corpus it exposes exactly what an audit
    // should — the marker profile covers en but not de/es/fr/zh, so
    // those rows concentrate off-diagonal. Two tiny groupBys over
    // G×G cells; the corpus-scale stage is the one scoring scan.
    "c20_lang_confusion" -> Q(
      fn = (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val (_, pred) = TextOps.langScores(toks, markers)
        val cells = t(s, dir, "documents")
          .select(col("lang"), pred.as("pred_lang"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("__t"))
        val acc = cells.agg(
          round(sum(when(col("lang") === col("pred_lang"), col("n"))
              .otherwise(0L)).cast("double") /
            sum(col("n")).cast("double"), 6).as("accuracy"))
        cells.join(broadcast(totals), "lang")
          .select(col("lang"), col("pred_lang"), col("n"),
            round(col("n").cast("double") / col("__t").cast("double"), 6)
              .as("row_frac"),
            (col("lang") === col("pred_lang")).as("hit"))
          .crossJoin(broadcast(acc))
          .orderBy(col("lang"), col("pred_lang"))
      },
      bench = true,
      oracle = Some {
        val sc = markers.map { case (l, ws) => s"${markerSql(ws)} AS s_$l" }
        val best =
          s"greatest(${markers.map(m => s"s_${m._1}").mkString(", ")})"
        val cases = markers.map { case (l, _) =>
          s"WHEN s_$l = __best AND __best > 0 THEN '$l'"
        }.mkString(" ")
        s"""
        WITH scored AS (
          SELECT doc_id, lang, ${sc.mkString(", ")} FROM documents),
        wb AS (SELECT *, $best AS __best FROM scored),
        p AS (SELECT lang, CASE $cases ELSE 'und' END AS pred_lang
              FROM wb),
        cells AS (
          SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
        tot AS (
          SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1),
        acc AS (
          SELECT round(CAST(sum(CASE WHEN lang = pred_lang THEN n
                   ELSE 0 END) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
                   AS accuracy
          FROM cells)
        SELECT c.lang, c.pred_lang, c.n,
               round(CAST(c.n AS DOUBLE) / t.t, 6) AS row_frac,
               c.lang = c.pred_lang AS hit,
               acc.accuracy
        FROM cells c JOIN tot t USING (lang) CROSS JOIN acc
        ORDER BY c.lang, c.pred_lang"""
      }),

    // C21 — Cohen's KAPPA between the marker classifier and the labeled
    // lang column: chance-corrected agreement, the number c20's raw
    // accuracy overstates whenever the label distribution is skewed
    // (a constant-majority classifier scores high accuracy but κ ≈ 0).
    // Everything assembles in BIGINT from c20's G×G cell counts —
    // κ = (N·agree − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k) is ONE
    // division of exact integers, so the hash can't wobble. The margins
    // and their product-sum are label-count-sized aggregates; the only
    // corpus-scale stage is the same single scoring scan c20 runs.
    // (BIGINT margins hold to ~3·10⁹ docs per label; past that the
    // product-sum should assemble in DECIMAL(38,0).)
    "c21_kappa" -> Q(
      fn = (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val (_, pred) = TextOps.langScores(toks, markers)
        val cells = t(s, dir, "documents")
          .select(col("lang"), pred.as("pred_lang"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
        val rowT = cells.groupBy(col("lang")).agg(sum(col("n")).as("rt"))
        val colT = cells.groupBy(col("pred_lang")).agg(sum(col("n")).as("ct"))
        val peNum = rowT
          .join(colT, rowT("lang") === colT("pred_lang"))
          .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).as("pe_num"))
        cells
          .agg(sum(col("n")).as("n_total"),
            sum(when(col("lang") === col("pred_lang"), col("n"))
              .otherwise(0L)).as("n_agree"))
          .crossJoin(broadcast(peNum))
          .select(col("n_total"), col("n_agree"), col("pe_num"),
            round(col("n_agree").cast("double") /
              col("n_total").cast("double"), 6).as("po"),
            round(col("pe_num").cast("double") /
              (col("n_total") * col("n_total")).cast("double"), 6).as("pe"),
            round((col("n_total") * col("n_agree") - col("pe_num"))
                .cast("double") /
              (col("n_total") * col("n_total") - col("pe_num"))
                .cast("double"), 9).as("kappa"))
      },
      oracle = Some {
        val sc = markers.map { case (l, ws) => s"${markerSql(ws)} AS s_$l" }
        val best =
          s"greatest(${markers.map(m => s"s_${m._1}").mkString(", ")})"
        val cases = markers.map { case (l, _) =>
          s"WHEN s_$l = __best AND __best > 0 THEN '$l'"
        }.mkString(" ")
        s"""
        WITH scored AS (
          SELECT doc_id, lang, ${sc.mkString(", ")} FROM documents),
        wb AS (SELECT *, $best AS __best FROM scored),
        p AS (SELECT lang, CASE $cases ELSE 'und' END AS pred_lang
              FROM wb),
        cells AS (
          SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
        rt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rt
               FROM cells GROUP BY 1),
        ct AS (SELECT pred_lang, CAST(sum(n) AS BIGINT) AS ct
               FROM cells GROUP BY 1),
        pe AS (SELECT CAST(coalesce(sum(rt.rt * ct.ct), 0) AS BIGINT)
                 AS pe_num
               FROM rt JOIN ct ON ct.pred_lang = rt.lang),
        b AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                     CAST(sum(CASE WHEN lang = pred_lang THEN n
                       ELSE 0 END) AS BIGINT) AS n_agree
              FROM cells)
        SELECT n_total, n_agree, pe_num,
               round(CAST(n_agree AS DOUBLE)
                 / CAST(n_total AS DOUBLE), 6) AS po,
               round(CAST(pe_num AS DOUBLE)
                 / CAST(n_total * n_total AS DOUBLE), 6) AS pe,
               round(CAST(n_total * n_agree - pe_num AS DOUBLE)
                 / CAST(n_total * n_total - pe_num AS DOUBLE), 9) AS kappa
        FROM b CROSS JOIN pe"""
      }),

    // C22 — per-source language DIVERSITY: Shannon entropy (nats) and
    // Simpson index of each source's language distribution — the
    // concentration summary that flags a "multilingual" feed that is
    // 98% one language. Shannon follows c5's decimal discipline (each
    // −p·ln p term rounds to 9 dp then sums as exact DECIMAL, so the
    // aggregation order can't move the hash); Simpson assembles wholly
    // in BIGINT — 1 − Σn²/N² is ONE division. Two tiny groupBys over
    // source×lang cells; the corpus never shuffles.
    "c22_diversity" -> Q(
      fn = (s, dir) => {
        val cells = t(s, dir, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy(col("source")).agg(
          sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          sum(col("n") * col("n")).as("sum_sq"))
        val terms = cells
          .join(broadcast(totals.select(col("source"), col("n_docs"))),
            "source")
          .select(col("source"),
            round((col("n").cast("double") / col("n_docs").cast("double")) *
              log(col("n").cast("double") / col("n_docs").cast("double")), 9)
              .cast("decimal(28,9)").as("term"))
          .groupBy(col("source"))
          .agg(sum(col("term")).as("nsum"))
        totals.join(terms, "source")
          .select(col("source"), col("n_docs"), col("n_langs"),
            round(-col("nsum").cast("double"), 6).as("shannon"),
            round((col("n_docs") * col("n_docs") - col("sum_sq"))
                .cast("double") /
              (col("n_docs") * col("n_docs")).cast("double"), 6)
              .as("simpson"))
          .orderBy(col("source"))
      },
      oracle = Some("""
        WITH cells AS (
          SELECT source, lang, count(*) AS n
          FROM documents GROUP BY 1, 2),
        tot AS (
          SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_langs,
                 CAST(sum(n * n) AS BIGINT) AS sum_sq
          FROM cells GROUP BY 1),
        terms AS (
          SELECT c.source,
                 CAST(round(
                   (CAST(c.n AS DOUBLE) / CAST(t.n_docs AS DOUBLE)) *
                   ln(CAST(c.n AS DOUBLE) / CAST(t.n_docs AS DOUBLE)), 9)
                   AS DECIMAL(28,9)) AS term
          FROM cells c JOIN tot t USING (source)),
        agg AS (
          SELECT source, sum(term) AS nsum FROM terms GROUP BY 1)
        SELECT t.source, t.n_docs, t.n_langs,
               round(-CAST(a.nsum AS DOUBLE), 6) AS shannon,
               round(CAST(t.n_docs * t.n_docs - t.sum_sq AS DOUBLE)
                 / CAST(t.n_docs * t.n_docs AS DOUBLE), 6) AS simpson
        FROM tot t JOIN agg a USING (source)
        ORDER BY source""")),

    // C23 — QUANTILE NORMALIZATION of a per-doc statistic across
    // sources: each doc's n_chars maps to the POOLED distribution's
    // value at the same within-source quantile (type-1 inverse-CDF:
    // idx = ⌈r·N/nₛ⌉), so every source ends up with an identical
    // normalized distribution — the batch-effect correction that makes
    // length/quality cutoffs comparable across feeds with different
    // scrapers. Entirely INTEGER: ranks, the ceiling index, and the
    // looked-up pooled value — no interpolation, no float midpoints
    // anywhere (the convention the resample-interp midpoint bug
    // taught). The pooled ranks come from globalRowNumber's two-pass
    // partition-offset construction — the corpus-sized frame never
    // collapses to one partition; its only global stage is a
    // parts-sized metadata prefix sum.
    "c23_quantile_normalize" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val pooled = graft.operators.TimeSeriesOps.globalRowNumber(
          docs, Seq(col("n_chars"), col("doc_id")))
          .select(col("rn").as("idx"), col("n_chars").as("norm_chars"))
        val wS = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val nPool = docs.agg(count(lit(1)).as("n_pool"))
        docs
          .withColumn("src_rn", row_number().over(wS).cast("long"))
          .withColumn("n_s",
            count(lit(1)).over(Window.partitionBy(col("source")))
              .cast("long"))
          .crossJoin(broadcast(nPool))
          .withColumn("idx",
            expr("(src_rn * n_pool + n_s - 1) div n_s"))
          .join(pooled, "idx")
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("src_rn"), col("norm_chars"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT n_chars,
                 row_number() OVER (ORDER BY n_chars, doc_id) AS pool_rn
          FROM documents),
        s AS (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS src_rn,
                 count(*) OVER (PARTITION BY source) AS n_s
          FROM documents),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM documents),
        tgt AS (
          SELECT s.doc_id, s.source, s.n_chars,
                 CAST(s.src_rn AS BIGINT) AS src_rn,
                 (s.src_rn * n.n_pool + s.n_s - 1) // s.n_s AS idx
          FROM s CROSS JOIN n)
        SELECT t.doc_id, t.source, t.n_chars, t.src_rn,
               p.n_chars AS norm_chars
        FROM tgt t JOIN p ON p.pool_rn = t.idx
        ORDER BY t.doc_id""")),

    // T38 — LEAKAGE-FREE train/holdout split: the split key is the
    // CONTENT hash (md5 of text), not the doc id, so exact duplicates
    // can never straddle the boundary — the eval-contamination channel
    // a random id split leaves open. The zero-violation property is
    // not asserted in a test but EMITTED (n_violations, a content
    // group seen on both sides — structurally 0) so the driver
    // hash-checks the guarantee itself. Per-row hash decision + one
    // md5-keyed audit groupBy; at 100 TB pair it with d14's store to
    // extend the same guarantee to near-duplicates.
    "t38_leakfree_split" -> Q(
      fn = (s, dir) => {
        val withSplit = t(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("__h"))
          .withColumn("split",
            graft.operators.SampleOps.hashSplit(col("__h"), 80))
        val viol = withSplit.groupBy(col("__h"))
          .agg(countDistinct(col("split")).as("__k"))
          .agg(sum(when(col("__k") > 1, 1L).otherwise(0L))
            .cast("bigint").as("n_violations"))
        withSplit.crossJoin(broadcast(viol))
          .select(col("doc_id"), col("split"), col("n_violations"))
          .orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)", "md5(md5(text))")
        s"""
        WITH sp AS (
          SELECT doc_id, md5(text) AS h,
                 CASE WHEN ($h60) % 100 < 80 THEN 'train'
                      ELSE 'holdout' END AS split
          FROM documents),
        viol AS (
          SELECT CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations
          FROM (SELECT h, count(DISTINCT split) AS k FROM sp GROUP BY h))
        SELECT doc_id, split, viol.n_violations
        FROM sp CROSS JOIN viol
        ORDER BY doc_id"""
      }),

    // T42 — GOOD–TURING frequency smoothing over TRIGRAM types (Gale
    // & Sampson's simple form, unsmoothed count-of-counts):
    // r* = (r+1)·N_{r+1}/N_r for r = 1..5, the adjusted probability
    // r*/N, and the unseen-mass estimate P₀ = N₁/N carried on every
    // row — the LM-eval smoothing baseline next to t24's add-k and
    // t39's Kneser–Ney. Trigrams, not unigrams, because GT lives on
    // the low-count tail (N₁, N₂, …) and this corpus's unigram
    // vocabulary is tiny-and-saturated — every word occurs thousands
    // of times, so the unigram N_{1..5} are all empty; the trigram
    // space has the genuine singleton tail the estimator exists for.
    // Everything assembles in BIGINT (type counts → count-of-counts →
    // the (r+1)·N_{r+1} numerator); each output is ONE division from
    // integer operands (p_gt divides r* by N — two IEEE steps on
    // identical operands, deterministic both engines). Plan: explode →
    // type groupBy on md5 hashes (map-side combined, never text) →
    // count-of-counts groupBy over ~dozens of rows → a tiny self-join
    // on r+1. Corpus-scale work is the type count; everything after
    // is O(distinct counts).
    "t42_good_turing" -> Q(
      fn = (s, dir) => {
        val words = t(s, dir, "documents")
          .select(explode(
            TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
          .select(md5(col("sh")).as("w"))
        val wc = words.groupBy(col("w")).agg(count(lit(1)).as("r"))
        // counts-of-counts: a handful of rows — localCheckpoint it and
        // derive BOTH the token total (sum r*n_r == count of the word
        // stream, exactly) and the r=1 mass from it, so the tokenize+
        // shingle scan runs ONCE instead of twice and the self-join/
        // filters read the checkpointed rows (r21, guide §2.4)
        val cc = wc.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
          .transform(graft.operators.Reuse.once)
        val tot = cc.agg(sum(col("r") * col("n_r")).as("n_tokens"))
        val n1 = cc.filter(col("r") === 1)
          .select(col("n_r").as("n_1"))
        cc.alias("a")
          .join(cc.alias("b"), col("b.r") === col("a.r") + 1, "left")
          .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
            coalesce(col("b.n_r"), lit(0L)).as("n_r1"))
          .filter(col("r") <= 5)
          .crossJoin(broadcast(tot))
          .crossJoin(broadcast(n1))
          .select(col("r"), col("n_r"),
            round(((col("r") + 1) * col("n_r1")).cast("double") /
              col("n_r").cast("double"), 9).as("r_star"),
            round(
              round(((col("r") + 1) * col("n_r1")).cast("double") /
                col("n_r").cast("double"), 9) /
                col("n_tokens").cast("double"), 12).as("p_gt"),
            col("n_tokens"),
            round(col("n_1").cast("double") /
              col("n_tokens").cast("double"), 9).as("p0_mass"))
          .orderBy(col("r"))
      },
      oracle = Some(s"""
        WITH w AS (SELECT md5(unnest($sh3Sql)) AS w FROM documents),
        wc AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM w GROUP BY 1),
        cc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
               FROM wc GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM w),
        n1 AS (SELECT n_r AS n_1 FROM cc WHERE r = 1)
        SELECT a.r, a.n_r,
               round(CAST((a.r + 1) * coalesce(b.n_r, 0) AS DOUBLE)
                 / CAST(a.n_r AS DOUBLE), 9) AS r_star,
               round(round(CAST((a.r + 1) * coalesce(b.n_r, 0) AS DOUBLE)
                 / CAST(a.n_r AS DOUBLE), 9)
                 / CAST(t.n_tokens AS DOUBLE), 12) AS p_gt,
               t.n_tokens,
               round(CAST(n1.n_1 AS DOUBLE)
                 / CAST(t.n_tokens AS DOUBLE), 9) AS p0_mass
        FROM cc a LEFT JOIN cc b ON b.r = a.r + 1
        CROSS JOIN tot t CROSS JOIN n1
        WHERE a.r <= 5
        ORDER BY a.r"""),
      bench = true),

    // C25 — HEAPS' LAW fit of vocabulary growth, V(N) ≈ k·N^β, over
    // trigram-shingle TYPES in doc_id ingest order: each distinct
    // shingle is owned by its FIRST document (min doc_id — the t25
    // first-owner rule), so V(d) is the running sum of newly-owned
    // types and N(d) the running shingle instances; β and ln k come
    // from the closed-form least squares on (ln N, ln V). The ln
    // terms round to 12 dp and fold as DECIMAL (order-free sums —
    // the c24/t30 discipline), and the regression chain is a fixed
    // double expression from those exact sums. β well below 1 says
    // the corpus keeps repeating itself; β near 1 says every new doc
    // brings new content — the growth number a crawl-vs-dedup budget
    // is planned against. Shuffles hashes only, never text.
    "c25_heaps_fit" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        // ONE tokenize+shingle+md5 pass (r21, was two — guide §2.4): the
        // per-doc hash array rides the row, so the shingle-instance count
        // ns is exactly its size (shingles() yields max(n_tok - 2, 0)
        // entries) and the owner aggregation explodes the same
        // localCheckpointed hash-only proxy.
        val withHs = docs.select(col("doc_id"),
          transform(TextOps.shingles(TextOps.tokens(col("text")), 3),
            sh => md5(sh)).as("hs"))
          .transform(graft.operators.Reuse.once)
        val perDoc = withHs.select(col("doc_id"),
          size(col("hs")).cast("long").as("ns"))
        val owners = withHs
          .select(explode(col("hs")).as("h"), col("doc_id"))
          .groupBy(col("h")).agg(min(col("doc_id")).as("d0"))
          .groupBy(col("d0")).agg(count(lit(1)).as("new_types"))
        // distributed-exact prefix sums (globalPrefixSum — the
        // globalRowNumber machinery): at corpus scale the V/N running
        // totals must NOT ride a partition-less window over every doc
        val pts = graft.operators.TimeSeriesOps.globalPrefixSum(
            perDoc
              .join(owners, col("doc_id") === col("d0"), "left")
              .select(col("doc_id"), col("ns"),
                coalesce(col("new_types"), lit(0L)).as("nt")),
            Seq(col("doc_id")), Seq("ns", "nt"))
          .select(col("doc_id"), col("ns_cum").as("cn"),
            col("nt_cum").as("cv"))
          .filter(col("cn") > 0 && col("cv") > 0)
          .select(
            round(log(col("cn").cast("double")), 12).as("x"),
            round(log(col("cv").cast("double")), 12).as("y"))
        val dec = (c: Column) => c.cast("decimal(28,12)")
        val s_ = pts.agg(
          count(lit(1)).as("n"),
          sum(dec(col("x"))).as("sx"),
          sum(dec(col("y"))).as("sy"),
          sum(dec(round(col("x") * col("x"), 12))).as("sxx"),
          sum(dec(round(col("x") * col("y"), 12))).as("sxy"))
        val nD = col("n").cast("double")
        val beta = (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (nD * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))
        s_.select(col("n").as("n_points"),
          round(beta, 6).as("beta"),
          round((col("sy").cast("double") -
            beta * col("sx").cast("double")) / nD, 6).as("ln_k"))
      },
      oracle = Some(s"""
        WITH sh AS (
          SELECT doc_id, md5(unnest($sh3Sql)) AS h FROM documents),
        per AS (
          SELECT doc_id,
                 CAST(greatest(len($toksSql) - 2, 0) AS BIGINT) AS ns
          FROM documents),
        own AS (
          SELECT d0, CAST(count(*) AS BIGINT) AS new_types FROM (
            SELECT h, min(doc_id) AS d0 FROM sh GROUP BY 1)
          GROUP BY 1),
        pts AS (
          SELECT round(ln(CAST(cn AS DOUBLE)), 12) AS x,
                 round(ln(CAST(cv AS DOUBLE)), 12) AS y
          FROM (
            SELECT p.doc_id,
                   CAST(sum(p.ns) OVER (ORDER BY p.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cn,
                   CAST(sum(coalesce(o.new_types, 0)) OVER (
                     ORDER BY p.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cv
            FROM per p LEFT JOIN own o ON o.d0 = p.doc_id)
          WHERE cn > 0 AND cv > 0),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(x AS DECIMAL(28,12))) AS sx,
                 sum(CAST(y AS DECIMAL(28,12))) AS sy,
                 sum(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS sxx,
                 sum(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS sxy
          FROM pts)
        SELECT n AS n_points,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                 AS beta,
               round((CAST(sy AS DOUBLE)
                   - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS ln_k
        FROM s"""),
      bench = true),

    // T47 — PADDING-WASTE SWEEP for batch packing: if sequences
    // batch in B equal-count LENGTH BUCKETS (each padded to its
    // bucket max), what fraction of the compute is padding, at
    // B ∈ {1, 2, 4, 8}? The training-batch planning number t11's
    // packer is deployed against — B=1 reads "pad everything to
    // global max" and the curve says what each extra bucket buys.
    // Ranks come from globalRowNumber (distributed-exact: range
    // partition + per-part offsets — NO corpus-sized single
    // partition, the c23 machinery); bucket index
    // floor((rn−1)·B/n) is pure integer arithmetic, and waste is
    // BIGINT sums with one final division per B.
    "t47_padding_waste" -> Q(
      fn = (s, dir) => {
        val lens = t(s, dir, "documents")
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("len"))
        val ranked = graft.operators.TimeSeriesOps.globalRowNumber(
          lens, Seq(col("len"), col("doc_id")))
        val tot = lens.agg(count(lit(1)).as("n"))
        val grid = ranked.crossJoin(broadcast(tot))
          .select(col("len"), col("rn"), col("n"),
            explode(array(lit(1L), lit(2L), lit(4L), lit(8L)))
              .as("n_buckets"))
          .withColumn("bucket",
            ((col("rn") - 1) * col("n_buckets") -
              pmod((col("rn") - 1) * col("n_buckets"), col("n"))) /
              col("n"))
        val perBucket = grid
          .groupBy(col("n_buckets"), col("bucket"))
          .agg(count(lit(1)).as("bn"), max(col("len")).as("bmax"),
            sum(col("len")).as("btok"))
        perBucket
          .groupBy(col("n_buckets"))
          .agg(sum(col("btok")).as("total_tokens"),
            sum(col("bn") * col("bmax")).as("padded_tokens"))
          .select(col("n_buckets"), col("total_tokens"),
            col("padded_tokens"),
            round((col("padded_tokens") - col("total_tokens"))
              .cast("double") / col("padded_tokens").cast("double"), 6)
              .as("waste"))
          .orderBy(col("n_buckets"))
      },
      oracle = Some(s"""
        WITH lens AS (
          SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS len
          FROM documents),
        ranked AS (
          SELECT len, CAST(row_number() OVER (ORDER BY len, doc_id)
                   AS BIGINT) AS rn
          FROM lens),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lens),
        grid AS (
          SELECT r.len, b.n_buckets,
                 ((r.rn - 1) * b.n_buckets) // t.n AS bucket
          FROM ranked r CROSS JOIN tot t
          CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS n_buckets) b),
        per AS (
          SELECT n_buckets, bucket, CAST(count(*) AS BIGINT) AS bn,
                 CAST(max(len) AS BIGINT) AS bmax,
                 CAST(sum(len) AS BIGINT) AS btok
          FROM grid GROUP BY 1, 2)
        SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
               CAST(sum(btok) AS BIGINT) AS total_tokens,
               CAST(sum(bn * bmax) AS BIGINT) AS padded_tokens,
               round(CAST(sum(bn * bmax) - sum(btok) AS DOUBLE)
                 / CAST(sum(bn * bmax) AS DOUBLE), 6) AS waste
        FROM per GROUP BY 1 ORDER BY n_buckets""")),

    // T45 — VOCABULARY COVERAGE CURVE: share of all token
    // occurrences covered by the top-k most frequent types, at
    // k ∈ {5, 10, 20, 40} — the tokenizer-budget planning number
    // (c11 fits the Zipf exponent; this reads the curve the budget
    // decision actually uses: "40 types cover 100%, 10 cover 27%").
    // Frequency ranks break ties by word for engine-exact ordering;
    // the cumulative sum runs over the vocabulary-sized frame (tiny
    // after the corpus groupBy); each share is one division from
    // BIGINT operands. The grid joins on min(k, vocab) so a k past
    // the vocabulary reads the full-coverage row, not a dropped one.
    "t45_vocab_coverage" -> Q(
      fn = (s, dir) => {
        val wc = t(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val wOrd = Window.orderBy(col("c").desc, col("w").asc)
        val cum = wc
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("cum", sum(col("c")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        val tot = wc.agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"))
        val grid = t(s, dir, "documents").limit(1)
          .select(explode(array(lit(5L), lit(10L), lit(20L), lit(40L)))
            .as("k"))
        grid.crossJoin(broadcast(tot))
          .join(cum, col("rn") === least(col("k"), col("vocab")))
          .select(col("k"), col("vocab"), col("n_tokens"),
            col("cum").as("covered_tokens"),
            round(col("cum").cast("double") /
              col("n_tokens").cast("double"), 6).as("coverage"))
          .orderBy(col("k"))
      },
      oracle = Some(s"""
        WITH wc AS (
          SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest($toksSql) AS w FROM documents)
          GROUP BY 1),
        cum AS (
          SELECT CAST(row_number() OVER (ORDER BY c DESC, w)
                   AS BIGINT) AS rn,
                 CAST(sum(c) OVER (ORDER BY c DESC, w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM wc),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS vocab
                FROM wc),
        grid AS (SELECT unnest([5, 10, 20, 40]) AS k)
        SELECT CAST(g.k AS BIGINT) AS k, t.vocab, t.n_tokens,
               c.cum AS covered_tokens,
               round(CAST(c.cum AS DOUBLE)
                 / CAST(t.n_tokens AS DOUBLE), 6) AS coverage
        FROM grid g CROSS JOIN tot t
        JOIN cum c ON c.rn = least(g.k, t.vocab)
        ORDER BY k""")),

    // T44 — WORD DISPERSION (Church–Gale burstiness): per word, the
    // variance/mean ratio of its per-document counts (docs where it
    // appears at all) plus document frequency — the classic
    // content-word vs function-word discriminator (a bursty word
    // concentrates in few docs; a function word spreads evenly).
    // Moments fold from BIGINT counts through the a51/a49 discipline
    // (exact integer sums → one double chain); the corpus-scale work
    // is one (word, doc) groupBy, everything after is
    // vocabulary-sized.
    "t44_word_dispersion" -> Q(
      fn = (s, dir) => {
        val wd = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy(col("w"), col("doc_id"))
          .agg(count(lit(1)).as("c"))
        wd.groupBy(col("w"))
          .agg(count(lit(1)).as("df"),
            sum(col("c")).as("s1"),
            sum(col("c") * col("c")).as("s2"))
          .filter(col("df") > 1)
          .select(col("w").as("word"), col("df"), col("s1").as("tf"),
            round(col("s1").cast("double") / col("df").cast("double"), 6)
              .as("mean_per_doc"),
            round(
              ((col("df").cast("double") * col("s2").cast("double") -
                col("s1").cast("double") * col("s1").cast("double")) /
                (col("df").cast("double") *
                  (col("df") - 1).cast("double"))) /
                (col("s1").cast("double") / col("df").cast("double")),
              6).as("dispersion"))
          .orderBy(col("word"))
      },
      bench = true,
      oracle = Some(s"""
        WITH wd AS (
          SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT doc_id, unnest($toksSql) AS w FROM documents)
          GROUP BY 1, 2),
        m AS (
          SELECT w AS word, CAST(count(*) AS BIGINT) AS df,
                 CAST(sum(c) AS BIGINT) AS s1,
                 CAST(sum(c * c) AS BIGINT) AS s2
          FROM wd GROUP BY 1)
        SELECT word, df, s1 AS tf,
               round(CAST(s1 AS DOUBLE) / CAST(df AS DOUBLE), 6)
                 AS mean_per_doc,
               round(((CAST(df AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 / (CAST(df AS DOUBLE) * CAST(df - 1 AS DOUBLE)))
                 / (CAST(s1 AS DOUBLE) / CAST(df AS DOUBLE)), 6)
                 AS dispersion
        FROM m WHERE df > 1
        ORDER BY word""")),

    // T49 — BLOCKLIST SCREEN (the C4-style badword filter): per doc,
    // blocklisted-token count, density, and the keep flag at the 5%
    // threshold — with the list kept as DATA (a broadcast-ready
    // in-plan array, not a regex) so a 100 TB run can swap lists
    // without recompiling, and the filter stays a pure in-row
    // higher-order function: zero shuffles, codegen size/filter.
    // Density is one division from integer operands.
    "t49_blocklist_filter" -> Q(
      fn = (s, dir) => {
        val blocklist = Seq("slow", "error", "big")
        val toks = TextOps.tokens(col("text"))
        val blocked = size(filter(toks,
          t => t.isInCollection(blocklist)))
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).as("n_tokens"),
            blocked.as("n_blocked"))
          .select(col("doc_id"), col("n_tokens"), col("n_blocked"),
            round(col("n_blocked").cast("double") /
              greatest(col("n_tokens"), lit(1)).cast("double"), 6)
              .as("blocked_ratio"))
          .withColumn("keep", col("blocked_ratio") < 0.05)
          .orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some(s"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len($toksSql) AS INT) AS n_tokens,
                 CAST(len(list_filter($toksSql,
                   t -> t IN ('slow', 'error', 'big'))) AS INT)
                   AS n_blocked
          FROM documents)
        SELECT doc_id, n_tokens, n_blocked,
               round(CAST(n_blocked AS DOUBLE)
                 / CAST(greatest(n_tokens, 1) AS DOUBLE), 6)
                 AS blocked_ratio,
               round(CAST(n_blocked AS DOUBLE)
                 / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) < 0.05
                 AS keep
        FROM d ORDER BY doc_id""")),

    // T48 — EFFECTIVE TOKEN MASS per source: total tokens vs the
    // tokens that survive exact dedup (c28's min-id keeper rule) —
    // "the feed claims 2M tokens but contributes 1.4M effective" is
    // the number a mixture plan (c19) should consume instead of raw
    // counts. One hash-cluster pass + one per-source rollup; BIGINT
    // until the final share division.
    "t48_effective_tokens" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("toks"),
            md5(col("text")).as("h"))
        val keepers = docs.groupBy(col("h"))
          .agg(min(col("doc_id")).as("keeper"))
        docs.join(keepers, "h")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("total_tokens"),
            sum(when(col("doc_id") === col("keeper"), col("toks"))
              .otherwise(0L)).as("effective_tokens"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            col("effective_tokens"),
            round(col("effective_tokens").cast("double") /
              col("total_tokens").cast("double"), 6)
              .as("effective_share"))
          .orderBy(col("source"))
      },
      oracle = Some(s"""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len($toksSql) AS BIGINT) AS toks,
                 md5(text) AS h
          FROM documents),
        k AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY 1)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN doc_id = keeper THEN toks ELSE 0 END)
                 AS BIGINT) AS effective_tokens,
               round(CAST(sum(CASE WHEN doc_id = keeper THEN toks
                   ELSE 0 END) AS DOUBLE)
                 / CAST(sum(toks) AS DOUBLE), 6) AS effective_share
        FROM d JOIN k USING (h)
        GROUP BY 1 ORDER BY source""")),

    // C28 — EXACT-DUP RATE BY SOURCE: share of each source's docs
    // whose md5(text) occurs ≥2 times corpus-wide, plus how many are
    // the cluster's FIRST copy (min doc_id — the keeper under d1's
    // rule) vs redundant — c14 prices the global savings, this names
    // WHICH FEEDS are recycling content. Hash-keyed shuffles only;
    // the per-source rollup partial-aggregates.
    // C29 — BOUNDED approximate mode per group: graft_mg_top1 (the
    // Misra–Gries top-1 aggregate the skew-profile observation rides,
    // ADVICE r16) against DuckDB's exact group-wise argmax. The derived
    // tag gives every language a ~2/3-share dominant value and a tail
    // spread over 97 values (< 1.1% each), so the MG guarantee — any
    // item above n/32 retained, estimates undercounting by at most
    // n/32 — makes the sketch's answer provably the EXACT mode; the
    // hash match is the end-to-end gate on the aggregate's update,
    // merge, and eval paths (merge exercised for real: the scan is
    // multi-partition). O(32) state per partial buffer vs mode()'s
    // per-distinct-value state — the 100 TB posture is the point.
    "c29_mg_mode" -> Q(
      fn = (s, dir) => {
        t(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            when(col("doc_id") % 3 < 2, lit("primary"))
              .otherwise(concat(lit("tail-"), col("doc_id") % 97))
              .as("tag"))
          .groupBy(col("lang"))
          .agg(expr("graft_mg_top1(tag, 32)").as("top_tag"),
            count(lit(1)).as("n_docs"))
          .orderBy(col("lang"))
      },
      oracle = Some("""
        WITH tags AS (
          SELECT lang,
                 CASE WHEN doc_id % 3 < 2 THEN 'primary'
                      ELSE 'tail-' || CAST(doc_id % 97 AS VARCHAR) END AS tag
          FROM documents),
        ranked AS (
          SELECT lang, tag, CAST(count(*) AS BIGINT) AS c,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY count(*) DESC, tag) AS rn
          FROM tags GROUP BY 1, 2)
        SELECT r.lang, r.tag AS top_tag, t.n_docs
        FROM ranked r
        JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
              FROM tags GROUP BY 1) t USING (lang)
        WHERE r.rn = 1
        ORDER BY lang""")),

    "c28_dup_by_source" -> Q(
      fn = (s, dir) => {
        val h = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
        val clusters = h.groupBy(col("h"))
          .agg(count(lit(1)).as("sz"), min(col("doc_id")).as("keeper"))
        h.join(clusters, "h")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_in_dup"),
            sum(when(col("sz") > 1 && col("doc_id") =!= col("keeper"),
              1L).otherwise(0L)).as("n_redundant"))
          .select(col("source"), col("n_docs"), col("n_in_dup"),
            col("n_redundant"),
            round(col("n_redundant").cast("double") /
              col("n_docs").cast("double"), 6).as("redundant_rate"))
          .orderBy(col("source"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT doc_id, source, md5(text) AS h FROM documents),
        cl AS (
          SELECT h, CAST(count(*) AS BIGINT) AS sz,
                 min(doc_id) AS keeper
          FROM h GROUP BY 1)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_in_dup,
               CAST(sum(CASE WHEN sz > 1 AND doc_id <> keeper
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_redundant,
               round(CAST(sum(CASE WHEN sz > 1 AND doc_id <> keeper
                   THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS redundant_rate
        FROM h JOIN cl USING (h)
        GROUP BY 1 ORDER BY source""")),

    // C26 — CONTAMINATION SCORECARD by source: d10/d12/d16 flag the
    // contaminated docs; this ranks the SOURCES — per source (bench
    // docs excluded from scoring), how many docs share ≥1 trigram
    // shingle with the benchmark set, the rate, and the mean distinct
    // hit shingles per doc. The number a curation pipeline acts on:
    // a source with 40% benchmark overlap gets dropped or re-crawled,
    // not filtered doc-by-doc. Same hashed-shingle shapes as d10 —
    // the shuffle carries integer hashes keyed by shingle then doc;
    // the benchmark side is the small broadcastable set. Ratios are
    // BIGINT-assembled, one division each.
    "c26_contamination_scorecard" -> Q(
      fn = (s, dir) => {
        val hashed = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.hashedShingles3(TextOps.tokens(col("text")))
              .as("hs"))
        val bench = hashed.filter(col("doc_id") % 50 === 0)
          .select(explode(col("hs")).as("sh")).distinct()
        val docsh = hashed.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), explode(col("hs")).as("sh"))
          .distinct()
        val hits = docsh.join(bench, "sh")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
        hashed.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), col("source"))
          .join(hits, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("hits").isNotNull, 1L).otherwise(0L))
              .as("n_contaminated"),
            sum(coalesce(col("hits"), lit(0L))).as("tot_hits"))
          .select(col("source"), col("n_docs"), col("n_contaminated"),
            round(col("n_contaminated").cast("double") /
              col("n_docs").cast("double"), 6).as("contamination_rate"),
            round(col("tot_hits").cast("double") /
              col("n_docs").cast("double"), 6).as("mean_hit_shingles"))
          .orderBy(col("source"))
      },
      bench = true,
      oracle = Some(s"""
        WITH $hashedCteSql,
        bench AS (
          SELECT DISTINCT unnest(hs) AS sh FROM hashed
          WHERE doc_id % 50 = 0),
        docsh AS (
          SELECT DISTINCT doc_id, unnest(hs) AS sh FROM hashed
          WHERE doc_id % 50 <> 0),
        hits AS (
          SELECT d.doc_id, CAST(count(*) AS BIGINT) AS hits
          FROM docsh d JOIN bench b ON b.sh = d.sh
          GROUP BY 1),
        scored AS (
          SELECT h.doc_id, doc.source, hits.hits
          FROM hashed h
          JOIN documents doc ON doc.doc_id = h.doc_id
          LEFT JOIN hits ON hits.doc_id = h.doc_id
          WHERE h.doc_id % 50 <> 0)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN hits IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_contaminated,
               round(CAST(sum(CASE WHEN hits IS NOT NULL THEN 1 ELSE 0
                 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                 AS contamination_rate,
               round(CAST(sum(coalesce(hits, 0)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_hit_shingles
        FROM scored GROUP BY 1 ORDER BY source""")),

    // T43 — per-document CHARACTER ENTROPY: Shannon entropy (nats)
    // over the doc's character distribution plus the /ln(distinct)
    // normalized form — the cheapest repetitive-garbage detector
    // (near-zero entropy = one char repeated; c22 measures diversity
    // across sources, this measures it INSIDE each doc). Char counts
    // are BIGINT; each term p·ln(p) is two IEEE steps from one
    // integer division, rounds to 12 dp and folds as DECIMAL per doc
    // (order-free), one final round. Everything partitions by doc_id
    // — the exchange carries (doc, char, count) rows bounded by
    // alphabet size, never text.
    "t43_char_entropy" -> Q(
      fn = (s, dir) => {
        val chars = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "") // Spark's limit=-1 keeps a trailing ""
        val cc = chars.groupBy(col("doc_id"), col("ch"))
          .agg(count(lit(1)).as("c"))
        val n = cc.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("k"))
        val p = col("c").cast("double") / col("n").cast("double")
        cc.join(n, "doc_id")
          .select(col("doc_id"), col("n"), col("k"),
            round(p * log(p), 12).cast("decimal(24,12)").as("term"))
          .groupBy(col("doc_id"), col("n"), col("k"))
          .agg(sum(col("term")).as("s"))
          .select(col("doc_id"), col("n").as("n_chars"),
            col("k").as("n_distinct"),
            round(-col("s").cast("double"), 6).as("entropy"),
            when(col("k") > 1,
              round(-col("s").cast("double") /
                log(col("k").cast("double")), 6))
              .otherwise(lit(0.0)).as("entropy_norm"))
          .orderBy(col("doc_id"))
      },
      bench = true,
      oracle = Some(charEntropyOracleSql)),

    // T46 — the SAME character-entropy screen as ONE in-row pass
    // ([[graft.operators.TextOps.charEntropy]] over the native
    // EntropyKit): zero shuffles — at 100 TB the quality screen is a
    // projection, not an alphabet×docs exchange. Hash-matched against
    // t43's oracle VERBATIM, which is the equivalence proof that the
    // codegen kit computes exactly the shuffled form (the
    // repetitionSignals discipline: same decimal term fold, same
    // rounding, behind the Generate barrier so the pass runs once).
    "t46_char_entropy_kit" -> Q(
      fn = (s, dir) =>
        TextOps.charEntropy(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      bench = true,
      oracle = Some(charEntropyOracleSql)),

    // D29 — LABEL PROPAGATION communities over the MinHash candidate
    // graph (deterministic LPA: adopt the most frequent neighbor
    // label, ties to the smallest; 3 sync rounds as one lazy
    // integer-only plan). The softer resolve next to d7's connected
    // components: CC merges anything touching, LPA keeps
    // weakly-bridged dup clusters apart when two real clusters share
    // one accidental candidate pair. The oracle replays all three
    // rounds as unrolled CTEs with the identical count-desc/label-asc
    // pick — no floats anywhere, so the trajectory is exact.
    "d29_label_propagation" -> Q(
      fn = (s, dir) => {
        val pairs = DedupOps.minhashCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 3, numPerm = 8, bands = 2)
          .select(col("a"), col("b"))
        DedupOps.labelPropagation(pairs, iters = 3)
          .orderBy(col("id"))
      },
      bench = true,
      oracle = Some({
        def roundCte(r: Int): String = {
          val prev = if (r == 1) "l0" else s"l${r - 1}"
          s"""
        l$r AS (
          SELECT id, label FROM (
            SELECT e.a AS id, l.label, count(*) AS cnt,
                   row_number() OVER (PARTITION BY e.a
                     ORDER BY count(*) DESC, l.label) AS rn
            FROM e JOIN $prev l ON l.id = e.b
            GROUP BY e.a, l.label)
          WHERE rn = 1)"""
        }
        s"""
        WITH $bandsSql,
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        e AS (SELECT a, b FROM pairs
              UNION ALL SELECT b AS a, a AS b FROM pairs),
        l0 AS (SELECT DISTINCT a AS id, a AS label FROM e),${roundCte(1)},${roundCte(2)},${roundCte(3)}
        SELECT id, label AS community FROM l3 ORDER BY id"""
      })),

    // D31 — LSH CANDIDATE PRECISION: d22 measures the banding
    // config's RECALL (which true near-dups the bands surface); this
    // measures its PRECISION — of the candidate pairs the bands
    // generate over the twin-injected corpus (d30's fixture), what
    // fraction are true near-dups at Jaccard ≥ 0.5? Together they
    // price a (bands, rows) choice on both axes before a 100 TB run.
    // Exact Jaccard computes ONLY on the candidate set (bounded by
    // banding — the whole point), via the d28 intersection shapes;
    // hash-only shuffles.
    "d31_lsh_precision" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val twins = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            array_join(expr(
              "slice(split(text, ' '), 1, " +
                "greatest(cast(floor(size(split(text, ' ')) * 3 / 5) " +
                "as int), 3))"), " ").as("text"))
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(twins)
        val cand = DedupOps.minhashCandidatePairs(
          corpus, "doc_id", "text", shingleK = 3, numPerm = 8, bands = 2)
          .select(col("a"), col("b"))
        // r21: hash-only shared set, localCheckpointed for its three
        // consumers (sz + both intersection join sides) — guide §2.4/§8
        val sets = corpus.select(col("doc_id"),
          explode(TextOps.shingles(TextOps.tokens(col("text")), 3))
            .as("sh"))
          .select(col("doc_id"), md5(col("sh")).as("h"))
          .distinct()
          .transform(graft.operators.Reuse.once)
        val sz = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val pz = cand
          .join(sz.select(col("doc_id").as("a"), col("sz").as("sza")),
            "a")
          .join(sz.select(col("doc_id").as("b"), col("sz").as("szb")),
            "b")
        val inter = cand
          .join(sets.select(col("doc_id").as("a"), col("h")), "a")
          .join(sets.select(col("doc_id").as("b"), col("h").as("h2")),
            "b")
          .filter(col("h") === col("h2"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("i"))
        pz.join(inter, Seq("a", "b"), "left")
          .select(round(coalesce(col("i"), lit(0L)).cast("double") /
            (col("sza") + col("szb") - coalesce(col("i"), lit(0L)))
              .cast("double"), 6).as("j"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("j") >= 0.5, 1L).otherwise(0L))
              .as("n_true_neardup"))
          .select(col("n_candidates"), col("n_true_neardup"),
            round(col("n_true_neardup").cast("double") /
              col("n_candidates").cast("double"), 6).as("precision"))
      },
      bench = true,
      oracle = Some(s"""
        WITH RECURSIVE corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 array_to_string((string_split(text, ' '))[1:greatest(
                   CAST(floor(len(string_split(text, ' ')) * 3 / 5)
                     AS INT), 3)], ' ') AS text
          FROM documents WHERE doc_id % 5 = 0),
        hashed AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(th) - 2),
                   __i -> ((th[__i] * 1000003 + th[__i+1]) % 1000000007
                     * 1000003 + th[__i+2]) % 1000000007) AS hs
          FROM (SELECT doc_id,
                       list_transform(string_split(text, ' '),
                         s -> $baseHashSql % 1000000007) AS th
                FROM corpus)),
        sigs AS (
          SELECT doc_id, list_transform(generate_series(0, 7),
            p -> list_min(list_transform(hs,
              x -> ((p * 2 + 3) * (x % 2147483647) + (p * 7 + 1))
                % 2147483647))) AS mh
          FROM hashed),
        bands AS (
          SELECT doc_id, 0 AS band_idx,
                 md5(array_to_string(list_transform(mh[1:4],
                   __v -> CAST(__v AS VARCHAR)), '')) AS band_key
          FROM sigs
          UNION ALL
          SELECT doc_id, 1 AS band_idx,
                 md5(array_to_string(list_transform(mh[5:8],
                   __v -> CAST(__v AS VARCHAR)), '')) AS band_key
          FROM sigs),
        cand AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
        sets AS (
          SELECT DISTINCT doc_id, md5(sh) AS h FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, len(string_split(text, ' ')) - 2),
                     i -> array_to_string(
                       (string_split(text, ' '))[i:i+2], ' '))) AS sh
            FROM corpus)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
               FROM sets GROUP BY 1),
        i AS (
          SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS i
          FROM cand c
          JOIN sets x ON x.doc_id = c.a
          JOIN sets y ON y.doc_id = c.b AND y.h = x.h
          GROUP BY 1, 2),
        j AS (
          SELECT round(CAST(coalesce(i.i, 0) AS DOUBLE)
                   / CAST(za.sz + zb.sz - coalesce(i.i, 0) AS DOUBLE),
                   6) AS j
          FROM cand c
          JOIN sz za ON za.doc_id = c.a
          JOIN sz zb ON zb.doc_id = c.b
          LEFT JOIN i ON i.a = c.a AND i.b = c.b)
        SELECT CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_true_neardup,
               round(CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS precision
        FROM j""")),

    // D30 — JACCARD THRESHOLD SWEEP: the survivor-count CDF over
    // blocked pairs at thresholds 0.1..0.9 — t41 calibrates the
    // SimHash hamming cut, this calibrates the Jaccard cut the
    // MinHash family (d2–d4, d22's S-curve) serves against: "how many
    // pairs would each threshold keep" as data, before committing a
    // 100 TB dedup run to one. The pair stream mixes the id-adjacent
    // background (near-zero J on this corpus) with deterministic
    // TRUNCATED TWINS for every 5th doc (first 3/5 of the tokens,
    // id-offset — the d22 injection recipe), so the sweep has real
    // mass in the mid deciles instead of reading vacuously zero.
    // Pair Jaccards compute once (the d28 shapes — hash-only
    // shuffles, blocked pairs); the sweep itself is a 9×11-row grid
    // join over the decile histogram, nothing pair-sized re-scans.
    "d30_jaccard_sweep" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        val twins = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            array_join(expr(
              "slice(split(text, ' '), 1, " +
                "greatest(cast(floor(size(split(text, ' ')) * 3 / 5) " +
                "as int), 3))"), " ").as("text"))
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(twins)
        // r21: hash-only shared set, localCheckpointed for its three
        // consumers (sz + both intersection join sides) — guide §2.4/§8
        val sets = corpus.select(col("doc_id"),
          explode(TextOps.shingles(TextOps.tokens(col("text")), 3))
            .as("sh"))
          .select(col("doc_id"), md5(col("sh")).as("h"))
          .distinct()
          .transform(graft.operators.Reuse.once)
        val sz = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val adj = docs
          .select(col("doc_id").as("a"),
            explode(sequence(lit(1), lit(2))).as("d"))
          .select(col("a"), (col("a") + col("d")).as("b"))
        val twinPairs = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id").as("a"),
            (col("doc_id") + lit(1000000L)).as("b"))
        val pairs = adj.unionByName(twinPairs)
          .join(sz.select(col("doc_id").as("a"), col("sz").as("sza")),
            "a")
          .join(sz.select(col("doc_id").as("b"), col("sz").as("szb")),
            "b")
        val inter = pairs
          .join(sets.select(col("doc_id").as("a"), col("h")), "a")
          .join(sets.select(col("doc_id").as("b"), col("h").as("h2")),
            "b")
          .filter(col("h") === col("h2"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("i"))
        val jacc = pairs.join(inter, Seq("a", "b"), "left")
          .select(round(coalesce(col("i"), lit(0L)).cast("double") /
            (col("sza") + col("szb") - coalesce(col("i"), lit(0L)))
              .cast("double"), 6).as("j"))
        val hist = jacc
          .groupBy(floor(col("j") * 10).cast("long").as("b"))
          .agg(count(lit(1)).as("c"))
        val tot = jacc.agg(count(lit(1)).as("n_total"))
        val grid = t(s, dir, "documents").limit(1)
          .select(explode(sequence(lit(1), lit(9))).as("t"))
        grid.join(hist, col("b") >= col("t"), "left")
          .groupBy(col("t"))
          .agg(sum(coalesce(col("c"), lit(0L))).as("n_above"))
          .crossJoin(broadcast(tot))
          .select(round(col("t").cast("double") / 10.0, 1)
            .as("threshold"),
            col("n_above"),
            round(col("n_above").cast("double") /
              col("n_total").cast("double"), 6).as("survivor_share"))
          .orderBy(col("threshold"))
      },
      bench = true,
      oracle = Some(s"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 array_to_string((string_split(text, ' '))[1:greatest(
                   CAST(floor(len(string_split(text, ' ')) * 3 / 5)
                     AS INT), 3)], ' ') AS text
          FROM documents WHERE doc_id % 5 = 0),
        sets AS (
          SELECT DISTINCT doc_id, md5(sh) AS h FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, len(string_split(text, ' ')) - 2),
                     i -> array_to_string(
                       (string_split(text, ' '))[i:i+2], ' '))) AS sh
            FROM corpus)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
               FROM sets GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS a, a.doc_id + d.d AS b
          FROM documents a,
               LATERAL (SELECT unnest(generate_series(1, 2)) AS d) d
          UNION ALL
          SELECT doc_id AS a, doc_id + 1000000 AS b
          FROM documents WHERE doc_id % 5 = 0),
        pz AS (
          SELECT p.a, p.b, za.sz AS sza, zb.sz AS szb
          FROM pairs p
          JOIN sz za ON za.doc_id = p.a
          JOIN sz zb ON zb.doc_id = p.b),
        i AS (
          SELECT p.a, p.b, CAST(count(*) AS BIGINT) AS i
          FROM pairs p
          JOIN sets x ON x.doc_id = p.a
          JOIN sets y ON y.doc_id = p.b AND y.h = x.h
          GROUP BY 1, 2),
        j AS (
          SELECT round(CAST(coalesce(i.i, 0) AS DOUBLE)
                   / CAST(p.sza + p.szb - coalesce(i.i, 0) AS DOUBLE), 6)
                   AS j
          FROM pz p LEFT JOIN i ON i.a = p.a AND i.b = p.b),
        hist AS (
          SELECT CAST(floor(j * 10) AS BIGINT) AS b,
                 CAST(count(*) AS BIGINT) AS c
          FROM j GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM j),
        grid AS (SELECT unnest(generate_series(1, 9)) AS t)
        SELECT round(CAST(g.t AS DOUBLE) / 10.0, 1) AS threshold,
               CAST(sum(coalesce(h.c, 0)) AS BIGINT) AS n_above,
               round(CAST(sum(coalesce(h.c, 0)) AS DOUBLE)
                 / CAST(max(tot.n_total) AS DOUBLE), 6)
                 AS survivor_share
        FROM grid g LEFT JOIN hist h ON h.b >= g.t CROSS JOIN tot
        GROUP BY g.t
        ORDER BY threshold""")),

    // D28 — pairwise CONTAINMENT over blocked candidate pairs: for
    // id-adjacent pairs (the d11 blocking shape), |A∩B| over distinct
    // trigram-shingle sets and BOTH asymmetric containments
    // |A∩B|/|A|, |A∩B|/|B| next to Jaccard — the quote/subset
    // detector Jaccard structurally misses (a short doc fully
    // contained in a long one has tiny Jaccard but containment 1.0;
    // Broder's containment measure). Zero-intersection pairs stay in
    // the output via a left join (a blocked pair with NO overlap is a
    // finding, not a dropped row). Shuffles md5 hashes keyed by doc,
    // intersections partial-aggregate per pair; pair count is bounded
    // by the blocking stage — never all-pairs.
    "d28_containment_pairs" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        // r21: the distinct (doc, hash) set feeds sz + both join sides of
        // the intersection — localCheckpoint the hash-only proxy once
        // instead of re-running tokenize+shingle+md5 per consumer
        // (guide §2.4/§8)
        val sets = docs.select(col("doc_id"),
          explode(TextOps.shingles(TextOps.tokens(col("text")), 3))
            .as("sh"))
          .select(col("doc_id"), md5(col("sh")).as("h"))
          .distinct()
          .transform(graft.operators.Reuse.once)
        val sz = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val pairs = docs
          .select(col("doc_id").as("a"),
            explode(sequence(lit(1), lit(2))).as("d"))
          .select(col("a"), (col("a") + col("d")).as("b"))
          .join(sz.select(col("doc_id").as("a"), col("sz").as("size_a")),
            "a")
          .join(sz.select(col("doc_id").as("b"), col("sz").as("size_b")),
            "b")
        val inter = pairs
          .join(sets.select(col("doc_id").as("a"), col("h")), "a")
          .join(sets.select(col("doc_id").as("b"), col("h").as("h2")),
            "b")
          .filter(col("h") === col("h2"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"))
        pairs
          .join(inter, Seq("a", "b"), "left")
          .select(col("a"), col("b"), col("size_a"), col("size_b"),
            coalesce(col("inter"), lit(0L)).as("intersection"))
          .withColumn("containment_a",
            round(col("intersection").cast("double") /
              col("size_a").cast("double"), 6))
          .withColumn("containment_b",
            round(col("intersection").cast("double") /
              col("size_b").cast("double"), 6))
          .withColumn("jaccard",
            round(col("intersection").cast("double") /
              (col("size_a") + col("size_b") - col("intersection"))
                .cast("double"), 6))
          .orderBy(col("a"), col("b"))
      },
      oracle = Some(s"""
        WITH sets AS (
          SELECT DISTINCT doc_id, md5(sh) AS h FROM (
            SELECT doc_id, unnest($sh3Sql) AS sh FROM documents)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
               FROM sets GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS a, a.doc_id + d.d AS b
          FROM documents a,
               LATERAL (SELECT unnest(generate_series(1, 2)) AS d) d),
        pz AS (
          SELECT p.a, p.b, za.sz AS size_a, zb.sz AS size_b
          FROM pairs p
          JOIN sz za ON za.doc_id = p.a
          JOIN sz zb ON zb.doc_id = p.b),
        i AS (
          SELECT p.a, p.b, CAST(count(*) AS BIGINT) AS intersection
          FROM pairs p
          JOIN sets x ON x.doc_id = p.a
          JOIN sets y ON y.doc_id = p.b AND y.h = x.h
          GROUP BY 1, 2)
        SELECT p.a, p.b, p.size_a, p.size_b,
               coalesce(i.intersection, 0) AS intersection,
               round(CAST(coalesce(i.intersection, 0) AS DOUBLE)
                 / CAST(p.size_a AS DOUBLE), 6) AS containment_a,
               round(CAST(coalesce(i.intersection, 0) AS DOUBLE)
                 / CAST(p.size_b AS DOUBLE), 6) AS containment_b,
               round(CAST(coalesce(i.intersection, 0) AS DOUBLE)
                 / CAST(p.size_a + p.size_b - coalesce(i.intersection, 0)
                        AS DOUBLE), 6) AS jaccard
        FROM pz p LEFT JOIN i ON i.a = p.a AND i.b = p.b
        ORDER BY p.a, p.b"""),
      bench = true),

    // C24 — split REPRESENTATIVENESS: PSI of the length distribution
    // between t38's holdout and train halves — t38 proves the split
    // LEAKS nothing, this proves the holdout still LOOKS like the
    // train set (a content-hash split is only valid for eval if it is
    // also distributionally neutral; PSI < 0.1 = representative). Same
    // ten 50-char bins, +1 Laplace smoothing, and one-division-
    // before-ln discipline as c13; the total PSI folds round-6
    // decimal terms so the headline number is order-free. Cost: one
    // scan into a 10-bin grid.
    "c24_split_psi" -> Q(
      fn = (s, dir) => {
        val b = t(s, dir, "documents").select(
          graft.operators.SampleOps.hashSplit(md5(col("text")), 80)
            .as("split"),
          least(floor(col("n_chars") / lit(50)), lit(9)).cast("bigint")
            .as("bin"))
        val ct = b.filter(col("split") === "train")
          .groupBy(col("bin")).agg(count(lit(1)).as("c_t"))
        val ch = b.filter(col("split") === "holdout")
          .groupBy(col("bin")).agg(count(lit(1)).as("c_h"))
        val nt = b.filter(col("split") === "train")
          .agg(count(lit(1)).as("n_t"))
        val nh = b.filter(col("split") === "holdout")
          .agg(count(lit(1)).as("n_h"))
        val p = (col("c_h") + 1).cast("double") / (col("n_h") + 10)
        val q = (col("c_t") + 1).cast("double") / (col("n_t") + 10)
        val lnRatio = round(log(
          ((col("c_h") + 1) * (col("n_t") + 10)).cast("double") /
            ((col("c_t") + 1) * (col("n_h") + 10)).cast("double")), 9)
        val terms = s.range(0, 10).select(col("id").as("bin"))
          .join(ct, Seq("bin"), "left")
          .withColumn("c_t", coalesce(col("c_t"), lit(0L)))
          .join(ch, Seq("bin"), "left")
          .withColumn("c_h", coalesce(col("c_h"), lit(0L)))
          .crossJoin(broadcast(nt))
          .crossJoin(broadcast(nh))
          .withColumn("psi_term", round((p - q) * lnRatio, 6))
        val total = terms.agg(
          round(sum(col("psi_term").cast("decimal(18,6)")).cast("double"), 6)
            .as("psi"))
        terms
          .crossJoin(broadcast(total))
          .select(col("bin"), col("c_t"), col("c_h"), col("psi_term"),
            col("psi"))
          .orderBy(col("bin"))
      },
      oracle = Some {
        val h60 = baseHashSql.replace("md5(s)", "md5(md5(text))")
        s"""
        WITH b AS (
          SELECT CASE WHEN ($h60) % 100 < 80 THEN 'train'
                      ELSE 'holdout' END AS split,
                 CAST(least(floor(n_chars / 50), 9) AS BIGINT) AS bin
          FROM documents),
        ct AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_t FROM b
               WHERE split = 'train' GROUP BY 1),
        ch AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_h FROM b
               WHERE split = 'holdout' GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n_t FROM b
               WHERE split = 'train'),
        nh AS (SELECT CAST(count(*) AS BIGINT) AS n_h FROM b
               WHERE split = 'holdout'),
        grid AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 10)),
        terms AS (
          SELECT g.bin,
                 coalesce(ct.c_t, 0) AS c_t,
                 coalesce(ch.c_h, 0) AS c_h,
                 round(
                   ((coalesce(ch.c_h, 0) + 1)
                      / CAST(nh.n_h + 10 AS DOUBLE)
                    - (coalesce(ct.c_t, 0) + 1)
                      / CAST(nt.n_t + 10 AS DOUBLE)) *
                   round(ln(
                     CAST((coalesce(ch.c_h, 0) + 1) * (nt.n_t + 10)
                       AS DOUBLE) /
                     CAST((coalesce(ct.c_t, 0) + 1) * (nh.n_h + 10)
                       AS DOUBLE)), 9), 6) AS psi_term
          FROM grid g
          LEFT JOIN ct ON ct.bin = g.bin
          LEFT JOIN ch ON ch.bin = g.bin
          CROSS JOIN nt CROSS JOIN nh),
        tot AS (
          SELECT round(CAST(sum(CAST(psi_term AS DECIMAL(18,6)))
            AS DOUBLE), 6) AS psi FROM terms)
        SELECT t.bin, t.c_t, t.c_h, t.psi_term, tot.psi
        FROM terms t CROSS JOIN tot
        ORDER BY t.bin"""
      }),
  )

  /** Okapi BM25 over `documents` (k1=1.5, b=0.75 — both exactly
    * representable, so `2.5`/`0.25`/`0.75` literals are bit-identical to
    * the Scala side's), Lucene idf. Mirrors
    * [[graft.operators.SearchOps.bm25TopK]] operation for operation; all
    * integer operands cast to DOUBLE before any arithmetic so DuckDB
    * never falls into decimal math where Spark does float math.
    */
  private[queries] def bm25ScoredCte(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""stats AS (
          SELECT doc_id, len(string_split(text, ' ')) AS dl,
                 string_split(text, ' ') AS tk
          FROM documents),
        corpus AS (
          SELECT count(*) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM stats),
        tf AS (
          SELECT doc_id, dl, term, count(*) AS tf
          FROM (SELECT doc_id, dl, unnest(tk) AS term FROM stats)
          WHERE term IN ($inList)
          GROUP BY 1, 2, 3),
        dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT t.doc_id,
                 sum(CAST(round(
                   ln((CAST(c.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) /
                      (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(t.tf AS DOUBLE) * 2.5)
                   / (CAST(t.tf AS DOUBLE) +
                      1.5 * (0.25 + 0.75 * (CAST(t.dl AS DOUBLE) / c.avgdl))),
                   9) AS DECIMAL(38,9))) AS s
          FROM tf t JOIN dfs d USING (term) CROSS JOIN corpus c
          GROUP BY 1)"""
  }

  private def bm25Oracle(terms: Seq[String], k: Int): String =
    s"""
        WITH ${bm25ScoredCte(terms)},
        topk AS (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id
                 LIMIT $k)
        SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS bm25,
               CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT)
                 AS rank
        FROM topk
        ORDER BY rank"""

  /** CTE chain for `rounds` BPE merges over the documents vocabulary:
    * w0 = (sym, cnt); per round r: pr = weighted overlapping pair
    * counts over w(r-1), mr = argmax, sr = surface form (prior merge
    * chars expanded), wr = w(r-1) with the pair replaced by the merge
    * char chr(0xE000 + r - 1).
    */
  private def bpeRoundsCte(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("""
        w0 AS (
          SELECT word AS sym, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(text, '\s+')) AS word
            FROM documents) t
          WHERE length(word) > 0
          GROUP BY 1)""")
    (1 to rounds).foreach { r =>
      val mc = 0xE000 + r - 1
      sb.append(s""",
        p$r AS (
          SELECT substr(sym, CAST(i AS INT), 2) AS pair, sum(cnt) AS n
          FROM (SELECT sym, cnt,
                       unnest(generate_series(1,
                         CAST(length(sym) - 1 AS BIGINT))) AS i
                FROM w${r - 1}
                WHERE length(sym) >= 2) t
          GROUP BY 1),
        m$r AS (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1),
        s$r AS (SELECT ${expandSql(r, s"(SELECT pair FROM m$r)")} AS tok),
        w$r AS (
          SELECT replace(sym, (SELECT pair FROM m$r), chr($mc)) AS sym, cnt
          FROM w${r - 1})""")
    }
    sb.toString
  }

  /** SQL that expands merge chars 1..r-1 inside `expr` to their surface
    * forms (nested replace chain — each round's char can only reference
    * earlier rounds).
    */
  private def expandSql(r: Int, expr: String): String =
    (1 until r).foldLeft(expr) { (acc, k) =>
      s"replace($acc, chr(${0xE000 + k - 1}), (SELECT tok FROM s$k))"
    }

  private def bpeTrainOracle(rounds: Int): String = {
    val rows = (1 to rounds).map { r =>
      s"SELECT $r AS rank, (SELECT tok FROM s$r) AS token, " +
        s"CAST((SELECT n FROM m$r) AS BIGINT) AS n"
    }.mkString("\n        UNION ALL ")
    s"""
        WITH ${bpeRoundsCte(rounds)}
        $rows
        ORDER BY rank"""
  }

  private def bpeTokensOracle(rounds: Int, topK: Int): String = {
    // expand ALL rounds' merge chars in one symbol (chars from round k
    // can appear in later vocab tables)
    val tokenExpr = (1 to rounds).foldLeft("sym_char") { (acc, k) =>
      s"replace($acc, chr(${0xE000 + k - 1}), (SELECT tok FROM s$k))"
    }
    s"""
        WITH ${bpeRoundsCte(rounds)},
        chars AS (
          SELECT substr(sym, CAST(i AS INT), 1) AS sym_char, cnt
          FROM (SELECT sym, cnt,
                       unnest(generate_series(1, CAST(length(sym) AS BIGINT)))
                         AS i
                FROM w$rounds) t),
        toks AS (
          SELECT $tokenExpr AS token, CAST(sum(cnt) AS BIGINT) AS n
          FROM chars
          GROUP BY 1)
        SELECT token, n FROM toks
        ORDER BY n DESC, token
        LIMIT $topK"""
  }
}
