package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over the `embeddings` table (array<float>
  * of 64 dims + a label): brute-force cosine top-k, sign-LSH bucketed ANN,
  * per-group centroids, and within-group nearest-neighbor (embedding
  * near-dup). Dot products use per-term 12 dp rounding with decimal
  * accumulation, so sums are order-independent and the DuckDB oracle
  * matches bit-for-bit.
  */
object SimilarityQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // v12/v13/v14 build a throwaway persisted index per invocation; the
  // shared package-level temp root carries the ONE-shutdown-hook
  // discipline (ADVICE r9), fresh subdirectory per call.
  private def freshIndexDir(tag: String): String = freshTmpDir(tag)

  // ---- shared DuckDB fragments (mirror SimilarityOps exactly) ----
  /** Strict left-fold dot product of two 64-dim list columns. list_reduce
    * folds ((e1+e2)+e3)... which is bit-identical to Spark's
    * aggregate-with-0.0-init left fold over the same element order.
    */
  private def dotNSql(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(generate_series(1, $n), __i -> " +
      s"CAST(($a)[__i] AS DOUBLE) * CAST(($b)[__i] AS DOUBLE)), " +
      s"(__x, __y) -> __x + __y)"
  private def dotSql(a: String, b: String): String = dotNSql(a, b, 64)
  private def cosineNSql(a: String, b: String, n: Int): String =
    s"round(${dotNSql(a, b, n)} / (sqrt(${dotNSql(a, a, n)}) * " +
      s"sqrt(${dotNSql(b, b, n)})), 6)"
  private def cosineSql(a: String, b: String): String =
    cosineNSql(a, b, 64)
  /** Sign-LSH bucket over 8 deterministic integer hyperplanes
    * (weight(p,i0) = (p*37 + i0*17) % 19 - 9, i0 0-based).
    */
  private val bucketSql =
    """CAST(list_sum(list_transform(generate_series(0, 7), p ->
      |  CASE WHEN list_reduce(list_transform(generate_series(1, 64), i ->
      |    CAST(embedding[i] AS DOUBLE) * ((p * 37 + (i - 1) * 17) % 19 - 9)),
      |    (x, y) -> x + y) > 0
      |  THEN CAST(pow(2.0, p) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** Unrounded cosine in mmrRerank's exact shape: left-fold dot over
    * doubles, then d / sqrt(na * nb) — the PRODUCT goes under ONE sqrt
    * (cosineSql's sqrt(na)·sqrt(nb) is a different double; using it
    * here would flip argmax picks at the 9-dp boundary).
    */
  private def mmrCosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  /** Shared by v44 (one-shot) and v49 (summarize→merge→drift): the
    * hash match of v49 against the SAME oracle is the associativity
    * proof — the a47 OLS-merge discipline applied to centroid state.
    */
  private val centroidDriftOracleSql = """
        WITH x AS (
          SELECT label, vec_id % 2 = 0 AS is_old, CAST(i - 1 AS INT) AS dim,
                 CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings,
               LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
        cent AS (
          SELECT label, is_old, dim,
                 round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 9) AS m
          FROM x GROUP BY 1, 2, 3),
        d AS (
          SELECT o.label,
                 CAST(round(n.m - o.m, 9) AS DECIMAL(18,9)) AS dd
          FROM cent o JOIN cent n
            ON n.label = o.label AND n.dim = o.dim
           AND o.is_old AND NOT n.is_old),
        agg AS (
          SELECT label, sum(dd * dd) AS d2, sum(abs(dd)) AS l1
          FROM d GROUP BY 1),
        c AS (
          SELECT label,
                 CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_old,
                 CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_new
          FROM embeddings GROUP BY 1)
        SELECT a.label, c.n_old, c.n_new,
               round(sqrt(CAST(a.d2 AS DOUBLE)), 6) AS drift_l2,
               round(CAST(a.l1 AS DOUBLE) / 64.0, 9) AS mean_abs_diff
        FROM agg a JOIN c ON c.label = a.label
        ORDER BY a.label"""

  /** v33's oracle: the MMR greedy trajectory (λ=0.6, k=5, head=20,
    * qids 0–3) as k unrolled CTE rounds — sel{r} carries the picks so
    * far, p{r} scores every remaining candidate with a correlated
    * max-cos over sel{r-1}, rounded to 9 dp before the per-qid argmax
    * (row_number, ties by vec_id) exactly like mmrRerank. λ is CAST AS
    * DOUBLE and the complement computed as (1.0 − λ) in double, so both
    * weights are the Scala side's IEEE values (the t27 lesson).
    */
  private lazy val mmrOracleSql: String = {
    val k = 5
    val lam = "CAST(0.6 AS DOUBLE)"
    val sb = new StringBuilder
    sb.append(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < 4),
        scored AS (
          SELECT q.qid, e.vec_id, e.embedding,
                 ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        head AS (
          SELECT qid, vec_id, embedding, sim FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, vec_id) AS rn
            FROM scored)
          WHERE rn <= 20),
        p1 AS (SELECT qid, vec_id, embedding,
                      round($lam * sim, 9) AS sc
               FROM head),
        k1 AS (SELECT qid, vec_id, embedding, sc,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sc DESC, vec_id) AS rn
               FROM p1),
        sel1 AS (SELECT qid, CAST(1 AS INT) AS rank, vec_id, embedding,
                        sc
                 FROM k1 WHERE rn = 1)""")
    (2 to k).foreach { r =>
      val prev = s"sel${r - 1}"
      sb.append(s""",
        red$r AS (
          SELECT h.qid, h.vec_id,
                 max(${mmrCosSql("h.embedding", "s.embedding")}) AS red
          FROM head h JOIN $prev s ON s.qid = h.qid
          GROUP BY h.qid, h.vec_id),
        p$r AS (
          SELECT h.qid, h.vec_id, h.embedding,
                 round($lam * h.sim - (1.0 - $lam) * r.red, 9) AS sc
          FROM head h
          JOIN red$r r ON r.qid = h.qid AND r.vec_id = h.vec_id
          WHERE NOT EXISTS (SELECT 1 FROM $prev x
                            WHERE x.qid = h.qid
                              AND x.vec_id = h.vec_id)),
        k$r AS (SELECT qid, vec_id, embedding, sc,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY sc DESC, vec_id) AS rn
                FROM p$r),
        sel$r AS (SELECT qid, rank, vec_id, embedding, sc FROM $prev
                  UNION ALL
                  SELECT qid, CAST($r AS INT) AS rank, vec_id,
                         embedding, sc
                  FROM k$r WHERE rn = 1)""")
    }
    sb.append(s"""
        SELECT qid, rank, vec_id, round(sc, 6) AS mmr_score
        FROM sel$k ORDER BY qid, rank""")
    sb.toString
  }

  // V52/V53 share ONE oracle string (the shared-oracle equivalence
  // convention): the SQL below computes the auto-sized k, unrolls the
  // same 2-iteration Lloyd's as v12, and serves the same 3-query
  // batch. v52 runs it against the DEFAULT assignment route (2-level
  // tree at k = 71), v53 against the FORCED 3-level tree — the hash
  // match across both physical forms is the proof that the extra
  // coarse level can never change an assignment.
  lazy val v52OracleSql: String = s"""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        kk AS (
          SELECT CAST(GREATEST(4, LEAST(4096, CEIL(SQRT(count(*))))) AS INT)
            AS k
          FROM embeddings),
        init AS (
          SELECT CAST(rn - 1 AS INT) AS cluster, vec_id
          FROM (SELECT vec_id,
                       row_number() OVER (ORDER BY vec_id) AS rn
                FROM embeddings), kk
          WHERE rn <= kk.k),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        cb AS (
          SELECT cluster AS cell, list(c ORDER BY dim) AS centroid
          FROM c1 GROUP BY 1),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id < 3),
        probed AS (
          SELECT qid, qe, cell FROM (
            SELECT q.qid, q.qe, cb.cell,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     ${cosineSql("q.qe", "cb.centroid")} DESC,
                     cb.cell) AS crank
            FROM cb, q)
          WHERE crank <= 2),
        scored AS (
          SELECT p.qid, b.vec_id, a.cluster AS cell,
                 ${cosineSql("b.embedding", "p.qe")} AS sim
          FROM embeddings b
          JOIN a2 a ON a.vec_id = b.vec_id
          JOIN probed p ON p.cell = a.cluster
          WHERE b.vec_id <> p.qid),
        r AS (
          SELECT qid, vec_id, cell, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT qid, vec_id, cell, sim, rank
        FROM r WHERE rank <= 10
        ORDER BY qid, rank"""

  val queries: Map[String, Q] = Map(
    // V1 — brute-force cosine top-k against one query vector: broadcast the
    // query, score in one pass, TakeOrderedAndProject for the k-heap (the
    // exact-baseline an ANN index is judged against).
    "v1_cosine_topk" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> 0),
        topk AS (
          SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank"""),
      bench = true),

    // V2 — sign-LSH bucketed ANN: every vector gets a deterministic 8-bit
    // bucket; the query's bucket-mates are ranked by exact cosine. The
    // scale path: candidates come from one bucket's partition, not a scan.
    "v2_lsh_ann" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.lshTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          numPlanes = 8, k = 10)
          .orderBy(col("vec_id"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
              FROM b WHERE vec_id = 0),
        flagged AS (
          SELECT b.vec_id, b.bucket,
                 b.bucket = q.qbucket AND b.vec_id <> q.qid AS is_candidate,
                 CASE WHEN b.bucket = q.qbucket AND b.vec_id <> q.qid
                      THEN ${cosineSql("b.embedding", "q.qe")} END AS sim
          FROM b, q),
        ranked AS (
          SELECT *, CASE WHEN is_candidate THEN
                   CAST(row_number() OVER (PARTITION BY is_candidate
                        ORDER BY sim DESC, vec_id) AS INT) END AS rank
          FROM flagged)
        SELECT vec_id, bucket, is_candidate, sim, rank
        FROM ranked
        WHERE NOT is_candidate OR rank <= 10
        ORDER BY vec_id""")),

    // V8 — multi-probe sign-LSH ANN: the query probes its own bucket PLUS
    // every bucket one sign-bit away (the standard recall repair — a
    // near-neighbor whose dot with one hyperplane sits just across zero
    // lands one bit away and single-bucket probing misses it). Candidates
    // from the 9 probed buckets rank by exact cosine.
    "v8_multiprobe_lsh" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.lshMultiProbeTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          numPlanes = 8, k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
              FROM b WHERE vec_id = 0),
        probes AS (
          SELECT qid, qe,
                 unnest(list_prepend(qbucket,
                   list_transform(generate_series(0, 7),
                     p -> xor(qbucket, CAST(pow(2.0, p) AS BIGINT))))) AS bucket
          FROM q),
        scored AS (
          SELECT b.vec_id, b.bucket, ${cosineSql("b.embedding", "p.qe")} AS sim
          FROM b JOIN probes p ON b.bucket = p.bucket
          WHERE b.vec_id <> p.qid),
        topk AS (
          SELECT vec_id, bucket, sim FROM scored
          ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, bucket, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V9 — batched exact top-k: one top-k per query row (the multi-query
    // form v1/v5 refuse). The per-query rank filter compiles to
    // WindowGroupLimit: map partitions ship <= k rows per query.
    "v9_topk_batch" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 3),
        scored AS (
          SELECT q.qid, e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        r AS (
          SELECT qid, vec_id, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT qid, vec_id, sim, rank
        FROM r WHERE rank <= 5
        ORDER BY qid, rank""")),

    // D9 — semantic dedup (SemDeDup-style): nearest-neighbor links above
    // a cosine threshold -> connected components -> keep lowest id.
    // Catches rewordings that share no shingles with the lexical family.
    "d9_semantic_dedup" -> Q(
      fn = (s, dir) =>
        graft.operators.DedupOps.semanticDedup(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label", tau = 0.4)
          .orderBy(col("vec_id")),
      oracle = Some(s"""
        WITH RECURSIVE p AS (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 ${cosineSql("a.embedding", "b.embedding")} AS sim
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id <> b.vec_id),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY va
                      ORDER BY sim DESC, vb) AS rk
          FROM p),
        nn AS (SELECT va AS a, vb AS b FROM r WHERE rk = 1 AND sim >= 0.4),
        e AS (SELECT a, b FROM nn UNION ALL SELECT b AS a, a AS b FROM nn),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM e
          UNION
          SELECT e.a AS id, walk.label
          FROM e JOIN walk ON e.b = walk.id),
        comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id)
        SELECT emb.vec_id,
               coalesce(c.component, emb.vec_id) AS component,
               emb.vec_id = coalesce(c.component, emb.vec_id) AS is_canonical
        FROM embeddings emb LEFT JOIN comp c ON c.id = emb.vec_id
        ORDER BY emb.vec_id""")),

    // V27 — SemDeDup as published: k-means clusters (not a given label)
    // are the blocking groups for semantic dedup. d9 assumed a metadata
    // group; here the clusters come from the data — kmeansFit (v6's
    // exact trajectory) partitions the corpus, then within-cluster
    // nearest-neighbor links above tau feed connected components and
    // the lowest id per component survives. The quadratic term is
    // bounded by the LEARNED cluster size, which is the published
    // algorithm's entire scaling argument (k grows with the corpus so
    // n²/k stays tractable). The oracle replays training (v6's CTE
    // prefix) and then d9's recursive reachability within the learned
    // clusters.
    "v27_semdedup" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val (asg, _) = SimilarityOps.kmeansFit(
          emb, "vec_id", "embedding", k = 4, iters = 2)
        val clustered = emb.join(
          asg.select(col("vec_id"), col("cluster")), "vec_id")
        graft.operators.DedupOps.semanticDedup(
          clustered, "vec_id", "embedding", "cluster", tau = 0.4)
          .orderBy(col("vec_id"))
      },
      oracle = Some(s"""
        WITH RECURSIVE e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        p AS (
          SELECT x.vec_id AS va, y.vec_id AS vb,
                 ${cosineSql("ea.embedding", "eb.embedding")} AS sim
          FROM a2 x JOIN a2 y
            ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
          JOIN embeddings ea ON ea.vec_id = x.vec_id
          JOIN embeddings eb ON eb.vec_id = y.vec_id),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY va
                      ORDER BY sim DESC, vb) AS rk
          FROM p),
        nn AS (SELECT va AS a, vb AS b FROM r WHERE rk = 1 AND sim >= 0.4),
        ed AS (SELECT a, b FROM nn UNION ALL SELECT b AS a, a AS b FROM nn),
        walk(id, label) AS (
          SELECT DISTINCT a AS id, a AS label FROM ed
          UNION
          SELECT ed.a AS id, walk.label
          FROM ed JOIN walk ON ed.b = walk.id),
        comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id)
        SELECT emb.vec_id,
               coalesce(c.component, emb.vec_id) AS component,
               emb.vec_id = coalesce(c.component, emb.vec_id) AS is_canonical
        FROM embeddings emb LEFT JOIN comp c ON c.id = emb.vec_id
        ORDER BY emb.vec_id""")),

    // V3 — per-label centroids (posexplode + exact decimal mean per dim)
    // and each vector's euclidean distance to its own centroid; the
    // centroid table is tiny and broadcast back.
    "v3_centroid_dist" -> Q(
      fn = (s, dir) =>
        SimilarityOps.distanceToCentroid(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label")
          .orderBy(col("vec_id")),
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, label, i AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        c AS (
          SELECT label, dim,
                 CAST(sum(CAST(round(v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e GROUP BY label, dim)
        SELECT e.vec_id, e.label,
               round(sqrt(CAST(sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                 AS DECIMAL(38,12))) AS DOUBLE)), 6) AS dist
        FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
        GROUP BY e.vec_id, e.label
        ORDER BY e.vec_id"""),
      bench = true),

    // V5 — IVF-style ANN: per-label centroids form the coarse codebook;
    // every vector is assigned to its nearest cell, the query probes its
    // 2 closest cells, and only those cells' vectors are ranked by exact
    // cosine. The scale path beyond LSH: codebook broadcasts, assignment
    // is map-side, search touches nprobe/cells of the data.
    "v5_ivf_ann" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.ivfTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          "label", nprobe = 2, k = 10)
          .select(col("vec_id"), col("cell"), col("sim"), col("rank"))
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, label, i AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        cdim AS (
          SELECT label, dim,
                 CAST(sum(CAST(round(v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e GROUP BY label, dim),
        cb AS (
          SELECT label AS cell, list(c ORDER BY dim) AS centroid
          FROM cdim GROUP BY 1),
        csims AS (
          SELECT b.vec_id, b.embedding, cb.cell,
                 ${cosineSql("b.embedding", "cb.centroid")} AS csim
          FROM embeddings b, cb),
        assigned AS (
          SELECT vec_id, embedding, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cell) AS crank
          FROM csims),
        cells AS (SELECT vec_id, embedding, cell FROM assigned WHERE crank = 1),
        probed AS (
          SELECT a.cell, q.embedding AS qvec
          FROM assigned a
          JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q ON TRUE
          WHERE a.vec_id = 0 AND a.crank <= 2),
        scored AS (
          SELECT c.vec_id, c.cell,
                 ${cosineSql("c.embedding", "p.qvec")} AS sim
          FROM cells c JOIN probed p ON c.cell = p.cell
          WHERE c.vec_id <> 0),
        topk AS (
          SELECT vec_id, cell, sim FROM scored
          ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, cell, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V4 — embedding near-dup: top-1 nearest neighbor per vector within its
    // label bucket (the bucket bounds the quadratic pair term; at corpus
    // scale the bucket is an LSH key instead, same plan).
    "v4_embed_neardup" -> Q(
      fn = (s, dir) =>
        SimilarityOps.nearestInGroup(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label")
          .select(col("a").as("vec_id"), col("label"), col("nn"), col("sim"))
          .orderBy(col("vec_id")),
      oracle = Some(s"""
        WITH p AS (
          SELECT a.vec_id AS va, a.label, b.vec_id AS vb,
                 ${cosineSql("a.embedding", "b.embedding")} AS sim
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id <> b.vec_id),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY va
                      ORDER BY sim DESC, vb) AS rk
          FROM p)
        SELECT va AS vec_id, label, vb AS nn, sim
        FROM r WHERE rk = 1
        ORDER BY vec_id""")),

    // V6 — k-means clustering (Lloyd's, 2 iterations, k=4): the learned
    // codebook path for IVF (v5 reuses semantic labels; here the cells
    // come from the data). Deterministic by construction — lowest-id
    // init, decimal-exact distances and means, lowest-cluster ties — so
    // the oracle unrolls the two iterations as plain SQL.
    "v6_kmeans" -> Q(
      fn = (s, dir) =>
        SimilarityOps.kmeansClusters(
          t(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 2)
          .orderBy(col("vec_id")),
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster, d2 FROM (
            SELECT vec_id, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1)
        SELECT vec_id, cluster, round(CAST(d2 AS DOUBLE), 6) AS dist2
        FROM a2
        ORDER BY vec_id""")),

    // V43 — IVF cell IMBALANCE factor: k·Σs²/N² over the trained cell
    // sizes — the expected number of rows a random-query probe scans
    // relative to the balanced N/k, i.e. the serving-cost multiplier
    // an unbalanced clustering silently imposes (FAISS's imbalance
    // metric; = 1 for perfect balance, → k when one cell absorbs
    // everything). c7 maps what's IN the cells; this prices probing
    // them. Assembles wholly in BIGINT off the k-row size frame — one
    // division; the corpus-scale stage is v6's map-side assignment.
    "v43_ivf_imbalance" -> Q(
      fn = (s, dir) => {
        val (asg, _) = SimilarityOps.kmeansFit(
          t(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 2)
        val sizes = asg.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"))
        val stat = sizes.agg(
          sum(col("n_members")).as("__n"),
          sum(col("n_members") * col("n_members")).as("__ss"),
          count(lit(1)).as("__k"))
        sizes.crossJoin(broadcast(stat))
          .select(col("cluster"), col("n_members"),
            round(col("n_members").cast("double") / col("__n").cast("double"),
              6).as("frac"),
            round((col("__k") * col("__ss")).cast("double") /
              (col("__n") * col("__n")).cast("double"), 6).as("imbalance"))
          .orderBy(col("cluster"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        sz AS (
          SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
          FROM a2 GROUP BY 1),
        st AS (
          SELECT CAST(sum(n_members) AS BIGINT) AS n,
                 CAST(sum(n_members * n_members) AS BIGINT) AS ss,
                 CAST(count(*) AS BIGINT) AS k
          FROM sz)
        SELECT sz.cluster, sz.n_members,
               round(CAST(sz.n_members AS DOUBLE) / CAST(st.n AS DOUBLE), 6)
                 AS frac,
               round(CAST(st.k * st.ss AS DOUBLE)
                 / CAST(st.n * st.n AS DOUBLE), 6) AS imbalance
        FROM sz CROSS JOIN st
        ORDER BY sz.cluster""")),

    // C7 — corpus cluster map: the k-means fit (v6's exact trajectory)
    // summarized per cluster — size, mean squared distance to the
    // centroid (cohesion), and the representative member (closest to
    // the centroid, ties to the lowest id). The "what is in this
    // corpus" topographic report a curation run opens with; at 100 TB
    // the summary is a k-row frame produced by one partial-aggregable
    // groupBy over the map-side assignment (the representative rides
    // the same agg as min(struct(d2, id)) — no per-cluster window, no
    // second scan). The oracle replays training CTE-for-CTE (v6's
    // prefix) and summarizes a2.
    "c7_cluster_map" -> Q(
      fn = (s, dir) => {
        val (asg, _) = SimilarityOps.kmeansFit(
          t(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 2)
        asg.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            round(sum(col("d2")).cast("double") / count(lit(1)), 6)
              .as("mean_dist2"),
            min(struct(col("d2"), col("vec_id"))).getField("vec_id")
              .as("rep_id"))
          .orderBy(col("cluster"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster, d2 FROM (
            SELECT vec_id, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        g AS (
          SELECT cluster, count(*) AS n_members,
                 round(CAST(sum(d2) AS DOUBLE) / count(*), 6) AS mean_dist2
          FROM a2 GROUP BY 1),
        rep AS (
          SELECT cluster, vec_id AS rep_id FROM (
            SELECT cluster, vec_id,
                   row_number() OVER (PARTITION BY cluster
                     ORDER BY d2, vec_id) AS rn
            FROM a2) WHERE rn = 1)
        SELECT g.cluster, g.n_members, g.mean_dist2, rep.rep_id
        FROM g JOIN rep ON rep.cluster = g.cluster
        ORDER BY g.cluster""")),

    // V7 — IVF over a LEARNED codebook: k-means (2 iterations, k=4)
    // trains the cells, the query probes its 2 closest learned centroids
    // by cosine, only those cells' vectors rank. The composed end-to-end
    // path v5 assumes a label for; the oracle unrolls training + probe.
    "v7_ivf_learned" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.ivfTopKLearned(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          kCells = 4, trainIters = 2, nprobe = 2, k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        cb AS (
          SELECT cluster AS cell, list(c ORDER BY dim) AS centroid
          FROM c1 GROUP BY 1),
        probed AS (
          SELECT cell FROM (
            SELECT cb.cell,
                   row_number() OVER (ORDER BY
                     ${cosineSql("q.embedding", "cb.centroid")} DESC,
                     cb.cell) AS crank
            FROM cb, (SELECT embedding FROM embeddings WHERE vec_id = 0) q)
          WHERE crank <= 2),
        scored AS (
          SELECT b.vec_id, a.cluster AS cell,
                 ${cosineSql("b.embedding", "q.embedding")} AS sim
          FROM embeddings b
          JOIN a2 a ON a.vec_id = b.vec_id
          JOIN probed p ON p.cell = a.cluster
          CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          WHERE b.vec_id <> 0),
        topk AS (
          SELECT vec_id, cell, sim FROM scored
          ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, cell, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V10 — product quantization + ADC: 64 dims split into 4 subspaces,
    // each with a 4-codeword codebook (seed codebooks here — the k
    // lowest-id vectors' subvectors; the TRAINED Lloyd's path is verified
    // separately by the v11_pq_trained oracle below and by the PQ
    // property tests in SimilarityOpsSpec). Every vector stores as 4
    // codes; the query ranks by a sum of 4 broadcast-table lookups
    // instead of a 64-dim scan. The compressed-index path that fits
    // 100 TB in memory.
    "v10_pq_adc" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.pqTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          numSub = 4, kCodes = 4, iters = 1, k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id,
                 CAST((i - 1) // 16 AS INT) AS sub,
                 CAST((i - 1) % 16 AS INT) AS dsub,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        cb AS (
          SELECT e.sub, i.code, e.dsub, e.v AS c
          FROM init i JOIN e ON e.vec_id = i.vec_id),
        d AS (
          SELECT e.vec_id, e.sub, cb.code,
                 sum(CAST(round((e.v - cb.c) * (e.v - cb.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN cb ON e.sub = cb.sub AND e.dsub = cb.dsub
          GROUP BY 1, 2, 3),
        enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM d) WHERE rn = 1),
        qt AS (SELECT sub, code, d2 FROM d WHERE vec_id = 0),
        adc AS (
          SELECT enc.vec_id,
                 round(CAST(sum(qt.d2) AS DOUBLE), 6) AS ad2
          FROM enc JOIN qt ON enc.sub = qt.sub AND enc.code = qt.code
          WHERE enc.vec_id <> 0
          GROUP BY 1),
        topk AS (
          SELECT vec_id, ad2 FROM adc ORDER BY ad2, vec_id LIMIT 10)
        SELECT vec_id, ad2,
               CAST(row_number() OVER (ORDER BY ad2, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank"""),
      bench = true),

    // V40 — ADC + exact REFINE: v10's compressed-index retrieve
    // proposes a 50-candidate shortlist, then the true L2 is computed
    // for those 50 rows only and the final top-10 ranks by it — the
    // two-stage serving shape production ANN actually deploys (faiss
    // IndexRefineFlat, ScaNN reorder). This closes the loop v31
    // quantifies: PQ recall loss comes from near-ties reordered by
    // quantization error, and a cheap exact pass over M ≪ corpus rows
    // recovers it. Output carries ad2 and d2 side by side so the
    // reordering is visible in the hashed result, not asserted.
    "v40_adc_refine" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.pqTopKRefined(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          numSub = 4, kCodes = 4, iters = 1, shortlist = 50, k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id,
                 CAST((i - 1) // 16 AS INT) AS sub,
                 CAST((i - 1) % 16 AS INT) AS dsub,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        cb AS (
          SELECT e.sub, i.code, e.dsub, e.v AS c
          FROM init i JOIN e ON e.vec_id = i.vec_id),
        d AS (
          SELECT e.vec_id, e.sub, cb.code,
                 sum(CAST(round((e.v - cb.c) * (e.v - cb.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN cb ON e.sub = cb.sub AND e.dsub = cb.dsub
          GROUP BY 1, 2, 3),
        enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM d) WHERE rn = 1),
        qt AS (SELECT sub, code, d2 FROM d WHERE vec_id = 0),
        adc AS (
          SELECT enc.vec_id,
                 round(CAST(sum(qt.d2) AS DOUBLE), 6) AS ad2
          FROM enc JOIN qt ON enc.sub = qt.sub AND enc.code = qt.code
          WHERE enc.vec_id <> 0
          GROUP BY 1),
        short AS (
          SELECT vec_id, ad2 FROM adc ORDER BY ad2, vec_id LIMIT 50),
        ex AS (
          SELECT s.vec_id, s.ad2,
                 round(CAST(sum(CAST(round((e.v - q.v) * (e.v - q.v), 12)
                   AS DECIMAL(38,12))) AS DOUBLE), 6) AS d2
          FROM short s
          JOIN e ON e.vec_id = s.vec_id
          JOIN e q ON q.vec_id = 0 AND q.sub = e.sub AND q.dsub = e.dsub
          GROUP BY 1, 2),
        topk AS (
          SELECT vec_id, ad2, d2 FROM ex ORDER BY d2, vec_id LIMIT 10)
        SELECT vec_id, ad2, d2,
               CAST(row_number() OVER (ORDER BY d2, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V41 — random-projection DISTORTION, measured: project 64 → 16
    // dims through the hash-derived ±1 sign matrix (rpProject) and
    // report, for every adjacent-id pair, the ratio of projected to
    // true squared distance (scaled by 1/m, so JL says ≈ 1 ± ε).
    // The number that tells you whether the cheap no-training
    // reduction is good enough before you pay for a PCA pass (v35)
    // at 100 TB — and like every recall/quality query in this
    // family, it is hash-checked output, not a claim. All distance
    // terms round-12 then sum as decimals; ONE division per pair at
    // the end.
    "v41_rp_distortion" -> Q(
      fn = (s, dir) => {
        // r21: the projection/distance passes explode 64 dims per row —
        // fan the single-file scan out so that map work parallelizes
        val emb = fan(t(s, dir, "embeddings"))
        val y = SimilarityOps.rpProject(emb, "vec_id", "embedding",
          outDims = 16)
        val ya = y.select(col("vec_id").as("a"), col("j"),
          col("y").as("ya")).filter(col("a") % 2 === 0)
        val yb = y.select((col("vec_id") - 1).as("a"), col("j"),
          col("y").as("yb"))
        val d2y = ya.join(yb, Seq("a", "j"))
          .select(col("a"),
            round((col("ya") - col("yb")).cast("double") *
              (col("ya") - col("yb")).cast("double"), 12)
              .cast("decimal(26,12)").as("t"))
          .groupBy(col("a")).agg(sum(col("t")).as("d2y"))
        val e = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "v")))
        val xa = e.select(col("vec_id").as("a"), col("dim"),
          col("v").as("va")).filter(col("a") % 2 === 0)
        val xb = e.select((col("vec_id") - 1).as("a"), col("dim"),
          col("v").as("vb"))
        val d2x = xa.join(xb, Seq("a", "dim"))
          .select(col("a"),
            round((col("va") - col("vb")) * (col("va") - col("vb")), 12)
              .cast("decimal(26,12)").as("t"))
          .groupBy(col("a")).agg(sum(col("t")).as("d2x"))
        d2x.join(d2y, "a")
          .select(col("a"), (col("a") + 1).as("b"),
            round(col("d2x").cast("double"), 6).as("d2x"),
            when(col("d2x") === 0, lit(null).cast("double"))
              .otherwise(round(col("d2y").cast("double") /
                (lit(16) * col("d2x")).cast("double"), 6))
              .as("distortion"))
          .orderBy(col("a"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(i - 1 AS INT) AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        sj AS (
          SELECT d.dim, j.j,
                 CASE WHEN list_transform(
                     [CAST(d.dim AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)],
                     s -> ${TextQueries.baseHashSql})[1] % 2 = 0
                   THEN 1.0 ELSE -1.0 END AS sgn
          FROM (SELECT unnest(generate_series(0, 63)) AS dim) d
          CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j),
        y AS (
          SELECT e.vec_id, sj.j,
                 sum(CAST(round(e.v * sj.sgn, 12) AS DECIMAL(26,12))) AS y
          FROM e JOIN sj ON sj.dim = e.dim
          GROUP BY 1, 2),
        d2y AS (
          SELECT a.vec_id AS a,
                 sum(CAST(round(CAST(a.y - b.y AS DOUBLE) *
                   CAST(a.y - b.y AS DOUBLE), 12) AS DECIMAL(26,12)))
                   AS d2y
          FROM y a JOIN y b
            ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0 AND b.j = a.j
          GROUP BY 1),
        d2x AS (
          SELECT a.vec_id AS a,
                 sum(CAST(round((a.v - b.v) * (a.v - b.v), 12)
                   AS DECIMAL(26,12))) AS d2x
          FROM e a JOIN e b
            ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
              AND b.dim = a.dim
          GROUP BY 1)
        SELECT x.a, x.a + 1 AS b,
               round(CAST(x.d2x AS DOUBLE), 6) AS d2x,
               CASE WHEN x.d2x = 0 THEN NULL
                 ELSE round(CAST(y.d2y AS DOUBLE)
                   / CAST(16 * x.d2x AS DOUBLE), 6) END AS distortion
        FROM d2x x JOIN d2y y ON y.a = x.a
        ORDER BY x.a""")),

    // V42 — recall@10 of RANDOM-PROJECTION serving: rank the corpus by
    // L2 in v41's 16-dim hash-sign space, compare to the exact 64-dim
    // top-10 — the fourth axis of the measured-quality family
    // (candidates v25–v30, precision v29/v31/v32, dimensions v38, now
    // the PROJECTION). Together with v41's distortion this is the
    // complete JL evidence: pairwise geometry is preserved to ±ε AND
    // what that ε does to a served ranking is a hashed number, so
    // "project 4× cheaper" is a decision, not a hope.
    "v42_rp_recall" -> Q(
      fn = (s, dir) => {
        // r21: same fan-out rationale as v41 — per-row explode-heavy
        val emb = fan(t(s, dir, "embeddings"))
        val y = SimilarityOps.rpProject(emb, "vec_id", "embedding",
          outDims = 16)
        val yq = y.filter(col("vec_id") === 0)
          .select(col("j"), col("y").as("yq"))
        val rpTop = y.filter(col("vec_id") =!= 0)
          .join(broadcast(yq), "j")
          .select(col("vec_id"),
            round((col("y") - col("yq")).cast("double") *
              (col("y") - col("yq")).cast("double"), 12)
              .cast("decimal(26,12)").as("t"))
          .groupBy(col("vec_id")).agg(sum(col("t")).as("d2rp"))
          .orderBy(col("d2rp").asc, col("vec_id").asc).limit(10)
          .select(col("vec_id"))
        val e = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "v")))
        val qd = e.filter(col("vec_id") === 0)
          .select(col("dim"), col("v").as("qv"))
        val exTop = e.filter(col("vec_id") =!= 0)
          .join(broadcast(qd), "dim")
          .select(col("vec_id"),
            round((col("v") - col("qv")) * (col("v") - col("qv")), 12)
              .cast("decimal(26,12)").as("t"))
          .groupBy(col("vec_id")).agg(sum(col("t")).as("d2"))
          .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
          .select(col("vec_id"))
        rpTop.join(exTop, "vec_id")
          .agg(count(lit(1)).as("n_hit"))
          .select(lit(10).as("k"), col("n_hit"),
            round(col("n_hit").cast("double") / lit(10.0), 6).as("recall"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(i - 1 AS INT) AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        sj AS (
          SELECT d.dim, j.j,
                 CASE WHEN list_transform(
                     [CAST(d.dim AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)],
                     s -> ${TextQueries.baseHashSql})[1] % 2 = 0
                   THEN 1.0 ELSE -1.0 END AS sgn
          FROM (SELECT unnest(generate_series(0, 63)) AS dim) d
          CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j),
        y AS (
          SELECT e.vec_id, sj.j,
                 sum(CAST(round(e.v * sj.sgn, 12) AS DECIMAL(26,12))) AS y
          FROM e JOIN sj ON sj.dim = e.dim
          GROUP BY 1, 2),
        rp AS (
          SELECT a.vec_id,
                 sum(CAST(round(CAST(a.y - q.y AS DOUBLE) *
                   CAST(a.y - q.y AS DOUBLE), 12) AS DECIMAL(26,12)))
                   AS d2rp
          FROM y a JOIN y q ON q.vec_id = 0 AND q.j = a.j
          WHERE a.vec_id <> 0
          GROUP BY 1),
        rt AS (SELECT vec_id FROM rp ORDER BY d2rp, vec_id LIMIT 10),
        ex AS (
          SELECT a.vec_id,
                 sum(CAST(round((a.v - q.v) * (a.v - q.v), 12)
                   AS DECIMAL(26,12))) AS d2
          FROM e a JOIN e q ON q.vec_id = 0 AND q.dim = a.dim
          WHERE a.vec_id <> 0
          GROUP BY 1),
        et AS (SELECT vec_id FROM ex ORDER BY d2, vec_id LIMIT 10),
        h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
              FROM rt JOIN et USING (vec_id))
        SELECT CAST(10 AS INT) AS k, n_hit,
               round(CAST(n_hit AS DOUBLE) / 10.0, 6) AS recall
        FROM h""")),

    // V12 — the PERSISTED index end-to-end under the oracle gate: write
    // trains the same codebook v7's oracle unrolls (k=4, 2 Lloyd's
    // iterations over the full corpus, deterministic by construction),
    // lays the vectors out cell-partitioned on disk, and queryBatch
    // serves three query rows against the layout — so the round-trip
    // (train -> write -> read -> probe -> rank) hash-checks against
    // plain SQL, not just against its own in-memory twin. The batch
    // probe/rank is per-query (WindowGroupLimit), matching the oracle's
    // PARTITION BY qid windows.
    "v12_index_batch" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v12_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path)
        graft.operators.IvfIndex.queryBatch(
          s, path, emb.filter(col("vec_id") < 3), nprobe = 2, k = 10)
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        cb AS (
          SELECT cluster AS cell, list(c ORDER BY dim) AS centroid
          FROM c1 GROUP BY 1),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id < 3),
        probed AS (
          SELECT qid, qe, cell FROM (
            SELECT q.qid, q.qe, cb.cell,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     ${cosineSql("q.qe", "cb.centroid")} DESC,
                     cb.cell) AS crank
            FROM cb, q)
          WHERE crank <= 2),
        scored AS (
          SELECT p.qid, b.vec_id, a.cluster AS cell,
                 ${cosineSql("b.embedding", "p.qe")} AS sim
          FROM embeddings b
          JOIN a2 a ON a.vec_id = b.vec_id
          JOIN probed p ON p.cell = a.cluster
          WHERE b.vec_id <> p.qid),
        r AS (
          SELECT qid, vec_id, cell, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT qid, vec_id, cell, sim, rank
        FROM r WHERE rank <= 10
        ORDER BY qid, rank""")),

    // V52 — the r16 build defaults under the oracle gate: write() with
    // kCells UNPINNED auto-sizes cells to min(⌈√n⌉, 4096) (SCALE.md
    // §10d's rule promoted to default), which at sf0.01 lands k = 71 —
    // past SimilarityOps.TreeAssignThreshold, so every row's cell comes
    // from the two-level coarse-quantizer tree with double-first
    // screening. The oracle computes the SAME k in SQL and unrolls the
    // same 2-iteration Lloyd's as v12, then serves the same 3-query
    // batch — the returned CELL column is the assignment, so a single
    // vector routed differently by the tree/screening than by the
    // plain unrolled argmin hash-mismatches. This is the oracle gate
    // for both r16 assignment paths; NearestKitSpec carries the
    // bit-parity pins, this row carries the end-to-end proof.
    "v52_index_auto" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v52_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", trainIters = 2, path = path)
        val meta = graft.operators.IvfIndex.readMeta(s, path)
        require(meta.kCellsAuto, "v52 exists to gate the auto-size default")
        graft.operators.IvfIndex.queryBatch(
          s, path, emb.filter(col("vec_id") < 3), nprobe = 2, k = 10)
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some(v52OracleSql)),

    // V53 — the FORCED 3-level coarse-quantizer tree under the same
    // oracle gate as v52 (shared oracle string — the hash match IS the
    // equivalence proof): treeLevels = Some(3), threaded as an explicit
    // write() parameter (never a sys.props mutation a concurrent query
    // could race on — ADVICE r17), routes every nearest-centroid
    // assignment in the build through NearestCentroidGrouped3
    // (super-groups over groups over cells), the structure nearestExpr
    // auto-engages past ~1e5 cells (VERDICT r16 item 4). A single
    // vector routed differently by the extra coarse level would
    // hash-mismatch against the SQL-unrolled argmin.
    "v53_index_tree3" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v53_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", trainIters = 2, path = path,
          treeLevels = Some(3))
        graft.operators.IvfIndex.queryBatch(
          s, path, emb.filter(col("vec_id") < 3), nprobe = 2, k = 10)
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some(v52OracleSql)),


    // V13 — incremental index growth under the oracle gate: the codebook
    // trains on the FIRST HALF of the corpus only (write), the second
    // half arrives later (append: frozen-codebook assignment, no
    // retrain), and the batch query serves the grown index. The oracle
    // is v12's SQL with ONE difference — the training CTEs (d1/a1, and
    // c1 through a1's membership) restrict to vec_id < 250 — while the
    // final assignment covers all 500 rows, which is exactly the
    // append contract: a late vector lands where a rebuild against the
    // SAME codebook would put it.
    "v13_index_append" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v13_") + "/index"
        graft.operators.IvfIndex.write(
          emb.filter(col("vec_id") < 250), "vec_id", "embedding",
          kCells = 4, trainIters = 2, path)
        graft.operators.IvfIndex.append(
          s, path, emb.filter(col("vec_id") >= 250))
        graft.operators.IvfIndex.queryBatch(
          s, path, emb.filter(col("vec_id") < 3), nprobe = 2, k = 10)
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings WHERE vec_id < 250
                ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          WHERE e.vec_id < 250
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        cb AS (
          SELECT cluster AS cell, list(c ORDER BY dim) AS centroid
          FROM c1 GROUP BY 1),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id < 3),
        probed AS (
          SELECT qid, qe, cell FROM (
            SELECT q.qid, q.qe, cb.cell,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     ${cosineSql("q.qe", "cb.centroid")} DESC,
                     cb.cell) AS crank
            FROM cb, q)
          WHERE crank <= 2),
        scored AS (
          SELECT p.qid, b.vec_id, a.cluster AS cell,
                 ${cosineSql("b.embedding", "p.qe")} AS sim
          FROM embeddings b
          JOIN a2 a ON a.vec_id = b.vec_id
          JOIN probed p ON p.cell = a.cluster
          WHERE b.vec_id <> p.qid),
        r AS (
          SELECT qid, vec_id, cell, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT qid, vec_id, cell, sim, rank
        FROM r WHERE rank <= 10
        ORDER BY qid, rank""")),

    // V14 — RESIDUAL product quantization (true IVFADC) under the oracle
    // gate: the index PQ-encodes each vector's residual against its
    // coarse-cell centroid, and the batched ADC query runs the full
    // serving pipeline — per-(query, cell) residual ADC tables, code
    // scan, per-query refine cut, exact cosine re-rank. At FULL probe
    // and full refine the candidate set provably covers the corpus, so
    // the end result must equal plain per-query brute force — which IS
    // SQL-expressible, giving the whole residual train/encode/serve
    // round-trip a hash-checked oracle (the ADC-ordering quality itself
    // is asserted in AnnRecallSpec; candidate-set completeness and the
    // re-rank arithmetic are what this row pins). Cell is dropped from
    // the output so the oracle needs no Lloyd's unroll.
    "v14_index_residual" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v14_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path,
          pq = Some(graft.operators.IvfIndex.Pq(
            numSub = 4, kCodes = 4, iters = 2, residual = true)))
        graft.operators.IvfIndex.queryAdcBatch(
          s, path, emb.filter(col("vec_id") < 3),
          nprobe = 4, k = 10, refine = 100000)
          .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 3),
        scored AS (
          SELECT q.qid, e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        r AS (
          SELECT qid, vec_id, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT qid, vec_id, sim, rank
        FROM r WHERE rank <= 10
        ORDER BY qid, rank""")),

    // V34 — the PRODUCTION residual-PQ build: v14's full IVFADC pipeline
    // (residual encode, batched per-cell ADC, refine, exact re-rank)
    // but with BOTH codebooks — coarse k-means AND the residual PQ —
    // trained on the deterministic 40% md5-of-id sample (v18's
    // trainSampleOf recipe). In-query full-corpus Lloyd's is v14/v15's
    // oracle-gating device, not the shape you'd ship: at 100 TB the
    // training re-scans dominate the build, and a sample pins the
    // codebooks at a fraction of the cost while the encode stays one
    // map-side full-corpus pass. At full probe/refine the exact top-k
    // is codebook-independent, so the same brute-force SQL gates the
    // whole sampled-train residual round-trip; that the codebooks
    // really fit on the sample is pinned structurally in IvfIndexSpec.
    "v34_residual_sampled" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v34_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path,
          pq = Some(graft.operators.IvfIndex.Pq(
            numSub = 4, kCodes = 4, iters = 2, residual = true)),
          trainPct = 40)
        graft.operators.IvfIndex.queryAdcBatch(
          s, path, emb.filter(col("vec_id") < 3),
          nprobe = 4, k = 10, refine = 100000)
          .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
          .orderBy(col("qid"), col("rank"))
      },
      bench = true,
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 3),
        scored AS (
          SELECT q.qid, e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        r AS (
          SELECT qid, vec_id, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT qid, vec_id, sim, rank
        FROM r WHERE rank <= 10
        ORDER BY qid, rank""")),

    // V35 — top principal component by power iteration (2 rounds, in-
    // engine PCA): v ← normalize((XᵀX)v) from the all-ones start. Every
    // arithmetic step is the kmeansFit/t26 discipline — 12-dp-rounded
    // products into exact decimal sums, 9-dp loadings per round — so
    // the oracle unrolls both rounds verbatim (two matrix applies, two
    // normalizations) and the loadings/eigenvalue hash-match. The
    // capability class this adds: dimensionality reduction/whitening
    // ahead of ANN builds, and the drift statistic a corpus monitor
    // watches (the dominant direction shifting = a source changed).
    "v35_pca_power" -> Q(
      fn = (s, dir) =>
        graft.operators.SimilarityOps.powerIteration(
          t(s, dir, "embeddings"), "vec_id", "embedding", iters = 2)
          .orderBy(col("dim")),
      bench = true,
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, CAST(i - 1 AS INT) AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, range(1, 65) t(i)),
        s1 AS (
          SELECT vec_id,
                 CAST(sum(CAST(round(x * 1.0, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS s
          FROM e GROUP BY 1),
        w1 AS (
          SELECT e.dim,
                 CAST(sum(CAST(round(s1.s * e.x, 12) AS DECIMAL(38,12)))
                   AS DECIMAL(38,12)) AS w
          FROM e JOIN s1 USING (vec_id) GROUP BY 1),
        n1 AS (
          SELECT CAST(sum(CAST(round(CAST(w AS DOUBLE) * CAST(w AS DOUBLE),
                   12) AS DECIMAL(38,12))) AS DOUBLE) AS n2
          FROM w1),
        v1 AS (
          SELECT dim, round(CAST(w AS DOUBLE) / sqrt(n1.n2), 9) AS v
          FROM w1, n1),
        s2 AS (
          SELECT e.vec_id,
                 CAST(sum(CAST(round(e.x * v1.v, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS s
          FROM e JOIN v1 USING (dim) GROUP BY 1),
        w2 AS (
          SELECT e.dim,
                 CAST(sum(CAST(round(s2.s * e.x, 12) AS DECIMAL(38,12)))
                   AS DECIMAL(38,12)) AS w
          FROM e JOIN s2 USING (vec_id) GROUP BY 1),
        n2c AS (
          SELECT CAST(sum(CAST(round(CAST(w AS DOUBLE) * CAST(w AS DOUBLE),
                   12) AS DECIMAL(38,12))) AS DOUBLE) AS n2
          FROM w2)
        SELECT w2.dim,
               round(CAST(w2.w AS DOUBLE) / sqrt(n2c.n2), 9) AS loading,
               round(sqrt(n2c.n2), 6) AS eigval
        FROM w2, n2c
        ORDER BY w2.dim""")),

    // V36 — PCA projection APPLY (whitening / drift scoring): every
    // embedding projected onto the 1-round power-iteration axis, plus
    // the off-axis residual norm. The oracle restates round 1 verbatim
    // (v35's CTEs) then folds ⟨x,v⟩ and ‖x‖² in one grouped pass; the
    // projection re-rounds to 9 dp BEFORE squaring so both engines
    // subtract identical doubles. The capability class: per-document
    // scores along the dominant corpus direction — the reduction fed
    // to an ANN build, and the ranking a drift monitor reads.
    "v36_pca_project" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val load = graft.operators.SimilarityOps.powerIteration(
          emb, "vec_id", "embedding", iters = 1)
        graft.operators.SimilarityOps.pcaProject(
          emb, "vec_id", "embedding", load)
      },
      bench = true,
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, CAST(i - 1 AS INT) AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, range(1, 65) t(i)),
        s1 AS (
          SELECT vec_id,
                 CAST(sum(CAST(round(x * 1.0, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS s
          FROM e GROUP BY 1),
        w1 AS (
          SELECT e.dim,
                 CAST(sum(CAST(round(s1.s * e.x, 12) AS DECIMAL(38,12)))
                   AS DECIMAL(38,12)) AS w
          FROM e JOIN s1 USING (vec_id) GROUP BY 1),
        n1 AS (
          SELECT CAST(sum(CAST(round(CAST(w AS DOUBLE) * CAST(w AS DOUBLE),
                   12) AS DECIMAL(38,12))) AS DOUBLE) AS n2
          FROM w1),
        v1 AS (
          SELECT dim, round(CAST(w AS DOUBLE) / sqrt(n1.n2), 9) AS v
          FROM w1, n1),
        p AS (
          SELECT e.vec_id,
                 CAST(sum(CAST(round(e.x * v1.v, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS pd,
                 CAST(sum(CAST(round(e.x * e.x, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS n2
          FROM e JOIN v1 USING (dim) GROUP BY 1)
        SELECT vec_id, round(pd, 9) AS projection,
               round(sqrt(greatest(0.0,
                 n2 - round(pd, 9) * round(pd, 9))), 6) AS residual
        FROM p ORDER BY vec_id""")),

    // V39 — embedding-space DRIFT between slices: the dominant
    // direction (1-round power iteration, v35's construction) of the
    // label=0 slice vs the rest, summarized as the cosine between the
    // two axes — the one-number answer to "did a source change what
    // the corpus points at" that v35's scaladoc promises (c13's PSI
    // drift for scalar features, this for embedding space). Loadings
    // are 9-dp unit vectors, so the cosine folds 12-dp-rounded
    // products into an exact decimal sum — one broadcast-sized join
    // on the 64-row frames.
    "v39_pca_drift" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        def axis(pred: org.apache.spark.sql.Column, tag: String) =
          graft.operators.SimilarityOps.powerIteration(
            emb.filter(pred), "vec_id", "embedding", iters = 1)
            .select(col("dim"), col("loading").as(s"l_$tag"),
              col("eigval").as(s"e_$tag"))
        axis(col("label") === 0, "a")
          .join(axis(col("label") =!= 0, "b"), "dim")
          .agg(
            round(sum(round(col("l_a") * col("l_b"), 12)
              .cast("decimal(38,12)")).cast("double"), 6).as("axis_cos"),
            max(col("e_a")).as("eig_a"),
            max(col("e_b")).as("eig_b"))
      },
      bench = true,
      oracle = Some {
        def chain(pred: String, tag: String) =
          s"""e_$tag AS (
             |  SELECT vec_id, CAST(i - 1 AS INT) AS dim,
             |         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
             |  FROM embeddings, range(1, 65) t(i) WHERE $pred),
             |s_$tag AS (
             |  SELECT vec_id,
             |         CAST(sum(CAST(round(x * 1.0, 12) AS DECIMAL(38,12)))
             |           AS DOUBLE) AS s
             |  FROM e_$tag GROUP BY 1),
             |w_$tag AS (
             |  SELECT e.dim,
             |         CAST(sum(CAST(round(s.s * e.x, 12)
             |           AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS w
             |  FROM e_$tag e JOIN s_$tag s USING (vec_id) GROUP BY 1),
             |n_$tag AS (
             |  SELECT CAST(sum(CAST(round(CAST(w AS DOUBLE) *
             |           CAST(w AS DOUBLE), 12) AS DECIMAL(38,12)))
             |           AS DOUBLE) AS n2
             |  FROM w_$tag),
             |v_$tag AS (
             |  SELECT dim, round(CAST(w AS DOUBLE) / sqrt(n.n2), 9) AS v,
             |         round(sqrt(n.n2), 6) AS eig
             |  FROM w_$tag, n_$tag n)""".stripMargin
        s"""
        WITH ${chain("label = 0", "a")},
        ${chain("label <> 0", "b")}
        SELECT round(CAST(sum(CAST(round(a.v * b.v, 12)
                 AS DECIMAL(38,12))) AS DOUBLE), 6) AS axis_cos,
               max(a.eig) AS eig_a,
               max(b.eig) AS eig_b
        FROM v_a a JOIN v_b b USING (dim)"""
      }),

    // V38 — MATRYOSHKA truncation recall: serve from only the first 16
    // of 64 dimensions (the MRL deployment trick — prefix-truncate the
    // embedding, keep the index 4× smaller/faster) and measure
    // recall@10 against full-dim exact. Completes the dimension axis
    // of the measured-quality family: v29/v31/v32 quantify PRECISION
    // loss (bits per value), this quantifies DIMENSION loss — together
    // they span the storage/quality plane an index designer actually
    // navigates. Truncation is a zero-cost in-row slice; serving cost
    // scales with the kept prefix.
    "v38_mrl_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val emb16 = emb.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("embedding"))
        val exact = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        val approx = SimilarityOps.topKPerQuery(
          emb16, emb16.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits"))
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      bench = true,
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 5),
        ex AS (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("e.embedding", "q.qe")} DESC,
                            e.vec_id) AS rnk
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM ex WHERE rnk <= 10),
        ap AS (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineNSql("e.embedding", "q.qe", 16)} DESC,
                            e.vec_id) AS rnk
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        approx AS (SELECT qid, vec_id FROM ap WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V37 — ranking-quality eval (MRR + nDCG@10) of single-bucket LSH
    // serving against GRADED exact-cosine truth (exact top-9, grades
    // 3/2/1 by rank tercile): the measured-recall family (v25…v32)
    // says which true neighbors the layout FINDS; this row adds what
    // recall cannot see — whether they arrive in the right ORDER under
    // graded relevance. Gain terms round 9 dp before the decimal fold
    // (absorbs the engines' last-ulp log2 differences), mrr/ndcg are
    // one division each.
    "v37_rank_eval" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val b = emb.withColumn("bucket",
          SimilarityOps.lshBucket(col("embedding"), 8))
        val q = b.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("bucket").as("qbucket"))
        val truth = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 9)
          .select(col("qid"), col("vec_id"),
            expr("CAST(4 - (rank + 2) DIV 3 AS INT)").as("rel"))
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val system = b.join(broadcast(q), col("bucket") === col("qbucket"))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("sim", SimilarityOps.cosine(col("embedding"), col("qe")))
          .withColumn("rank", row_number().over(wA))
          .where(col("rank") <= 10)
          .select(col("qid"), col("vec_id"), col("rank"))
        graft.operators.SearchOps.rankEval(
          system, truth, "qid", "vec_id", "rank", "rel", 10)
      },
      bench = true,
      oracle = Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
              FROM b WHERE vec_id < 5),
        ex AS (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("e.embedding", "q.qe")} DESC,
                            e.vec_id) AS rnk
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        truth AS (
          SELECT qid, vec_id, CAST(4 - (rnk + 2) // 3 AS INT) AS rel
          FROM ex WHERE rnk <= 9),
        ap AS (
          SELECT q.qid, b.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("b.embedding", "q.qe")} DESC,
                            b.vec_id) AS rnk
          FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.qid),
        sys AS (SELECT qid, vec_id, rnk FROM ap WHERE rnk <= 10),
        j AS (
          SELECT s.qid, s.rnk, coalesce(t.rel, 0) AS relv
          FROM sys s LEFT JOIN truth t
            ON t.qid = s.qid AND t.vec_id = s.vec_id),
        ps AS (
          SELECT qid,
                 sum(CAST(round((power(2.0, relv) - 1.0)
                   / log2(rnk + 1.0), 9) AS DECIMAL(38,9))) AS dcg,
                 min(CASE WHEN relv > 0 THEN rnk END) AS first
          FROM j GROUP BY 1),
        nr AS (SELECT qid, count(*) AS n_rel FROM truth
               WHERE rel > 0 GROUP BY 1),
        ideal AS (
          SELECT qid,
                 sum(CAST(round((power(2.0, rel) - 1.0)
                   / log2(pos + 1.0), 9) AS DECIMAL(38,9))) AS idcg
          FROM (SELECT qid, rel, vec_id,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY rel DESC, vec_id) AS pos
                FROM truth WHERE rel > 0)
          WHERE pos <= 10 GROUP BY 1)
        SELECT nr.qid, nr.n_rel,
               coalesce(round(1.0 / ps.first, 6), 0.0) AS mrr,
               round(coalesce(CAST(ps.dcg AS DOUBLE), 0.0), 9) AS dcg,
               round(CAST(ideal.idcg AS DOUBLE), 9) AS idcg,
               round(coalesce(CAST(ps.dcg AS DOUBLE), 0.0)
                 / CAST(ideal.idcg AS DOUBLE), 6) AS ndcg
        FROM nr JOIN ideal USING (qid) LEFT JOIN ps USING (qid)
        ORDER BY nr.qid""")),

    // V15 — residual ADC ORDERING under the oracle gate: v14 proves
    // candidate completeness (full probe/refine collapses to brute
    // force); this row pins the part v14 cannot — the residual ADC
    // ranking itself decides who reaches the re-rank (refine=50 out of
    // ~250 probed candidates at sf0.01, an ACTIVE cut). The oracle
    // unrolls the whole pipeline in SQL: 2-iteration k-means (v12's
    // CTEs), per-dimension residuals against the trained centroids,
    // 2-iteration PQ fit ON THE RESIDUALS (v11's CTEs over the residual
    // long form), the query's PER-CELL residual ADC tables, the
    // (ad2, id) refine cut, and the exact cosine re-rank — every
    // decimal/rounding step mirroring the Scala bit-for-bit.
    "v15_residual_adc" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v15_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path,
          pq = Some(graft.operators.IvfIndex.Pq(
            numSub = 4, kCodes = 4, iters = 2, residual = true)))
        val qvec = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .as[Array[Double]].head()
        graft.operators.IvfIndex.queryAdc(
          s, path, qvec, excludeId = Some(0L), nprobe = 2, k = 10,
          refine = 50)
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        c0 AS (SELECT i.cluster, e.dim, e.v AS c
               FROM init i JOIN e ON e.vec_id = i.vec_id),
        d1 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c0 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT a.cluster, e.dim,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a1 a ON e.vec_id = a.vec_id
          GROUP BY 1, 2),
        dd2 AS (
          SELECT e.vec_id, c.cluster,
                 sum(CAST(round((e.v - c.c) * (e.v - c.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN c1 c ON e.dim = c.dim
          GROUP BY 1, 2),
        a2 AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cluster) AS rn
            FROM dd2) WHERE rn = 1),
        -- residual long form against the trained centroid of each
        -- vector's OWN cell, split into (sub, dsub)
        re AS (
          SELECT e.vec_id, a.cluster AS cell,
                 CAST((e.dim - 1) // 16 AS INT) AS sub,
                 CAST((e.dim - 1) % 16 AS INT) AS dsub,
                 e.v - c.c AS v
          FROM e
          JOIN a2 a ON e.vec_id = a.vec_id
          JOIN c1 c ON c.cluster = a.cluster AND c.dim = e.dim),
        -- PQ fit on residuals: seed codebook = residuals of the 4
        -- lowest-id vectors, then one Lloyd's update (v11's recipe)
        rinit AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        rcb0 AS (
          SELECT re.sub, i.code, re.dsub, re.v AS c
          FROM rinit i JOIN re ON re.vec_id = i.vec_id),
        rd0 AS (
          SELECT re.vec_id, re.sub, rcb0.code,
                 sum(CAST(round((re.v - rcb0.c) * (re.v - rcb0.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM re JOIN rcb0 ON re.sub = rcb0.sub AND re.dsub = rcb0.dsub
          GROUP BY 1, 2, 3),
        ra0 AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM rd0) WHERE rn = 1),
        rcb1 AS (
          SELECT re.sub, a.code, re.dsub,
                 CAST(sum(CAST(round(re.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM re JOIN ra0 a ON re.vec_id = a.vec_id AND re.sub = a.sub
          GROUP BY 1, 2, 3),
        rd1 AS (
          SELECT re.vec_id, re.sub, rcb1.code,
                 sum(CAST(round((re.v - rcb1.c) * (re.v - rcb1.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM re JOIN rcb1 ON re.sub = rcb1.sub AND re.dsub = rcb1.dsub
          GROUP BY 1, 2, 3),
        enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM rd1) WHERE rn = 1),
        -- probe: the query's 2 closest trained cells by cosine
        cb AS (
          SELECT cluster AS cell, list(c ORDER BY dim) AS centroid
          FROM c1 GROUP BY 1),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id = 0),
        probed AS (
          SELECT cell FROM (
            SELECT cb.cell,
                   row_number() OVER (ORDER BY
                     ${cosineSql("q.qe", "cb.centroid")} DESC,
                     cb.cell) AS crank
            FROM cb, q)
          WHERE crank <= 2),
        -- the query's PER-CELL residual ADC tables: residual against
        -- cell c's centroid, distance to every residual codeword
        qr AS (
          SELECT c.cluster AS cell,
                 CAST((e.dim - 1) // 16 AS INT) AS sub,
                 CAST((e.dim - 1) % 16 AS INT) AS dsub,
                 e.v - c.c AS v
          FROM e JOIN c1 c ON c.dim = e.dim
          WHERE e.vec_id = 0 AND c.cluster IN (SELECT cell FROM probed)),
        qt AS (
          SELECT qr.cell, qr.sub, rcb1.code,
                 sum(CAST(round((qr.v - rcb1.c) * (qr.v - rcb1.c), 12)
                   AS DECIMAL(38,12))) AS d2q
          FROM qr JOIN rcb1 ON qr.sub = rcb1.sub AND qr.dsub = rcb1.dsub
          GROUP BY 1, 2, 3),
        -- ADC: each probed-cell candidate's codes meet the table of the
        -- candidate's OWN cell
        adc AS (
          SELECT enc.vec_id, a.cluster AS cell,
                 round(CAST(sum(qt.d2q) AS DOUBLE), 6) AS ad2
          FROM enc
          JOIN a2 a ON a.vec_id = enc.vec_id
          JOIN qt ON qt.cell = a.cluster AND qt.sub = enc.sub
                 AND qt.code = enc.code
          WHERE enc.vec_id <> 0
          GROUP BY 1, 2),
        refine AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (ORDER BY ad2, vec_id) AS arank
            FROM adc) WHERE arank <= 50),
        rr AS (
          SELECT r.vec_id, r.cell,
                 ${cosineSql("b.embedding", "q.qe")} AS sim
          FROM refine r
          JOIN embeddings b ON b.vec_id = r.vec_id, q),
        topk AS (
          SELECT vec_id, cell, sim FROM rr
          ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, cell, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT)
                 AS rank
        FROM topk
        ORDER BY rank""")),

    // V28 — binary-quantization ANN: every vector's 64 dims pack into ONE
    // long of sign bits (dim i sets bit i iff v[i] > 0 — a pure float
    // compare, no arithmetic that could flip a boundary bit); the first
    // pass ranks the corpus by popcount(xor) Hamming distance over those
    // 8-byte codes, and only the 4k closest get the exact-cosine re-rank.
    // The modern 32×-compression serving layout (BQ/RaBitQ family): at
    // 100 TB the Hamming pass is a codes-only columnar scan + a k-heap
    // (TakeOrderedAndProject — no shuffle of vectors), and float vectors
    // are fetched for 40 rows. The oracle recomputes the same bits from
    // the same compares, so hamming, candidate cut, and final rank all
    // hash-match.
    "v28_binary_quant" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.binaryQuantTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          dims = 64, k = 10, rerankFactor = 4)
          .orderBy(col("rank"))
      },
      bench = true,
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id = 0),
        h AS (
          SELECT e.vec_id, e.embedding, q.qe,
                 CAST(list_sum(list_transform(generate_series(1, 64), i ->
                   CASE WHEN (CAST(e.embedding[i] AS DOUBLE) > 0.0)
                          <> (CAST(q.qe[i] AS DOUBLE) > 0.0)
                        THEN 1 ELSE 0 END)) AS INT) AS hamming
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        cand AS (
          SELECT * FROM h ORDER BY hamming ASC, vec_id ASC LIMIT 40),
        scored AS (
          SELECT vec_id, hamming, ${cosineSql("embedding", "qe")} AS sim
          FROM cand),
        topk AS (
          SELECT * FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, hamming, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT)
                 AS rank
        FROM topk
        ORDER BY rank""")),

    // V16 — SQ8 scalar quantization: per-dimension (min, max) ranges
    // learned from the corpus, 8-bit codes, serving over DEQUANTIZED
    // vectors with the shared deterministic cosine. The oracle replays
    // the whole pipeline in SQL — min/max are exact selections, the
    // encode/dequantize expressions mirror the Scala shapes term for
    // term (IEEE double ops; half-up rounding of non-negative args ==
    // round-half-away), and the final cosine is the established
    // list_reduce fold — so codes, reconstructions, and ranking all
    // hash-match bit for bit.
    "v16_sq8_topk" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.sq8TopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, i AS dim, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY 1),
        deq AS (
          SELECT e.vec_id,
                 list(mm.mn + (CASE WHEN mm.mx = mm.mn THEN 0
                       ELSE CAST(round((e.v - mm.mn) * 255.0 /
                              (mm.mx - mm.mn), 0) AS INT) END)
                    * (mm.mx - mm.mn) / 255.0 ORDER BY e.dim) AS vhat
          FROM e JOIN mm ON e.dim = mm.dim
          GROUP BY 1),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id = 0),
        scored AS (
          SELECT d.vec_id, ${cosineSql("d.vhat", "q.qe")} AS sim
          FROM deq d, q
          WHERE d.vec_id <> q.qid),
        topk AS (
          SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V17 — IVF x SQ8 under the oracle gate: the index stores SQ8 codes
    // alongside the vectors, the serving query ranks candidates by the
    // cosine of their dequantized reconstructions (codes-only first
    // pass) and exact-re-ranks the survivors. At FULL probe and full
    // refine the candidate set provably covers the corpus, so the end
    // result must equal plain per-query brute force (v14's trick on the
    // SQ8 path) — a hash-checked gate on the whole
    // fit/encode/persist/serve round-trip; the approximate ORDERING
    // quality is pinned separately (Sq8Spec overlap floor, v16's
    // bit-exact dequantized ranking).
    "v17_index_sq8" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v17_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path,
          sq8 = true)
        val qvec = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .as[Array[Double]].head()
        graft.operators.IvfIndex.querySq8(
          s, path, qvec, excludeId = Some(0L), nprobe = 4, k = 10,
          refine = 100000)
          .select(col("vec_id"), col("sim"), col("rank"))
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        topk AS (
          SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V23 — FILTERED vector search from the persisted index: top-k among
    // rows satisfying a metadata predicate (label = 3), the vector-store
    // feature every retrieval pipeline ends up needing. The layout keeps
    // every non-vector column beside the vector, so the predicate lands
    // on the SAME pruned scan as a parquet PushedFilter — never
    // "fetch k then discard", and k survives arbitrary selectivity. At
    // FULL probe the result is exactly the filtered brute force (the
    // IvfIndexSpec-pinned identity), which is what makes the oracle
    // expressible without restating the learned cells.
    "v23_filtered_ann" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v23_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path)
        val qvec = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .as[Array[Double]].head()
        graft.operators.IvfIndex.query(
          s, path, qvec, excludeId = Some(0L), nprobe = 4, k = 10,
          where = Some(col("label") === 3))
          .select(col("vec_id"), col("sim"), col("rank"))
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid AND e.label = 3),
        topk AS (
          SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V24 — k-NN classification: the first five vectors take the
    // majority label of their 10 nearest (cosine) training vectors
    // (all the rest), ties to the smallest label — embedding-space
    // weak labeling on the topKPerQuery candidate stage; the label
    // join touches only the q×k candidate rows.
    "v24_knn_classify" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.knnClassify(
          emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 10)
          .orderBy(col("qid"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < 5),
        t AS (SELECT vec_id, label, embedding FROM embeddings
              WHERE vec_id >= 5),
        scored AS (
          SELECT q.qid, t.vec_id, t.label,
                 ${cosineSql("t.embedding", "q.qe")} AS sim
          FROM t, q),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY sim DESC, vec_id) AS rnk
          FROM scored),
        votes AS (
          SELECT qid, label, count(*) AS votes
          FROM rk WHERE rnk <= 10 GROUP BY 1, 2),
        best AS (
          SELECT qid, label, votes,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY votes DESC, label) AS r
          FROM votes)
        SELECT qid, label AS pred, CAST(votes AS BIGINT) AS votes
        FROM best WHERE r = 1
        ORDER BY qid""")),

    // V25 — MEASURED recall@10 of single-bucket sign-LSH against the
    // exact top-k, per query, inside the oracle gate: the engine
    // measures its own approximation and an independent engine
    // reproduces the number. This is AnnRecallSpec's discipline
    // promoted to a hash-checked query — the recall a user would see
    // is a verified output, not a test-log claim.
    "v25_ann_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val b = emb.withColumn("bucket",
          SimilarityOps.lshBucket(col("embedding"), 8))
        val q = b.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("bucket").as("qbucket"))
        val exact = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val approx = b.join(broadcast(q), col("bucket") === col("qbucket"))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("sim", SimilarityOps.cosine(col("embedding"), col("qe")))
          .withColumn("rank", row_number().over(wA))
          .where(col("rank") <= 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits")) // non-null = found by LSH
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
              FROM b WHERE vec_id < 5),
        ex AS (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("e.embedding", "q.qe")} DESC,
                            e.vec_id) AS rnk
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM ex WHERE rnk <= 10),
        ap AS (
          SELECT q.qid, b.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("b.embedding", "q.qe")} DESC,
                            b.vec_id) AS rnk
          FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.qid),
        approx AS (SELECT qid, vec_id FROM ap WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V30 — MEASURED recall@10 of IVF cell-probing (v5's label-centroid
    // layout, nprobe=2) against the exact top-k — the fourth member of
    // the measured-recall family (v25 single-bucket LSH, v26 multiprobe,
    // v29 binary quantization), so every serving layout's quality is a
    // hash-checked output. The codebook is the per-label decimal-exact
    // mean (v5's construction, restated for 5 queries); probe lists come
    // from the SAME assignment frame the corpus uses, so query and
    // corpus can never disagree about cell geometry.
    "v30_ivf_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cdim = emb
          .select(col("label"), posexplode(col("embedding"))
            .as(Seq("dim", "v")))
          .groupBy(col("label"), col("dim"))
          .agg((sum(round(col("v").cast("double"), 12)
            .cast("decimal(38,12)")).cast("double") / count(lit(1)))
            .as("c"))
        val cb = cdim.groupBy(col("label").as("cell"))
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("c")))),
            x => x("c")).as("centroid"))
        val wC = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cell").asc)
        val assigned = emb.join(broadcast(cb))
          .withColumn("csim",
            SimilarityOps.cosine(col("embedding"), col("centroid")))
          .withColumn("crank", row_number().over(wC))
        val cells = assigned.filter(col("crank") === 1)
          .select(col("vec_id"), col("embedding"), col("cell"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val probed = assigned
          .filter(col("vec_id") < 5 && col("crank") <= 2)
          .select(col("vec_id").as("qid"), col("cell"))
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val approx = cells
          .join(broadcast(probed), Seq("cell"))
          .join(broadcast(q), Seq("qid"))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("sim",
            SimilarityOps.cosine(col("embedding"), col("qe")))
          .withColumn("rank", row_number().over(wA))
          .where(col("rank") <= 10)
          .select(col("qid"), col("vec_id"))
        val exact = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits"))
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      bench = true,
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, label, i AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        cdim AS (
          SELECT label, dim,
                 CAST(sum(CAST(round(v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e GROUP BY label, dim),
        cb AS (
          SELECT label AS cell, list(c ORDER BY dim) AS centroid
          FROM cdim GROUP BY 1),
        csims AS (
          SELECT b.vec_id, b.embedding, cb.cell,
                 ${cosineSql("b.embedding", "cb.centroid")} AS csim
          FROM embeddings b, cb),
        assigned AS (
          SELECT vec_id, embedding, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cell) AS crank
          FROM csims),
        cells AS (
          SELECT vec_id, embedding, cell FROM assigned WHERE crank = 1),
        q AS (SELECT vec_id AS qid, embedding AS qe
              FROM embeddings WHERE vec_id < 5),
        probed AS (
          SELECT vec_id AS qid, cell FROM assigned
          WHERE vec_id < 5 AND crank <= 2),
        ap AS (
          SELECT p.qid, c.vec_id,
                 row_number() OVER (PARTITION BY p.qid
                   ORDER BY ${cosineSql("c.embedding", "q.qe")} DESC,
                            c.vec_id) AS rnk
          FROM cells c
          JOIN probed p ON c.cell = p.cell
          JOIN q ON q.qid = p.qid
          WHERE c.vec_id <> p.qid),
        approx AS (SELECT qid, vec_id FROM ap WHERE rnk <= 10),
        ex AS (
          SELECT q.qid, e2.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("e2.embedding", "q.qe")} DESC,
                            e2.vec_id) AS rnk
          FROM embeddings e2, q WHERE e2.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM ex WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V31 — MEASURED recall@10 of PQ-ADC (v10's 4×16 codebook, init
    // encode) against the exact L2 top-k — the fifth member of the
    // measured-recall family, and the one whose ground truth is L2, not
    // cosine: ADC approximates squared Euclidean distance, so the
    // honest baseline is exact ||q−x||² (computed as q·q − 2q·x + x·x
    // from three identical-fold dots), not an objective it never
    // optimized. Code distances assemble in exact decimals (the v10
    // discipline); the ADC join touches codes only, never vectors.
    "v31_pq_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val e = emb
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("i0", "vf")))
          .select(col("vec_id"), (col("i0") / 16).cast("int").as("sub"),
            (col("i0") % 16).cast("int").as("dsub"),
            col("vf").cast("double").as("v"))
        val wInit = org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))
        val init = emb.orderBy(col("vec_id")).limit(4)
          .select(col("vec_id"))
          .withColumn("code", (row_number().over(wInit) - 1).cast("int"))
        val cb = init.join(e, "vec_id")
          .select(col("sub"), col("code"), col("dsub"), col("v").as("c"))
        val d = e.join(broadcast(cb), Seq("sub", "dsub"))
          .groupBy(col("vec_id"), col("sub"), col("code"))
          .agg(sum(round((col("v") - col("c")) * (col("v") - col("c")), 12)
            .cast("decimal(38,12)")).as("d2"))
        val wEnc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"), col("sub"))
          .orderBy(col("d2"), col("code"))
        val enc = d.withColumn("rn", row_number().over(wEnc))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("sub"), col("code"))
        val qt = d.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("sub"), col("code"),
            col("d2"))
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("ad2"), col("vec_id"))
        val approx = enc.join(broadcast(qt), Seq("sub", "code"))
          .filter(col("vec_id") =!= col("qid"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(round(sum(col("d2")).cast("double"), 6).as("ad2"))
          .withColumn("rnk", row_number().over(wA))
          .filter(col("rnk") <= 10)
          .select(col("qid"), col("vec_id"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val wE = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("sq"), col("vec_id"))
        val exact = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("sq", round(
            SimilarityOps.dotFold(col("embedding"), col("embedding"))
              - lit(2) * SimilarityOps.dotFold(col("embedding"), col("qe"))
              + SimilarityOps.dotFold(col("qe"), col("qe")), 6))
          .withColumn("rnk", row_number().over(wE))
          .filter(col("rnk") <= 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits"))
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      bench = true,
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id,
                 CAST((i - 1) // 16 AS INT) AS sub,
                 CAST((i - 1) % 16 AS INT) AS dsub,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS code, vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        cb AS (
          SELECT e.sub, i.code, e.dsub, e.v AS c
          FROM init i JOIN e ON e.vec_id = i.vec_id),
        d AS (
          SELECT e.vec_id, e.sub, cb.code,
                 sum(CAST(round((e.v - cb.c) * (e.v - cb.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN cb ON e.sub = cb.sub AND e.dsub = cb.dsub
          GROUP BY 1, 2, 3),
        enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM d) WHERE rn = 1),
        qt AS (SELECT vec_id AS qid, sub, code, d2
               FROM d WHERE vec_id < 5),
        adc AS (
          SELECT qt.qid, enc.vec_id,
                 round(CAST(sum(qt.d2) AS DOUBLE), 6) AS ad2
          FROM enc JOIN qt ON enc.sub = qt.sub AND enc.code = qt.code
          WHERE enc.vec_id <> qt.qid
          GROUP BY 1, 2),
        ap AS (
          SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY ad2, vec_id) AS rnk
          FROM adc),
        approx AS (SELECT qid, vec_id FROM ap WHERE rnk <= 10),
        q AS (SELECT vec_id AS qid, embedding AS qe
              FROM embeddings WHERE vec_id < 5),
        exq AS (
          SELECT q.qid, b.vec_id,
                 row_number() OVER (PARTITION BY q.qid ORDER BY
                   round(${dotSql("b.embedding", "b.embedding")}
                     - 2 * ${dotSql("b.embedding", "q.qe")}
                     + ${dotSql("q.qe", "q.qe")}, 6),
                   b.vec_id) AS rnk
          FROM embeddings b, q WHERE b.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM exq WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V32 — MEASURED recall@10 of SQ8 scalar quantization (v16's
    // per-dim min/max 8-bit codes, ranking by the cosine of the
    // DEQUANTIZED reconstruction) against the exact cosine top-k — the
    // sixth member of the measured-recall family, so every serving
    // layout in the library (LSH, multiprobe, IVF, BQ, PQ, SQ8) now
    // carries a hash-checked quality number. SQ8's recall should sit
    // near 1.0 — 8 bits/dim is nearly lossless — which is exactly the
    // quantified contrast with v29's 1-bit and v31's 2-bit-per-dim
    // codes that justifies the 4× storage.
    "v32_sq8_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val e = emb
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("i0", "vf")))
          .select(col("vec_id"), col("i0").as("dim"),
            col("vf").cast("double").as("v"))
        val mm = e.groupBy(col("dim"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val code = when(col("mx") === col("mn"), lit(0))
          .otherwise(round((col("v") - col("mn")) * 255.0 /
            (col("mx") - col("mn")), 0).cast("int"))
        val deq = e.join(broadcast(mm), Seq("dim"))
          .withColumn("vh",
            col("mn") + code * (col("mx") - col("mn")) / lit(255.0))
          .groupBy(col("vec_id"))
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("vh")))),
            x => x("vh")).as("vhat"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            col("embedding").cast("array<double>").as("qe"))
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val approx = deq.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("sim",
            SimilarityOps.cosine(col("vhat"), col("qe")))
          .withColumn("rnk", row_number().over(wA))
          .where(col("rnk") <= 10)
          .select(col("qid"), col("vec_id"))
        val exact = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits"))
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      bench = true,
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY 1),
        deq AS (
          SELECT e.vec_id,
                 list(mm.mn + (CASE WHEN mm.mx = mm.mn THEN 0
                       ELSE CAST(round((e.v - mm.mn) * 255.0 /
                              (mm.mx - mm.mn), 0) AS INT) END)
                    * (mm.mx - mm.mn) / 255.0 ORDER BY e.dim) AS vhat
          FROM e JOIN mm ON e.dim = mm.dim
          GROUP BY 1),
        q AS (SELECT vec_id AS qid, embedding AS qe
              FROM embeddings WHERE vec_id < 5),
        ap AS (
          SELECT q.qid, d.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("d.vhat", "q.qe")} DESC,
                            d.vec_id) AS rnk
          FROM deq d, q WHERE d.vec_id <> q.qid),
        approx AS (SELECT qid, vec_id FROM ap WHERE rnk <= 10),
        ex AS (
          SELECT q.qid, b.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("b.embedding", "q.qe")} DESC,
                            b.vec_id) AS rnk
          FROM embeddings b, q WHERE b.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM ex WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V29 — MEASURED recall@10 of binary quantization (v28's Hamming
    // top-40 + cosine re-rank) against the exact top-k: the third member
    // of the measured-recall family (v25 single-bucket LSH, v26
    // multiprobe), so the BQ serving layout's quality is a hash-checked
    // output too. Per-query Hamming candidate cuts are windows
    // (WindowGroupLimit pre-cuts map-side); the oracle recomputes the
    // bits from the same float compares.
    // V33 — oracle-gated MMR diversity re-rank (λ=0.6, k=5) over a
    // per-query top-20 cosine head (qids 0–3): the serving-side pass
    // between first-stage retrieval and the response, greedily picking
    // argmax λ·sim − (1−λ)·max-cos-to-selected. Spark runs the greedy
    // recursion inside flatMapGroups per query (mmrRerank — bounded
    // head, distributed across queries); the oracle replays the SAME
    // trajectory as k unrolled CTE rounds, which hash-match because
    // every score rounds to 9 dp BEFORE the argmax compare (the
    // t26/d21 discipline) and the reduction cosine is the identical
    // left-fold dot with sqrt(na·nb) — product THEN sqrt, matching
    // mmrRerank's d/sqrt(na*nb), not cosineSql's sqrt·sqrt.
    "v33_mmr_rerank" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = broadcast(emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("qid"), col("embedding").as("qe")))
        val wS = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val head = emb.join(q, col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("embedding"),
            SimilarityOps.cosine(col("embedding"), col("qe")).as("sim"))
          .withColumn("rn", row_number().over(wS))
          .where(col("rn") <= 20)
          .drop("rn")
        SimilarityOps.mmrRerank(head, lambdaParam = 0.6, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      bench = true,
      oracle = Some(mmrOracleSql)),

    "v29_bq_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val codes = emb.withColumn("code",
          SimilarityOps.signBits(col("embedding"), 64))
        val q = codes.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("code").as("qcode"))
        val exact = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        val wH = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("hamming").asc, col("vec_id").asc)
        val wS = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val approx = codes.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("hamming",
            SimilarityOps.hammingWords(col("code"), col("qcode")))
          .withColumn("hrank", row_number().over(wH))
          .where(col("hrank") <= 40)
          .withColumn("sim",
            SimilarityOps.cosine(col("embedding"), col("qe")))
          .withColumn("rank", row_number().over(wS))
          .where(col("rank") <= 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits"))
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < 5),
        h AS (
          SELECT q.qid, e.vec_id, e.embedding, q.qe,
                 list_sum(list_transform(generate_series(1, 64), i ->
                   CASE WHEN (CAST(e.embedding[i] AS DOUBLE) > 0.0)
                          <> (CAST(q.qe[i] AS DOUBLE) > 0.0)
                        THEN 1 ELSE 0 END)) AS hamming
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        hr AS (
          SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY hamming, vec_id) AS hrank
          FROM h),
        cand AS (SELECT * FROM hr WHERE hrank <= 40),
        sc AS (
          SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY ${cosineSql("embedding", "qe")} DESC,
                            vec_id) AS rnk
          FROM cand),
        approx AS (SELECT qid, vec_id FROM sc WHERE rnk <= 10),
        ex AS (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("e.embedding", "q.qe")} DESC,
                            e.vec_id) AS rnk
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM ex WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V26 — MEASURED recall@10 of MULTI-PROBE sign-LSH (own bucket plus
    // every Hamming-distance-1 bucket, 9 probes over 8 planes) against
    // the exact top-k: v25's twin for the recall REPAIR, so the number
    // AnnRecallSpec floors (multi-probe ⊇ single-bucket candidates,
    // hence recall(v26) >= recall(v25) per query) is itself a
    // hash-checked output. Spark probes via an exploded 9-row-per-query
    // broadcast and a bucket equi-join (lshMultiProbeTopK's shape —
    // (planes+1)/2^planes of the corpus in expectation, never a scan);
    // the oracle states the same probe set declaratively as
    // bit_count(xor(bucket, qbucket)) <= 1.
    "v26_multiprobe_recall" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val b = emb.withColumn("bucket",
          SimilarityOps.lshBucket(col("embedding"), 8))
        val q = b.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("bucket").as("qbucket"))
        // 9 probe rows per query: the bucket itself + each single-bit
        // flip (distinct by construction, so a corpus row matches at
        // most one probe per query — no candidate dedup needed).
        val probes = broadcast(q.select(col("qid"), col("qe"),
          explode(concat(
            array(col("qbucket")),
            transform(sequence(lit(0), lit(7)), p =>
              col("qbucket").bitwiseXOR(
                pow(lit(2.0), p.cast("double")).cast("long")))))
            .as("bucket")))
        val exact = SimilarityOps.topKPerQuery(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id"))
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val approx = b.join(probes, Seq("bucket"))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("sim", SimilarityOps.cosine(col("embedding"), col("qe")))
          .withColumn("rank", row_number().over(wA))
          .where(col("rank") <= 10)
          .select(col("qid"), col("vec_id"))
        exact
          .join(approx.withColumn("__m", lit(1)), Seq("qid", "vec_id"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("__m")).as("hits"))
          .withColumn("recall", round(col("hits") / 10.0, 6))
          .orderBy(col("qid"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
              FROM b WHERE vec_id < 5),
        ex AS (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("e.embedding", "q.qe")} DESC,
                            e.vec_id) AS rnk
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        exact AS (SELECT qid, vec_id FROM ex WHERE rnk <= 10),
        ap AS (
          SELECT q.qid, b.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY ${cosineSql("b.embedding", "q.qe")} DESC,
                            b.vec_id) AS rnk
          FROM b JOIN q
            ON bit_count(xor(b.bucket, q.qbucket)) <= 1
           AND b.vec_id <> q.qid),
        approx AS (SELECT qid, vec_id FROM ap WHERE rnk <= 10),
        hits AS (
          SELECT e.qid, CAST(count(a.vec_id) AS BIGINT) AS hits
          FROM exact e LEFT JOIN approx a
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY e.qid)
        SELECT qid, hits, round(hits / 10.0, 6) AS recall
        FROM hits ORDER BY qid""")),

    // V18 — SAMPLED codebook training: the codebooks fit on the
    // deterministic 40% md5-of-id subset (trainSampleOf — hashSplit's
    // recipe), encoding and serving stay full-corpus. The production
    // shape at 100 TB: Lloyd's re-scans its training set once per round,
    // and a small sample pins the centroids while the corpus pays only
    // the one-pass map-side encode. At full probe/refine the exact
    // top-k is codebook-independent, so brute-force SQL gates the whole
    // sampled-train/encode/persist/serve round-trip; that the codebook
    // REALLY trained on the sample is pinned structurally in
    // IvfIndexSpec (bit-equal to kmeansFit on the restated subset).
    "v18_sampled_build" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val path = freshIndexDir("v18_") + "/index"
        graft.operators.IvfIndex.write(
          emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path,
          trainPct = 40)
        val qvec = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .as[Array[Double]].head()
        graft.operators.IvfIndex.query(
          s, path, qvec, excludeId = Some(0L), nprobe = 4, k = 10)
          .select(col("vec_id"), col("sim"), col("rank"))
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        topk AS (
          SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V19 — shard merge: two indexes built independently over DISJOINT
    // halves of the corpus (even/odd ids — different codebooks by
    // construction), then mergeFrom folds the odd shard into the even
    // one by re-encoding its raw vectors against the destination's
    // frozen codebooks (append's map-side pass). Full probe over the
    // merged index must equal brute force over the WHOLE corpus — the
    // gate that merge lost no rows, re-derived every cell under the
    // right codebook, and left the serving path consistent.
    "v19_index_merge" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val base = freshIndexDir("v19_")
        val dst = base + "/even"
        val srcIx = base + "/odd"
        graft.operators.IvfIndex.write(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          kCells = 3, trainIters = 2, dst)
        graft.operators.IvfIndex.write(
          emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          kCells = 3, trainIters = 2, srcIx)
        graft.operators.IvfIndex.mergeFrom(s, dst, srcIx)
        val qvec = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .as[Array[Double]].head()
        graft.operators.IvfIndex.query(
          s, dst, qvec, excludeId = Some(0L), nprobe = 3, k = 10)
          .select(col("vec_id"), col("sim"), col("rank"))
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        topk AS (
          SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
        SELECT vec_id, sim,
               CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V20 — HYBRID search: BM25 lexical top-20 over `documents` fused
    // with exact-cosine top-20 over `embeddings` (shared 0..N-1 id
    // space) by reciprocal-rank fusion, score(id) = Σ 1/(60 + rank).
    // RRF is scale-free — ranks fuse without score calibration — which
    // is why it is the standard lexical×vector combiner. Contributions
    // are deterministic doubles rounded at 9 dp into a decimal sum, and
    // every ranking is rank-cut before the fuse, so the fusion stage is
    // top-k-sized no matter the corpus. The oracle restates both
    // retrievers (t19's BM25 CTEs, v1's cosine CTEs) and the same
    // fusion arithmetic.
    "v20_hybrid_rrf" -> Q(
      fn = (s, dir) => {
        val lex = graft.operators.SearchOps.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("dup", "vector", "query"), k = 20)
        val emb = t(s, dir, "embeddings")
        val vec = SimilarityOps.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          k = 20).withColumnRenamed("vec_id", "doc_id")
        graft.operators.SearchOps.rrfFuse(
          Seq(lex.select(col("doc_id"), col("rank")),
            vec.select(col("doc_id"), col("rank"))),
          "doc_id", "rank", k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH ${TextQueries.bm25ScoredCte(Seq("dup", "vector", "query"))},
        lex AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY s DESC, doc_id)
                   AS BIGINT) AS r
          FROM (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id
                LIMIT 20)),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        vscored AS (
          SELECT e.vec_id AS doc_id,
                 ${cosineSql("e.embedding", "q.qe")} AS sim
          FROM embeddings e, q
          WHERE e.vec_id <> 0),
        vec AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                   AS BIGINT) AS r
          FROM (SELECT doc_id, sim FROM vscored ORDER BY sim DESC, doc_id
                LIMIT 20)),
        u AS (SELECT doc_id, r FROM lex
              UNION ALL SELECT doc_id, r FROM vec),
        fused AS (
          SELECT doc_id,
                 sum(CAST(round(
                   CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + r), 9)
                   AS DECIMAL(38,9))) AS s,
                 count(*) AS n_lists
          FROM u GROUP BY 1),
        topk AS (SELECT doc_id, s, n_lists FROM fused
                 ORDER BY s DESC, doc_id LIMIT 10)
        SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS rrf, n_lists,
               CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT)
                 AS rank
        FROM topk
        ORDER BY rank"""),
      bench = true),

    // V11 — PQ + ADC over TRAINED codebooks (iters = 2): exercises the
    // Lloyd's update inside pqFit — assignment against the seed codebook,
    // then decimal-exact per-(sub, code, dsub) means — which v10's seed-
    // only oracle never reaches. Deterministic by the same construction
    // as v6_kmeans (lowest-id seeds, decimal-exact distances and means,
    // lowest-code ties), so the oracle unrolls the one training update
    // in SQL exactly as v6 does for full-vector k-means.
    "v11_pq_trained" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        SimilarityOps.pqTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          numSub = 4, kCodes = 4, iters = 2, k = 10)
          .orderBy(col("rank"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id,
                 CAST((i - 1) // 16 AS INT) AS sub,
                 CAST((i - 1) % 16 AS INT) AS dsub,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
                 vec_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        cb0 AS (
          SELECT e.sub, i.code, e.dsub, e.v AS c
          FROM init i JOIN e ON e.vec_id = i.vec_id),
        d0 AS (
          SELECT e.vec_id, e.sub, cb0.code,
                 sum(CAST(round((e.v - cb0.c) * (e.v - cb0.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN cb0 ON e.sub = cb0.sub AND e.dsub = cb0.dsub
          GROUP BY 1, 2, 3),
        a0 AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM d0) WHERE rn = 1),
        cb1 AS (
          SELECT e.sub, a.code, e.dsub,
                 CAST(sum(CAST(round(e.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS c
          FROM e JOIN a0 a ON e.vec_id = a.vec_id AND e.sub = a.sub
          GROUP BY 1, 2, 3),
        d1 AS (
          SELECT e.vec_id, e.sub, cb1.code,
                 sum(CAST(round((e.v - cb1.c) * (e.v - cb1.c), 12)
                   AS DECIMAL(38,12))) AS d2
          FROM e JOIN cb1 ON e.sub = cb1.sub AND e.dsub = cb1.dsub
          GROUP BY 1, 2, 3),
        enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
            FROM d1) WHERE rn = 1),
        qt AS (SELECT sub, code, d2 FROM d1 WHERE vec_id = 0),
        adc AS (
          SELECT enc.vec_id,
                 round(CAST(sum(qt.d2) AS DOUBLE), 6) AS ad2
          FROM enc JOIN qt ON enc.sub = qt.sub AND enc.code = qt.code
          WHERE enc.vec_id <> 0
          GROUP BY 1),
        topk AS (
          SELECT vec_id, ad2 FROM adc ORDER BY ad2, vec_id LIMIT 10)
        SELECT vec_id, ad2,
               CAST(row_number() OVER (ORDER BY ad2, vec_id) AS INT) AS rank
        FROM topk
        ORDER BY rank""")),

    // V21 — L2 normalization to unit vectors: the ingest-time prep that
    // turns every later cosine into a bare dot product. Per-row, one
    // codegen'd projection; elements round to 6 dp; the unit-norm
    // property is re-checked in the emitted norm column. The operator
    // emits a real array<double>; the query fixes each element to a
    // DECIMAL(18,6) string and CSV-joins so the oracle comparator
    // (which cannot sort array cells, and whose double→text rendering
    // differs from the JVM's) hashes a stable text form on both sides.
    "v21_l2_normalize" -> Q(
      fn = (s, dir) =>
        SimilarityOps.l2Normalize(t(s, dir, "embeddings"),
          "embedding", "unit")
          .select(col("vec_id"),
            array_join(transform(col("unit"),
              e => e.cast("decimal(18,6)").cast("string")), ",")
              .as("unit"),
            round(SimilarityOps.normFold(col("embedding")), 6).as("norm"))
          .orderBy(col("vec_id")),
      oracle = Some(s"""
        WITH n AS (
          SELECT vec_id, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nm
          FROM embeddings)
        SELECT vec_id,
               array_to_string(list_transform(generate_series(1, 64), __i ->
                 CAST(CAST(
                   CASE WHEN nm > 0
                        THEN round(CAST(embedding[__i] AS DOUBLE) / nm, 6)
                        ELSE 0.0 END
                   AS DECIMAL(18,6)) AS VARCHAR)), ',') AS unit,
               round(nm, 6) AS norm
        FROM n
        ORDER BY vec_id""")),

    // V22 — per-dimension stats: the profile that sizes SQ8 ranges and
    // spots dead/saturated dimensions. Mean/std derive in double from
    // exact decimal sums (order-independent addition — the a17
    // construction), so the emitted stats hash-match.
    "v22_dim_stats" -> Q(
      fn = (s, dir) =>
        SimilarityOps.dimStats(t(s, dir, "embeddings"), "embedding"),
      oracle = Some("""
        WITH x AS (
          SELECT CAST(i - 1 AS INT) AS dim,
                 CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings,
               LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
        s AS (
          SELECT dim, count(*) AS n,
                 round(min(v), 6) AS lo, round(max(v), 6) AS hi,
                 CAST(count(*) AS DOUBLE) AS nd,
                 CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                 CAST(sum(CAST(CAST(v AS DECIMAL(18,6)) *
                               CAST(v AS DECIMAL(18,6))
                          AS DECIMAL(38,12))) AS DOUBLE) AS s2
          FROM x GROUP BY dim)
        SELECT dim, n, lo, hi,
               round(s1 / nd, 6) AS mean,
               CASE WHEN nd > 1 THEN
                 round(sqrt((nd * s2 - s1 * s1) / (nd * (nd - 1.0))), 6)
               END AS std
        FROM s
        ORDER BY dim""")),

    // V46 — CONTRASTIVE TRIPLET MINING (anchor, positive, negative)
    // — the training-pair builder a contrastive/metric-learning run
    // consumes: per anchor, the positive is a same-label vector and
    // the negative a different-label vector, each drawn by the
    // SampleOps id-hash discipline (min md5("anchor:candidate") —
    // deterministic, retry-safe, no rand()) with the anchor's own
    // vector excluded. The emitted pos/neg cosines and margin make
    // triplet quality a hash-checked output. Shape: anchors
    // broadcast, candidates scored in one corpus pass, the per-
    // (anchor, side) pick is a rank-1 window (WindowGroupLimit cuts
    // map-side), vectors re-joined only for the k picked rows.
    "v46_triplet_mine" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val anchors = broadcast(emb.filter(col("vec_id") < 40)
          .select(col("vec_id").as("aid"), col("label").as("albl"),
            col("embedding").as("avec")))
        val cand = emb.join(anchors, col("vec_id") =!= col("aid"))
          .select(col("aid"), col("avec"),
            col("vec_id").as("cid"), col("embedding").as("cvec"),
            (col("label") === col("albl")).as("is_pos"),
            md5(concat_ws(":", col("aid"), col("vec_id"))).as("h"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("aid"), col("is_pos"))
          .orderBy(col("h"), col("cid"))
        val picks = cand.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val pos = picks.filter(col("is_pos"))
          .select(col("aid"), col("avec"), col("cid").as("pos_id"),
            SimilarityOps.cosine(col("cvec"), col("avec")).as("pos_sim"))
        val neg = picks.filter(!col("is_pos"))
          .select(col("aid").as("__a2"), col("cid").as("neg_id"),
            SimilarityOps.cosine(col("cvec"), col("avec")).as("neg_sim"))
        pos.join(neg, col("aid") === col("__a2"))
          .select(col("aid").as("anchor"), col("pos_id"), col("neg_id"),
            col("pos_sim"), col("neg_sim"),
            round(col("pos_sim") - col("neg_sim"), 6).as("margin"))
          .orderBy(col("anchor"))
      },
      bench = true,
      oracle = Some(s"""
        WITH a AS (
          SELECT vec_id AS aid, label AS albl, embedding AS avec
          FROM embeddings WHERE vec_id < 40),
        c AS (
          SELECT a.aid, a.avec, e.vec_id AS cid, e.embedding AS cvec,
                 e.label = a.albl AS is_pos,
                 md5(CAST(a.aid AS VARCHAR) || ':'
                     || CAST(e.vec_id AS VARCHAR)) AS h
          FROM a JOIN embeddings e ON e.vec_id <> a.aid),
        p AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY aid, is_pos
                        ORDER BY h, cid) AS rn
            FROM c)
          WHERE rn = 1),
        pos AS (
          SELECT aid, avec, cid AS pos_id,
                 ${cosineSql("cvec", "avec")} AS pos_sim
          FROM p WHERE is_pos),
        neg AS (
          SELECT aid, cid AS neg_id,
                 ${cosineSql("cvec", "avec")} AS neg_sim
          FROM p WHERE NOT is_pos)
        SELECT pos.aid AS anchor, pos.pos_id, neg.neg_id,
               pos.pos_sim, neg.neg_sim,
               round(pos.pos_sim - neg.neg_sim, 6) AS margin
        FROM pos JOIN neg USING (aid)
        ORDER BY anchor""")),

    // V48 — kNN LABEL-CONSISTENCY (label-noise detector): for each
    // probe vector, the share of its k=5 nearest neighbors (cosine)
    // that carry the SAME label — the standard confident-learning
    // signal for mislabeled samples (a probe whose neighborhood
    // disagrees with its tag is a relabel/review candidate). Probes
    // broadcast; one corpus pass scores, the per-probe k-cut is a
    // rank window WindowGroupLimit trims map-side; the share is one
    // integer division. flagged = consistency < 0.5 makes the review
    // queue itself a hash-checked output.
    "v48_knn_label_consistency" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = broadcast(emb.filter(col("vec_id") < 60)
          .select(col("vec_id").as("pid"), col("label").as("plbl"),
            col("embedding").as("pvec")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid"))
          .orderBy(col("sim").desc, col("cid").asc)
        emb.join(probes, col("vec_id") =!= col("pid"))
          .select(col("pid"), col("plbl"),
            col("vec_id").as("cid"), col("label").as("clbl"),
            SimilarityOps.cosine(col("embedding"), col("pvec"))
              .as("sim"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy(col("pid"), col("plbl"))
          .agg(sum(when(col("clbl") === col("plbl"), 1L).otherwise(0L))
            .as("n_same"))
          .select(col("pid").as("vec_id"), col("plbl").as("label"),
            col("n_same"),
            round(col("n_same").cast("double") / 5.0, 6)
              .as("consistency"),
            (col("n_same") < 3).as("flagged"))
          .orderBy(col("vec_id"))
      },
      bench = true,
      oracle = Some(s"""
        WITH p AS (
          SELECT vec_id AS pid, label AS plbl, embedding AS pvec
          FROM embeddings WHERE vec_id < 60),
        c AS (
          SELECT p.pid, p.plbl, e.vec_id AS cid, e.label AS clbl,
                 ${cosineSql("e.embedding", "p.pvec")} AS sim
          FROM p JOIN embeddings e ON e.vec_id <> p.pid),
        k AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, cid) AS rn
            FROM c)
          WHERE rn <= 5)
        SELECT pid AS vec_id, plbl AS label,
               CAST(sum(CASE WHEN clbl = plbl THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_same,
               round(CAST(sum(CASE WHEN clbl = plbl THEN 1 ELSE 0 END)
                 AS DOUBLE) / 5.0, 6) AS consistency,
               sum(CASE WHEN clbl = plbl THEN 1 ELSE 0 END) < 3
                 AS flagged
        FROM k GROUP BY 1, 2
        ORDER BY vec_id""")),

    // V51 — SQ8 RECONSTRUCTION-ERROR PROFILE: per-label mean/max L2
    // error between each vector and its dequantized SQ8 code — the
    // STORAGE-side quality number next to v32's serving-side recall
    // (recall says the ranking survives; this says how much geometry
    // the 4× compression spends, per label, so a mixed-quality corpus
    // shows WHERE quantization hurts). Per-dim squared diffs fold as
    // the strict left fold (zip_with + aggregate — the dotNSql
    // contract), per-vector errors round to 9 dp and cast EXACTLY to
    // decimal(18,9) for the order-free label rollup; one division at
    // the end. Codes derive from the same sq8Fit frame v16/v17 gate.
    "v51_sq8_error" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val mm = SimilarityOps.sq8Fit(emb, "embedding")
        val vhat = SimilarityOps.sq8DequantCol(
          SimilarityOps.sq8EncodeCol(col("embedding"), mm), mm)
        val err2 = aggregate(
          zip_with(col("embedding").cast("array<double>"), vhat,
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
        val errs = emb.select(col("label"),
          round(sqrt(err2), 9).as("err"))
        errs.groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            sum(col("err").cast("decimal(18,9)")).as("s"),
            max(col("err")).as("mx"))
          .select(col("label"), col("n"),
            round(col("s").cast("double") / col("n").cast("double"), 6)
              .as("mean_err"),
            round(col("mx"), 6).as("max_err"))
          .orderBy(col("label"))
      },
      bench = true,
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, label, i AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)),
        mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY 1),
        d AS (
          SELECT e.vec_id, e.label, e.dim, e.v,
                 mm.mn + (CASE WHEN mm.mx = mm.mn THEN 0
                          ELSE CAST(round((e.v - mm.mn) * 255.0 /
                                 (mm.mx - mm.mn), 0) AS INT) END)
                   * (mm.mx - mm.mn) / 255.0 AS vhat
          FROM e JOIN mm ON e.dim = mm.dim),
        terms AS (
          SELECT vec_id, label,
                 list((d.v - d.vhat) * (d.v - d.vhat)
                   ORDER BY d.dim) AS t2
          FROM d GROUP BY 1, 2),
        errs AS (
          SELECT label,
                 round(sqrt(list_reduce(t2, (a, b) -> a + b)), 9)
                   AS err
          FROM terms)
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(CAST(err AS DECIMAL(18,9))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_err,
               round(max(err), 6) AS max_err
        FROM errs GROUP BY 1
        ORDER BY label""")),

    // V50 — EMBEDDING NORM OUTLIER SCREEN: per-vector L2 norm,
    // corpus z-score, and the |z| > 3 flag — the cheapest sanity
    // screen before an ANN build (a zero/huge-norm vector poisons
    // cosine serving and k-means alike; v22 profiles dimensions,
    // this profiles VECTORS). This corpus ships unit-normalized
    // (every norm exactly 1.0 — the screen would read vacuously
    // clean AND divide by a zero std), so the query INJECTS
    // deterministic corruption in-engine — every 25th vector scaled
    // by 1 + id%7, every 50th zeroed, the t36/m3 fixture discipline
    // — and the screen must flag exactly those. Norms round to 6 dp
    // so they cast exactly to decimal(18,6) and the corpus moments
    // fold order-free; the z chain is the a51 all-double sequence,
    // guarded for the all-equal std = 0 corpus. One in-row norm pass
    // + one 1-row broadcast.
    "v50_norm_outliers" -> Q(
      fn = (s, dir) => {
        val factor = when(pmod(col("vec_id"), lit(50)) === 0, lit(0.0))
          .when(pmod(col("vec_id"), lit(25)) === 0,
            (lit(1) + pmod(col("vec_id"), lit(7))).cast("double"))
          .otherwise(lit(1.0))
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"),
            round(SimilarityOps.normFold(col("embedding")) * factor, 6)
              .as("norm"))
        val dec = col("norm").cast("decimal(18,6)")
        val stats = emb.agg(count(lit(1)).as("n"),
            sum(dec).as("s1"),
            sum((dec * dec).cast("decimal(38,12)")).as("s2"))
          .select(col("n"),
            (col("s1").cast("double") / col("n").cast("double"))
              .as("mean"),
            sqrt((col("n").cast("double") * col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
              (col("n").cast("double") *
                (col("n") - 1).cast("double"))).as("std"))
        emb.crossJoin(broadcast(stats))
          .select(col("vec_id"), col("norm"),
            when(col("std") > 0,
              round((col("norm") - col("mean")) / col("std"), 6))
              .otherwise(lit(0.0)).as("z"))
          .withColumn("is_outlier", abs(col("z")) > 3.0)
          .orderBy(col("vec_id"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id,
                 round(sqrt(${dotSql("embedding", "embedding")})
                   * (CASE WHEN vec_id % 50 = 0 THEN 0.0
                           WHEN vec_id % 25 = 0
                             THEN CAST(1 + vec_id % 7 AS DOUBLE)
                           ELSE 1.0 END), 6) AS norm
          FROM embeddings),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                 CAST(sum(CAST(CAST(norm AS DECIMAL(18,6))
                     * CAST(norm AS DECIMAL(18,6)) AS DECIMAL(38,12)))
                   AS DOUBLE) AS s2
          FROM e),
        m AS (
          SELECT n, s1 / n AS mean,
                 sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) AS std
          FROM st)
        SELECT vec_id, norm,
               CASE WHEN std > 0
                    THEN round((norm - mean) / std, 6)
                    ELSE 0.0 END AS z,
               abs(CASE WHEN std > 0
                        THEN round((norm - mean) / std, 6)
                        ELSE 0.0 END) > 3.0 AS is_outlier
        FROM e CROSS JOIN m
        ORDER BY vec_id""")),

    // V49 — CENTROID-STATE MERGE ALGEBRA: the old/new snapshots are
    // each summarized in TWO id-range parts, folded with
    // centroidMerge, and drifted from summaries alone — against
    // v44's one-shot oracle VERBATIM, so the hash match IS the
    // associativity proof (the a47 OLS-merge discipline). This is the
    // 100 TB shape: per-partition/per-day centroid state folds
    // without re-reading vectors; drift answers from O(labels×dims)
    // summary rows.
    "v49_centroid_merge" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        def part(m: Int) = SimilarityOps.centroidSummarize(
          emb.filter(pmod(col("vec_id"), lit(4)) === m),
          "label", "embedding")
        val oldSum = SimilarityOps.centroidMerge(
          part(0).unionByName(part(2)))
        val newSum = SimilarityOps.centroidMerge(
          part(1).unionByName(part(3)))
        SimilarityOps.centroidDriftFrom(oldSum, newSum)
          .orderBy(col("label"))
      },
      oracle = Some(centroidDriftOracleSql)),

    // V47 — HARD-NEGATIVE MINING: for each anchor, the single
    // highest-cosine DIFFERENT-label vector — the negative that
    // actually teaches a contrastive model something (v46's hash-drawn
    // negative is easy by construction; the hard one sits right at the
    // decision boundary). Also emits the hardness gap vs the anchor's
    // best same-label positive, so "how confusable is this class" is
    // a hash-checked output. Shape: anchors broadcast, one corpus
    // pass scores candidates, per-(anchor, side) top-1 is a rank-1
    // window WindowGroupLimit cuts map-side — no vectors shuffle.
    "v47_hard_negatives" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val anchors = broadcast(emb.filter(col("vec_id") < 40)
          .select(col("vec_id").as("aid"), col("label").as("albl"),
            col("embedding").as("avec")))
        val scored = emb.join(anchors, col("vec_id") =!= col("aid"))
          .select(col("aid"),
            col("vec_id").as("cid"),
            (col("label") === col("albl")).as("is_pos"),
            SimilarityOps.cosine(col("embedding"), col("avec"))
              .as("sim"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("aid"), col("is_pos"))
          .orderBy(col("sim").desc, col("cid").asc)
        val top = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val pos = top.filter(col("is_pos"))
          .select(col("aid"), col("cid").as("best_pos_id"),
            col("sim").as("best_pos_sim"))
        val neg = top.filter(!col("is_pos"))
          .select(col("aid").as("__a2"), col("cid").as("hard_neg_id"),
            col("sim").as("hard_neg_sim"))
        pos.join(neg, col("aid") === col("__a2"))
          .select(col("aid").as("anchor"), col("best_pos_id"),
            col("hard_neg_id"), col("best_pos_sim"),
            col("hard_neg_sim"),
            round(col("best_pos_sim") - col("hard_neg_sim"), 6)
              .as("hardness_gap"))
          .orderBy(col("anchor"))
      },
      bench = true,
      oracle = Some(s"""
        WITH a AS (
          SELECT vec_id AS aid, label AS albl, embedding AS avec
          FROM embeddings WHERE vec_id < 40),
        c AS (
          SELECT a.aid, e.vec_id AS cid, e.label = a.albl AS is_pos,
                 ${cosineSql("e.embedding", "a.avec")} AS sim
          FROM a JOIN embeddings e ON e.vec_id <> a.aid),
        p AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY aid, is_pos
                        ORDER BY sim DESC, cid) AS rn
            FROM c)
          WHERE rn = 1),
        pos AS (SELECT aid, cid AS best_pos_id, sim AS best_pos_sim
                FROM p WHERE is_pos),
        neg AS (SELECT aid, cid AS hard_neg_id, sim AS hard_neg_sim
                FROM p WHERE NOT is_pos)
        SELECT pos.aid AS anchor, best_pos_id, hard_neg_id,
               best_pos_sim, hard_neg_sim,
               round(best_pos_sim - hard_neg_sim, 6) AS hardness_gap
        FROM pos JOIN neg USING (aid)
        ORDER BY anchor""")),

    // V44 — per-label CENTROID DRIFT between two embedding snapshots
    // (even vec_ids = old, odd = new — the parity split every
    // deterministic A/B harness here uses): per (label, snapshot, dim)
    // means from exact decimal sums rounded to 9 dp, then the L2 and
    // mean-|Δ| distances between each label's old and new centroid.
    // THE embedding-space monitoring number: a re-embedded or
    // re-trained encoder shifts centroids long before downstream
    // metrics notice, and at 100 TB this is one posexplode → one
    // partial-aggregable groupBy(label, half, dim) → a 64-row-per-
    // label join — no vector ever leaves its partition un-aggregated.
    // The 9-dp mean differences cast EXACTLY to decimal(18,9) (they
    // sit ~2 ulp from the 9-dp grid, never near a cast midpoint), so
    // Δ² and Σ|Δ| fold in decimal with zero float-order dependence;
    // sqrt and the /64 are one IEEE step each from exact operands.
    "v44_centroid_drift" -> Q(
      fn = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val dims = emb.select(col("label"),
          (pmod(col("vec_id"), lit(2)) === 0).as("is_old"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "x")))
        val cent = dims
          .groupBy(col("label"), col("is_old"), col("dim"))
          .agg(sum(col("x").cast("decimal(18,6)")).as("s1"),
            count(lit(1)).as("n"))
          .select(col("label"), col("is_old"), col("dim"),
            round(col("s1").cast("double") / col("n").cast("double"), 9)
              .as("m"))
        val o = cent.filter(col("is_old"))
          .select(col("label"), col("dim"), col("m").as("mo"))
        val nw = cent.filter(!col("is_old"))
          .select(col("label").as("__l"), col("dim").as("__d"),
            col("m").as("mn"))
        val dd = round(col("mn") - col("mo"), 9).cast("decimal(18,9)")
        val counts = emb.groupBy(col("label"))
          .agg(sum(when(pmod(col("vec_id"), lit(2)) === 0, 1L)
            .otherwise(0L)).as("n_old"),
            sum(when(pmod(col("vec_id"), lit(2)) === 1, 1L)
              .otherwise(0L)).as("n_new"))
        o.join(nw, col("label") === col("__l") && col("dim") === col("__d"))
          .groupBy(col("label"))
          .agg(sum(dd * dd).as("d2"),
            sum(abs(dd)).as("l1"))
          .join(counts, "label")
          .select(col("label"), col("n_old"), col("n_new"),
            round(sqrt(col("d2").cast("double")), 6).as("drift_l2"),
            round(col("l1").cast("double") / lit(64.0), 9)
              .as("mean_abs_diff"))
          .orderBy(col("label"))
      },
      bench = true,
      oracle = Some(centroidDriftOracleSql))
  )
}
