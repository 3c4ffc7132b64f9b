package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.{IncrementalRunner, Layouts}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans, filters, projections, equi-joins and plain aggregates — SURVEY.md
  * §2.1 (S1, S2, S9-S12), §2.2 (P1-P8), §2.3 (J1), §2.4 (A5) re-expressed on
  * the driver test tables. Each entry cites the reference behavior it
  * re-implements.
  */
object RelationalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, Q] = Map(
    // S1 — measurement scan with tag + time-range pushdown
    // (pipeline/cosmoz_process_levels.py:49-54: SELECT <cols> FROM m WHERE
    //  time > t AND site_no=$s). Filter + projection reach the parquet scan.
    "s1_scan_pushdown" -> Q(
      fn = (s, dir) => {
        // Filter on the RAW stored form of `ts` so both predicates reach
        // the parquet scan (PushedFilters -> row-group pruning): a
        // predicate on a CONVERTED column is opaque to the source. The
        // generator has shipped ts as TIMESTAMP(NANOS)-read-as-long and
        // as native TIMESTAMP_NTZ across rounds — bind the literal to
        // whichever type the file actually carries (the cast of a
        // foldable literal keeps the comparison pushable either way).
        val raw = s.read.parquet(s"$dir/events.parquet")
        val bound: Column = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            lit(1705276800L * 1000000000L) // 2024-01-15 00:00:00 UTC in nanos
          case dt => lit("2024-01-15 00:00:00").cast(dt)
        }
        raw.filter(col("user_id") === 7 && col("ts") >= bound)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id, user_id, event_type, value FROM events
        WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        ORDER BY event_id""")),

    // S2 — delimited text source (pipeline/csv_influx_converter.py:95-374):
    // typed TSV read with explicit schema; proven by a TSV round-trip of the
    // nation table (write then re-read must be lossless).
    "s2_csv_roundtrip" -> Q(
      fn = (s, dir) => {
        // Unique dir under java.io.tmpdir: CWD-independent, no collision
        // between concurrent runs; cleaned up on JVM exit (the re-read is
        // lazy, so the files must outlive this function).
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_s2_nation_tsv_").toString
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
          }
          rm(new java.io.File(tmp))
        }
        t(s, dir, "nation")
          .coalesce(1)
          .write.mode("overwrite")
          .option("sep", "\t").option("header", "true")
          .csv(tmp)
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.option("sep", "\t").option("header", "true")
          .schema(schema).csv(tmp)
          .orderBy(col("n_nationkey"))
      },
      oracle = Some(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // S15 — JSONL round-trip: the native interchange format of LLM data
    // pipelines (one JSON object per line — exactly Spark's json source,
    // which reads/writes it line-parallel: a 100 TB JSONL corpus splits
    // per line like CSV). Write the documents table as JSONL, read it
    // back with an EXPLICIT schema (schema inference is a full extra
    // scan and nondeterministic under type drift — production readers
    // pin the schema), and every field must survive the trip bit for
    // bit, newline-bearing text included (JSON string escaping is the
    // point vs naive line formats).
    "s15_jsonl_roundtrip" -> Q(
      fn = (s, dir) => {
        val tmp = freshTmpDir("s15_docs_jsonl_")
        t(s, dir, "documents").write.mode("overwrite").json(tmp)
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType),
          StructField("lang", StringType),
          StructField("source", StringType),
          StructField("n_chars", LongType)))
        s.read.schema(schema).json(tmp)
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        "SELECT doc_id, text, lang, source, n_chars FROM documents " +
          "ORDER BY doc_id")),

    // S17 — ORC source/sink: the other columnar interchange format
    // (predicate pushdown + column pruning work the same as parquet's —
    // the scan is an OrcScan with pushed filters). Write the documents
    // table as ORC, read it back with an explicit schema, every field
    // must survive bit for bit.
    "s17_orc_roundtrip" -> Q(
      fn = (s, dir) => {
        val tmp = freshTmpDir("s17_docs_orc_")
        t(s, dir, "documents").write.mode("overwrite").orc(tmp)
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType),
          StructField("lang", StringType),
          StructField("source", StringType),
          StructField("n_chars", LongType)))
        s.read.schema(schema).orc(tmp)
          .where(col("doc_id") >= 0) // a pushable predicate on the scan
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        "SELECT doc_id, text, lang, source, n_chars FROM documents " +
          "WHERE doc_id >= 0 ORDER BY doc_id")),

    // S22 — schema evolution across table generations: an older parquet
    // generation lacks a column a newer one carries; mergeSchema
    // unifies the footers at planning time (schema-only — no data
    // rewrite of the old files, the cheap half of lake schema
    // evolution) and the missing column reads as null for old rows.
    // Both generations are derived deterministically from documents.
    "s22_schema_merge" -> Q(
      fn = (s, dir) => {
        val tmp = freshTmpDir("s22_schema_")
        val docs = t(s, dir, "documents")
        docs.select(col("doc_id"), col("lang"))
          .where(col("doc_id") < 250)
          .write.mode("overwrite").parquet(s"$tmp/gen1")
        docs.select(col("doc_id"), col("lang"), col("n_chars"))
          .where(col("doc_id") >= 250)
          .write.mode("overwrite").parquet(s"$tmp/gen2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$tmp/gen1", s"$tmp/gen2")
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id, lang,
               CASE WHEN doc_id >= 250 THEN n_chars END AS n_chars
        FROM documents
        ORDER BY doc_id""")),

    // S24 — generic table compaction: a 32-file append-accumulated copy
    // of documents compacts to target-sized files behind the rename-
    // aside crash-safe swap (the stores' protocol on a bare directory);
    // contents must survive byte-equal — only the file geometry moves.
    // S28 — ERASURE SWEEP (right-to-be-forgotten audit): one subject
    // set (user_id ≡ 0 mod 97) swept across every table that keys on
    // it — events by user_id, orders by o_custkey, customer by
    // c_custkey — reporting per-table before/purged/after counts.
    // The warehouse-scale shape of S10's single-table delete: each
    // table pays ONE anti-join against the broadcast subject set
    // (conditional partial-aggregated counts here, the same plan the
    // write-side purge runs), and the audit row proves completeness
    // per table. All BIGINT.
    "s28_erasure_sweep" -> Q(
      fn = (s, dir) => {
        def sweep(df: DataFrame, key: String, table: String) =
          df.agg(
            count(lit(1)).as("rows_before"),
            sum(when(pmod(col(key), lit(97)) === 0, 1L).otherwise(0L))
              .as("rows_purged"))
            .select(lit(table).as("table_name"), col("rows_before"),
              col("rows_purged"),
              (col("rows_before") - col("rows_purged")).as("rows_after"))
        val out = sweep(
          t(s, dir, "events").select(col("user_id")), "user_id",
          "events")
          .unionByName(sweep(
            t(s, dir, "orders").select(col("o_custkey").as("user_id")),
            "user_id", "orders"))
          .unionByName(sweep(
            t(s, dir, "customer").select(col("c_custkey").as("user_id")),
            "user_id", "customer"))
        out.orderBy(col("table_name"))
      },
      oracle = Some("""
        WITH sw AS (
          SELECT 'events' AS table_name,
                 CAST(count(*) AS BIGINT) AS rows_before,
                 CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS rows_purged
          FROM events
          UNION ALL
          SELECT 'orders', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0
                   END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'customer', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0
                   END) AS BIGINT)
          FROM customer)
        SELECT table_name, rows_before, rows_purged,
               rows_before - rows_purged AS rows_after
        FROM sw ORDER BY table_name""")),

    // S27 — PARTITION LAYOUT ADVISOR: for a proposed partition key
    // (lang, source) over the documents corpus, the numbers a 100 TB
    // layout decision actually needs — rows, bytes (payload chars as
    // the proxy), byte share, estimated file count at the target file
    // size, and each partition's skew vs the mean. One partial-
    // aggregable groupBy + a broadcast 1-row total; everything BIGINT
    // until the two final divisions. The advisory rule is the one
    // s24's compaction and Layouts' bucketing implement: partitions
    // at ≫1 target file want splitting/bucketing, many ≪1 partitions
    // want coalescing into a parent key.
    "s27_layout_advisor" -> Q(
      fn = (s, dir) => {
        val target = 65536L // bytes per file; 128 MiB in production
        val per = t(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("rows"),
            sum(col("n_chars")).as("bytes"))
        val tot = per.agg(sum(col("bytes")).as("tot_bytes"),
          count(lit(1)).as("n_parts"))
        per.crossJoin(broadcast(tot))
          .select(col("lang"), col("source"), col("rows"), col("bytes"),
            round(col("bytes").cast("double") /
              col("tot_bytes").cast("double"), 6).as("byte_share"),
            greatest(lit(1L),
              ceil(col("bytes").cast("double") / lit(target.toDouble))
                .cast("bigint")).as("est_files"),
            round(col("bytes").cast("double") * col("n_parts").cast("double") /
              col("tot_bytes").cast("double"), 6).as("skew_vs_mean"))
          .orderBy(col("lang"), col("source"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS rows,
                 CAST(sum(n_chars) AS BIGINT) AS bytes
          FROM documents GROUP BY 1, 2),
        tot AS (
          SELECT CAST(sum(bytes) AS BIGINT) AS tot_bytes,
                 CAST(count(*) AS BIGINT) AS n_parts
          FROM per)
        SELECT lang, source, rows, bytes,
               round(CAST(bytes AS DOUBLE)
                 / CAST(tot_bytes AS DOUBLE), 6) AS byte_share,
               greatest(1, CAST(ceil(CAST(bytes AS DOUBLE) / 65536.0)
                 AS BIGINT)) AS est_files,
               round(CAST(bytes AS DOUBLE) * CAST(n_parts AS DOUBLE)
                 / CAST(tot_bytes AS DOUBLE), 6) AS skew_vs_mean
        FROM per CROSS JOIN tot
        ORDER BY lang, source""")),

    "s24_compact_table" -> Q(
      fn = (s, dir) => {
        val tmp = freshTmpDir("s24_compact_") + "/docs"
        t(s, dir, "documents")
          .repartition(32).write.mode("overwrite").parquet(tmp)
        Layouts.compactTable(s, tmp, targetFileBytes = 8L * 1024 * 1024)
        s.read.parquet(tmp)
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        "SELECT doc_id, text, lang, source, n_chars FROM documents " +
          "ORDER BY doc_id")),

    // S23 — CDC changelog apply (diffSnapshots' inverse, the lake MERGE
    // primitive): latest change per key wins — a second-generation 'D'
    // overrides a first-generation 'U' on the same key; untouched rows
    // pass through. The changelog is synthesized deterministically from
    // orders; the oracle states the NET EFFECT (what the table must
    // look like), independent of the merge mechanics — a stronger check
    // than replaying the same window dance in SQL.
    "s23_cdc_apply" -> Q(
      fn = (s, dir) => {
        val orders = t(s, dir, "orders")
        val snapshot = orders.select(
          col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val upserts = snapshot.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 5.0)
          .withColumn("op", lit("U")).withColumn("seq", lit(1L))
        val lateDeletes = snapshot.filter(col("o_orderkey") % 20 === 0)
          .withColumn("op", lit("D")).withColumn("seq", lit(2L))
        val inserts = snapshot.filter(col("o_orderkey") % 10 === 5)
          .withColumn("o_totalprice", col("o_totalprice") * 2.0)
          .withColumn("op", lit("I")).withColumn("seq", lit(1L))
        IncrementalRunner.applyChangelog(
          snapshot, upserts.unionByName(lateDeletes).unionByName(inserts),
          Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 5.0
                    WHEN o_orderkey % 10 = 5 THEN o_totalprice * 2.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders
        WHERE o_orderkey % 20 <> 0
        ORDER BY o_orderkey""")),

    // S26 — SCD-2 history from a versioned changelog: s23 answers "what
    // is true NOW"; this keeps every version addressable — each
    // non-delete version valid from its own seq until the next event on
    // the key (a later version supersedes, a delete closes), the as-of
    // audit shape regulatory replay needs. ONE per-key window pass —
    // deletes' entire effect is bounding the predecessor via lead(), so
    // there is no self-join and no snapshot scan (cost O(changelog)).
    "s26_scd2_history" -> Q(
      fn = (s, dir) => {
        val orders = t(s, dir, "orders")
        val base = orders.select(col("o_orderkey"), col("o_totalprice"))
          .withColumn("op", lit("I")).withColumn("seq", lit(1L))
        val reprice = orders.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 10.0).as("o_totalprice"))
          .withColumn("op", lit("U")).withColumn("seq", lit(2L))
        val deletes = orders.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), lit(0.0).as("o_totalprice"))
          .withColumn("op", lit("D")).withColumn("seq", lit(3L))
        IncrementalRunner.scd2History(
          base.unionByName(reprice).unionByName(deletes),
          Seq("o_orderkey"))
          .orderBy(col("o_orderkey"), col("valid_from"))
      },
      bench = true,
      oracle = Some("""
        WITH ch AS (
          SELECT o_orderkey, o_totalprice, 'I' AS op,
                 CAST(1 AS BIGINT) AS seq
          FROM orders
          UNION ALL
          SELECT o_orderkey, o_totalprice + 10.0, 'U', 2
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL
          SELECT o_orderkey, 0.0, 'D', 3
          FROM orders WHERE o_orderkey % 5 = 0),
        h AS (
          SELECT o_orderkey, o_totalprice, op, seq AS valid_from,
                 lead(seq) OVER (PARTITION BY o_orderkey
                   ORDER BY seq, op) AS valid_to
          FROM ch)
        SELECT o_orderkey, o_totalprice, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM h WHERE op <> 'D'
        ORDER BY o_orderkey, valid_from""")),

    // S18 — snapshot diff: added/removed/changed keys between two table
    // generations plus WHICH columns changed — the change-feed a plain-
    // parquet lake derives by comparing snapshots (both generations
    // synthesized deterministically from orders). Null-safe compares;
    // the change set is churn-sized, never table-sized. The operator
    // emits changed_cols as a real array; the query joins it to a CSV
    // string so the oracle comparator (which cannot sort array cells)
    // can hash it.
    "s18_snapshot_diff" -> Q(
      fn = (s, dir) => {
        val orders = t(s, dir, "orders")
        val oldGen = orders.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
        val newGen = orders.filter(col("o_orderkey") % 5 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.5)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            col("o_orderstatus"))
        IncrementalRunner.diffSnapshots(
          oldGen, newGen, Seq("o_orderkey"),
          Seq("o_totalprice", "o_orderstatus"))
          .withColumn("changed_cols", array_join(col("changed_cols"), ","))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
          WHERE o_orderkey % 7 <> 0),
        n AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.5
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 5 <> 0),
        j AS (
          SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                 o.o_orderkey AS ok, n.o_orderkey AS nk,
                 CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                      THEN 'o_totalprice' END AS c1,
                 CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      THEN 'o_orderstatus' END AS c2
          FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey),
        d AS (
          SELECT o_orderkey,
                 CASE WHEN ok IS NULL THEN 'added'
                      WHEN nk IS NULL THEN 'removed'
                      WHEN c1 IS NOT NULL OR c2 IS NOT NULL THEN 'changed'
                 END AS change,
                 list_filter([c1, c2], x -> x IS NOT NULL) AS cols
          FROM j)
        SELECT o_orderkey, change,
               -- array_to_string([]) is NULL in DuckDB; Spark's
               -- array_join([]) is '' — coalesce to match
               coalesce(array_to_string(
                 CASE WHEN change = 'changed' THEN cols ELSE [] END, ','),
                 '') AS changed_cols
        FROM d WHERE change IS NOT NULL
        ORDER BY o_orderkey""")),

    // S19 — JSON column extraction: corpora arrive with JSON metadata
    // columns; both engines build the SAME json text, then extract with
    // their native accessors (get_json_object / json_extract) — typed
    // values, not raw json, are compared.
    "s19_json_extract" -> Q(
      fn = (s, dir) => {
        val j = concat(lit("{\"id\":"), col("doc_id"),
          lit(",\"lang\":\""), col("lang"),
          lit("\",\"n\":"), col("n_chars"), lit("}"))
        t(s, dir, "documents")
          .select(col("doc_id"), j.as("__j"))
          .select(col("doc_id"),
            get_json_object(col("__j"), "$.lang").as("j_lang"),
            get_json_object(col("__j"), "$.n").cast("long").as("j_n"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT doc_id,
                 '{"id":' || doc_id || ',"lang":"' || lang || '","n":' ||
                   n_chars || '}' AS j
          FROM documents)
        SELECT doc_id,
               json_extract_string(j, '$.lang') AS j_lang,
               CAST(json_extract(j, '$.n') AS BIGINT) AS j_n
        FROM b
        ORDER BY doc_id""")),

    // S20 — set operations (INTERSECT / EXCEPT / UNION DISTINCT): the
    // remaining relational-algebra surface, as one labeled union. Spark
    // plans these as aggregate + join under the hood — no special-casing
    // needed, but the semantics (DISTINCT, null-safe equality) must
    // match ANSI, which is exactly what the oracle checks.
    "s20_set_ops" -> Q(
      fn = (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
        c.intersect(sup).withColumn("op", lit("both"))
          .unionByName(c.except(sup).withColumn("op", lit("cust_only")))
          .unionByName(sup.except(c).withColumn("op", lit("supp_only")))
          .select(col("op"), col("k"))
          .orderBy(col("op"), col("k"))
      },
      oracle = Some("""
        SELECT 'both' AS op, k FROM
          (SELECT c_nationkey AS k FROM customer
           INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'cust_only', k FROM
          (SELECT c_nationkey AS k FROM customer
           EXCEPT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'supp_only', k FROM
          (SELECT s_nationkey AS k FROM supplier
           EXCEPT SELECT c_nationkey FROM customer)
        ORDER BY op, k""")),

    // S16 — z-order (Morton) key: the multi-column clustering key behind
    // Layouts.zorder. Power-of-2 bin shifts (pure >>, no division) and
    // LSB-first interleave make the key exact integer arithmetic both
    // engines reproduce bit-for-bit — the oracle runs
    // Layouts.zvalueSql, the ANSI restatement generated from the SAME
    // shift constants the Spark side uses. Fixed clamp bounds (domain
    // knowledge, not data stats) keep the key stable under appends.
    "s16_zorder_key" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"),
            Layouts.zvalue(
              Seq(col("l_orderkey"), col("l_partkey")),
              mins = Seq(1L, 1L), maxs = Seq(1L << 20, 1L << 12),
              bits = 8).as("z"))
          .orderBy(col("z"), col("l_orderkey"), col("l_partkey")),
      oracle = Some(s"""
        SELECT l_orderkey, l_partkey,
               ${Layouts.zvalueSql(
                 Seq("l_orderkey", "l_partkey"),
                 mins = Seq(1L, 1L), maxs = Seq(1L << 20, 1L << 12),
                 bits = 8)} AS z
        FROM lineitem
        ORDER BY z, l_orderkey, l_partkey""")),

    // S6/S8/S9 — idempotent windowed upsert, proven by a parquet
    // round-trip: write a day-partitioned table, dynamically OVERWRITE one
    // (site, day) partition with updated (and fewer) rows, read back. The
    // final state must show the replacement partition's new contents and
    // every other partition untouched — i.e. InfluxDB point-overwrite +
    // DROP SERIES semantics (pipeline/cosmoz_process_levels.py:56-58).
    "s6_upsert_roundtrip" -> Q(
      fn = (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_s6_upsert_").toString
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
          }
          rm(new java.io.File(tmp))
        }
        val base = t(s, dir, "events").select(
          (col("user_id") % 5).cast("int").as("site_no"),
          col("event_id"), col("ts").as("time"),
          coalesce(col("value"), lit(0.0)).as("value"))
        // Partition-selection metadata (one scalar), not a data-path
        // collect: which day to overwrite.
        val minDay = base.filter(col("site_no") === 2)
          .agg(min(to_date(col("time")))).collect()(0).getDate(0).toString
        IncrementalRunner.upsertByDay(base, tmp)
        val updated = base
          .filter(col("site_no") === 2 &&
            to_date(col("time")) === lit(minDay) && col("event_id") % 2 === 0)
          .withColumn("value", col("value") + lit(1000.0))
        IncrementalRunner.upsertByDay(updated, tmp)
        IncrementalRunner.readLevel(s, tmp)
          .select(col("site_no"), col("event_id"), rd(col("value"), 6).as("value"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT CAST(user_id % 5 AS INT) AS site_no, event_id, ts,
                 coalesce(value, 0.0) AS value
          FROM events),
        minday AS (SELECT min(CAST(ts AS DATE)) AS d FROM base WHERE site_no = 2)
        SELECT site_no, event_id,
               round(CASE WHEN site_no = 2 AND CAST(ts AS DATE) = (SELECT d FROM minday)
                          THEN value + 1000.0 ELSE value END, 6) AS value
        FROM base
        WHERE NOT (site_no = 2 AND CAST(ts AS DATE) = (SELECT d FROM minday)
                   AND event_id % 2 = 1)
        ORDER BY event_id""")),

    // S10 — row delete of corrupt rows as an anti-join
    // (fix_raws, pipeline/cosmoz_process_levels.py:431-452: collect bad
    // (site, time) keys, DELETE each). Here: derive the key set, left-anti.
    "s10_delete_antijoin" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val corrupt = ev
          .filter(col("event_type") === "error" && col("value") < 1.0)
          .select(col("user_id"), col("ts"))
        ev.join(corrupt, Seq("user_id", "ts"), "left_anti")
          .select(col("event_id"), col("user_id"), col("value"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id, user_id, value FROM events a
        WHERE NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id AND b.ts = a.ts
            AND b.event_type = 'error' AND b.value < 1.0)
        ORDER BY event_id""")),

    // S11 — series-to-series copy with re-tag
    // (pipeline/csv_influx_converter.py:53-93: read site A intensity range,
    // rewrite tagged as site B).
    "s11_retag_copy" -> Q(
      fn = (s, dir) => {
        val src = t(s, dir, "events")
          .filter(col("user_id") === 3 && col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        src.unionByName(src.withColumn("user_id", lit(9999L)))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some("""
        SELECT user_id, event_id, ts, value FROM events
        WHERE user_id = 3 AND event_type = 'purchase'
        UNION ALL
        SELECT CAST(9999 AS BIGINT) AS user_id, event_id, ts, value FROM events
        WHERE user_id = 3 AND event_type = 'purchase'
        ORDER BY user_id, event_id""")),

    // S12 — keyed metadata lookup / $in filter
    // (nmdb/mongo_db.py:59-82: find({'site_no': {"$in": list}})).
    "s12_isin_lookup" -> Q(
      fn = (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_custkey").isin(1L, 5L, 10L, 42L, 77L, 100L))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      oracle = Some("""
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey IN (1, 5, 10, 42, 77, 100)
        ORDER BY c_custkey""")),

    // P1-P6+P8 — projection, rename-in-scan, closed time interval, tag
    // equality, null-guard predicate (pipeline/cosmoz_process_levels.py:
    // 352-355 projection; :66-69 closed interval; :440-444 corrupt guard).
    "p_filter_kit" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .filter(
            col("ts").between(
              lit("2024-01-05 00:00:00").cast(TimestampType),
              lit("2024-01-20 23:59:59.999999").cast(TimestampType)) &&
              col("user_id") < 50 &&
              !(col("value").isNull && col("props").isNull))
          .select(col("event_id"), col("event_type").as("etype"),
            col("value"), col("ts"))
          .orderBy(col("event_id")),
      oracle = Some("""
        SELECT event_id, event_type AS etype, value, ts FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
                     AND TIMESTAMP '2024-01-20 23:59:59.999999'
          AND user_id < 50
          AND NOT (value IS NULL AND props IS NULL)
        ORDER BY event_id""")),

    // P7 — scalar-subquery filter (pipeline/level3->level4.sql:64:
    // Timestamp >= (SELECT InstallationDate ...)); decorrelated to a
    // broadcast cross-join of the 1-row aggregate.
    "p7_scalar_subquery" -> Q(
      fn = (s, dir) => {
        val cutoff = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .agg(max(col("o_orderdate")).as("cutoff"))
        t(s, dir, "lineitem")
          .join(broadcast(cutoff))
          .filter(col("l_shipdate") >= col("cutoff"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            rd(sum(dec2(col("l_quantity"))), 2).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag, count(*) AS n,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= (SELECT max(o_orderdate) FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // J1 — station-metadata broadcast equi-join
    // (pipeline/level1->level2.sql:238-239 AllStations x LevelView;
    // pipeline/cosmoz_process_levels.py:105,181 hoisted find_one).
    // Dims are broadcast: no shuffle of the fact side beyond the groupBy.
    "j1_broadcast_dims" -> Q(
      fn = (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            rd(sum(dec2(col("c_acctbal"))), 2).as("total_bal"))
          .orderBy(col("r_name"), col("n_name")),
      oracle = Some("""
        SELECT r_name, n_name, count(*) AS n_cust,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // J9 — SALTED fact-to-dim join for the hot-key case AQE cannot
    // split (all same-key rows still meet in one task after any
    // partition split): lineitem's salt derives from its unique row
    // identity — never the join key, never a random() (task retries
    // must re-derive identical salts or rows duplicate/drop) — and
    // orders replicates 8x, so one hot orderkey becomes 8 independent
    // join cells. The salt never escapes the operator; the oracle is
    // the PLAIN join, which salting must reproduce exactly.
    "j9_salted_join" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ords = t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.SkewOps.saltedJoin(
          li, ords, Seq("l_orderkey"),
          saltFrom = struct(col("l_orderkey"), col("l_linenumber")),
          salts = 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            rd(sum(dec2(col("l_quantity"))), 2).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // A5 + flagship — TPC-H Q1-style scan-heavy aggregate with exact decimal
    // arithmetic (order-independent sums -> deterministic hash compare).
    "q1_agg" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        val qty = dec2(col("l_quantity"))
        val price = dec2(col("l_extendedprice"))
        val disc = dec2(col("l_discount"))
        val tax = dec2(col("l_tax"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            rd(sum(qty), 2).as("sum_qty"),
            rd(sum(price), 2).as("sum_base_price"),
            rd(sum(price * (lit(1).cast("decimal(18,2)") - disc)), 4).as("sum_disc_price"),
            rd(sum(price * (lit(1).cast("decimal(18,2)") - disc) *
              (lit(1).cast("decimal(18,2)") + tax)), 6).as("sum_charge"),
            rd(sum(qty).cast("double") / count(lit(1)), 6).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS sum_disc_price,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 6) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // A8 — ROLLUP subtotal hierarchy (the OLAP report shape): per
    // (flag, status), per flag, and grand total in ONE pass — Spark
    // expands the grouping sets before the exchange, so partial
    // aggregation still collapses map-side and the shuffle carries one
    // partial row per (set, group), not one per input row. grouping_id
    // disambiguates real NULL group values from subtotal rows — both
    // engines emit the standard bit order (first rollup column = MSB),
    // which the hash compare pins.
    "a8_rollup" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            rd(sum(dec2(col("l_quantity"))), 2).as("sum_qty"))
          .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
            col("n"), col("sum_qty"))
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      oracle = Some("""
        SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               l_returnflag, l_linestatus, count(*) AS n,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")),

    // A29 — CUBE: the full 2^k grouping-set lattice (a8's rollup emits
    // only the prefix hierarchy; CUBE adds the column-wise marginals —
    // per-status-across-flags here — that a drill-anywhere OLAP report
    // needs). Same scale shape as rollup: the sets expand BEFORE the
    // exchange, partials still collapse map-side, the shuffle carries
    // one partial row per (set, group). grouping_id bit order pinned
    // by the hash compare, as in a8.
    "a29_cube" -> Q(
      fn = (s, dir) =>
        // r21: CUBE expands 4 grouping sets per row BEFORE the partial
        // agg — fan the single-file scan so that 4x map work parallelizes
        fan(t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity")))
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            rd(sum(dec2(col("l_quantity"))), 2).as("sum_qty"))
          .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
            col("n"), col("sum_qty"))
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      oracle = Some("""
        SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               l_returnflag, l_linestatus, count(*) AS n,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")),

    // A5 — diagnostic group counts (pipeline/detect_duplicates.py:89-111).
    "a5_group_counts" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            rd(sum(dec2(col("value"))), 2).as("total"))
          .orderBy(col("event_type"), col("day")),
      oracle = Some("""
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
        ORDER BY event_type, day"""))
  )
}
