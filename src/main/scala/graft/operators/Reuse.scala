package graft.operators

import org.apache.spark.sql.DataFrame

/** Within-query materialization of a multiply-consumed intermediate
  * (optimization guide §2.4 "remove shuffles outright" / §5
  * localCheckpoint): Spark does not share common subtrees across the
  * branches of one plan, so a frame consumed by N operators re-runs its
  * whole upstream lineage N times (ReuseExchange only dedups
  * canonically IDENTICAL exchanges, which column pruning usually makes
  * non-identical). `once` computes the frame eagerly, stores it in
  * block-manager blocks (memory, disk-spilling), and hands every
  * consumer the materialized rows.
  *
  * Deliberately localCheckpoint, NOT persist()/cache(): an explicit
  * cache registers in the CacheManager keyed by the canonicalized plan,
  * so a LATER invocation of the same query would silently reuse the
  * earlier run's data — result caching across runs, which the bench
  * methodology forbids. A localCheckpoint is private to its Dataset:
  * every invocation recomputes from the parquet inputs, and the blocks
  * are reclaimed by the ContextCleaner once the frame is unreachable.
  *
  * Use on PROXY-scale frames only (hash sets, count tables, candidate
  * edge lists — a few percent of corpus bytes), never on raw text/blob
  * payloads: at 100 TB re-scanning parquet beats materializing payloads
  * (the IvfIndex build discipline), but re-running a tokenize+hash scan
  * per consumer loses to materializing its hash-only output once.
  *
  * `SPARK_GRAFT_NO_ONCE=1` disables the materialization (same plan as
  * before the optimization) — the measurement kill-switch that lets a
  * bench A/B the two shapes in one binary.
  */
object Reuse {
  private val disabled = sys.env.contains("SPARK_GRAFT_NO_ONCE")
  def once(df: DataFrame): DataFrame =
    if (disabled) df else df.localCheckpoint()
}
