package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a curation pipeline runs
  * before anything else: per column, row/null/distinct counts and
  * stringified min/max, as one long-format frame.
  *
  * Scale shape: ONE aggregation job produces a single wide row (4
  * aggregates per column + the row count), which a `stack` unpivots to
  * k rows — no per-column scans, no shuffle beyond the aggregation's
  * own partial/final pair. `exact = true` uses exact count_distinct:
  * Catalyst plans multiple distinct aggregates via Expand (k-way row
  * multiplication before the partial agg), which is the
  * oracle-matchable form but the expensive one; at corpus scale pass
  * `exact = false` for approx_count_distinct (HLL, one pass, no
  * Expand, ~2% relative error — spec-pinned against the exact counts).
  */
object ProfileOps {

  def profileColumns(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    // names are interpolated into the stack() SQL string — restrict to
    // plain identifiers and reject duplicates (ambiguous aliases) loudly
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profileColumns needs plain identifier column names, got $cols")
    require(cols.distinct == cols,
      s"profileColumns column list has duplicates: $cols")
    def nd(c: String) =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __n - `__cnt_$c`, `__nd_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    wide.select(col("__n").as("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) " +
        "AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
