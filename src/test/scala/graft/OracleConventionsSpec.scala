package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle-SQL typing conventions the driver's hash compare
  * depends on (VERDICT r12 item 2; memory: DuckDB `sum()` of an integer —
  * plain or windowed — promotes BIGINT → HUGEINT, and the driver hashes
  * types, so a value-identical result still reds out unless the oracle
  * casts the sum back to BIGINT).
  *
  * The enforced textual rule, which passes every green r12 oracle and
  * catches exactly the `a24_user_growth` failure class:
  *
  *   A `sum(...)` (optionally `sum(...) OVER (...)`) that is aliased
  *   DIRECTLY to a column (`AS name`) must either be wrapped in a
  *   `CAST( ... )` — fixing the DuckDB-side type — or its alias must be
  *   referenced again later in the statement (an intermediate CTE value,
  *   whose HUGEINT type is laundered by the downstream expression before
  *   it reaches an output column).
  *
  * Sums embedded in a larger expression (`round(sum(x)/count(*),6)`,
  * `c / s.total`) are exempt: the enclosing arithmetic/function decides
  * the result type, and every such site produces DOUBLE/DECIMAL.
  */
class OracleConventionsSpec extends AnyFunSuite {

  /** Index just past the parenthesized group opening at `open`. */
  private def closeOf(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    sql.length
  }

  private val sumRe = "(?i)\\bsum\\s*\\(".r
  private val overRe = "^(?is)\\s*over\\s*\\(".r
  private val aliasRe = "^(?is)\\s*as\\s+([A-Za-z_][A-Za-z0-9_]*)".r

  /** Offenders: directly-aliased, un-CAST sums whose alias is never
    * referenced after its definition (i.e. raw HUGEINT output columns).
    */
  private def offenders(sql: String): Seq[String] =
    sumRe.findAllMatchIn(sql).toSeq.flatMap { m =>
      // CAST( immediately before the sum means the type is handled.
      val before = sql.substring(0, m.start).replaceAll("(?s)\\s+$", "")
      val casted = before.toUpperCase.endsWith("CAST(")
      var end = closeOf(sql, sql.indexOf('(', m.start))
      // Fold a trailing `OVER (...)` into the expression.
      overRe.findFirstMatchIn(sql.substring(end)).foreach { ov =>
        end = closeOf(sql, end + ov.matched.toUpperCase.indexOf('('))
      }
      aliasRe.findFirstMatchIn(sql.substring(end)) match {
        case Some(a) if !casted =>
          val alias = a.group(1)
          // A subquery's alias may be consumed textually BEFORE its
          // definition (`SELECT c / n FROM (SELECT ... AS n ...)`), so
          // search the whole statement minus this definition's span.
          val rest = sql.substring(0, m.start) + sql.substring(end + a.end)
          val referenced =
            ("(?i)\\b" + java.util.regex.Pattern.quote(alias) + "\\b").r
              .findFirstIn(rest).isDefined
          if (referenced) None else Some(alias)
        case _ => None // embedded in a larger expression, or CAST-wrapped
      }
    }

  test("every oracle sum aliased to an output column is CAST-wrapped") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => offenders(sql).map(a => s"$name: AS $a")
    }
    assert(
      bad.isEmpty,
      s"un-CAST sum() aliased straight to an output column (DuckDB " +
        s"promotes integer sums to HUGEINT and the driver hash is " +
        s"type-sensitive — wrap in CAST(... AS BIGINT)): ${bad.mkString(", ")}")
  }

  test("the rule itself flags the a24 failure shape and passes the fix") {
    val broken =
      "SELECT d, sum(n) OVER (ORDER BY d) AS cum FROM t ORDER BY d"
    assert(offenders(broken) == Seq("cum"))
    val fixed =
      "SELECT d, CAST(sum(n) OVER (ORDER BY d) AS BIGINT) AS cum FROM t"
    assert(offenders(fixed).isEmpty)
    val intermediate =
      "WITH s AS (SELECT sum(b) OVER (ORDER BY t) AS sn FROM g) " +
        "SELECT CAST(sn AS BIGINT) AS session_no FROM s GROUP BY sn"
    assert(offenders(intermediate).isEmpty)
    val embedded =
      "SELECT round(sum(tok) / count(*), 6) AS mean_tokens FROM w"
    assert(offenders(embedded).isEmpty)
  }
}
