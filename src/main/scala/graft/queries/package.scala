package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object queries {

  /** Exact-arithmetic cast for money-like doubles (values carry <=2 dp, so
    * decimal(18,2) is lossless); keeps aggregate sums order-independent and
    * therefore bit-identical between Spark and the DuckDB oracle.
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Canonical float output: exact value in, deterministically rounded
    * double out (same operands -> same IEEE result on both engines).
    */
  def rd(c: Column, n: Int = 6): Column = round(c.cast("double"), n)
}
