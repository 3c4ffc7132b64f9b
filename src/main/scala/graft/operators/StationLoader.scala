package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Station TSV -> typed station documents (S3,
  * `pipeline/csv_mongodb_converter.py:30-101`).
  *
  * The calibration numerics are EXACT DecimalType(38,18) — the
  * reference stores Decimal128 (`csv_mongodb_converter.py:55-64`) and
  * ref_pressure feeds exp(beta*(p-ref_pressure)) downstream, so the
  * stored document must not round. Each decimal also gets a `<name>_d`
  * DOUBLE twin — the reference's at-use-site `float(x.to_decimal())`
  * conversion (`cosmoz_process_levels.py:125-129`) — which is what the
  * physics kernels consume. Query surfaces that hash-compare against
  * engines with differing decimal cell normalization should project the
  * `_d` twins (rounded); the decimals are the document of record.
  */
object StationLoader {

  /** Parse a one-column DataFrame of raw TSV `line`s. */
  def fromTsv(lines: DataFrame): DataFrame = {
    val parts = split(col("line"), "\t")
    def dec(i: Int, n: String) = Seq(
      parts(i).cast(DecimalType(38, 18)).as(n),
      parts(i).cast(DecimalType(38, 18)).cast(DoubleType).as(n + "_d"))
    lines.select(Seq(
      parts(0).cast(IntegerType).as("site_no"),
      parts(1).as("site_name"),
      to_timestamp(parts(2), "yyyy-MM-dd'T'HH:mm:ssX").as("installation_date")) ++
      dec(3, "latitude") ++ dec(4, "longitude") ++
      Seq(parts(5).cast(IntegerType).as("altitude")) ++
      dec(6, "ref_pressure") ++ dec(7, "ref_intensity") ++
      dec(8, "beta") ++ dec(9, "n0_cal"): _*)
  }
}
