package graft

import graft.operators.StationLoader
import org.apache.spark.sql.types.DecimalType

/** The loaded station document must keep EXACT Decimal128-equivalent
  * calibration numerics (reference csv_mongodb_converter.py:55-64) — the
  * `_d` double twins are the at-use-site conversion, not the document.
  */
class StationLoaderSpec extends SparkSpec {
  import spark.implicits._

  test("calibration numerics load as exact DECIMAL(38,18) plus double twins") {
    // latitude with 12 dp — beyond double-display rounding and beyond the
    // 6-dp query-surface rounding; must survive bit-exactly in the decimal
    val line = "9\tSiteX\t2012-01-01T00:00:00Z\t-32.871469123456\t148.531636\t" +
      "438\t942.123456789012\t144.1\t0.0077\t1247.45"
    val df = StationLoader.fromTsv(Seq(line).toDF("line"))
    val schema = df.schema
    Seq("latitude", "longitude", "ref_pressure", "ref_intensity", "beta",
      "n0_cal").foreach { c =>
      assert(schema(c).dataType === DecimalType(38, 18), c)
      assert(schema(c + "_d").dataType.typeName === "double", c)
    }
    val row = df.head()
    assert(row.getAs[java.math.BigDecimal]("latitude")
      .compareTo(new java.math.BigDecimal("-32.871469123456")) === 0)
    assert(row.getAs[java.math.BigDecimal]("ref_pressure")
      .compareTo(new java.math.BigDecimal("942.123456789012")) === 0)
    assert(row.getAs[Double]("ref_pressure_d") === 942.123456789012)
    assert(row.getAs[Int]("site_no") === 9)
    assert(row.getAs[String]("site_name") === "SiteX")
  }
}
