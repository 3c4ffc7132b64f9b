package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's sidecar-metadata loaders — SURVEY.md §2.1 S3 (station
  * TSV -> typed docs with Decimal128 calibration params,
  * `pipeline/csv_mongodb_converter.py:30-101`) and S4 (calibration text
  * scrape repair: NULL-padding of wide gaps, "a to b cm" token merge,
  * per-row arity assert, `:104-195`). Inline fixtures (the reference reads
  * a checked-in TSV / an HTTP scrape); the parsing itself runs in Spark.
  */
object LoaderQueries extends QueryModule {

  private val stationTsv = Seq(
    "1\tBaldry\t2010-10-06T00:00:00Z\t-32.871469\t148.531636\t438\t942.1\t144.1\t0.0077\t1247.45",
    "2\tTullochgorum\t2011-02-28T00:00:00Z\t-41.669874\t147.914004\t285\t977.45\t137.51\t0.0076\t1527.43",
    "3\tTumbarumba\t2011-04-07T00:00:00Z\t-35.656613\t148.152091\t1200\t861.33\t159.2\t0.0081\t1021.7",
    "4\tYanco\t2011-05-05T00:00:00Z\t-34.628744\t146.429914\t124\t1003.99\t133.64\t0.0075\t1437.73")

  private val calTxt = Seq(
    "2016-05-12 A1 edge 10 to 20 cm 345.2 500.1 400.2 50.0 450.1 350.2 0.28 1.32 0.37",
    "2016-05-12 B2 mid 30 cm 345.2 500.1 400.2 50.0 450.1 350.2 0.28 1.32 0.41",
    "2016-05-13 C3 far 5 to 10 cm 345.2 500.1 400.2 50.0 450.1 350.2 NULL 1.29 0.35")

  private def valuesSql(lines: Seq[String]): String =
    lines.map(l => s"('${l.replace("'", "''")}')").mkString(", ")

  val queries: Map[String, Q] = Map(
    // S3 — station TSV -> typed station documents via StationLoader: the
    // loaded document keeps EXACT DecimalType(38,18) calibration numerics
    // plus `_d` double twins (the at-use-site float(x.to_decimal())
    // conversion, pipeline/cosmoz_process_levels.py:125-129; exactness
    // pinned by StationLoaderSpec). This QUERY projects the rounded double
    // twins only — decimal cells normalize differently across comparator
    // environments (the round-2 driver-gate mismatch), so the hash-compare
    // surface is deliberately double-typed.
    "s3_station_load" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        graft.operators.StationLoader.fromTsv(stationTsv.toDF("line"))
          .select(
            col("site_no"), col("site_name"), col("installation_date"),
            round(col("latitude_d"), 6).as("latitude"),
            round(col("longitude_d"), 6).as("longitude"),
            col("altitude"),
            round(col("ref_pressure_d"), 6).as("ref_pressure"),
            round(col("ref_intensity_d"), 6).as("ref_intensity_d"),
            round(col("beta_d"), 6).as("beta_d"),
            round(col("n0_cal_d"), 6).as("n0_cal_d"))
          .orderBy(col("site_no"))
      },
      oracle = Some(s"""
        WITH raw(line) AS (VALUES ${valuesSql(stationTsv)}),
        p AS (SELECT string_split(line, chr(9)) AS f FROM raw)
        SELECT CAST(f[1] AS INT) AS site_no,
               f[2] AS site_name,
               CAST(strptime(f[3], '%Y-%m-%dT%H:%M:%SZ') AS TIMESTAMP) AS installation_date,
               round(CAST(CAST(f[4] AS DECIMAL(38,18)) AS DOUBLE), 6) AS latitude,
               round(CAST(CAST(f[5] AS DECIMAL(38,18)) AS DOUBLE), 6) AS longitude,
               CAST(f[6] AS INT) AS altitude,
               round(CAST(CAST(f[7] AS DECIMAL(38,18)) AS DOUBLE), 6) AS ref_pressure,
               round(CAST(CAST(f[8] AS DECIMAL(38,18)) AS DOUBLE), 6) AS ref_intensity_d,
               round(CAST(CAST(f[9] AS DECIMAL(38,18)) AS DOUBLE), 6) AS beta_d,
               round(CAST(CAST(f[10] AS DECIMAL(38,18)) AS DOUBLE), 6) AS n0_cal_d
        FROM p
        ORDER BY site_no""")),

    // S4 — calibration text repair: merge the multi-token depth phrase
    // ("a to b cm" / "N cm") into one field, split on whitespace, enforce
    // the 13-column arity, NULL/empty numerics -> NaN (the reference's
    // Decimal128('NaN'), csv_mongodb_converter.py:180-183). The
    // wide-gap NULL padding (:149-151) is byte-offset dependent; the
    // token-level semantics here are the load-bearing part.
    "s4_calibration_parse" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val merged = regexp_replace(
          regexp_replace(col("line"), "([0-9]+) to ([0-9]+) cm", "$1_to_$2_cm"),
          "([0-9]+) cm", "$1_cm")
        val parts = split(merged, " ")
        def num(i: Int) =
          when(parts(i) === "NULL" || parts(i) === "", lit(Double.NaN))
            .otherwise(parts(i).cast(DoubleType))
        calTxt.toDF("line")
          .select(parts.as("f"), to_date(split(col("line"), " ")(0)).as("date"))
          .filter(size(col("f")) === 13)
          .select(col("date"),
            col("f")(1).as("label"),
            col("f")(2).as("loc"),
            regexp_replace(col("f")(3), "_", " ").as("depth"),
            col("f")(4).cast(DoubleType).as("vol"),
            col("f")(5).cast(DoubleType).as("total_wet"),
            col("f")(6).cast(DoubleType).as("total_dry"),
            col("f")(7).cast(DoubleType).as("tare"),
            col("f")(8).cast(DoubleType).as("soil_wet"),
            col("f")(9).cast(DoubleType).as("soil_dry"),
            when(col("f")(10) === "NULL" || col("f")(10) === "", lit(Double.NaN))
              .otherwise(col("f")(10).cast(DoubleType)).as("gwc"),
            col("f")(11).cast(DoubleType).as("bd"),
            col("f")(12).cast(DoubleType).as("vwc"))
          .orderBy(col("date"), col("label"))
      },
      oracle = Some(s"""
        WITH raw(line) AS (VALUES ${valuesSql(calTxt)}),
        m AS (SELECT line,
                string_split(
                  regexp_replace(
                    regexp_replace(line, '([0-9]+) to ([0-9]+) cm', '\\1_to_\\2_cm', 'g'),
                    '([0-9]+) cm', '\\1_cm', 'g'),
                  ' ') AS f
              FROM raw)
        SELECT CAST(strptime(f[1], '%Y-%m-%d') AS DATE) AS date,
               f[2] AS label,
               f[3] AS loc,
               replace(f[4], '_', ' ') AS depth,
               CAST(f[5] AS DOUBLE) AS vol,
               CAST(f[6] AS DOUBLE) AS total_wet,
               CAST(f[7] AS DOUBLE) AS total_dry,
               CAST(f[8] AS DOUBLE) AS tare,
               CAST(f[9] AS DOUBLE) AS soil_wet,
               CAST(f[10] AS DOUBLE) AS soil_dry,
               CASE WHEN f[11] = 'NULL' OR f[11] = '' THEN CAST('NaN' AS DOUBLE)
                    ELSE CAST(f[11] AS DOUBLE) END AS gwc,
               CAST(f[12] AS DOUBLE) AS bd,
               CAST(f[13] AS DOUBLE) AS vwc
        FROM m
        WHERE len(f) = 13
        ORDER BY date, label"""))
  )
}
