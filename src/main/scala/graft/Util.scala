package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

object Util {
  /** Round every DoubleType column to `scale` decimals. Applied to both
    * sides of the DuckDB-oracle compare so order-dependent floating-point
    * summation cannot flip a hash match. */
  /** Oracle-gate rounding for every DOUBLE column. The +5e-10 nudge (also
    * applied inside the paired oracle SQL's ROUND) shifts the half-point
    * rounding boundary off "natural" decimal values: data like l_discount
    * lives on a 0.01 grid, so a mean can sit EXACTLY on a 6dp half point
    * (e.g. 2995.11/60000 = 0.0499185) where each engine's ±1e-12 summation
    * noise decides the direction independently. Nudged, both engines sit
    * ~5e-10 above the half point and round the same way; values not at a
    * boundary are unaffected (5e-10 << the 5e-7 half-ulp at 6dp). */
  def roundDoubles(df: DataFrame, scale: Int = 6): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name) + lit(5e-10), scale).as(f.name) else col(f.name)
    }.toSeq: _*)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's `events` parquet carries TIMESTAMP(NANOS), which Spark 4
    * rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    * convert to a microsecond TimestampType — integer `div` (not `/`,
    * which goes through double and loses precision above 2^53 ns). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
