package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

object Util {
  /** Round every DoubleType column to `scale` decimals. Applied to both
    * sides of the DuckDB-oracle compare so order-dependent floating-point
    * summation cannot flip a hash match. */
  def roundDoubles(df: DataFrame, scale: Int = 6): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), scale).as(f.name) else col(f.name)
    }.toSeq: _*)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
