package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range/proximity joins without the cross join.
  *
  * A naive `a JOIN b ON abs(a.t - b.t) <= tol` has no equi-key, so Spark
  * plans a broadcast-nested-loop (O(n*m) comparisons). Banding restores
  * an equi-key: bucket the axis into tolerance-width bands; one side
  * keeps its band, the other explodes to {band-1, band, band+1}; any
  * in-tolerance pair shares exactly one (band_a, candidate_band) match,
  * so the equi-join finds every pair exactly once and the exact
  * predicate filters the false candidates. Cost O(n * local density).
  */
object RangeJoin {

  /** Unordered pairs of rows whose `tsCol` (timestamp) values lie within
    * `toleranceSec` of each other; `id_a < id_b`. Extra columns from the
    * input survive with `_a`/`_b` suffixes for `carryCols`. */
  def selfPairsWithin(df: DataFrame, idCol: String, tsCol: String,
                      toleranceSec: Long, carryCols: Seq[String] = Nil): DataFrame = {
    require(toleranceSec > 0, "tolerance must be positive")
    val ms = toleranceSec * 1000L
    val base = df.select((Seq(col(idCol).as("id"), unix_millis(col(tsCol)).as("t")) ++
      carryCols.map(col)): _*)
    val a = base.select(Seq(col("id").as("id_a"), col("t").as("t_a"),
      (col("t") - (col("t") % ms)).as("__band")) ++
      carryCols.map(c => col(c).as(s"${c}_a")): _*)
    val b = base.select(Seq(col("id").as("id_b"), col("t").as("t_b"),
      explode(array(lit(-1L), lit(0L), lit(1L))).as("__off"),
      col("t").as("__tb")) ++ carryCols.map(c => col(c).as(s"${c}_b")): _*)
      .withColumn("__band", col("__tb") - (col("__tb") % ms) + col("__off") * ms)
      .drop("__off", "__tb")
    a.join(b, Seq("__band"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= ms)
      .drop("__band")
  }
}
