package graft.tableone

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Standardized mean differences between strata — the balance
  * diagnostic every Table-1 audience asks for next (the tableone
  * ecosystem's `smd` column): unlike a p-value it does not shrink with
  * n, so at corpus scale it is the only usable imbalance measure
  * (everything is "significant" at 10^9 rows).
  *
  * Continuous: SMD = (mean_a − mean_b) / √((var_a + var_b)/2) with
  * SAMPLE variance (n−1 — the tableone convention), derived from raw
  * power sums. Binary: the proportion formula
  * (p_a − p_b) / √((p_a(1−p_a) + p_b(1−p_b))/2) with POPULATION
  * variance, the standard binary-SMD definition. Signs follow
  * (stratum_a − stratum_b) with strata ordered ascending, so the
  * report is deterministic; callers wanting the usual absolute SMD
  * take `abs(smd)`.
  *
  * Scale shape: ONE map-side-combined aggregate over the melted
  * (variable, stratum) frame — adding a variable adds agg columns, not
  * scans; the pairwise step is a self-join of the ≤ |vars|·|strata|-row
  * moment frame (aggregate-sized by construction). Every sum stays
  * exact until the final subtractions/divisions, operation order
  * preserved for external replay.
  */
object Smd {

  /** Pairwise SMD per variable and stratum pair (a < b, strata as
    * strings ordered ascending). `contCols` use the sample-variance
    * continuous formula; `binCols` must be 0/1-valued (cast to double)
    * and use the proportion formula. Null stratum or null value rows
    * are excluded per variable. Returns (variable, kind, strat_a,
    * strat_b, n_a, n_b, smd); smd is NULL when the pooled variance is
    * 0 (identical constants on both sides — undefined, not infinite). */
  def pairwise(df: DataFrame, stratCol: String,
               contCols: Seq[String], binCols: Seq[String] = Nil): DataFrame = {
    require(contCols.nonEmpty || binCols.nonEmpty, "no variables given")
    require((contCols ++ binCols).distinct.size == contCols.size + binCols.size,
      "duplicate variable")
    val spark = df.sparkSession
    // melt to (variable, kind, stratum, value) — one narrow projection,
    // variables share the single downstream aggregate
    val cols = contCols.map(c => (c, "cont")) ++ binCols.map(c => (c, "bin"))
    val melted = df
      .filter(col(stratCol).isNotNull)
      .select(col(stratCol).cast("string").as("__s"),
        explode(array(cols.map { case (c, kind) =>
          struct(lit(c).as("variable"), lit(kind).as("kind"),
            col(c).cast(DoubleType).as("value"))
        }: _*)).as("__x"))
      .select(col("__x.variable").as("variable"), col("__x.kind").as("kind"),
        col("__s"), col("__x.value").as("v"))
      .filter(col("v").isNotNull)
    val moments = melted.groupBy("variable", "kind", "__s")
      .agg(count(lit(1)).as("n"), sum("v").as("s1"), sum(col("v") * col("v")).as("s2"))
    val a = moments.select(col("variable"), col("kind"), col("__s").as("strat_a"),
      col("n").as("n_a"), col("s1").as("s1_a"), col("s2").as("s2_a"))
    val b = moments.select(col("variable"), col("kind"), col("__s").as("strat_b"),
      col("n").as("n_b"), col("s1").as("s1_b"), col("s2").as("s2_b"))
    def mean(s1: String, n: String) = col(s1) / col(n)
    // sample variance (s2 - s1*s1/n) / (n - 1); binary population p(1-p)
    def sampVar(s2: String, s1: String, n: String) =
      (col(s2) - col(s1) * col(s1) / col(n)) / (col(n) - lit(1L))
    def binVar(s1: String, n: String) =
      mean(s1, n) * (lit(1.0) - mean(s1, n))
    val joined = a.join(b, Seq("variable", "kind"))
      .filter(col("strat_a") < col("strat_b"))
    val pooled = when(col("kind") === "cont",
        (sampVar("s2_a", "s1_a", "n_a") + sampVar("s2_b", "s1_b", "n_b")) / lit(2.0))
      .otherwise((binVar("s1_a", "n_a") + binVar("s1_b", "n_b")) / lit(2.0))
    joined
      .withColumn("smd",
        when(pooled > 0.0,
          (mean("s1_a", "n_a") - mean("s1_b", "n_b")) / sqrt(pooled)))
      .select(col("variable"), col("kind"), col("strat_a"), col("strat_b"),
        col("n_a"), col("n_b"), col("smd"))
  }
}
