package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tableone.{TableOne, TableOneConfig}
import graft.oracle.TableOneSql
import graft.Util.{roundDoubles, table}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads the driver's parquet tables.
  * Queries with an `oracleSql` entry are hash-compared against DuckDB at
  * sf0.01; double columns are rounded to 6 decimals on BOTH sides
  * (Util.roundDoubles / ROUND in the SQL) so parallel-summation float
  * noise cannot flip the compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full stratified Table 1 over lineitem with p-values. */
  def entry(spark: SparkSession): DataFrame =
    TableOne.summarize(
      table(spark, "/root/testdata/sf0.001", "lineitem"),
      TableOneConfig(stratify = Some("l_returnflag"),
        cols = Seq("l_linestatus", "l_quantity", "l_extendedprice"),
        pValues = true))

  // (name, isContinuous) in analysis order, per flagship target
  private val lineitemCols = Seq("l_linestatus" -> false, "l_quantity" -> true, "l_extendedprice" -> true)

  def queries: Map[String, (SparkSession, String) => DataFrame] = base ++ OpsQueries.queries

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TableOne end-to-end (SURVEY.md §3) ----
    "t1_tableone_lineitem" -> ((s, dir) => roundDoubles(TableOne.summarize(
      table(s, dir, "lineitem"),
      TableOneConfig(Some("l_returnflag"), Seq("l_linestatus", "l_quantity", "l_extendedprice"))))),
    "t2_tableone_customer" -> ((s, dir) => roundDoubles(TableOne.summarize(
      table(s, dir, "customer"),
      TableOneConfig(Some("c_mktsegment"), Seq("c_acctbal"))))),
    "t3_tableone_unstrat" -> ((s, dir) => roundDoubles(TableOne.summarize(
      table(s, dir, "lineitem"),
      TableOneConfig(None, Seq("l_linestatus", "l_quantity"))))),
    "t4_tableone_sanitize" -> ((s, dir) => roundDoubles(TableOne.summarize(
      table(s, dir, "orders"),
      TableOneConfig(Some("o_orderpriority"), Seq("o_orderstatus", "o_totalprice"))))),
    // p-values + beautify: not DuckDB-expressible -> rows-only check;
    // exact statistics are covered by the ScalaTest golden suite.
    "t5_tableone_pvalues" -> ((s, dir) => TableOne.summarize(
      table(s, dir, "lineitem"),
      TableOneConfig(Some("l_linestatus"), Seq("l_returnflag", "l_quantity"), pValues = true))),
    "t6_tableone_beautify" -> ((s, dir) => TableOne.summarize(
      table(s, dir, "customer"),
      TableOneConfig(Some("c_mktsegment"), Seq("c_acctbal"), beautify = true))),

    // ---- core aggregation operators (SURVEY.md §2.4) ----
    "a1_group_count" -> ((s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt")).orderBy("l_returnflag")),
    "a2_pivot_counts" -> ((s, dir) =>
      table(s, dir, "lineitem").groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R")).count()
        .na.fill(0L).orderBy("l_linestatus")),
    "a3_onepass_stats" -> ((s, dir) => roundDoubles {
      val t = table(s, dir, "lineitem")
      t.agg(
        count(col("l_quantity")).as("n"),
        round(avg(col("l_quantity")), 6).as("mean"),
        round(stddev(col("l_quantity")), 6).as("sd"),
        min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"),
        percentile_approx(col("l_quantity"), lit(0.25), lit(2000000)).as("q25"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(2000000)).as("q50"),
        percentile_approx(col("l_quantity"), lit(0.75), lit(2000000)).as("q75"))
    }),
    "a4_stats_by_group" -> ((s, dir) => roundDoubles(
      table(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(col("l_extendedprice")).as("n"),
        avg(col("l_extendedprice")).as("mean"),
        stddev(col("l_extendedprice")).as("sd"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
        .orderBy("l_returnflag"))),
  )

  def oracleSql: Map[String, String] = Map(
    "t1_tableone_lineitem" -> TableOneSql.oracle(
      "lineitem", Some("l_returnflag"), Seq("A", "N", "R"), lineitemCols),
    "t2_tableone_customer" -> TableOneSql.oracle(
      "customer", Some("c_mktsegment"),
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
      Seq("c_acctbal" -> true)),
    "t3_tableone_unstrat" -> TableOneSql.oracle(
      "lineitem", None, Nil, Seq("l_linestatus" -> false, "l_quantity" -> true)),
    "t4_tableone_sanitize" -> TableOneSql.oracle(
      "orders", Some("o_orderpriority"),
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT_SPECIFIED", "5-LOW"),
      Seq("o_orderstatus" -> false, "o_totalprice" -> true)),
    "a1_group_count" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "a2_pivot_counts" ->
      ("SELECT l_linestatus, count(*) FILTER (WHERE l_returnflag = 'A') AS \"A\", " +
        "count(*) FILTER (WHERE l_returnflag = 'N') AS \"N\", " +
        "count(*) FILTER (WHERE l_returnflag = 'R') AS \"R\" " +
        "FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"),
    "a3_onepass_stats" ->
      ("SELECT count(l_quantity) AS n, ROUND(avg(l_quantity), 6) AS mean, " +
        "ROUND(stddev_samp(l_quantity), 6) AS sd, min(l_quantity) AS mn, max(l_quantity) AS mx, " +
        "quantile_disc(l_quantity, 0.25) AS q25, quantile_disc(l_quantity, 0.50) AS q50, " +
        "quantile_disc(l_quantity, 0.75) AS q75 FROM lineitem"),
    "a4_stats_by_group" ->
      ("SELECT l_returnflag, count(l_extendedprice) AS n, ROUND(avg(l_extendedprice), 6) AS mean, " +
        "ROUND(stddev_samp(l_extendedprice), 6) AS sd, ROUND(min(l_extendedprice), 6) AS mn, " +
        "ROUND(max(l_extendedprice), 6) AS mx FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
  ) ++ OpsQueries.oracleSql
}
