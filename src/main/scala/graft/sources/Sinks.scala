package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-layout sinks: Hive-style `partitionBy` parquet with the
  * small-files hazard designed out.
  *
  * At 100 TB the failure mode of a naive `df.write.partitionBy(c)` is not
  * correctness but file count: every task holds an open writer per
  * partition VALUE it sees, so T tasks x P values emits T*P files —
  * thousands of KB-sized parquet files per partition directory, and the
  * next reader drowns in open/seek overhead. Shuffling rows onto their
  * partition value first gives each value a single owning task (skewed
  * values can widen via `filesPerPartition`), so the layout lands as
  * P directories x ~filesPerPartition files regardless of parallelism.
  */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCols`, pre-shuffled
    * so each partition value is written by `filesPerPartition` tasks
    * (default 1 file per value). Readers filtering on `partitionCols`
    * prune whole directories before touching a row group —
    * `PartitionFilters` in the scan node, verified by SinksSpec. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(filesPerPartition >= 1, s"filesPerPartition must be >= 1, got $filesPerPartition")
    // deterministic salt (row-content hash) so a huge partition value can
    // spread across several writing tasks; AQE may still merge partitions
    // below the advisory size, which is the right call at scale
    val keys = partitionCols.map(col) ++
      (if (filesPerPartition > 1)
        Seq(pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)),
          lit(filesPerPartition.toLong)))
      else Nil)
    df.repartition(keys: _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Overwrite-by-partition append pattern (the incremental-ingest shape):
    * replaces ONLY the partition directories present in `df`, leaving the
    * rest of the table untouched — dynamic partition overwrite, the batch
    * equivalent of an idempotent re-run of one ingest day. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)
  }
}
