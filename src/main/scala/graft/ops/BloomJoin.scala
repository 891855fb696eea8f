package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-filtered joins — the shuffle-reduction pattern for
  * joining a huge fact stream against a selective dimension at 100 TB:
  * build a compact bloom over the dim keys (distributed partial
  * aggregation; only the final bitmap reaches the driver), broadcast the
  * bitmap as a literal into a codegen'd probe on the fact scan, and let
  * the surviving sliver take the exact join. No false negatives, so the
  * result is EXACTLY the plain join's; false positives only cost join
  * input rows (rate `fpp`).
  *
  * Uses Catalyst's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the same machinery AQE's InjectRuntimeFilter plants automatically) so
  * both the build and the probe stay inside whole-stage codegen — this
  * operator makes the pattern explicit, deterministic, and available when
  * the optimizer's heuristics decline to inject it (e.g. the dim side is
  * an arbitrary DataFrame, not a selective scan).
  */
object BloomJoin {

  /** Distributed bloom build over `dim(keyCol)`: returns the serialized
    * bitmap (null when `dim` has no non-null keys). Bits sized from the
    * standard `m = -n ln(fpp) / ln(2)^2` bound.
    *
    * `BloomFilterAggregate` silently clamps its sizing to the session confs
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M) and
    * `.maxNumBits` (default 64M bits = 8 MB) — above ~7M keys at fpp=0.01
    * the requested false-positive rate would quietly degrade. This builder
    * raises both confs to at least the requested sizing first, so the fpp
    * the caller asked for is the fpp the bitmap delivers. */
  def buildBloom(dim: DataFrame, keyCol: String,
                 expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = math.max(64L,
      (-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val conf = dim.sparkSession.conf
    def raiseTo(key: String, needed: Long): Unit =
      if (conf.get(key).toLong < needed) conf.set(key, needed)
    raiseTo("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", expectedKeys)
    raiseTo("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", numBits)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedKeys), Literal(numBits))
    val row = dim.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe of `key` against a serialized bloom. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(xxhash64(key))))

  /** Semi join `fact` ⋉ `dim` with a bloom pre-filter on the fact side:
    * rows whose key cannot be in `dim` never reach the join exchange.
    * Equivalent to `fact.join(dim, factKey === dimKey, "left_semi")` —
    * the exact join clears the bloom's false positives.
    *
    * `expectedDimKeys` sizes the bitmap (over-estimating costs bits, not
    * correctness); at the default 1% fpp, 10M keys is a ~12 MB broadcast. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                    expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedDimKeys, fpp)
    if (bloom == null) fact.filter(lit(false)) // empty dim -> empty semi join
    else fact.filter(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === dim(dimKey), "left_semi")
  }

  /** Anti-join flavor (decontamination shape): keep fact rows whose key is
    * definitely absent from `dim` without joining them at all; only rows
    * the bloom flags (true + false positives) take the exact anti join. */
  def bloomAntiJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                    expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedDimKeys, fpp)
    if (bloom == null) fact // empty dim removes nothing
    else {
      // null keys probe to null; anti-join semantics KEEP them (a null
      // never equals a dim key), so treat null as not-flagged
      val flagged = coalesce(mightContain(bloom, col(factKey)), lit(false))
      fact.filter(!flagged).unionByName(
        fact.filter(flagged).join(dim, col(factKey) === dim(dimKey), "left_anti"))
    }
  }
}
