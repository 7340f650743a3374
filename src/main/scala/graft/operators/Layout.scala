package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators: multi-dimensional clustering so file- and
  * row-group-level min/max statistics prune scans on MORE than the
  * leading sort column — the lakehouse Z-ORDER technique (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), here as a plain Spark write pattern:
  * interleave the key bits (Morton curve), range-partition by the
  * interleaved value, sort within partitions.
  *
  * Why it matters at 100 TB: a table sorted by `user_id` alone prunes
  * `user_id` predicates but every file still spans the full `ts` range;
  * z-ordering gives every file a compact hyper-rectangle in
  * (user_id, ts) space, so either predicate (or both) skips most files
  * via footer stats alone — no index structures, no extra reads.
  */
object Layout {

  /** Morton (Z-order) bit-interleave of two columns clamped to
    * `bits`-bit unsigned range: result bit 2i = bit i of `a`, bit
    * 2i+1 = bit i of `b`. Pure Catalyst fold over bit positions —
    * codegen'd, no UDF. Callers normalize dimensions into range first
    * (e.g. `pmod(x, 1 << bits)` or a rank/bucket transform). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val al = pmod(a.cast(LongType), lit(1L << bits))
    val bl = pmod(b.cast(LongType), lit(1L << bits))
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", al, i).bitwiseAND(lit(1L)), i * 2))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", bl, i).bitwiseAND(lit(1L)), i * 2 + 1)))
  }

  /** Z-order clustered parquet write: range-partition on the
    * interleaved key (each output file owns a contiguous z-range =
    * a compact rectangle in (c1, c2) space), sort within partitions
    * (row groups inside each file cluster further), drop the helper
    * column. `numFiles` sizes the output — at 100 TB pick it from
    * target file size, exactly like any partitioned-write sizing. */
  def zorderWrite(df: DataFrame, c1: Column, c2: Column, path: String,
                  numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue2(c1, c2, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
