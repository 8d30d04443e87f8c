package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering for data layout —
  * the scan-pruning lever for 100-TB tables filtered on MORE than one
  * column. A single-column sort gives parquet row-group min/max
  * pruning on that column only; interleaving the bits of two (or
  * more) quantized dimensions into one sort key makes every
  * contiguous file span a small RECTANGLE in (a, b) space, so a
  * conjunctive filter on either or both columns skips most files.
  * Same operator family as Delta/Iceberg OPTIMIZE ZORDER; the
  * reference's analog is connector-side data clustering before write.
  *
  * Spark-first shape: the whole computation composes from built-in
  * shiftleft / bitwise ops — whole-stage codegen'd for free, no UDF,
  * no custom Expression — and the identical BIGINT arithmetic runs in
  * DuckDB, so the z-value column is oracle-checkable bit-for-bit.
  *
  * Quantization is linear min/max to `bits` buckets (one cheap agg
  * pass for the bounds). CAVEAT at heavy skew: linear buckets
  * degenerate (most rows in few buckets) — production systems sample
  * rank boundaries instead; the interleave below is independent of
  * how bucket ids were produced, so a rank-based quantizer drops in
  * without touching the layout path.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i
    * (the classic mask-shift cascade, each step doubling the gap). */
  def spread16(x: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(m1)
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(m2)
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(m3)
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(m4)
  }

  /** Morton interleave of two 16-bit bucket ids: a's bits land on the
    * even positions, b's on the odd — one BIGINT sort key covering
    * both dimensions. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Linear quantization of `x` into [0, 2^bits) given inclusive
    * bounds — `(x - min) * (2^bits - 1) / (max - min)`, floor
    * division. Degenerate range (min == max) maps everything to
    * bucket 0. floor(double division) equals BIGINT floor division
    * exactly while the numerator stays under 2^53 — i.e. for any key
    * range below ~2^37 at 16 bits; a wider key domain should be
    * pre-scaled before quantization. */
  def quantize(x: Column, minV: Column, maxV: Column,
      bits: Int = 16): Column = {
    val buckets = (1L << bits) - 1
    when(maxV <= minV, lit(0L)).otherwise(
      floor(((x - minV).cast("long") * buckets) /
        (maxV - minV).cast("long")).cast("long"))
  }

  /** Cluster `df` for (aCol, bCol) filters: compute per-column
    * bounds (one agg, broadcast as a single-row cross join), derive
    * the z-value, and range-partition + sort by it. Files written
    * from the result have rectangular (a, b) footprints. */
  def cluster(df: DataFrame, aCol: String, bCol: String,
      partitions: Int): DataFrame = {
    val bounds = df.agg(
      min(col(aCol)).as("__amin"), max(col(aCol)).as("__amax"),
      min(col(bCol)).as("__bmin"), max(col(bCol)).as("__bmax"))
    val withZ = df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave16(
        quantize(col(aCol), col("__amin"), col("__amax")),
        quantize(col(bCol), col("__bmin"), col("__bmax"))))
      .drop("__amin", "__amax", "__bmin", "__bmax")
    withZ.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
