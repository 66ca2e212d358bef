package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional data skipping —
  * what Delta/Iceberg OPTIMIZE ZORDER does: interleave the bits of two
  * sort dimensions so that sorting by the combined key gives LOCALITY IN
  * BOTH — any file/row-group of a z-sorted table covers a bounded
  * rectangle of (a, b) space, so min/max stats prune scans filtered on
  * EITHER dimension (a plain compound sort only prunes the leading one).
  *
  * The interleave is pure integer bit arithmetic (shift/and/or), unrolled
  * at plan-build time into one codegen'd expression — deterministic and
  * engine-portable (q88 replays it in SQL).
  *
  * Values must already be non-negative ints in [0, 2^bits): real columns
  * get there by range-bucketing (`bucketize`) — at 100 TB the bucket
  * bounds come from a stats pass or fixed domain knowledge, they are
  * layout metadata, not data.
  */
object Layout {

  /** Clamp-and-scale a value into [0, 2^bits) integer buckets over
    * [lo, hi] — the bucketizer that feeds [[zValue]]. Integer-exact:
    * ((v - lo) * 2^bits) div (hi - lo + 1), computed as subtract-mod-
    * divide so the double division is over an exactly-divisible numerator
    * (requires (hi - lo + 1) * 2^bits < 2^53 — range metadata, checked). */
  def bucketize(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, "bucketize: hi > lo")
    require((BigInt(hi - lo + 1) * BigInt(1L << bits)) < BigInt(1L << 53),
      "bucketize: (hi-lo+1)*2^bits must stay under 2^53")
    val rng = lit(hi - lo + 1L)
    val scaled = (least(greatest(v.cast("long"), lit(lo)), lit(hi)) - lit(lo)) *
      lit(1L << bits)
    ((scaled - pmod(scaled, rng)) / rng).cast("long")
  }

  /** The Morton interleave of two `bits`-bit non-negative ints: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "zValue: bits in [1, 31]")
    val parts = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }
    parts.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[zValue]] — (a, b) back from the Morton code; used by
    * the spec to prove the interleave is a bijection. */
  def unzValue(z: Column, bits: Int = 16): (Column, Column) = {
    val a = (0 until bits).map(i =>
      shiftleft(shiftright(z, 2 * i).bitwiseAND(1L), i)).reduce(_ bitwiseOR _)
    val b = (0 until bits).map(i =>
      shiftleft(shiftright(z, 2 * i + 1).bitwiseAND(1L), i)).reduce(_ bitwiseOR _)
    (a, b)
  }

  /** Repartition-by-range + sort on the z-value — the write-side layout
    * step. `numFiles` range partitions of z-contiguous rows: each output
    * file covers a bounded (a, b) rectangle, which is exactly what
    * parquet min/max stats need to prune on either dimension. */
  def zOrderBy(df: DataFrame, a: Column, b: Column, bits: Int = 16,
               numFiles: Int = 8): DataFrame = {
    val withZ = df.withColumn("__z", zValue(a, b, bits))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
