package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) interleaving for multi-dimensional data clustering —
  * the space-filling-curve layout behind Delta/Iceberg `OPTIMIZE ZORDER BY`
  * (Morton 1966; "Z-ordering" in the Hudi/Delta data-skipping literature):
  * sort by the bit-interleaved value of k columns and a range-partitioned
  * file layout stays NARROW on every column at once, so k-dimensional box
  * predicates prune files multiplicatively — a single-column sort can only
  * ever prune its own dimension.
  *
  * All pure codegen'd long arithmetic (shifts/masks), no UDF.
  */
object ZOrder {

  /** `x`'s linear bin in [lo, hi] among 2^bits equal-width bins, clamped
    * into range (values outside [lo, hi] land in the edge bins; null → bin
    * 0 so null rows cluster together rather than poisoning the z-value).
    * Equal-width binning is exact for the integer arithmetic (floor
    * division) and right for roughly uniform dimensions; skewed dimensions
    * want equi-depth boundaries — plug those in upstream by bucketing the
    * column first and z-ordering on the bucket id.
    *
    * Overflow bound: (x − lo)·2^bits must stay in Long — fine for any
    * range up to 2^(63−bits).
    */
  def linearBucket(x: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"linearBucket: bits=$bits outside [1, 20]")
    require(hi >= lo, s"linearBucket: empty range [$lo, $hi]")
    val n = 1L << bits
    val width = hi - lo + 1L
    val raw = ((coalesce(x.cast("long"), lit(lo)) - lit(lo)) * lit(n)) / lit(width)
    least(greatest(raw.cast("long"), lit(0L)), lit(n - 1L))
  }

  /** Morton-interleave k bucket columns of `bits` bits each: output bit
    * j·k + i holds bit j of bucket i (column-major bit interleave, the
    * classic Z-curve). k·bits must fit a Long's 63 value bits. */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    require(k >= 1, "interleaveBits: at least one column")
    require(k * bits <= 63, s"interleaveBits: $k cols × $bits bits exceeds 63")
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value of a row: each (column, lo, hi) linear-binned to `bits`
    * bits, then Morton-interleaved. */
  def zvalue(cols: Seq[(Column, Long, Long)], bits: Int = 8): Column =
    interleaveBits(cols.map { case (c, lo, hi) => linearBucket(c, lo, hi, bits) }, bits)
}
