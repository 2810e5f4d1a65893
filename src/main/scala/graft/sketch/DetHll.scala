package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DETERMINISTIC, ENGINE-PORTABLE HyperLogLog (Flajolet et al., AofA 2007)
  * with m = 16 registers keyed by the first MD5 nibble.
  *
  * Purpose: the MERGEABLE distinct-count-sketch pattern — store tiny
  * register vectors per fine-grained cell once, answer any coarser rollup
  * by element-wise max — with every step a pure closed-form function of
  * MD5, which EVERY SQL engine evaluates identically. That turns the
  * estimate itself into an oracle-checkable value (DuckDB reproduces the
  * registers, the union, and the harmonic-mean estimate hash-exactly),
  * where a library sketch (Datasketches, q26) is bound only by its error
  * guarantee. The price is fixed precision: m = 16 ⇒ ~26% standard error —
  * this is the demonstrator of the ALGEBRA (registers → max-union →
  * estimate); production sizing just widens the register index to more
  * nibbles, nothing else changes.
  *
  * All arithmetic before the final estimate is integer-exact:
  *  - register = first hex nibble of md5(key);
  *  - rho      = 1 + leading zero BITS of the next 60 bits, computed from
  *               hex characters (trim leading '0's, classify the first
  *               non-zero nibble) — no float anywhere;
  *  - union    = max(rho) per register — associative, order-free;
  *  - N        = Σ_registers 2^(59−M_r) (absent registers contribute 2^59):
  *               the harmonic-mean denominator scaled by the common factor
  *               2^59 so it stays an exact BIGINT (M_r ≥ 1 ⇒ each term ≤
  *               2^58, 16 terms ⇒ no overflow);
  *  - estimate = floor(0.673 · 16² · 2^59 / N) with ONE double division,
  *               mirrored verbatim in the oracle SQL (long→double rounding
  *               of N is IEEE-defined, identical in both engines).
  */
object DetHll {
  val m = 16

  /** (register, rho) expressions for a key column. */
  def registerRho(key: Column): (Column, Column) = {
    val h = md5(key.cast("string").cast("binary"))
    val reg = conv(substring(h, 1, 1), 16, 10).cast("int")
    // 60-bit suffix as 15 hex chars; rho = 1 + leading zero bits
    val t = regexp_replace(substring(h, 2, 15), "^0*", "")
    val c = substring(t, 1, 1)
    val lzInNibble = when(c === "1", 3)
      .when(c.isin("2", "3"), 2)
      .when(c.isin("4", "5", "6", "7"), 1)
      .otherwise(0) // 8..f, and the all-zero case where t = "" (covered by length)
    val rho = (lit(15) - length(t)) * 4 + lzInNibble + 1
    (reg, rho)
  }

  /** Fine-grained register table: one row per (groupCols..., reg) with the
    * max rho — the mergeable sketch state (a 16-row vector per group). */
  def registers(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val (reg, rho) = registerRho(key)
    df.select(groupCols.map(col) :+ reg.as("reg") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max("rho").as("max_rho"))
  }

  /** Union registers to a coarser grouping (element-wise max) — the rollup
    * that never re-scans the fact table. */
  def union(regs: DataFrame, coarserCols: Seq[String]): DataFrame =
    regs.groupBy((coarserCols :+ "reg").map(col): _*)
      .agg(max("max_rho").as("max_rho"))

  /** Harmonic-mean estimate per group from a register table. */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               outCol: String = "approx_distinct"): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg((sum(expr("shiftleft(cast(1 as bigint), 59 - max_rho)")) +
        (lit(m.toLong) - count(lit(1))) * lit(1L << 59)).as("__N"))
      .select(groupCols.map(col) :+
        floor(lit(0.673) * lit(256.0) * lit(576460752303423488.0) /
          col("__N").cast("double")).cast("long").as(outCol): _*)
}
