package graft.typed

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s over `Dataset[T]` — the §2.9 headroom tier (the
  * reference has zero UDAFs; a Spark-native engine should still expose the
  * type-safe aggregation surface, `ds.groupByKey(...).agg(agg.toColumn)`).
  *
  * Design rule shared with RelOps.momentStats: accumulate EXACT integer
  * sufficient statistics (here cents×quantity as Long) and confine floating
  * point to one final formula — the result is then independent of partial-
  * aggregation order, i.e. bit-reproducible across partition counts and
  * engine runs, which is what lets a DuckDB oracle hash-match it. A naive
  * `sum(price*qty)/sum(qty)` over doubles is accumulation-order-dependent
  * and would differ run to run at 1000-executor scale.
  */
object TypedAggs {

  /** Input row for [[WeightedMean]]: `cents` is the DECIMAL(18,2) measure
    * ×100 (exact), `qty` the integer weight. */
  case class Weighted(key: String, qty: Long, cents: Long)

  /** Typed view of a lineitem row for the Dataset[T] lambda pipeline
    * (SparkEntry q110). */
  case class Line(okey: Long, lineNo: Long, qty: Long, flag: String)

  /** Quantity-weighted mean of a money column: Σ(cents·qty)/100/Σqty.
    * Buffer is two Longs — partial aggregation (map-side combine) is exact
    * integer addition, so merge order cannot change the answer. */
  object WeightedMean extends Aggregator[Weighted, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Weighted): (Long, Long) =
      (b._1 + a.cents * a.qty, b._2 + a.qty)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    // one float expression, mirrored verbatim in the oracle SQL
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) 0.0 else r._1.toDouble / 100.0 / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** [[WeightedMean]] in positional-argument form, for SQL registration via
    * `functions.udaf` — `spark.udf.register("graft_wavg", udaf(WeightedMeanUdaf))`
    * makes it callable as `graft_wavg(qty, cents)` from `spark.sql`
    * (§2.9's UDAF surface). Same exact-integer buffer, same single final
    * float expression.
    */
  object WeightedMeanUdaf extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._2 * a._1, b._2 + a._1)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) 0.0 else r._1.toDouble / 100.0 / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
