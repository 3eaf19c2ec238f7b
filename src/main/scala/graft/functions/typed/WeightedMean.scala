package graft.functions.typed

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed `Aggregator[IN, BUF, OUT]` — the Dataset-typed custom-aggregate
 * tier (SURVEY §2.7): weight-weighted mean with an exact BigDecimal
 * buffer, so the result is order-independent and oracle-reproducible
 * (double sums would drift with partitioning). Inputs are snapped to
 * 2 decimals (money semantics) before accumulating.
 */
class WeightedMeanAgg[IN](weight: IN => Double, value: IN => Double)
    extends Aggregator[IN, (BigDecimal, BigDecimal), Double] {

  private def d2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal), in: IN): (BigDecimal, BigDecimal) = {
    val w = d2(weight(in))
    (b._1 + w * d2(value(in)), b._2 + w)
  }

  override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._2 == BigDecimal(0)) 0.0 else b._1.toDouble / b._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMean {
  def of[IN](weight: IN => Double, value: IN => Double): WeightedMeanAgg[IN] =
    new WeightedMeanAgg(weight, value)
}
