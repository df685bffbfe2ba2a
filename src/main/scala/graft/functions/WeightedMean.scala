package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (the Dataset-native custom
  * aggregate of SURVEY §2.2, complementing the Catalyst-level
  * [[KMinStrings]]): exact weighted mean over pre-quantized integer
  * (value, weight) pairs. The buffer is two exact int64 sums, so the
  * result is a single correctly-rounded double division — deterministic
  * under any partitioning and replayable by an engine computing
  * `CAST(sum(q*w) AS BIGINT) / CAST(sum(w) AS BIGINT)` in double.
  */
object WeightedMean extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) Double.NaN else b._1.toDouble / b._2.toDouble
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
