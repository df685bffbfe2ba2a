package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join by bin replication.
  *
  * Spark plans a raw `p BETWEEN lo AND hi` join as a broadcast nested loop
  * — O(points × intervals) compares and a broadcast requirement that
  * collapses when neither side is small. The scale shape is binning:
  * intervals are replicated to every fixed-width bin they cover, points
  * map to exactly one bin, and the join becomes a hash equi-join on
  * (keys…, bin) followed by a residual `BETWEEN` filter. Work is
  * O(points + intervals × avg_span/binWidth + true_matches): linear,
  * shuffle-partitioned, AQE-skew-splittable — no custom operator needed,
  * so this sits on rung (a) of the SURVEY §7.5 ladder (compose built-ins
  * when semantics allow), unlike the as-of join which genuinely required
  * rung (c).
  *
  * `binWidth` trades replication (long intervals × narrow bins) against
  * residual selectivity (short intervals × wide bins); set it near the
  * typical interval span. Intervals are inclusive on both ends.
  */
object RangeJoin {

  /** Inner-join `points` to every row of `intervals` with matching `keys`
    * and `pointCol` in `[loCol, hiCol]`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // floorDiv semantics so negative coordinates bin correctly
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    points
      .withColumn("__bin", bin(col(pointCol)))
      .join(binned, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
