package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k-per-group A/B at scale: the row_number window form (which Spark 4
  * optimizes with partial WindowGroupLimit — the shuffle is already
  * k-bounded, but every input partition still pays TWO full sorts) against
  * the TopKPairs bounded-buffer aggregate (O(n log k) heap, no sort).
  * Alternated in one JVM, min-of-2 per shape, so host noise can't pick the
  * winner. `sbt "runMain graft.tools.TopKScale 20000000 1000 5"` → 20M
  * rows, 1000 groups, k=5.
  */
object TopKScale {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val groups = if (args.length > 1) args(1).toInt else 1000
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.range(n).selectExpr(
      s"CAST(pmod(hash(id), $groups) AS BIGINT) AS g",
      "CAST(pmod(hash(id * 13 + 5), 1000000000) AS BIGINT) AS v",
      "id")
      .persist()
    base.count() // materialize input outside the timed region

    def windowForm(): Long = {
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      base.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).count()
    }
    def aggForm(): Long = {
      base.groupBy("g")
        .agg(graft.functions.TopKPairs(col("v"), col("id"), k).as("tk"))
        .select(posexplode(col("tk"))).count()
    }
    def time(f: () => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = f()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    // warm both shapes once, then alternate measured passes
    windowForm(); aggForm()
    val runs = Seq(
      ("window", time(() => windowForm())), ("agg", time(() => aggForm())),
      ("window", time(() => windowForm())), ("agg", time(() => aggForm())))
    val rowCounts = runs.map(_._2._1).distinct
    require(rowCounts.size == 1, s"shapes disagree: $rowCounts")
    def minOf(label: String) =
      runs.filter(_._1 == label).map(_._2._2).min
    println(f"rows=$n groups=$groups k=$k out=${rowCounts.head}")
    println(f"window (WindowGroupLimit + 2 sorts): ${minOf("window")}%6.2f s")
    println(f"topk_pairs (bounded heap, no sort):  ${minOf("agg")}%6.2f s")
  }
}
