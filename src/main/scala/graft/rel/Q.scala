package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness query: a Spark DataFrame implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables (SURVEY.md §7.4).
  *
  * Oracle-parity ground rules (so result hashes match bit-for-bit):
  *  - outputs carry only ints, strings, decimals, or untouched doubles —
  *    never an aggregated raw double (summation order differs per engine);
  *  - ratios use double division of exact ints (IEEE-identical in both);
  *  - every computed column is aliased identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
