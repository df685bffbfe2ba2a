package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.rel._
import graft.streaming.StreamingOps

/** Driver contract — see SURVEY.md §7.
  *
  * `queries` carries one entry per implemented operator family; `oracleSql`
  * holds the DuckDB-equivalent SQL for every SQL-expressible entry (the
  * driver's correctness gate). Non-SQL-expressible operators (tile kernels,
  * streaming, binary/multimodal plumbing) are exposed Spark-side only and get
  * the driver's rows-only check.
  */
object SparkEntry {

  private def families: Seq[Q] =
    CoreQueries.all ++ RelabelRel.all ++ HaloRel.all ++ TextOps.all ++
      VectorOps.all ++ PipelineOps.all ++ FullChainRel.all ++ ChainExtras.all ++
      Relabel3Rel.all ++ StreamingOps.all ++ AsOfRel.all ++ SketchRel.all ++
      GeoRel.all ++ AnnotateRel.all ++ BucketedRel.all ++ CurationOps.all ++
      AudioOps.all ++ SourceOps.all ++ SketchOps.all ++ RankOps.all ++
      TokenizerOps.all ++ SelectOps.all ++ RagOps.all ++ GovernOps.all ++
      SpatialOps.all ++ EvalOps.all ++ StatsOps.all

  /** Flagship: the full image2labels pipeline on a synthetic tile grid
    * derived from sf0.001 lineitem (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineOps.flagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    families.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
