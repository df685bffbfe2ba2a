package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential probe: the round-5 co-partitioned RDD fixpoint
  * (graft.rel.GraphOps) vs the round-4 DataFrame fixpoint (OldGraphOps,
  * lifted verbatim from git history) on the same synthetic graph —
  * alternating in one JVM so host noise hits both.
  *
  * Graph shape mirrors the dedup workload's hard parts: long chains
  * (worst-case diameter for label propagation) plus dense clusters, over a
  * mostly-isolated corpus.
  */
object ComponentsScale {

  def main(args: Array[String]): Unit = {
    val nVerts = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vertices = spark.range(nVerts).select(col("id").as("doc_id"))
    // 1% of vertices form chains of 64 (diameter driver); another 1% form
    // 16-cliques via a shared hub (breadth driver)
    val chain = spark.range(nVerts / 100)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .filter(col("id_b") % 64 =!= 0)
    val hubs = spark.range(nVerts / 100)
      .select((col("id") * 7919 % nVerts).as("id_a"),
        (lit(nVerts) + expr("id div 16")).as("hub"))
      .select(col("id_a"), col("hub").as("id_b"))
    val edges = chain.unionByName(hubs).persist()
    edges.count()

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val comps = f.agg(countDistinct(col("comp"))).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[components] $label%-4s $sec%7.2f s  distinct_comps=$comps")
      comps
    }

    var oldC = 0L; var newC = 0L
    // force the DISTRIBUTED fixpoint: this probe exists to compare the
    // fixpoint shapes, so the runtime driver-union-find shortcut (which
    // would absorb this synthetic edge set) is disabled here
    spark.conf.set(graft.rel.GraphOps.DriverCapKey, "0")
    (1 to 3).foreach { _ =>
      newC = time("new")(graft.rel.GraphOps.connectedComponents(vertices, edges))
      oldC = time("old")(OldGraphOps.connectedComponents(vertices, edges))
    }
    assert(oldC == newC, s"component counts diverge: old=$oldC new=$newC")
    spark.stop()
  }
}
