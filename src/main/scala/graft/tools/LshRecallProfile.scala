package graft.tools

import org.apache.spark.sql.DataFrame

import graft.BenchProtocol

/** Adjudication probe for `dd_lsh_recall` (the slowest BATCH gate in the
  * r13 idle artifact, 3.30 s): quiet min-of-3 of the full gate, then
  * min-of-3 of each cost center THROUGH THE GATE'S OWN SUBQUERIES
  * (`TextOps.lshTruthPairs`, `TextOps.minhashCand`) so the decomposition
  * cannot drift from what the gate runs:
  *
  *   truth   the exact ground-truth side — co-shingle equi-join +
  *           Jaccard filter (bounded by co-shingle volume, never an
  *           all-pairs product; on the synthetic ~35-word-vocabulary
  *           corpus nearly every doc pair shares SOME shingle, so this
  *           is the quadratic-leaning piece a real corpus doesn't have)
  *   cand    the LSH candidate side (the production band equi-join)
  *   verify  the semi-join of truth against candidates + the three
  *           count folds (timed as full-gate minus the two sides is NOT
  *           valid — stages share scans — so it runs as its own query)
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.LshRecallProfile"`
  */
object LshRecallProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (cpus, cpusN) = BenchProtocol.cpusEnv()
    val spark = BenchProtocol.session(cpus, cpusN)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/documents.parquet").limit(1).collect()
    println(f"CALIB ${BenchProtocol.calibMin3(spark)}%.3f s (min-of-3)  " +
      f"load_start ${BenchProtocol.loadavg()}%.2f")

    def min3(name: String)(mk: () => DataFrame): Unit = {
      var best = Double.MaxValue
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        best = math.min(best, t)
        t
      }
      println(f"TIME $name%-8s min3=${best}%6.2f s  " +
        samples.map(t => f"$t%.2f").mkString("samples=", "/", "") +
        f"  load=${BenchProtocol.loadavg()}%.2f")
    }

    min3("gate") { () =>
      graft.SparkEntry.queries("dd_lsh_recall")(spark, d) }
    min3("truth") { () =>
      val (truth, shd) = graft.rel.TextOps.lshTruthPairs(spark, d)
      graft.Caching.releaseAfterAction(truth, shd)
    }
    min3("cand") { () => graft.rel.TextOps.minhashCand(spark, d) }
    min3("verify") { () =>
      val (truth, shd) = graft.rel.TextOps.lshTruthPairs(spark, d)
      val cand = graft.rel.TextOps.minhashCand(spark, d)
      graft.Caching.releaseAfterAction(
        truth.join(cand, Seq("id_a", "id_b"), "left_semi"), shd)
    }
    spark.stop()
  }
}
