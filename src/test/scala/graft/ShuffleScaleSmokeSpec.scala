package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ShuffleScale

/** Minimal-size smoke over the ShuffleScale probe's production wiring —
  * one staged run per shuffle-heavy family (5 k docs / 5 k vectors / 8x8
  * tiles, no timing assertions) through the SAME stage/build/assert
  * methods the evidence runs use, so the probe's plumbing and its
  * plan-shape `require`s cannot rot between evidence rounds: if
  * `TextOps.candFromMins`, `VectorOps.annIvfCore`, or
  * `Relabel.image2labels` stop planning the asserted shapes, the suite
  * goes red the same day, not at the next quiet-window scale run.
  */
class ShuffleScaleSmokeSpec extends AnyFunSuite {

  test("lsh smoke: band join plans a hash equi-join and keeps the twins") {
    val spark = SparkTest.session
    val dir = TempDirs.create("smoke_lsh")
    ShuffleScale.lshStage(spark, 5000L, dir)
    val cand = ShuffleScale.lshCand(spark, dir)
    ShuffleScale.assertLshPlan(cand.queryExecution.executedPlan.toString)
    // ~1000 planted twins; candidate recall below 0.9 means the corpus or
    // the minhash path broke (same net as the probe's RUN require)
    assert(cand.count() >= 5000 / 5 * 9 / 10)
  }

  test("ivf smoke: cell-probe join is a broadcast hash join, no cartesian") {
    val spark = SparkTest.session
    val dir = TempDirs.create("smoke_ivf")
    ShuffleScale.ivfStage(spark, 5000L, dir)
    val q = ShuffleScale.ivfQuery(spark, dir, 5000L)
    ShuffleScale.assertIvfPlan(q.queryExecution.executedPlan.toString)
    assert(q.count() > 1500, "query stratum collapsed")
  }

  test("halo smoke: the 8x8 pipeline plans exactly 2 exchanges") {
    val spark = SparkTest.session
    val dir = TempDirs.create("smoke_halo")
    ShuffleScale.haloStage(spark, 8, dir)
    val p = ShuffleScale.haloPipeline(spark, dir, 8)
    ShuffleScale.assertHaloPlan(p.queryExecution.executedPlan.toString)
    assert(p.count() == 64L, "pipeline lost tiles")
  }
}
