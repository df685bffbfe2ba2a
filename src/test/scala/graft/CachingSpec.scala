package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel

class CachingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def eventually(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    cond
  }

  test("deps are cached for the action and released after it completes") {
    import spark.implicits._
    val dep = spark.range(1000).map(_ * 2).toDF("v")
    val result = Caching.releaseAfterAction(
      dep.groupBy(($"v" % 10).as("k")).count(), dep)
    assert(dep.storageLevel != StorageLevel.NONE, "dep not persisted")
    assert(result.count() == 5) // even values only -> 5 residues mod 10
    assert(eventually(dep.storageLevel == StorageLevel.NONE),
      "dep still cached 10s after the consuming action completed")
  }

  test("an unrelated action does not release the cache") {
    import spark.implicits._
    val dep = spark.range(1000).map(_ * 3).toDF("v")
    val result = Caching.releaseAfterAction(
      dep.groupBy(($"v" % 7).as("k")).count(), dep)
    spark.range(50).count() // unrelated
    Thread.sleep(500)
    assert(dep.storageLevel != StorageLevel.NONE,
      "unrelated action released the cache")
    result.count()
    assert(eventually(dep.storageLevel == StorageLevel.NONE))
  }
}
