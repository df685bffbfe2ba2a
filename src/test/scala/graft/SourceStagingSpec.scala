package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

/** Concurrent invocations of the staged source round-trips must not clobber
  * each other: each invocation stages into its own counter-suffixed
  * directory, so one run's overwrite can never delete files under another
  * run's still-active read.
  */
class SourceStagingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("two concurrent staged round-trips produce identical results") {
    val sf = "/root/testdata/sf0.001"
    val fn = SparkEntry.queries("src_csv_roundtrip")
    def run(): Map[(Long, String), (Long, Double)] =
      fn(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    val (a, b) = (Future(run()), Future(run()))
    val (ra, rb) = (Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    assert(ra.nonEmpty && ra == rb)
    assert(ra == run()) // and a sequential run agrees
  }
}
