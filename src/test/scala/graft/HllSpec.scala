package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HllRegisters differentials: the aggregate's register table equals a
  * driver-side replay of the same definition, and is invariant under
  * repartitioning (elementwise max is commutative + idempotent — the
  * property that makes the sketch exactly-replayable and hence
  * hash-gateable, unlike a float estimate).
  */
class HllSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def hashed = spark.read.parquet(s"$sf/events.parquet")
    .select(col("event_type"), expr(
      "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      .as("h"))

  private def regsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Int]] =
    df.groupBy("event_type")
      .agg(graft.functions.HllRegisters(col("h"), 6).as("regs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap

  test("registers equal a driver-side replay of the definition") {
    val got = regsOf(hashed)
    val replay = hashed.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (et, rows) =>
        val regs = new Array[Int](64)
        for ((_, h) <- rows) {
          val bucket = (h >>> 54).toInt
          val r = h & ((1L << 54) - 1)
          val rho =
            if (r == 0L) 55
            else 54 - (63 - java.lang.Long.numberOfLeadingZeros(r))
          if (rho > regs(bucket)) regs(bucket) = rho
        }
        et -> regs.toSeq
      }
    assert(got.keySet == replay.keySet)
    for ((et, r) <- replay) assert(got(et) == r, s"mismatch for $et")
    // the fixture actually exercises the sketch: some register is > 1
    assert(replay.values.flatten.max > 1)
  }

  test("registers are partitioning-invariant") {
    val base = regsOf(hashed)
    assert(regsOf(hashed.repartition(1)) == base)
    assert(regsOf(hashed.repartition(17)) == base)
  }

  test("estimate lands within HLL's error envelope of the exact count") {
    // the GATE outputs the raw harmonic estimate (deterministic — no ln);
    // for the accuracy check apply the standard small-range correction
    // (linear counting when raw < 2.5m), which is float-library-dependent
    // and so lives here, not in the hash-gated query
    val rows = SparkEntry.queries("sk_hll_users")(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((et, g) <- byType) {
      val raw = g.head.getAs[Double]("est_users")
      val zeros = g.count(_.getAs[Long]("reg") == 0L)
      val m = 64.0
      val est =
        if (raw < 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
      val n = exact(et)
      // m=64 gives ~13% standard error; allow 4 sigma
      assert(math.abs(est - n) <= math.max(4.0, 0.52 * n),
        s"$et: est $est (raw $raw, zeros $zeros) vs exact $n")
    }
  }
}
