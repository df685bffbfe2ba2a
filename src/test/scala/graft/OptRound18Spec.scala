package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI pins for the round-18 optimizations. */
class OptRound18Spec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("forked JVMs run with writable memory-backed scratch when available") {
    // build.sbt points java.io.tmpdir at SPARK_GRAFT_SCRATCH, defaulting to
    // /dev/shm/graft-scratch when /dev/shm is writable (r18 §2). Tests fork
    // with the same javaOptions, so this pins the lever end-to-end: all
    // ephemeral engine I/O (spark.local.dir, streaming checkpoints,
    // TempDirs staging) derives from java.io.tmpdir.
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    assert(tmp.isDirectory && tmp.canWrite, s"tmpdir unusable: $tmp")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite && !sys.env.contains("SPARK_GRAFT_SCRATCH"))
      assert(tmp.getPath.startsWith("/dev/shm/"),
        s"writable /dev/shm present but scratch is $tmp")
  }

  test("dd_lsh_recall caches truth and cand without changing the result") {
    // r18: truth/cand are persisted for the action's lifetime (each feeds
    // two consumers). Pin (a) the result equals a straight recomputation
    // through an independent session run, (b) the caches are released once
    // the action completes (releaseAfterAction contract).
    val d = "/root/testdata/sf0.001"
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = SparkEntry.queries("dd_lsh_recall")(spark, d)
    val rows = df.collect()
    assert(rows.length == 1)
    // a second invocation (fresh builder => fresh persists) must agree
    val rows2 = SparkEntry.queries("dd_lsh_recall")(spark, d).collect()
    assert(rows.map(_.toString).sameElements(rows2.map(_.toString)))
    // deps were released by the action listener (may be async; poll briefly)
    val deadline = System.currentTimeMillis() + 10000
    def extra() = spark.sparkContext.getPersistentRDDs.size > before
    while (extra() && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(!extra(), "dd_lsh_recall left cached blocks after its action")
  }
}
