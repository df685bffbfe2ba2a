package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rel.GraphOps

/** Differential test: the distributed label-propagation fixpoint must agree
  * with a plain union-find on arbitrary graphs — random sparse and dense
  * graphs, chains (worst-case diameter), stars, and isolated vertices.
  */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val p = parent(c); parent(c) = r; c = p }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are minimal ids because unions always point larger to smaller
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val vs = spark.range(n.toLong).toDF("doc_id")
    val es = edges.toDF("id_a", "id_b")
    // both physical strategies must agree with the reference union-find:
    // the runtime driver shortcut (default cap) AND the distributed
    // fixpoint (cap 0 forces it)
    val expected = unionFind(n, edges)
    val gotDriver = GraphOps.connectedComponents(vs, es)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDriver == expected, "driver union-find path diverges")
    spark.conf.set(GraphOps.DriverCapKey, "0")
    try {
      val gotDist = GraphOps.connectedComponents(vs, es)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == expected, "distributed fixpoint path diverges")
    } finally spark.conf.unset(GraphOps.DriverCapKey)
  }

  test("random sparse graph matches union-find") {
    val rnd = new scala.util.Random(11)
    check(200, Seq.fill(120)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(e => e._1 != e._2))
  }

  test("random dense graph matches union-find") {
    val rnd = new scala.util.Random(13)
    check(60, Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2))
  }

  test("a single long chain (worst-case diameter) collapses to one component") {
    val n = 64
    check(n, (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)))
  }

  test("reversed chain and star centered on the max id") {
    check(32, (0 until 31).map(i => ((i + 1).toLong, i.toLong)))
    check(20, (0 until 19).map(i => (19L, i.toLong)))
  }

  test("edgeless graph: every vertex is its own component") {
    check(25, Seq.empty)
  }

  test("LongUnionFind: agrees with naive union-find across grows, any ids") {
    // ids chosen to stress the open-addressed table: negatives, zero,
    // Long extremes, and enough distinct vertices to force several
    // rehash doublings past the 4096 initial capacity
    val rnd = new scala.util.Random(17)
    val ids = (0 until 6000).map(_ => rnd.nextLong()) ++
      Seq(0L, -1L, Long.MinValue, Long.MaxValue, 42L)
    val edges = (0 until 9000).map { _ =>
      (ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
    } ++ Seq((Long.MinValue, Long.MaxValue), (0L, -1L))
    val uf = new GraphOps.LongUnionFind()
    edges.foreach { case (a, b) => uf.union(a, b) }
    val got = uf.labels().toMap
    // naive reference over boxed longs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("tx_mix_apply spends each source's budget without overshooting") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("tx_mix_apply")(spark, "/root/testdata/sf0.001")
      .cache()
    try {
      // never exceed the per-source allocation; always take at least the
      // docs that fit, so the leftover is smaller than the next doc
      assert(df.filter(col("tokens_taken") > col("alloc")).count() == 0)
      assert(df.filter(col("n_taken") > col("n_docs")).count() == 0)
      val total = df.agg(sum("alloc"), sum("tokens_taken")).collect()(0)
      assert(total.getLong(0) == 10000L, "Hamilton allocations sum to budget")
      assert(total.getLong(1) <= 10000L && total.getLong(1) > 5000L,
        s"budget utilization out of range: ${total.getLong(1)}")
    } finally df.unpersist()
  }

  test("gr_labelprop communities partition the sparsified node set") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("gr_labelprop")(spark, sf).cache()
    try {
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") <= 2)
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val ed = orders.join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + lit(1000000L)).as("b")).distinct()
      val nNodes = ed.select(col("a").as("n"))
        .unionByName(ed.select(col("b").as("n"))).distinct().count()
      val total = rows.agg(sum("n_members")).collect()(0).getLong(0)
      assert(total == nNodes, s"members=$total nodes=$nNodes")
      // every community label is itself a node id of the graph
      assert(rows.filter(col("id_min") > col("id_sum")).count() == 0)
      assert(rows.filter(col("n_members") < 1).count() == 0)
    } finally rows.unpersist()
  }

  test("gr_bfs matches an in-memory BFS truncated at 3 hops") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("gr_bfs")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ed = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") <= 2),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(1000000L)).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (ed.map(e => e._1 -> e._2) ++ ed.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.keySet.filter(n => n < 1000000L && n % 100 == 0)
    var want = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (r <- 1 to 3) {
      val nxt = frontier.flatMap(adj(_)).diff(want.keySet)
      want = want ++ nxt.map(_ -> r.toLong)
      frontier = nxt
    }
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
  }

  test("gr_hits: both sides max-normalized over exactly the graph's nodes") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("gr_hits")(spark, sf).cache()
    try {
      // scores live in (0, 1e6] and each side attains its max
      assert(rows.filter(col("score") <= 0 || col("score") > 1000000L)
        .count() == 0)
      val mx = rows.groupBy("side").agg(max("score").as("m"))
      assert(mx.filter(col("m") =!= 1000000L).count() == 0,
        "per-side max must be the scale unit")
      // hub rows = distinct customers with orders+lineitems, auth rows =
      // distinct suppliers (offset), nothing else
      val ed = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000L)).as("dst")).distinct()
      val hubs = rows.filter(col("side") === "hub")
      val auths = rows.filter(col("side") === "auth")
      assert(hubs.count() == ed.select("src").distinct().count())
      assert(auths.count() == ed.select("dst").distinct().count())
      assert(hubs.join(ed.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").count() == 0)
      assert(auths.join(ed.select(col("dst").as("node")).distinct(),
        Seq("node"), "left_anti").count() == 0)
    } finally rows.unpersist()
  }
}
