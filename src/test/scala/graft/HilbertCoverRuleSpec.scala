package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{HilbertIndex, HInterval}
import graft.plans.HilbertBoxCover

/** The automatic Hilbert box-filter pushdown: the rule injects the
  * HInterval.cover ranges into a plain box filter's plan (visible in the
  * parquet scan's PushedFilters), results are unchanged, the scan reads
  * fewer rows, and the rule declines every case it must not touch
  * (index column already referenced, half-bounded boxes, missing layout
  * declaration, out-of-domain boxes).
  */
class HilbertCoverRuleSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private val ConfKey = "spark.graft.hilbert.layout"

  // 32 range-partitioned files so each carries a TIGHT bh min/max
  // envelope — the pruning-win assertion needs file-level granularity
  // finer than the box
  private lazy val dir: String = {
    val d = TempDirs.create("hcover_spec")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(expr("l_orderkey & 65535").as("bx"),
        expr("l_partkey & 65535").as("by"))
      .withColumn("bh", HilbertIndex.hilbert(col("bx"), col("by")))
      .repartitionByRange(32, col("bh"))
      .sortWithinPartitions("bh")
      .write.mode("overwrite").parquet(d)
    d
  }

  private def withLayout[T](v: String)(body: => T): T = {
    HilbertBoxCover.ensureInstalled(spark)
    spark.conf.set(ConfKey, v)
    try body finally spark.conf.unset(ConfKey)
  }

  private def boxDf = spark.read.parquet(dir)
    .filter(col("bx").between(100L, 900L) && col("by").between(50L, 300L))

  test("rule injects cover ranges into PushedFilters; results unchanged") {
    val plain = boxDf.collect().map(_.toSeq).toSet
    val (got, pushed) = withLayout("bx,by,bh") {
      val df = boxDf
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      // metadata is the UNtruncated source of the explain string
      (df.collect().map(_.toSeq).toSet,
        scans.map(_.metadata("PushedFilters")).mkString)
    }
    assert(got == plain, "cover must be a superset — results identical")
    assert(got.nonEmpty)
    // the scan carries bh range predicates the user never wrote
    assert(pushed.contains("GreaterThanOrEqual(bh") &&
      pushed.contains("LessThanOrEqual(bh"),
      s"expected bh ranges in PushedFilters:\n$pushed")
    // and the optimized filter really contains the OR'd ranges
    val opt = withLayout("bx,by,bh")(boxDf.queryExecution.optimizedPlan)
    val ors = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.Or(_, _) => 1
        }.size
    }.sum
    assert(ors > 0, "optimized filter should hold the OR'd range cover")
  }

  test("injected ranges equal HInterval.cover of the box") {
    val opt = withLayout("bx,by,bh")(boxDf.queryExecution.optimizedPlan)
    val got = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.And(
            org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
              a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Literal(lo: Long, _)),
            org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
              b: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Literal(hi: Long, _)))
            if a.name == "bh" && b.name == "bh" => (lo, hi)
        }
    }.flatten.toSet
    assert(got == HInterval.cover(100L, 900L, 50L, 300L).toSet)
  }

  test("the cover actually prunes: fewer rows scanned than a full read") {
    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }
    // a small box -> a narrow cover -> most of the 32 file envelopes are
    // disjoint from every range and get skipped outright
    def smallBox = spark.read.parquet(dir)
      .filter(col("bx").between(100L, 300L) && col("by").between(50L, 150L))
    val total = spark.read.parquet(dir).count()
    val withRule = withLayout("bx,by,bh")(scannedRows(smallBox))
    assert(withRule < total / 3,
      s"expected file/row-group pruning: scanned $withRule of $total")
    // never worse than the raw box (whose bx/by min/max stats also prune
    // here — hilbert clustering makes every file's x/y envelope tight,
    // which is the layout's whole point)
    val rawBox = scannedRows(smallBox)
    assert(withRule <= rawBox, s"rule made the scan worse: $withRule > $rawBox")
    // the 100 TB claim the rule exists for: the injected SORT-KEY ranges
    // alone prune as hard as per-column stats on both keys — at scale the
    // store can keep min/max (or a range index) on the ONE clustered
    // column and still answer any box on the keys it encodes
    val coverOnly = HInterval.cover(100L, 300L, 50L, 150L)
      .map { case (a, b) => col("bh").between(a, b) }.reduce(_ || _)
    val coverScan = scannedRows(spark.read.parquet(dir).filter(coverOnly))
    assert(coverScan == withRule,
      s"bh ranges alone must match box-stats pruning: $coverScan vs $withRule")
  }

  test("declines: no layout conf, wrong arity, missing columns") {
    // no conf -> untouched plan
    HilbertBoxCover.ensureInstalled(spark)
    val none = boxDf.queryExecution.optimizedPlan.toString
    assert(!none.contains("bh >="), "no rewrite without the declaration")
    // arity != 3 -> untouched
    val bad = withLayout("bx,by")(boxDf.queryExecution.optimizedPlan.toString)
    assert(!bad.contains("bh >="))
    // layout names a column the relation lacks -> untouched
    val miss = withLayout("bx,nope,bh")(
      boxDf.queryExecution.optimizedPlan.toString)
    assert(!miss.contains("bh >="))
  }

  test("declines: half-bounded box and index column already referenced") {
    val half = withLayout("bx,by,bh") {
      spark.read.parquet(dir)
        .filter(col("bx") >= 100L && col("by").between(50L, 300L))
        .queryExecution.optimizedPlan
    }
    val halfOrs = half.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.Or(_, _) => 1
        }.size
    }.sum
    assert(halfOrs == 0, "no cover for a half-bounded box")
    // a hand-built cover referencing bh must not get a second cover added
    val hand = withLayout("bx,by,bh") {
      val ivs = HInterval.cover(100L, 900L, 50L, 300L)
      val pred = ivs.map { case (a, b) => col("bh").between(a, b) }
        .reduce(_ || _)
      spark.read.parquet(dir)
        .filter(pred && col("bx").between(100L, 900L) &&
          col("by").between(50L, 300L))
        .queryExecution.optimizedPlan
    }
    val handRanges = hand.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
            a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
            _) if a.name == "bh" => 1
        }.size
    }.sum
    assert(handRanges == HInterval.cover(100L, 900L, 50L, 300L).size,
      "hand-built cover left exactly as written")
  }

  // hilbert3-sorted twin store for the 3-D layout tests
  private lazy val dir3: String = {
    val d = TempDirs.create("hcover3_spec")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(expr("l_orderkey & 1023").as("cx"),
        expr("l_partkey & 1023").as("cy"),
        expr("l_suppkey & 1023").as("cz"))
      .withColumn("ch", graft.functions.Hilbert3.hilbert3(
        col("cx"), col("cy"), col("cz")))
      .repartitionByRange(32, col("ch"))
      .sortWithinPartitions("ch")
      .write.mode("overwrite").parquet(d)
    d
  }

  // sf0.001 key spreads: suppkey 0..9, partkey&1023 0..199 — the box must
  // intersect them (the suppkey slab also exercises cover3's escalation)
  private def boxDf3 = spark.read.parquet(dir3)
    .filter(col("cx").between(100L, 400L) && col("cy").between(20L, 150L) &&
      col("cz").between(2L, 8L))

  test("four-name layout routes through cover3; results unchanged") {
    val plain = boxDf3.collect().map(_.toSeq).toSet
    val got = withLayout("cx,cy,cz,ch")(boxDf3.collect().map(_.toSeq).toSet)
    assert(got == plain && got.nonEmpty, "3-D cover must be a superset")
    val opt = withLayout("cx,cy,cz,ch")(boxDf3.queryExecution.optimizedPlan)
    val ranges = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.And(
            org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
              a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Literal(lo: Long, _)),
            org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
              b: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Literal(hi: Long, _)))
            if a.name == "ch" && b.name == "ch" => (lo, hi)
        }
    }.flatten.toSet
    assert(ranges ==
      HInterval.cover3(100L, 400L, 20L, 150L, 2L, 8L).toSet,
      "injected ranges equal the octree cover")
  }

  test("multi-layout declaration: each table matches its own layout") {
    // one session serving BOTH stores: the 2-D layout fires on the 2-D
    // table, the 3-D layout on the 3-D table, neither cross-fires
    def rangeCols(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Set[String] = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
            a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
            org.apache.spark.sql.catalyst.expressions.Literal(_, _))
            if a.name == "bh" || a.name == "ch" => a.name
        }
    }.flatten.toSet
    withLayout("bx,by,bh;cx,cy,cz,ch") {
      assert(rangeCols(boxDf.queryExecution.optimizedPlan) == Set("bh"))
      assert(rangeCols(boxDf3.queryExecution.optimizedPlan) == Set("ch"))
      assert(boxDf3.count() > 0)
    }
  }

  private def rangesOf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      name: String): Set[(Long, Long)] = plan.collect {
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      f.condition.collect {
        case org.apache.spark.sql.catalyst.expressions.And(
          org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
            a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
            org.apache.spark.sql.catalyst.expressions.Literal(lo: Long, _)),
          org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
            b: org.apache.spark.sql.catalyst.expressions.AttributeReference,
            org.apache.spark.sql.catalyst.expressions.Literal(hi: Long, _)))
          if a.name == name && b.name == name => (lo, hi)
      }
  }.flatten.toSet

  private def bhRanges(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Set[(Long, Long)] = rangesOf(plan, "bh")

  // expectation-building uses the rule's OWN union-merge, so the two
  // can never silently diverge
  private def merged(rs: Seq[(Long, Long)]): Set[(Long, Long)] =
    HilbertBoxCover.mergeRanges(rs).toSet

  test("IN-list: per-value sub-box covers injected, results unchanged") {
    // narrow by-range keeps every cover EXACT (no cell escalation), so
    // the union-of-unit-covers expectation is range-for-range comparable
    def inBox = spark.read.parquet(dir)
      .filter(col("bx").isin(150L, 151L, 900L) &&
        col("by").between(50L, 60L))
    val plain = inBox.collect().map(_.toSeq).toSet
    withLayout("bx,by,bh") {
      assert(inBox.collect().map(_.toSeq).toSet == plain,
        "multi-box cover must be a superset")
      val got = bhRanges(inBox.queryExecution.optimizedPlan)
      val expect = merged(Seq(150L, 151L, 900L)
        .flatMap(v => HInterval.cover(v, v, 50L, 60L)))
      assert(got == expect,
        s"expected the union-merged per-value covers, got $got")
      // the win over the hull: three degenerate boxes cover far less
      // curve than the hull box the old rule would have needed
      val hullVol = HInterval.cover(150L, 900L, 50L, 60L)
        .map { case (a, b) => b - a + 1 }.sum
      val gotVol = got.toSeq.map { case (a, b) => b - a + 1 }.sum
      assert(gotVol < hullVol / 10,
        s"per-value covers should be far tighter than the hull: $gotVol vs $hullVol")
    }
  }

  test("long IN-list arrives as InSet and still covers; >cap collapses to hull") {
    // 12 values: past spark.sql.optimizer.inSetConversionThreshold (10),
    // the main batch rewrites In -> InSet before this rule runs
    val twelve = (100L to 111L)
    def inSetBox = spark.read.parquet(dir)
      .filter(col("bx").isin(twelve: _*) && col("by").between(50L, 300L))
    withLayout("bx,by,bh") {
      val got = bhRanges(inSetBox.queryExecution.optimizedPlan)
      // contiguous values merge into ONE interval -> a single box cover
      assert(got == HInterval.cover(100L, 111L, 50L, 300L).toSet,
        "InSet of contiguous values must cover as one box")
    }
    // 40 scattered values: past MaxInValues, the key collapses to its
    // hull [min, max] — coarser, still a superset
    val forty = (0 until 40).map(i => 100L + i * 37L)
    def bigBox = spark.read.parquet(dir)
      .filter(col("bx").isin(forty: _*) && col("by").between(50L, 300L))
    val plain = bigBox.collect().map(_.toSeq).toSet
    withLayout("bx,by,bh") {
      assert(bigBox.collect().map(_.toSeq).toSet == plain)
      val got = bhRanges(bigBox.queryExecution.optimizedPlan)
      assert(got == HInterval.cover(forty.min, forty.max, 50L, 300L).toSet,
        "past the IN cap the cover is the hull box")
    }
  }

  test("null-safe equality bounds a key exactly like EqualTo") {
    def nsBox = spark.read.parquet(dir)
      .filter(col("bx") <=> 150L && col("by").between(50L, 300L))
    val plain = nsBox.collect().map(_.toSeq).toSet
    withLayout("bx,by,bh") {
      assert(nsBox.collect().map(_.toSeq).toSet == plain)
      assert(bhRanges(nsBox.queryExecution.optimizedPlan) ==
        HInterval.cover(150L, 150L, 50L, 300L).toSet)
    }
  }

  test("a NULL index with in-domain keys survives via the IsNull escape") {
    // a conf-declared layout over arbitrary data can carry a NULL index
    // on a row whose keys are in-domain and non-null; without the
    // IsNull(h) escape the injected conjunct evaluates Or(NULL, false) =
    // NULL and the Filter silently drops the row
    import spark.implicits._
    val d = TempDirs.create("hcover_nullh")
    Seq((5L, 10L), (6L, 11L)).toDF("nx", "ny")
      .withColumn("nh",
        when(col("nx") === 5L, HilbertIndex.hilbert(col("nx"), col("ny"))))
      .write.mode("overwrite").parquet(d)
    withLayout("nx,ny,nh") {
      val got = spark.read.parquet(d)
        .filter(col("nx").between(0L, 100L) && col("ny").between(0L, 20L))
        .select("nx").collect().map(_.getLong(0)).toSet
      assert(got == Set(5L, 6L),
        "NULL-index row must fall through to the original predicate")
    }
  }

  test("3-D IN-list routes through per-value octree covers") {
    def inBox3 = spark.read.parquet(dir3)
      .filter(col("cz").isin(2L, 8L) && col("cx").between(100L, 400L) &&
        col("cy").between(20L, 150L))
    val plain = inBox3.collect().map(_.toSeq).toSet
    withLayout("cx,cy,cz,ch") {
      assert(inBox3.collect().map(_.toSeq).toSet == plain && plain.nonEmpty)
      val got = rangesOf(inBox3.queryExecution.optimizedPlan, "ch")
      // two disjoint z-slabs -> two sub-box octree covers, union-merged
      // (identical cover3 calls on both sides, so escalation cancels out)
      val expect = merged(
        HInterval.cover3(100L, 400L, 20L, 150L, 2L, 2L) ++
          HInterval.cover3(100L, 400L, 20L, 150L, 8L, 8L))
      assert(got == expect, s"expected merged per-slab covers, got $got")
    }
  }

  test("fuzz: random box/IN predicates — rewrite never changes results") {
    // fixed-seed adversarial sweep over the predicate shapes the rule
    // accepts, INCLUDING bounds outside the curve domain (clamp + escape
    // paths) and empty IN-x-range intersections (decline path). The one
    // invariant that may never break: with the layout declared, every
    // query returns exactly the plain-filter rows.
    val rnd = new scala.util.Random(12)
    def rb(lo: Long, hi: Long): Long = lo + rnd.nextLong(hi - lo + 1)
    val preds = (1 to 15).map { i =>
      val shape = i % 5
      val (xl, xh) = (rb(-200L, 1500L), rb(-200L, 70000L))
      val (yl, yh) = (rb(-50L, 200L), rb(-50L, 400L))
      val ins = Seq.fill(1 + rnd.nextInt(6))(rb(0L, 2200L))
      shape match {
        case 0 => col("bx").between(xl, xh) && col("by").between(yl, yh)
        case 1 => col("bx").isin(ins: _*) && col("by").between(yl, yh)
        case 2 => col("by").isin(ins: _*) && col("bx").between(xl, xh)
        case 3 => col("bx").isin(ins: _*) &&
          col("by").isin(Seq.fill(3)(rb(0L, 250L)): _*)
        case _ => (col("bx") <=> rb(0L, 1500L)) && col("by") > yl &&
          col("by") <= yh
      }
    }
    val plains = preds.map(p =>
      spark.read.parquet(dir).filter(p).collect().map(_.toSeq).toSet)
    withLayout("bx,by,bh") {
      preds.zip(plains).zipWithIndex.foreach { case ((p, want), i) =>
        val got = spark.read.parquet(dir).filter(p)
          .collect().map(_.toSeq).toSet
        assert(got == want, s"fuzz predicate #$i changed the result set")
      }
    }
  }

  test("strict and reversed comparisons normalize to the same closed box") {
    val a = withLayout("bx,by,bh") {
      spark.read.parquet(dir)
        .filter(col("bx") > 99L && col("bx") < 901L &&
          lit(50L) <= col("by") && lit(300L) >= col("by"))
        .queryExecution.optimizedPlan
    }
    val got = a.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case org.apache.spark.sql.catalyst.expressions.And(
            org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
              x: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Literal(lo: Long, _)),
            org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
              y: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Literal(hi: Long, _)))
            if x.name == "bh" && y.name == "bh" => (lo, hi)
        }
    }.flatten.toSet
    assert(got == HInterval.cover(100L, 900L, 50L, 300L).toSet)
  }
}
