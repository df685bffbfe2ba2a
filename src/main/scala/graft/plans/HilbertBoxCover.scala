package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.{HilbertIndex, HInterval}

/** Optimizer rule: rewrite a plain 2-D box filter over Hilbert-laid-out
  * data into a scan that prunes by the Hilbert index — automatically, so
  * the user writes the query they mean:
  *
  * {{{ df.filter($"x".between(a, b) && $"y".between(c, d)) }}}
  *
  * and the rule ANDs in the [[HInterval.cover]] range decomposition over
  * the layout's index column (`h BETWEEN r1lo AND r1hi OR ...`), which
  * FileSourceStrategy pushes into the parquet scan as min/max-prunable
  * range predicates — the file/row-group skipping a Hilbert OPTIMIZE
  * exists to buy, without the caller hand-building OR'd ranges (the
  * lo_hscan gate's manual form). The original box predicates stay in the
  * plan: the cover is a SUPERSET of the box (aligned quadtree cells
  * overshoot, never undershoot — HilbertSpec pins this), so adding the
  * implied conjunct can only prune, never change results.
  *
  * The layout is DECLARED, not inferred: the session conf
  * `spark.graft.hilbert.layout = "xcol,ycol,hcol"` names the two 16-bit
  * key columns and the order-16 index column written by the layout job
  * (the relational analogue of a table clustering property — plain
  * parquet has nowhere durable to carry it). A FOUR-name layout
  * `"xcol,ycol,zcol,hcol"` declares the order-10 3-D curve instead
  * ([[graft.functions.Hilbert3]]), rewritten through the octree
  * [[HInterval.cover3]]; several layouts separate with `;` (one session
  * can serve tables clustered on different keys — each Filter is matched
  * against each declared layout in turn, first complete match fires).
  * Declaring a layout by conf ASSERTS the contract for any relation
  * carrying those column names; [[GraftLayout]]'s sidecar route instead
  * registers PATH-SCOPED layouts that this rule applies only to filters
  * over the exact file store the sidecar sits in. The rule fires only on
  * a Filter whose child carries ALL the layout's columns (the index
  * column bigint, the keys integral) and whose predicate conjunctively
  * bounds every key with integral literals — closed ranges, equalities
  * (null-safe included), and `IN`-lists, an IN being a union of
  * degenerate boxes covered sub-box by sub-box; a predicate already
  * referencing the index column is left untouched (idempotence, and
  * hand-built covers like lo_hscan's keep their exact form). The
  * injected conjunct is `cover OR any-key-out-of-domain` (conf-declared
  * layouts, which assert the contract over data the engine never wrote,
  * additionally get `OR index-NULL`): on data that violates the declared
  * contract the masked index is unrelated to the raw key (or not
  * computed at all), and the escape disjuncts let such rows fall through
  * to the original predicate instead of being silently pruned (on clean
  * stores file statistics disprove the escapes — they cost nothing; see
  * coverPred for why the sidecar route must NOT carry the IsNull form).
  *
  * Scale note: the rewrite is pure driver-side math on the query
  * literals — the cover of a box is O(perimeter / cell) intervals,
  * capped below; data never moves.
  */
object HilbertBoxCover extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.hilbert.layout"

  /** Hard cap on injected ranges (cover/cover3 escalate their cell size
    * under this by construction; the check remains as a belt for custom
    * callers). The domain-spanning case the cap used to proxy for is now
    * declined DIRECTLY: coverPred refuses any cover spanning more than a
    * quarter of the curve domain, where a fat OR chain would be
    * evaluated per row for almost no pruning.
    */
  private val MaxRanges = 256

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confLayouts = conf.getConfString(ConfKey, "").split(";")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(n => (n.length == 3 || n.length == 4) &&
        n.distinct.length == n.length).toSeq
    // cheap short-circuit: sessions that never declare a layout must not
    // pay the per-Filter leaf traversal on every optimizer pass
    if (confLayouts.isEmpty && GraftLayout.registryEmpty) return plan

    // store fingerprint re-validation (inside layoutFor) costs one tiny
    // sidecar GET + one directory LIST per registered root (content hash
    // + data-file fingerprint — the append/overwrite/rewrite guards) —
    // memoized per path-set for THIS apply() so multi-Filter plans pay
    // it once per rule INVOCATION. The fixed-point "User Provided
    // Optimizers" batch still re-invokes the rule until the plan stops
    // changing, so a firing compile pays ~2 GET+LIST pairs per root
    // (more if other user rules keep the batch iterating) — bounded and
    // driver-side, but not literally once; the LIST is the same call the
    // file index itself makes to plan the scan
    val scopedCache =
      scala.collection.mutable.Map.empty[Seq[String], Option[Seq[String]]]

    plan transform {
      case f @ Filter(cond, child) =>
        // sidecar-registered layouts apply ONLY to a filter whose scanned
        // roots ALL carry that same layout (path-scoped — a relation that
        // merely reuses the column names, or a multi-path read mixing a
        // layout store with foreign data, is never touched), and the
        // layout's columns must reach this filter AS the store's own
        // attributes: each name is resolved on the registered leaf and
        // must pass through to child.output with its exprId intact, so a
        // derived column shadowing the name (drop+withColumn, a window
        // alias) makes the rule decline instead of covering over values
        // that are not the curve index. Conf-declared layouts keep their
        // documented session-wide name-matching semantics.
        val leafInfo =
          org.apache.spark.sql.graft.Bridge.fileScanLeafInfo(child)
        val leafPaths = leafInfo.flatMap(_._1)
        val scoped =
          scopedCache.getOrElseUpdate(leafPaths, GraftLayout.layoutFor(leafPaths))
        val childById = child.output.map(a => a.exprId -> a).toMap
        val resolveScoped = (n: String) =>
          leafInfo.flatMap(_._2).find(a => conf.resolver(a.name, n))
            .flatMap(a => childById.get(a.exprId))
        val resolveConf = (n: String) =>
          child.output.find(a => conf.resolver(a.name, n))
        // the third element: whether the layout describes ARBITRARY data
        // (conf route) — scoped sidecars are written by writeHilbert*,
        // whose index is computed FROM the keys, so h IS NULL only when
        // a key is NULL and the bounded original predicate drops the row
        // anyway; conf declarations carry no such guarantee and need the
        // IsNull escape (see coverPred)
        val layouts: Seq[(Seq[String], String => Option[Attribute], Boolean)] =
          scoped.map((_, resolveScoped, false)).toSeq ++
            confLayouts.map((_, resolveConf, true))
        layouts.iterator.flatMap { case (names, resolve, arbitraryData) =>
          val keys = names.init.flatMap(resolve(_))
          resolve(names.last) match {
            case Some(h) if keys.length == names.length - 1 &&
                h.dataType == LongType && keys.forall(integral) &&
                !cond.references.contains(h) =>
              val conjuncts = splitConjuncts(cond)
              val bounds = keys.flatMap(boxBounds(conjuncts, _)).toSeq
              if (bounds.length == keys.length)
                coverPred(h, keys.toSeq, bounds, arbitraryData)
                  .map(p => Filter(And(p, cond), child))
              else None
            case _ => None
          }
        }.nextOption().getOrElse(f)
    }
  }

  private def integral(a: Attribute): Boolean = a.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case _ => None
  }

  /** `InSet` carries raw JVM values, not Literals. */
  private def rawLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** Per-key IN-list expansions are capped: past this many surviving
    * values the key collapses to its hull `[min, max]` (one interval) —
    * a giant IN would otherwise cross-product into thousands of sub-box
    * covers for marginal extra pruning.
    */
  private val MaxInValues = 32

  /** Cross-product cap on sub-boxes (an IN on each of two keys multiplies
    * interval choices). Past it every key collapses to its hull — one box,
    * coarser but sound, and still the envelope file stats can prune with.
    */
  private val MaxBoxes = 64

  /** Closed, sorted, disjoint [lo, hi] interval list for `attr` from the
    * conjunct list, or None if the key is unbounded. Range comparisons
    * tighten a single interval (tightest bound wins; both operand
    * orientations and strict comparisons normalized); `IN`-lists — and
    * the `InSet` form the main optimizer batch rewrites long lists into —
    * intersect a membership set, yielding one degenerate interval per
    * surviving value (hull-collapsed past [[MaxInValues]]); a NULL-SAFE
    * equality against a non-null literal bounds exactly like `EqualTo`
    * (`k <=> 5` holds iff k = 5 — the null case is false either way,
    * while `k <=> NULL` matches no litLong and adds no bound). An IN set
    * emptied by the range bounds returns None — the predicate is
    * unsatisfiable and the rule declines rather than reasoning about it.
    */
  private def boxBounds(conjuncts: Seq[Expression],
      attr: Attribute): Option[Seq[(Long, Long)]] = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    var inSet: Option[Set[Long]] = None
    def raiseLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def lowerHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    def meet(vs: Set[Long]): Unit = inSet = Some(inSet.fold(vs)(_ intersect vs))
    conjuncts.foreach {
      case GreaterThanOrEqual(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(raiseLo)
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(lowerHi)
      case GreaterThan(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => raiseLo(v + 1))
      case LessThan(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => lowerHi(v - 1))
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(lowerHi)
      case LessThanOrEqual(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(raiseLo)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => lowerHi(v - 1))
      case LessThan(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach(v => raiseLo(v + 1))
      case EqualTo(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach { v => raiseLo(v); lowerHi(v) }
      case EqualTo(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach { v => raiseLo(v); lowerHi(v) }
      case EqualNullSafe(a: Attribute, l) if a.semanticEquals(attr) =>
        litLong(l).foreach { v => raiseLo(v); lowerHi(v) }
      case EqualNullSafe(l, a: Attribute) if a.semanticEquals(attr) =>
        litLong(l).foreach { v => raiseLo(v); lowerHi(v) }
      case In(a: Attribute, vs) if a.semanticEquals(attr) =>
        val longs = vs.map(litLong)
        if (longs.nonEmpty && longs.forall(_.isDefined)) meet(longs.flatten.toSet)
      case InSet(a: Attribute, hset) if a.semanticEquals(attr) =>
        val longs = hset.toSeq.map(rawLong)
        if (longs.nonEmpty && longs.forall(_.isDefined)) meet(longs.flatten.toSet)
      case _ =>
    }
    inSet match {
      case Some(vs) =>
        val kept = vs.filter(v => lo.forall(v >= _) && hi.forall(v <= _))
          .toSeq.sorted
        if (kept.isEmpty) None
        else if (kept.length > MaxInValues) Some(Seq((kept.head, kept.last)))
        else Some(mergeRanges(kept.map(v => (v, v))))
      case None => for (l <- lo; u <- hi) yield Seq((l, u))
    }
  }

  /** Sort + coalesce overlapping/adjacent ranges (inputs stay far below
    * Long.MaxValue — curve indexes top out at 2^32 — so `+ 1` is safe).
    * Package-visible so specs build their expected covers with the SAME
    * merge the rule applies, instead of a re-implementation that could
    * silently diverge.
    */
  private[graft] def mergeRanges(rs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    rs.sortBy(_._1).foldLeft(Vector.empty[(Long, Long)]) {
      case (acc, (lo, hi)) => acc.lastOption match {
        case Some((plo, phi)) if lo <= phi + 1 =>
          acc.init :+ ((plo, math.max(phi, hi)))
        case _ => acc :+ ((lo, hi))
      }
    }

  /** The injected predicate for the box(es): the OR'd h-range cover of
    * the per-key intervals CLAMPED to the curve domain (2 keys → 2-D
    * order-16 quadtree cover, 3 → 3-D order-10 octree; IN-lists make a
    * key contribute several intervals, whose cross product is covered
    * sub-box by sub-box and the ranges union-merged — falling back to the
    * per-key hulls past [[MaxBoxes]] sub-boxes or [[MaxRanges]] merged
    * ranges, coarser but still a superset), OR'd with escape disjuncts.
    * The escapes make the clamp sound on data that VIOLATES the layout
    * contract: the index is computed from masked bits, so a key outside
    * [0, side) has an index unrelated to its raw value — such rows must
    * survive the injected conjunct and fall through to the original
    * predicate. On contract-clean stores file statistics (which ignore
    * nulls) disprove the out-of-domain escapes, so they cost nothing.
    * Under `arbitraryData` (a CONF-declared layout, which asserts the
    * contract over data the engine never wrote) the escape also includes
    * `h IS NULL`: there a NULL index can coexist with in-domain non-null
    * keys, and without the escape the cover disjunction evaluates
    * Or(NULL, false) = NULL and silently prunes a row the original
    * predicate keeps. The SIDECAR route deliberately omits it — its
    * stores are written by writeHilbert*, whose index is computed FROM
    * the keys (NULL index ⟺ some NULL key, and every key-bounding
    * conjunct already rejects NULL keys, so pruning those rows is
    * sound), and an IsNull disjunct is the one escape file stats cannot
    * disprove on a store whose null keys all sort into one file — it
    * would make that file unprunable for every box query.
    *
    * None when the clamped box is empty / degenerate, or when the cover
    * spans more than a quarter of the curve domain — there the scan
    * would evaluate a fat OR chain per row for almost no pruning.
    */
  private def coverPred(h: Attribute, keys: Seq[Attribute],
      bounds: Seq[Seq[(Long, Long)]],
      arbitraryData: Boolean): Option[Expression] = {
    val side = if (bounds.length == 3) graft.functions.Hilbert3.Side
      else HilbertIndex.Side
    val max = side - 1
    val clamped = bounds.map(_.flatMap { case (lo0, hi0) =>
      val lo = math.max(lo0, 0L); val hi = math.min(hi0, max)
      if (lo <= hi) Some((lo, hi)) else None
    })
    if (clamped.exists(_.isEmpty)) return None
    def hullOf(ks: Seq[(Long, Long)]): Seq[(Long, Long)] =
      Seq((ks.head._1, ks.last._2)) // per-key lists are sorted
    def coverOf(kss: Seq[Seq[(Long, Long)]]): Seq[(Long, Long)] = {
      val boxes = kss.foldLeft(Seq(Seq.empty[(Long, Long)])) { (acc, ks) =>
        for (a <- acc; k <- ks) yield a :+ k
      }
      mergeRanges(boxes.flatMap {
        case Seq((xlo, xhi), (ylo, yhi)) =>
          HInterval.cover(xlo, xhi, ylo, yhi)
        case Seq((xlo, xhi), (ylo, yhi), (zlo, zhi)) =>
          HInterval.cover3(xlo, xhi, ylo, yhi, zlo, zhi)
        case _ => Seq.empty
      })
    }
    val boxed =
      if (clamped.map(_.length.toLong).product <= MaxBoxes) clamped
      else clamped.map(hullOf)
    var ranges = coverOf(boxed)
    // per-value sub-box covers can fragment past the range cap where the
    // single hull box stays under it — coarsen before declining
    if (ranges.size > MaxRanges && boxed.exists(_.length > 1))
      ranges = coverOf(clamped.map(hullOf))
    if (ranges.isEmpty || ranges.size > MaxRanges) return None
    val covVol = ranges.map { case (a, b) => b - a + 1 }.sum
    // derived from `side` so an order change cannot desynchronize it
    val domVol = bounds.indices.foldLeft(1L)((v, _) => v * side)
    if (covVol * 4 > domVol) return None
    val cover = ranges.map { case (a, b) =>
      And(GreaterThanOrEqual(h, Literal(a, LongType)),
        LessThanOrEqual(h, Literal(b, LongType))): Expression
    }.reduce(Or(_, _))
    val domainEscapes = keys.map { k =>
      // the high bound saturates at the key type's own max: a narrower
      // type can never exceed the domain there, and the saturated
      // comparison is equivalently never-true (no lossy literal cast)
      Or(LessThan(k, typedLit(0L, k.dataType)),
        GreaterThan(k, typedLit(max, k.dataType))): Expression
    }
    val escapes =
      (if (arbitraryData) domainEscapes :+ (IsNull(h): Expression)
       else domainEscapes).reduce(Or(_, _))
    Some(Or(cover, escapes))
  }

  private def typedLit(v: Long,
      dt: org.apache.spark.sql.types.DataType): Literal = dt match {
    case IntegerType => Literal(math.min(v, Int.MaxValue).toInt, IntegerType)
    case ShortType => Literal(math.min(v, Short.MaxValue).toShort, ShortType)
    case ByteType => Literal(math.min(v, Byte.MaxValue).toByte, ByteType)
    case _ => Literal(v, LongType)
  }

  /** Idempotently add the rule to a LIVE session; `GraftExtensions`
    * covers the construction-time route. Synchronized on the session's
    * ExperimentalMethods: extraOptimizations is a bare var, and two
    * concurrent readers racing the check-then-append could otherwise
    * double-install (or drop a third party's concurrent append).
    */
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = org.apache.spark.sql.graft.Bridge.experimental(spark)
    exp.synchronized {
      if (!org.apache.spark.sql.graft.Bridge.hasOptimizerRule(spark, HilbertBoxCover) &&
        !exp.extraOptimizations.contains(HilbertBoxCover))
        exp.extraOptimizations = exp.extraOptimizations :+ HilbertBoxCover
    }
  }
}
