package graft.sources.zarr

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import org.apache.hadoop.fs.Path
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{ShardIndexCache, StoreIO, Zarr3IO, ZarrIO}

/** DataSource V2 for zarr v2 stores: `spark.read.format("zarr").load(dir)`.
  *
  * Schema for a d-dimensional store: grid coordinates `g0..g{d-1}`, in-chunk
  * coordinates `p0..p{d-1}`, and `value` — all BIGINT. Two pushdowns make it
  * scale-shaped ([[ZarrIO]]'s docstring scenario: a 100 TB store on object
  * storage, a query wanting one region):
  *
  *  - **Filter pushdown** (`SupportsPushDownFilters`): comparisons on the
  *    `g*` columns become chunk-box bounds — pruned chunks are never listed
  *    as partitions, so their files are never opened. Consumed filters are
  *    reported back as fully handled (no residual row filter).
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): when `value`
  *    is not projected, the reader emits coordinate rows from shape math
  *    alone and SKIPS the payload read + decompress entirely — a
  *    `count(*)` over a region performs zero chunk I/O.
  *
  * Cited layout semantics: reference `relabeling.py` reads zarr arrays via
  * dask; this source re-expresses the same store as a pruned relational
  * scan.
  */
class ZarrTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "zarr"

  private def path(options: util.Map[String, String]): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "zarr source requires a path")
    p
  }

  private def dimsOf(p: String, options: util.Map[String, String]): Int =
    if (ZarrTableProvider.hasMeta(p))
      ZarrTableProvider.metaOf(p).dims
    else {
      // a write to a fresh store: dims come from the mandatory option
      val sh = options.get("shape")
      require(sh != null,
        s"no store at $p and no 'shape' option — nothing to infer from")
      sh.split(",").length
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrTableProvider.schemaFor(dimsOf(path(options), options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val p = path(properties)
    new ZarrTable(p, dimsOf(p, properties))
  }
}

object ZarrTableProvider {

  /** Format autodetection: a v3 store has `zarr.json`, a v2 store
    * `.zarray`. Either way the rest of the source works off the
    * v2-equivalent codec meta (the v3 metadata maps onto it losslessly for
    * the supported dtype/codec subset).
    */
  def isV3(dir: String): Boolean =
    StoreIO.exists(StoreIO.hadoopConf, new Path(dir, "zarr.json").toString)

  /** True when the path already holds a store (either format). */
  def hasMeta(dir: String): Boolean =
    isV3(dir) ||
      StoreIO.exists(StoreIO.hadoopConf, new Path(dir, ".zarray").toString)

  /** The scan-facing meta. For a SHARDED v3 store this is the INNER-chunk
    * granularity equivalent: the relational surface exposes the same rows
    * and the same (g*, p*) coordinates whether the store packs its chunks
    * into shard objects or not — sharding is a storage layout, not a
    * schema.
    */
  def metaOf(dir: String): ZarrIO.Meta =
    if (isV3(dir)) {
      val m3 = Zarr3IO.readMeta(dir)
      if (m3.sharding.isDefined) m3.innerV2 else m3.v2
    } else ZarrIO.readMeta(dir)

  /** Shard layout of a sharded v3 store; None for unsharded (either
    * format). Drives partition planning and the readers' ranged I/O.
    */
  def shardInfoOf(dir: String): Option[ShardInfo] =
    if (isV3(dir)) {
      val m3 = Zarr3IO.readMeta(dir)
      m3.sharding.map(sh =>
        ShardInfo(m3.innersPerShard, sh.indexAtEnd, sh.indexCrc))
    } else None

  def schemaFor(dims: Int): StructType = StructType(
    (0 until dims).map(a => StructField(s"g$a", LongType, nullable = false)) ++
      (0 until dims).map(a => StructField(s"p$a", LongType, nullable = false)) :+
      StructField("value", LongType, nullable = false))

  /** Payload reads performed by readers in this JVM — lets the column-
    * pruning spec assert that a coordinates-only scan opens no chunk file
    * (meaningful in local mode, where executors share the JVM).
    */
  val payloadReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Every grid location inside the pushed [lo, hi] ∩ allowed box — the
    * nominal-grid enumeration behind `assumeComplete` planning: pure
    * arithmetic from metadata, zero listing RTTs. Pruned axes enumerate
    * only their surviving values, so the cost is the SURVIVING box, not
    * the grid.
    */
  private[zarr] def boxLocs(grid: Array[Int], lo: Array[Long],
      hi: Array[Long], allowed: Array[Set[Long]]): Seq[Array[Int]] = {
    val axes: Array[Array[Int]] = Array.tabulate(grid.length) { a =>
      val l = math.max(0L, lo(a)).toInt
      val h = math.min(grid(a) - 1L, hi(a)).toInt
      (l to h).filter(v =>
        allowed(a) == null || allowed(a).contains(v.toLong)).toArray
    }
    axes.foldLeft(Seq(Array.empty[Int]))((acc, vals) =>
      acc.flatMap(prefix => vals.map(v => prefix :+ v)))
  }

  /** Inner-chunk bounds mapped to SHARD-grid bounds (floor division by
    * inners-per-shard): a shard survives iff it could hold a surviving
    * inner chunk. Conservative on `allowed` (membership of any covered
    * inner), exact on the box.
    */
  private[zarr] def shardBox(ips: Array[Int], lo: Array[Long],
      hi: Array[Long], allowed: Array[Set[Long]])
      : (Array[Long], Array[Long], Array[Set[Long]]) = (
    Array.tabulate(ips.length)(a => if (lo(a) < 0) 0L else lo(a) / ips(a)),
    Array.tabulate(ips.length)(a => if (hi(a) < 0) -1L else hi(a) / ips(a)),
    Array.tabulate(ips.length)(a =>
      if (allowed(a) == null) null else allowed(a).map(_ / ips(a)))
  )
}

/** `dir` is public so plan-walking code (e.g. the scope resolution behind
  * [[graft.plans.HilbertBoxCover]], via `Bridge.fileScanLeafInfo`) can
  * treat a zarr relation as a file-store leaf with a root path — a query
  * mixing a path-scoped parquet layout with a zarr scan must see the zarr
  * root as a FOREIGN store and decline, not overlook it.
  */
final class ZarrTable(val dir: String, dims: Int) extends Table
    with SupportsRead with SupportsWrite {
  // reads need the full store metadata; writes to a fresh dir must not
  // touch it (dims alone drives the schema)
  private lazy val meta = ZarrTableProvider.metaOf(dir)
  override def name(): String = s"zarr:$dir"
  override def schema(): StructType = ZarrTableProvider.schemaFor(dims)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(dir, meta, options.getBoolean("vectorized", true),
      options.getInt("maxChunksPerTrigger", 0),
      options.getBoolean("assumeComplete", false))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ZarrWriteBuilder(dir, info)
}

final class ZarrScanBuilder(dir: String, meta: ZarrIO.Meta,
    vectorized: Boolean,
    maxChunksPerTrigger: Int = 0,
    assumeComplete: Boolean = false) extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  /** Limit pushdown: a LIMIT n scan plans only enough chunks to cover n
    * rows (cells-per-chunk is metadata) — `df.limit(10)` on a 100 TB
    * store opens at most one chunk file. Partial: Spark still applies the
    * exact limit on top; the scan just stops planning partitions early.
    * On a SHARDED store presence lives in the per-shard indexes, so the
    * planner walks shards in listing order reading each index (one tiny
    * ranged read, cached) and plans only PRESENT inner chunks until their
    * exact cells cover the limit — cost bounded by the limit, not the
    * store.
    */
  private var limit: Int = -1
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed: Boolean = true

  private val dims = meta.dims
  private val grid: Array[Int] = meta.spec.gridShape
  // inclusive chunk-box bounds per grid axis, tightened by pushed filters
  private val lo = Array.fill(dims)(0L)
  private val hi = grid.map(_ - 1L)
  // non-contiguous membership per axis (IN lists); null = unconstrained
  private val allowed: Array[Set[Long]] = Array.fill(dims)(null)
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = ZarrTableProvider.schemaFor(dims)

  private def axisOf(att: String): Option[Int] = GAxis.unapply(att, dims)
  private def asLong(v: Any): Option[Long] = GAxis.long(v)

  /** Tighten bounds for one comparison; true when fully consumed.
    * Strict bounds use saturating +-1: at the Long extremes the predicate
    * is unsatisfiable and the box empties rather than wrapping around
    * (x + 1 overflowing to Long.MinValue would DROP the filter's effect
    * while still reporting it consumed — every row would come back).
    */
  private def consume(f: Filter): Boolean = f match {
    case EqualTo(att, v) => (axisOf(att), asLong(v)) match {
      case (Some(a), Some(x)) =>
        lo(a) = math.max(lo(a), x); hi(a) = math.min(hi(a), x); true
      case _ => false
    }
    case GreaterThan(att, v) => (axisOf(att), asLong(v)) match {
      case (Some(a), Some(x)) =>
        if (x == Long.MaxValue) { lo(a) = 1; hi(a) = 0 } // empty box
        else lo(a) = math.max(lo(a), x + 1)
        true
      case _ => false
    }
    case GreaterThanOrEqual(att, v) => (axisOf(att), asLong(v)) match {
      case (Some(a), Some(x)) => lo(a) = math.max(lo(a), x); true
      case _ => false
    }
    case LessThan(att, v) => (axisOf(att), asLong(v)) match {
      case (Some(a), Some(x)) =>
        if (x == Long.MinValue) { lo(a) = 1; hi(a) = 0 } // empty box
        else hi(a) = math.min(hi(a), x - 1)
        true
      case _ => false
    }
    case LessThanOrEqual(att, v) => (axisOf(att), asLong(v)) match {
      case (Some(a), Some(x)) => hi(a) = math.min(hi(a), x); true
      case _ => false
    }
    case In(att, values) => axisOf(att) match {
      case Some(a) =>
        val vs = values.flatMap(asLong)
        if (vs.length != values.length) false
        else {
          val set = vs.toSet
          allowed(a) = if (allowed(a) == null) set else allowed(a).intersect(set)
          true
        }
      case _ => false
    }
    case And(l, r) =>
      // consume both or neither (bounds only tighten, so a half-consumed
      // And would still be sound — but returning it as residual is simpler)
      val okL = consume(l); val okR = consume(r); okL && okR
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(consume)
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ------------------------------------------------- aggregate pushdown
  //
  // count/min/max over coordinates are pure CHUNK-LIST math: count(*) is
  // the sum of (edge-clipped) tile volumes of the surviving chunk box,
  // min/max of a grid coordinate come from the surviving locations, and
  // min/max of an in-chunk coordinate from the clipped tile shapes. A
  // `SELECT count(*)` over a 100 TB store — pruned or not — therefore
  // never opens a chunk file, never emits a row, and runs as one
  // metadata-only task. `value` aggregates need payload and are refused
  // (Spark falls back to the normal scan). Complete pushdown only: Spark
  // invokes it exactly when every filter was consumed by pushFilters, so
  // the chunk box IS the full predicate.
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}

  private var pushedAggSpecs: Seq[ZarrAgg] = null

  private def aggSpec(f: AggregateFunc): Option[ZarrAgg] = {
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: org.apache.spark.sql.connector.expressions.NamedReference
            if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
        case _ => None
      }
    def pAxis(n: String): Option[Int] = n match {
      case _ if n.length > 1 && n.head == 'p' && n.tail.forall(_.isDigit) &&
        n.tail.toInt < dims => Some(n.tail.toInt)
      case _ => None
    }
    f match {
      case _: CountStar => Some(ZarrAgg.CountAll)
      // count of any of this source's columns: all are non-nullable, so
      // count(col) == count(*); distinct counts are not chunk-list math
      case c: Count if !c.isDistinct =>
        colOf(c.column).filter(n =>
          GAxis.unapply(n, dims).isDefined || pAxis(n).isDefined ||
            n == "value").map(_ => ZarrAgg.CountAll)
      case m: Min => colOf(m.column).flatMap { n =>
        GAxis.unapply(n, dims).map(a => ZarrAgg.MinG(a): ZarrAgg)
          .orElse(pAxis(n).map(a => ZarrAgg.MinP(a): ZarrAgg))
      } // min(value) needs payload -> None -> no pushdown
      case m: Max => colOf(m.column).flatMap { n =>
        GAxis.unapply(n, dims).map(a => ZarrAgg.MaxG(a): ZarrAgg)
          .orElse(pAxis(n).map(a => ZarrAgg.MaxP(a): ZarrAgg))
      }
      case _ => None
    }
  }

  private var pushedGroupBy: Seq[Int] = null

  /** Grouping is pushable when every group key is a grid column (distinct):
    * chunks sharing the keyed coordinates aggregate in plan-time metadata
    * math, any SUBSET of the grid axes included — `groupBy(g0).count()`
    * over a 100 TB store is still zero-I/O. In-chunk coordinates vary
    * within a chunk, so grouping on them falls back to the row scan.
    */
  private def groupAxes(aggregation: Aggregation): Option[Seq[Int]] = {
    val names = aggregation.groupByExpressions().toSeq.map {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
          if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }
    if (names.exists(_.isEmpty)) None
    else {
      val axes = names.map(n => GAxis.unapply(n.get, dims))
      if (axes.exists(_.isEmpty)) None
      else {
        val as = axes.map(_.get)
        if (as.distinct.length == as.length) Some(as) else None
      }
    }
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    groupAxes(aggregation).isDefined &&
      aggregation.aggregateExpressions().forall(aggSpec(_).isDefined)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (!supportCompletePushDown(aggregation)) false
    else {
      pushedGroupBy = groupAxes(aggregation).get
      pushedAggSpecs =
        aggregation.aggregateExpressions().toSeq.map(aggSpec(_).get)
      true
    }

  override def build(): Scan =
    if (pushedAggSpecs != null)
      new ZarrAggScan(dir, meta, lo.clone(), hi.clone(), allowed.clone(),
        pushedGroupBy, pushedAggSpecs, assumeComplete)
    else
      new ZarrScan(dir, meta, lo.clone(), hi.clone(), allowed.clone(), required,
        vectorized, limit, maxChunksPerTrigger, assumeComplete)
}

/** The chunk-list aggregates the source can answer without payload I/O. */
private[zarr] sealed trait ZarrAgg extends Serializable
private[zarr] object ZarrAgg {
  case object CountAll extends ZarrAgg
  final case class MinG(a: Int) extends ZarrAgg
  final case class MaxG(a: Int) extends ZarrAgg
  final case class MinP(a: Int) extends ZarrAgg
  final case class MaxP(a: Int) extends ZarrAgg
}

/** Per-group running state of the pushed coordinate aggregates: cell
  * count, per-axis min/max surviving grid coordinate, and per-axis max
  * in-chunk coordinate (min is always 0 for a non-empty group). One such
  * partial per group per shard is what the distributed index scan moves —
  * bytes per group, never per chunk.
  */
private[zarr] final case class AggPartial(cells: Long, minLoc: Array[Long],
    maxLoc: Array[Long], maxP: Array[Long]) {
  def merge(o: AggPartial): AggPartial = AggPartial(
    cells + o.cells,
    Array.tabulate(minLoc.length)(a => math.min(minLoc(a), o.minLoc(a))),
    Array.tabulate(maxLoc.length)(a => math.max(maxLoc(a), o.maxLoc(a))),
    Array.tabulate(maxP.length)(a => math.max(maxP(a), o.maxP(a))))
}

/** Completely-pushed aggregate scan. On an UNSHARDED store the result rows
  * are computed at PLAN time from the (pruned) chunk listing — the same
  * listing the row scan performs to plan partitions — and the one task
  * just emits them. On a SHARDED store inner-chunk presence lives in the
  * per-shard binary indexes, so the scan runs one distributed metadata
  * job over the shard listing: each task ranged-reads its shards' indexes
  * (16 B per inner slot, [[ShardIndexCache]]d), folds the present
  * surviving inner chunks into per-group [[AggPartial]]s, and only the
  * combined group rows reach the driver — a coordinate-only `count()`
  * over a 100 TB sharded store reads indexes, never chunk payloads, and
  * never funnels per-chunk metadata through the driver. An empty
  * surviving box yields count 0 and null extrema, matching the semantics
  * of aggregating zero rows.
  */
final class ZarrAggScan(dir: String, meta: ZarrIO.Meta, lo: Array[Long],
    hi: Array[Long], allowed: Array[Set[Long]], groupBy: Seq[Int],
    aggs: Seq[ZarrAgg], assumeComplete: Boolean = false)
    extends Scan with Batch with Serializable {

  override def readSchema(): StructType = StructType(
    groupBy.map(a => StructField(s"g$a", LongType, nullable = false)) ++
      aggs.zipWithIndex.map {
        case (ZarrAgg.CountAll, i) =>
          StructField(s"agg$i", LongType, nullable = false)
        case (_, i) => StructField(s"agg$i", LongType, nullable = true)
      })

  override def toBatch: Batch = this

  override def description(): String =
    s"ZarrAggScan groupBy=[${groupBy.map(a => s"g$a").mkString(", ")}] " +
      s"pushed=[${aggs.mkString(", ")}] bounds=" +
      lo.indices.map(a => s"g$a in [${lo(a)}, ${hi(a)}]").mkString(", ")

  private def survives(loc: Array[Int]): Boolean =
    loc.indices.forall(a =>
      loc(a) >= lo(a) && loc(a) <= hi(a) &&
        (allowed(a) == null || allowed(a).contains(loc(a).toLong)))

  /** Unsharded: every listed chunk exists; the listing IS the survivors.
    * Under `assumeComplete` the caller asserts the nominal grid is fully
    * present, so the survivors come from pure box arithmetic — a
    * `count()` over a 100 TB dense store is zero-I/O INCLUDING the
    * listing.
    */
  private def survivors: Seq[Array[Int]] =
    if (assumeComplete)
      ZarrTableProvider.boxLocs(meta.spec.gridShape, lo, hi, allowed)
    else {
      val locs =
        if (ZarrTableProvider.isV3(dir)) Zarr3IO.listChunkLocs(dir, Zarr3IO.readMeta(dir))
        else ZarrIO.listChunkLocs(dir, meta)
      locs.filter(survives)
    }

  /** Driver-side shard threshold: at or below it the indexes are read on
    * the driver (each read is one tiny ranged GET, cached) instead of
    * paying a job launch — the right trade for interactive queries over
    * small stores; above it the reads distribute.
    */
  private val DriverShards = 16

  /** Sharded: per-group partials from the present surviving inner chunks
    * of the given shards — runs on executors (distributed job) or on the
    * driver (small stores), same code either way.
    */
  private def partialsOf(shardLocs: Iterator[Seq[Int]],
      conf: org.apache.hadoop.conf.Configuration, m3: Zarr3IO.Meta3,
      ips: Array[Int], innerGrid: Array[Int],
      gb: Array[Int]): Iterator[(Seq[Long], AggPartial)] = {
    val sh = m3.sharding.get
    val cps = ips.product
    val dims = m3.dims
    val acc = scala.collection.mutable.HashMap.empty[Seq[Long], AggPartial]
    shardLocs.foreach { slSeq =>
      val sl = slSeq.toArray
      val spath = new Path(dir, Zarr3IO.chunkKey(sl, m3.separator)).toString
      val (offs, lens) = ShardIndexCache.indexOf(conf, spath, cps,
        sh.indexAtEnd, sh.indexCrc)
      Zarr3IO.innerLocsOf(sl, ips, innerGrid).foreach { il =>
        val pos = Array.tabulate(dims)(a => il(a) - sl(a) * ips(a))
        val k = graft.core.Regions.linearIndex(pos, ips).toInt
        if (!(offs(k) == Zarr3IO.ABSENT && lens(k) == Zarr3IO.ABSENT) &&
            survives(il)) {
          val tile = Array.tabulate(dims)(a =>
            math.min(meta.chunks(a).toLong,
              meta.shape(a) - il(a).toLong * meta.chunks(a)))
          val p = AggPartial(tile.product, il.map(_.toLong),
            il.map(_.toLong), tile.map(_ - 1))
          val key: Seq[Long] = gb.map(il(_).toLong).toSeq
          acc.updateWith(key) {
            case Some(prev) => Some(prev.merge(p))
            case None => Some(p)
          }
        }
      }
    }
    acc.iterator
  }

  /** Sharded group partials: distributed over the shard listing, combined
    * by group key, only group rows collected.
    */
  private def shardedPartials(m3: Zarr3IO.Meta3): Map[Seq[Long], AggPartial] = {
    val sh = m3.sharding.get
    val ips = m3.innersPerShard
    val innerGrid = graft.tiles.GridSpec(m3.shape, sh.inner).gridShape
    val shards = (
      if (assumeComplete) {
        val (sl, sh2, sa) = ZarrTableProvider.shardBox(ips, lo, hi, allowed)
        ZarrTableProvider.boxLocs(m3.spec.gridShape, sl, sh2, sa)
      } else Zarr3IO.listChunkLocs(dir, m3)).map(_.toSeq)
    val gb = groupBy.toArray
    if (shards.size <= DriverShards)
      partialsOf(shards.iterator, StoreIO.hadoopConf, m3, ips, innerGrid, gb)
        .toMap
    else {
      val spark = org.apache.spark.sql.SparkSession.active
      val sconf = StoreIO.ser(StoreIO.hadoopConf)
      spark.sparkContext
        .parallelize(shards, math.max(1, math.min(shards.size,
          spark.sparkContext.defaultParallelism)))
        .mapPartitions(it =>
          partialsOf(it, sconf.value, m3, ips, innerGrid, gb))
        .reduceByKey(_.merge(_))
        .collect().toMap
    }
  }

  /** The result rows; computed once — planInputPartitions can be invoked
    * several times while planning, and the sharded path runs a job.
    */
  private lazy val resultRows: Seq[Array[Any]] = {
    def fromPartial(p: Option[AggPartial]): Seq[Any] = aggs.map {
      case ZarrAgg.CountAll => p.map(_.cells).getOrElse(0L): Any
      case ZarrAgg.MinG(a) => p.map(_.minLoc(a): Any).orNull
      case ZarrAgg.MaxG(a) => p.map(_.maxLoc(a): Any).orNull
      case ZarrAgg.MinP(_) => p.map(_ => 0L: Any).orNull
      case ZarrAgg.MaxP(a) => p.map(_.maxP(a): Any).orNull
    }
    val m3 = if (ZarrTableProvider.isV3(dir)) Some(Zarr3IO.readMeta(dir)) else None
    m3.filter(_.sharding.isDefined) match {
      case Some(meta3) =>
        val partials = shardedPartials(meta3)
        if (groupBy.isEmpty)
          Seq(fromPartial(partials.values.reduceOption(_.merge(_))).toArray)
        else partials.toSeq.map { case (key, p) =>
          (key.map(x => x: Any) ++ fromPartial(Some(p))).toArray
        }
      case None =>
        def tileShape(loc: Array[Int], a: Int): Long =
          math.min(meta.chunks(a).toLong,
            meta.shape(a) - loc(a).toLong * meta.chunks(a))
        def aggValues(locs: Seq[Array[Int]]): Seq[Any] = aggs.map {
          case ZarrAgg.CountAll =>
            locs.map(loc => loc.indices.map(tileShape(loc, _)).product).sum: Any
          case ZarrAgg.MinG(a) =>
            if (locs.isEmpty) null else (locs.map(_(a)).min.toLong: Any)
          case ZarrAgg.MaxG(a) =>
            if (locs.isEmpty) null else (locs.map(_(a)).max.toLong: Any)
          case ZarrAgg.MinP(_) => if (locs.isEmpty) null else (0L: Any)
          case ZarrAgg.MaxP(a) =>
            if (locs.isEmpty) null
            else (locs.map(loc => tileShape(loc, a) - 1).max: Any)
        }
        if (groupBy.isEmpty) Seq(aggValues(survivors).toArray)
        else survivors.groupBy(loc => groupBy.map(loc(_)))
          .toSeq.map { case (key, locs) =>
            (key.map(_.toLong: Any) ++ aggValues(locs)).toArray
          }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(ZarrAggResultPartition(resultRows))

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrAggReaderFactory()
}

final case class ZarrAggResultPartition(rows: Seq[Array[Any]]) extends InputPartition

final case class ZarrAggReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ZarrAggResultPartition].rows
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: Array[Any] = null
      override def next(): Boolean = it.hasNext && { cur = it.next(); true }
      override def get(): InternalRow = new GenericInternalRow(cur.clone())
      override def close(): Unit = ()
    }
  }
}

final class ZarrScan(dir: String, meta: ZarrIO.Meta, lo: Array[Long],
    hi: Array[Long], allowed: Array[Set[Long]], required: StructType,
    vectorized: Boolean, limit: Int = -1, maxChunksPerTrigger: Int = 0,
    assumeComplete: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {

  /** Streaming read of a growing store ([[ZarrMicroBatchStream]]). Pushed
    * grid bounds carry over to discovery. Unsharded stores stream at chunk
    * granularity; sharded stores at SHARD granularity under the
    * write-once-shard contract documented on the stream class.
    */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ZarrMicroBatchStream(dir, meta, lo, hi, allowed, required,
      checkpointLocation, maxChunksPerTrigger,
      ZarrTableProvider.shardInfoOf(dir))

  /** Storage-partitioned read: the store is clustered by grid coordinates
    * (each chunk file holds exactly one (g0..gd-1) key — the write path's
    * clustered distribution guarantees it), so the scan reports
    * KeyGroupedPartitioning over the g columns whenever they all survive
    * column pruning. With `spark.sql.sources.v2.bucketing.enabled`, a
    * groupBy on the grid key (the per-tile aggregate every pipeline stage
    * starts with) and storage-partitioned joins between two stores run
    * WITHOUT an exchange — at 100 TB that deletes the biggest shuffle in
    * the tile workload.
    */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val gCols = (0 until meta.dims).map(a => s"g$a")
    if (gCols.forall(required.fieldNames.contains))
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        gCols.map(c => org.apache.spark.sql.connector.expressions.Expressions.identity(c):
          org.apache.spark.sql.connector.expressions.Expression).toArray,
        planInputPartitions().length)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
  }

  /** Dynamic pruning: at execution time Spark can derive IN/= filters on
    * the grid columns from the other side of a join (the DSv2 analogue of
    * dynamic partition pruning) and hand them here — chunks outside the
    * runtime set are dropped before any partition is planned.
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only the grid columns that SURVIVED column pruning: Spark resolves
    // these against the pruned output and would fail on a projected-out one
    (0 until meta.dims).map(a => s"g$a")
      .filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(filters: Array[Filter]): Unit = {
    filters.foreach {
      case EqualTo(att, v) => GAxis.unapply(att, meta.dims).foreach { a =>
        GAxis.long(v).foreach { x =>
          lo(a) = math.max(lo(a), x); hi(a) = math.min(hi(a), x)
        }
      }
      case In(att, values) => GAxis.unapply(att, meta.dims).foreach { a =>
        val vs = values.flatMap(GAxis.long)
        if (vs.length == values.length) {
          val set = vs.toSet
          allowed(a) = if (allowed(a) == null) set else allowed(a).intersect(set)
        }
      }
      case _ => () // unsupported runtime filters are simply not pruned on
    }
    planned = null // bounds changed: the cached partition plan is stale
  }

  override def readSchema(): StructType = required

  /** Post-pruning size estimate: cells in the surviving chunk box × row
    * width. Exact on row count for full chunks (edge chunks overestimate
    * slightly, which is the safe direction). Lets Catalyst auto-broadcast
    * a heavily pruned scan in joins — pruning changes not just I/O but the
    * JOIN STRATEGY downstream.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val cells: Long = lo.indices.map { a =>
      val inBox =
        if (allowed(a) == null) math.max(0L, hi(a) - lo(a) + 1)
        else allowed(a).count(v => v >= lo(a) && v <= hi(a)).toLong
      inBox * meta.chunks(a)
    }.product
    private val rowBytes = 8L * required.size
    override def sizeInBytes = java.util.OptionalLong.of(
      math.max(1L, cells * rowBytes))
    override def numRows = java.util.OptionalLong.of(cells)
  }

  override def description(): String =
    s"ZarrScan ${meta.dims}d bounds=" +
      lo.indices.map { a =>
        val setPart =
          if (allowed(a) == null) ""
          else s" and in {${allowed(a).toSeq.sorted.mkString(",")}}"
        s"g$a in [${lo(a)}, ${hi(a)}]$setPart"
      }.mkString(", ") +
      s" columns=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  /** The partition plan is cached: Spark may call [[outputPartitioning]]
    * and [[planInputPartitions]] several times while planning, and each
    * uncached call re-lists the whole store (object-store listing RTTs).
    * Runtime filters invalidate it — [[filter]] resets to null.
    */
  @volatile private var planned: Array[InputPartition] = null

  override def planInputPartitions(): Array[InputPartition] = {
    val cached = planned
    if (cached != null) return cached
    val fresh = doPlanPartitions()
    planned = fresh
    fresh
  }

  private def doPlanPartitions(): Array[InputPartition] = {
    def survives(loc: Array[Int]): Boolean =
      loc.indices.forall(a =>
        loc(a) >= lo(a) && loc(a) <= hi(a) &&
          (allowed(a) == null || allowed(a).contains(loc(a).toLong)))
    def cellsOf(loc: Array[Int]): Long =
      loc.indices.map(a => math.min(meta.chunks(a).toLong,
        meta.shape(a) - loc(a).toLong * meta.chunks(a))).product
    val m3 = if (ZarrTableProvider.isV3(dir)) Some(Zarr3IO.readMeta(dir)) else None
    m3.flatMap(m => m.sharding.map((m, _))) match {
      case Some((meta3, sh)) =>
        val ips = meta3.innersPerShard
        val innerGrid = graft.tiles.GridSpec(meta3.shape, sh.inner).gridShape
        // assumeComplete: the caller asserts every shard object of the
        // nominal grid exists, so the shard list is box arithmetic (inner
        // presence STILL comes from the shard indexes, executor-side)
        def shardLocs: Seq[Array[Int]] =
          if (assumeComplete) {
            val (sl, sh2, sa) = ZarrTableProvider.shardBox(ips, lo, hi, allowed)
            ZarrTableProvider.boxLocs(meta3.spec.gridShape, sl, sh2, sa)
          } else Zarr3IO.listChunkLocs(dir, meta3)
        if (limit < 0)
          // the listing yields SHARD objects; partitions are the inner
          // chunks they cover (readers skip index-absent inners —
          // present-ness lives executor-side, never on the driver)
          shardLocs
            .flatMap(sl => Zarr3IO.innerLocsOf(sl, ips, innerGrid))
            .filter(survives)
            .map(loc => ZarrInputPartition(loc): InputPartition).toArray
        else {
          // partial limit with index-aware presence: walk shards in
          // listing order, ranged-read each index (driver-side, cached),
          // and plan only PRESENT surviving inners until their exact cell
          // count covers the limit — a planned-prefix over the nominal
          // grid could under-deliver when inners are absent
          val conf = StoreIO.hadoopConf
          val cps = ips.product
          val out = Seq.newBuilder[InputPartition]
          var covered = 0L
          val shardIt = shardLocs.iterator
          while (covered < limit && shardIt.hasNext) {
            val sl = shardIt.next()
            val spath = new Path(dir, Zarr3IO.chunkKey(sl, meta3.separator)).toString
            val (offs, lens) = ShardIndexCache.indexOf(conf, spath, cps,
              sh.indexAtEnd, sh.indexCrc)
            Zarr3IO.innerLocsOf(sl, ips, innerGrid).foreach { il =>
              if (covered < limit && survives(il)) {
                val pos = Array.tabulate(il.length)(a => il(a) - sl(a) * ips(a))
                val k = graft.core.Regions.linearIndex(pos, ips).toInt
                if (!(offs(k) == Zarr3IO.ABSENT && lens(k) == Zarr3IO.ABSENT)) {
                  covered += cellsOf(il)
                  out += ZarrInputPartition(il)
                }
              }
            }
          }
          out.result().toArray
        }
      case None =>
        val locs =
          if (assumeComplete)
            ZarrTableProvider.boxLocs(meta.spec.gridShape, lo, hi, allowed)
          else m3 match {
            case Some(meta3) => Zarr3IO.listChunkLocs(dir, meta3)
            case None => ZarrIO.listChunkLocs(dir, meta)
          }
        val surviving = locs.filter(survives)
        // partial limit: stop planning chunks once their combined cell
        // count covers the limit (Spark applies the exact limit on top;
        // unsharded listings only contain chunks that exist)
        val chosen =
          if (limit < 0) surviving
          else {
            var covered = 0L
            surviving.takeWhile { loc =>
              val take = covered < limit
              if (take) covered += cellsOf(loc)
              take
            }
          }
        chosen.map(loc => ZarrInputPartition(loc): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrReaderFactory(dir, meta, required.fieldNames,
      ZarrTableProvider.isV3(dir), StoreIO.ser(StoreIO.hadoopConf), vectorized,
      ZarrTableProvider.shardInfoOf(dir))
}

/** Shared axis/literal matching for static and runtime filter pushdown. */
private[zarr] object GAxis {
  private val GCol = "g([0-9]+)".r
  def unapply(att: String, dims: Int): Option[Int] = att match {
    case GCol(a) if a.toInt < dims => Some(a.toInt)
    case _ => None
  }
  def long(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }
}

/** One chunk, one partition — and the chunk's grid location IS the
  * partition key ([[HasPartitionKey]]), which is what lets Spark treat the
  * store as storage-partitioned: grouped by (g0..gd-1) on disk.
  */
final case class ZarrInputPartition(loc: Array[Int]) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(loc.map(_.toLong: Any))
}

/** Shard layout facts a reader needs: inner chunks per shard per axis and
  * where/how the shard index is stored.
  */
final case class ShardInfo(ips: Array[Int], atEnd: Boolean, crc: Boolean)

final case class ZarrReaderFactory(dir: String, meta: ZarrIO.Meta,
    columns: Array[String], isV3: Boolean,
    sconf: SerializableConfiguration,
    vectorized: Boolean = true,
    shard: Option[ShardInfo] = None) extends PartitionReaderFactory {

  /** Shared per-partition setup for both read paths: chunk location, the
    * (edge-clipped) tile shape, and the decoded payload — or null when
    * `value` was pruned away, in which case no chunk file is opened at all.
    *
    * Sharded store: the partition is an INNER chunk; its shard's index
    * (per-JVM cached) says whether it exists and where its bytes live, and
    * the payload comes from one ranged read — an absent inner chunk
    * returns a zero-extent tile, so both readers emit no rows for it
    * (matching the unsharded layout, where a missing chunk file is simply
    * never planned).
    */
  private def openChunk(partition: InputPartition): (Array[Int], Array[Int], Array[Long]) = {
    val loc = partition.asInstanceOf[ZarrInputPartition].loc
    val dims = meta.dims
    val tileShape = Array.tabulate(dims) { a =>
      math.min(meta.chunks(a).toLong,
        meta.shape(a) - loc(a).toLong * meta.chunks(a)).toInt
    }
    shard match {
      case Some(si) =>
        val sl = Array.tabulate(dims)(a => loc(a) / si.ips(a))
        val pos = Array.tabulate(dims)(a => loc(a) - sl(a) * si.ips(a))
        val k = graft.core.Regions.linearIndex(pos, si.ips).toInt
        val spath = new Path(dir, Zarr3IO.chunkKey(sl, meta.separator)).toString
        val (offs, lens) = ShardIndexCache.indexOf(sconf.value, spath,
          si.ips.product, si.atEnd, si.crc)
        if (offs(k) == Zarr3IO.ABSENT && lens(k) == Zarr3IO.ABSENT)
          (loc, Array.fill(dims)(0), null) // absent inner chunk: no rows
        else if (!columns.contains("value")) (loc, tileShape, null)
        else {
          ZarrTableProvider.payloadReads.incrementAndGet()
          require(offs(k) >= 0 && lens(k) >= 0 && lens(k) <= Int.MaxValue,
            s"$spath: inner chunk ${loc.mkString(",")} has corrupt index " +
              s"entry (offset ${offs(k)}, nbytes ${lens(k)})")
          val in = StoreIO.open(sconf.value, spath)
          val raw =
            try StoreIO.readRange(in, offs(k), lens(k).toInt)
            finally in.close()
          try (loc, tileShape, ZarrIO.decodeChunk(raw, meta, loc, tileShape))
          catch { case e: Exception =>
            throw new java.io.IOException(
              s"zarr inner chunk ${loc.mkString(",")} (shard " +
                s"'${Zarr3IO.chunkKey(sl, meta.separator)}', bytes " +
                s"[${offs(k)}, ${offs(k) + lens(k)})) in $dir failed to " +
                s"decode: ${e.getMessage}", e)
          }
        }
      case None =>
        val data: Array[Long] =
          if (!columns.contains("value")) null
          else {
            ZarrTableProvider.payloadReads.incrementAndGet()
            val key =
              if (isV3) Zarr3IO.chunkKey(loc, meta.separator)
              else loc.mkString(meta.separator)
            try ZarrIO.decodeChunk(
              StoreIO.readAllBytes(sconf.value, new Path(dir, key).toString),
              meta, loc, tileShape)
            catch {
              case e: java.io.FileNotFoundException =>
                // only an enumerated (assumeComplete) plan can reach a
                // missing chunk — fail loudly instead of silently dropping
                // the region's rows
                throw new java.io.IOException(
                  s"zarr chunk '$key' (grid ${loc.mkString(",")}) in $dir " +
                    "is absent but was planned: the store was declared " +
                    "complete (assumeComplete=true) or mutated concurrently",
                  e)
              case e: Exception =>
                // surface the CHUNK, not a codec stack frame: at 100 TB a
                // single corrupt object must be identifiable from the task
                // failure alone
                throw new java.io.IOException(
                  s"zarr chunk '$key' (grid ${loc.mkString(",")}) in $dir " +
                    s"failed to decode: ${e.getMessage}", e)
            }
          }
        (loc, tileShape, data)
    }
  }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    vectorized

  /** Columnar read path: fills reused [[OnHeapColumnVector]]s in 4K-row
    * batches instead of allocating a [[GenericInternalRow]] (+ boxed Longs)
    * per cell. Grid coordinates are a constant fill, the payload is a
    * single `putLongs` array copy (chunk cells are already in row-major
    * order), and in-chunk coordinates come from a stride/modulus fill —
    * the scan-bound 100 TB workload reads straight into vectors and hands
    * Spark a [[ColumnarBatch]], so the per-row iterator overhead that
    * dominated the row path disappears.
    */
  override def createColumnarReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val (loc, tileShape, data) = openChunk(partition)
    val dims = meta.dims
    val total = tileShape.product
    val batchSize = math.min(4096, math.max(total, 1))
    val vectors = columns.map(_ => new OnHeapColumnVector(batchSize, LongType))
    val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
    // per-axis strides: p_a(flat) = (flat / stride(a)) % tileShape(a)
    val strides = new Array[Long](dims)
    if (dims > 0) {
      strides(dims - 1) = 1L
      var a = dims - 2
      while (a >= 0) { strides(a) = strides(a + 1) * tileShape(a + 1); a -= 1 }
    }
    // per-column batch fillers resolved once: (vector, startFlat, n)
    val fill: Array[(OnHeapColumnVector, Int, Int) => Unit] = columns.map {
      case c if c.startsWith("g") =>
        val const = loc(c.drop(1).toInt).toLong
        (v: OnHeapColumnVector, _: Int, n: Int) => v.putLongs(0, n, const)
      case c if c.startsWith("p") =>
        val a = c.drop(1).toInt
        val stride = strides(a); val size = tileShape(a)
        (v: OnHeapColumnVector, start: Int, n: Int) => {
          var i = 0
          while (i < n) { v.putLong(i, ((start + i) / stride) % size); i += 1 }
        }
      case "value" =>
        (v: OnHeapColumnVector, start: Int, n: Int) =>
          v.putLongs(0, n, data, start)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

    new PartitionReader[ColumnarBatch] {
      private var start = 0

      override def next(): Boolean = {
        if (start >= total) false
        else {
          val n = math.min(batchSize, total - start)
          var c = 0
          while (c < vectors.length) {
            vectors(c).reset()
            fill(c)(vectors(c), start, n)
            c += 1
          }
          batch.setNumRows(n)
          start += n
          true
        }
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (loc, tileShape, data) = openChunk(partition)
    val dims = meta.dims
    val total = tileShape.product
    // per-column emitters resolved once, not per row
    val emit: Array[(Array[Int], Int) => Long] = columns.map {
      case c if c.startsWith("g") =>
        val a = c.drop(1).toInt; (_: Array[Int], _: Int) => loc(a).toLong
      case c if c.startsWith("p") =>
        val a = c.drop(1).toInt; (p: Array[Int], _: Int) => p(a).toLong
      case "value" => (_: Array[Int], flat: Int) => data(flat)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

    new PartitionReader[InternalRow] {
      private var flat = -1
      private val p = new Array[Int](dims)

      override def next(): Boolean = {
        flat += 1
        if (flat >= total) false
        else {
          var rem = flat
          var a = dims - 1
          while (a >= 0) { p(a) = rem % tileShape(a); rem /= tileShape(a); a -= 1 }
          true
        }
      }

      override def get(): InternalRow =
        new GenericInternalRow(
          emit.map(f => f(p, flat): Any))

      override def close(): Unit = ()
    }
  }
}

// ---------------------------------------------------------------- write path

/** `df.write.format("zarr").option("shape", "72,48").option("chunks",
  * "12,12").option("dtype", "<u2").option("compressor", "zlib")
  * .mode("overwrite").save(dir)` — rows are (g*, p*, value); cells not
  * present take the fill value (0).
  *
  * Scale + durability shape:
  *  - `RequiresDistributionAndOrdering` clusters rows on the grid
  *    coordinates AND sorts within each task, so every chunk file is
  *    produced whole by exactly one task and the writer streams: it holds
  *    ONE chunk buffer at a time, flushing when the grid key advances —
  *    memory is O(chunk), not O(chunks-per-task).
  *  - Writers stage into `dir/.staging-<uuid>/`; the previous store is
  *    untouched until driver-side commit, which swaps the staged files in
  *    (clearing the old store first under overwrite) and writes `.zarray`
  *    LAST — a failed or aborted write leaves the old store fully intact,
  *    and readers never observe a store without metadata.
  */
final class ZarrWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val o = info.options
    val storeExists = ZarrTableProvider.hasMeta(dir)
    // layout options are mandatory for a fresh store; a write into an
    // EXISTING store may omit them and inherit the store's own metadata.
    // lazy: forced only when inheritance or append validation actually
    // needs it — an OVERWRITE with full layout options never reads the
    // store's metadata (extra RTTs on an object store), and in particular
    // can replace a SHARDED store, which is exactly what the sharded
    // error message below advertises.
    lazy val existing =
      if (storeExists) {
        // the DSv2 writer emits one object per chunk; layout inheritance
        // or append into a SHARDED store would corrupt it (chunk keys are
        // shard keys there). Rewrite sharded stores via
        // Zarr3IO.writeSharded, or overwrite with explicit layout options.
        require(ZarrTableProvider.shardInfoOf(dir).isEmpty,
          s"zarr write to $dir: the existing store is sharded " +
            "(sharding_indexed); appending or inheriting its layout is " +
            "unsupported — use mode(\"overwrite\") with explicit " +
            "shape/chunks/dtype/compressor (and optionally 'shards') " +
            "options to replace it")
        Some(ZarrTableProvider.metaOf(dir))
      } else None
    def layout(name: String, fromMeta: ZarrIO.Meta => String): String =
      Option(o.get(name)).orElse(existing.map(fromMeta)).getOrElse(
        throw new IllegalArgumentException(
          s"zarr write to $dir needs the '$name' option " +
            "(no existing store metadata to inherit it from)"))
    val shape = layout("shape", _.shape.mkString(","))
      .split(",").map(_.trim.toLong)
    val chunks = layout("chunks", _.chunks.mkString(","))
      .split(",").map(_.trim.toInt)
    // format selection: "2" (default, .zarray + dot keys) or "3"
    // (zarr.json + c/ keys + bytes[+gzip] codec chain). An existing store
    // pins its own format — mixing layouts in one dir is always an error.
    // Resolved from isV3 alone (one existence probe), NOT from `existing`,
    // so it never forces the metadata read.
    val v3 = Option(o.get("zarrFormat")).map(_.trim)
      .orElse(if (storeExists)
        Some(if (ZarrTableProvider.isV3(dir)) "3" else "2") else None)
      .getOrElse("2") match {
        case "3" => true
        case "2" => false
        case other => throw new IllegalArgumentException(
          s"zarrFormat must be '2' or '3', got '$other'")
      }
    if (storeExists && v3 != ZarrTableProvider.isV3(dir))
      throw new IllegalArgumentException(
        s"zarr write to $dir requests format ${if (v3) 3 else 2} but the " +
          s"existing store is format ${if (ZarrTableProvider.isV3(dir)) 3 else 2}")
    // 'shards' = shard shape (sharding_indexed): writers still stage one
    // object per INNER chunk; the commit packs them into shard objects
    val shardsOpt = Option(o.get("shards")).map(_.split(",").map(_.trim.toInt))
    require(shardsOpt.isEmpty || v3,
      "the 'shards' option (sharding_indexed layout) needs zarrFormat=3")
    require(shardsOpt.isEmpty || doTruncate || !storeExists,
      s"sharded zarr write to $dir needs mode(\"overwrite\"): appending " +
        "would rewrite committed shard objects in place")
    var v3Meta: Option[Zarr3IO.Meta3] = None
    val meta: ZarrIO.Meta = if (v3) {
      val dataType = Option(o.get("dtype"))
        .orElse(existing.map(m => Zarr3IO.v3NameOf(m.dtype)))
        .getOrElse("int64")
      require(Zarr3IO.isV3Name(dataType),
        s"zarr v3 write needs a v3 data_type (uint8/uint16/int32/int64), " +
          s"got '$dataType'")
      val gz = Option(o.get("compressor"))
        .orElse(existing.map(_.compressor)).getOrElse("gzip") match {
          case "gzip" => true
          case "" | "none" => false
          case other => throw new IllegalArgumentException(
            s"zarr v3 supports compressor 'gzip' or '' (none), got '$other'")
        }
      val m3 = shardsOpt match {
        case Some(shard) =>
          require(shard.length == chunks.length && shard.indices.forall(a =>
            shard(a) > 0 && shard(a) % chunks(a) == 0),
            s"shard shape ${shard.mkString(",")} must be a positive " +
              s"multiple of the chunk shape ${chunks.mkString(",")} on " +
              "every axis")
          Zarr3IO.Meta3(shape, shard, dataType, gz, 0L, "/",
            Some(Zarr3IO.Shard3(chunks.clone(), indexAtEnd = true,
              indexCrc = true)))
        case None => Zarr3IO.Meta3(shape, chunks, dataType, gz, 0L, "/")
      }
      v3Meta = Some(m3)
      if (m3.sharding.isDefined) m3.innerV2 else m3.v2
    } else ZarrIO.Meta(shape, chunks,
      Option(o.get("dtype")).orElse(existing.map(_.dtype)).getOrElse("<i8"),
      Option(o.get("compressor")).orElse(existing.map(_.compressor))
        .getOrElse("zlib"), 0L, ".")
    // append-mode into a non-empty store: stale chunks from a prior write
    // survive commit, so they must decode identically under the NEW
    // metadata — reject any layout/codec mismatch up front
    if (!doTruncate) existing.foreach { old =>
      require(java.util.Arrays.equals(old.shape, meta.shape) &&
        java.util.Arrays.equals(old.chunks, meta.chunks) &&
        old.dtype == meta.dtype && old.compressor == meta.compressor &&
        old.fillValue == meta.fillValue && old.separator == meta.separator,
        s"append-mode zarr write to $dir changes the store layout " +
          s"(existing: shape=${old.shape.mkString(",")} " +
          s"chunks=${old.chunks.mkString(",")} dtype=${old.dtype} " +
          s"compressor=${old.compressor}; " +
          s"write: shape=${meta.shape.mkString(",")} " +
          s"chunks=${meta.chunks.mkString(",")} dtype=${meta.dtype} " +
          s"compressor=${meta.compressor}) — prior chunks would decode as " +
          "garbage; use mode(\"overwrite\") to replace the store")
    }
    new ZarrWrite(dir, meta, info.schema(), doTruncate, v3Meta,
      info.queryId())
  }
}

final class ZarrWrite(dir: String, meta: ZarrIO.Meta, schema: StructType,
    doTruncate: Boolean, v3Meta: Option[Zarr3IO.Meta3],
    queryId: String = "")
    extends Write with RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  override def requiredDistribution(): Distribution =
    Distributions.clustered(
      (0 until meta.dims).map(a =>
        Expressions.identity(s"g$a"): org.apache.spark.sql.connector.expressions.Expression).toArray)

  override def requiredOrdering(): Array[SortOrder] =
    (0 until meta.dims).map(a =>
      Expressions.sort(Expressions.identity(s"g$a"),
        SortDirection.ASCENDING): SortOrder).toArray

  override def toBatch: BatchWrite = {
    StoreIO.mkdirs(StoreIO.hadoopConf, dir)
    val staging = ".staging-" + java.util.UUID.randomUUID().toString
    new ZarrBatchWrite(dir, staging, meta, schema, doTruncate, v3Meta)
  }

  /** Native micro-batch sink (`df.writeStream.format("zarr")`) — the DSv2
    * streaming face of the same append contract the foreachBatch gate
    * documents: each epoch appends whole chunk objects, micro-batches own
    * DISJOINT chunk regions (zarr's own independent-writer model;
    * reference relabeling.py:319-322), and a redelivered epoch restages
    * and re-moves byte-identical chunk files — idempotent, hence
    * effectively exactly-once. Cross-epoch writes to the SAME chunk are a
    * contract violation and resolve last-writer-wins, exactly as two
    * concurrent batch writers would. Epoch staging dirs are DETERMINISTIC
    * (`.staging-epoch-<id>`), so a re-executed epoch overwrites its own
    * partial staging instead of leaking orphans. Metadata is written
    * LAST on every epoch commit (idempotent byte-identical rewrite after
    * the first), so a crash mid-commit never leaves a store whose
    * metadata advertises chunks that are missing.
    */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(v3Meta.forall(_.sharding.isEmpty),
      "the streaming zarr sink cannot write the sharded layout: shard " +
        "objects pack at COMMIT from all their inner chunks, but a stream " +
        "appends chunks across epochs — write sharded stores with the " +
        "batch writer's 'shards' option, or stream unsharded and rewrite")
    require(!doTruncate,
      "the streaming zarr sink is append-only (each epoch adds chunk " +
        "objects); use the batch writer with mode(\"overwrite\") to " +
        "replace a store")
    StoreIO.mkdirs(StoreIO.hadoopConf, dir)
    new ZarrStreamingWrite(dir, meta, schema, v3Meta, queryId)
  }
}

final class ZarrStreamingWrite(dir: String, meta: ZarrIO.Meta,
    schema: StructType, v3Meta: Option[Zarr3IO.Meta3], queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  // staging is deterministic per (query, epoch) — the queryId is stable
  // across restarts (it lives in the checkpoint), so a re-executed epoch
  // overwrites its own partial staging, while TWO concurrent streaming
  // writers on one store (legal under zarr's independent-writer model if
  // their chunk regions are disjoint) can never collide on epoch numbers
  private def stagingFor(epochId: Long) = s".staging-epoch-$queryId-$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    ZarrStreamingWriterFactory(dir, meta, schema.fieldNames,
      StoreIO.ser(StoreIO.hadoopConf), v3Meta.isDefined, queryId)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = StoreIO.hadoopConf
    val root = new Path(dir)
    val stage = new Path(dir, stagingFor(epochId))
    def move(p: Path, isFile: Boolean, rel: String): Unit =
      if (!isFile)
        StoreIO.list(conf, p.toString).foreach { c =>
          val name = c.getPath.getName
          move(c.getPath, c.isFile, if (rel.isEmpty) name else rel + "/" + name)
        }
      else StoreIO.moveInto(conf, p, root, rel) // replace = redelivery-safe
    move(stage, isFile = false, "")
    StoreIO.deleteRecursive(conf, stage.toString)
    v3Meta match {
      case Some(m3) => Zarr3IO.writeMeta(dir, m3)
      case None => ZarrIO.writeMeta(dir, meta)
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    StoreIO.deleteRecursive(StoreIO.hadoopConf,
      new Path(dir, stagingFor(epochId)).toString) // store untouched
}

/** Per-epoch delegation onto the batch writer: identical row -> chunk
  * encoding, staged under the epoch's deterministic directory.
  */
final case class ZarrStreamingWriterFactory(dir: String, meta: ZarrIO.Meta,
    columns: Array[String], sconf: SerializableConfiguration, v3: Boolean,
    queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    ZarrWriterFactory(
      new Path(dir, s".staging-epoch-$queryId-$epochId").toString,
      meta, columns, sconf, v3).createWriter(partitionId, taskId)
}

final class ZarrBatchWrite(dir: String, staging: String, meta: ZarrIO.Meta,
    schema: StructType, doTruncate: Boolean,
    v3Meta: Option[Zarr3IO.Meta3]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ZarrWriterFactory(new Path(dir, staging).toString, meta,
      schema.fieldNames, StoreIO.ser(StoreIO.hadoopConf), v3Meta.isDefined)

  private def packStaging = staging + "-pack"

  /** Swap the staged files in: clear the old store (overwrite mode) only
    * now that every task has succeeded, then move chunks, then metadata
    * LAST. The pre-commit store is never touched by a failing write.
    *
    * Sharded layout (`shards` option): the staged objects are INNER
    * chunks, so commit first runs a distributed PACK job — one task per
    * shard reads its staged (already element-encoded) inner chunks and
    * concatenates them into the shard object plus binary index — into a
    * second staging dir, and the swap moves the packed shards instead.
    * Packing moves only encoded bytes (no decode/re-encode), and the pack
    * job's parallelism is the shard count, so a 100 TB write pays one
    * extra pass over the COMPRESSED data in exchange for the
    * object-per-shard layout that object stores need. The store is still
    * untouched until every pack task has succeeded.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = StoreIO.hadoopConf
    val root = new Path(dir)
    val stage = new Path(dir, staging)
    val packed = v3Meta.filter(_.sharding.isDefined).map { m3 =>
      val pack = new Path(dir, packStaging)
      packShards(m3, stage, pack)
      pack
    }
    if (doTruncate)
      StoreIO.list(conf, dir)
        .filterNot(f => f.getPath.getName == staging ||
          f.getPath.getName == packStaging)
        .foreach(f => StoreIO.deleteRecursive(conf, f.getPath.toString))
    def move(p: Path, isFile: Boolean, rel: String): Unit =
      if (!isFile)
        StoreIO.list(conf, p.toString).foreach { c =>
          val name = c.getPath.getName
          move(c.getPath, c.isFile, if (rel.isEmpty) name else rel + "/" + name)
        }
      else StoreIO.moveInto(conf, p, root, rel)
    move(packed.getOrElse(stage), isFile = false, "")
    StoreIO.deleteRecursive(conf, stage.toString)
    packed.foreach(p => StoreIO.deleteRecursive(conf, p.toString))
    v3Meta match {
      case Some(m3) => Zarr3IO.writeMeta(dir, m3)
      case None => ZarrIO.writeMeta(dir, meta)
    }
    if (packed.isDefined)
      ShardIndexCache.invalidateUnder(dir) // same-JVM rewrite loops
  }

  /** One pack task per shard: gather the shard's staged inner-chunk
    * objects (raw bytes — they are already in the store's element codec)
    * and write the assembled shard object into `packDir`. Runs as a Spark
    * job from the driver-side commit; shard count bounds the parallelism.
    */
  private def packShards(m3: Zarr3IO.Meta3, stage: Path, packDir: Path): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val dims = m3.dims
    val ips = m3.innersPerShard
    val cps = ips.product
    val sep = m3.separator
    val sh = m3.sharding.get
    val sconf = StoreIO.ser(StoreIO.hadoopConf)
    val stageStr = stage.toString
    val packStr = packDir.toString
    val innerM3 = m3.copy(chunks = sh.inner, sharding = None)
    val groups = Zarr3IO.listChunkLocs(stageStr, innerM3)
      .groupBy(loc => loc.indices.map(a => loc(a) / ips(a)).toVector)
      .iterator.map { case (sl, locs) => (sl.toArray, locs.toArray) }.toSeq
    if (groups.nonEmpty)
      spark.sparkContext
        .parallelize(groups, math.min(groups.size,
          math.max(1, spark.sparkContext.defaultParallelism)))
        .foreach { case (sl, locs) =>
          val enc = new Array[Array[Byte]](cps)
          locs.foreach { loc =>
            val pos = Array.tabulate(dims)(a => loc(a) - sl(a) * ips(a))
            val k = graft.core.Regions.linearIndex(pos, ips).toInt
            enc(k) = StoreIO.readAllBytes(sconf.value,
              new Path(stageStr, Zarr3IO.chunkKey(loc, sep)).toString)
          }
          StoreIO.write(sconf.value,
            new Path(packStr, Zarr3IO.chunkKey(sl, sep)).toString,
            Zarr3IO.packShard(enc, sh.indexAtEnd, sh.indexCrc))
        }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    StoreIO.deleteRecursive(StoreIO.hadoopConf,
      new Path(dir, staging).toString) // old store untouched
    StoreIO.deleteRecursive(StoreIO.hadoopConf,
      new Path(dir, packStaging).toString)
  }
}

final case class ZarrChunksWritten(n: Int) extends WriterCommitMessage

final case class ZarrWriterFactory(stageDir: String, meta: ZarrIO.Meta,
    columns: Array[String],
    sconf: SerializableConfiguration,
    v3: Boolean = false) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val dims = meta.dims
    val grid = meta.spec.gridShape
    val gIdx = (0 until dims).map(a => columns.indexOf(s"g$a")).toArray
    val pIdx = (0 until dims).map(a => columns.indexOf(s"p$a")).toArray
    val vIdx = columns.indexOf("value")
    require(gIdx.forall(_ >= 0) && pIdx.forall(_ >= 0) && vIdx >= 0,
      s"zarr write needs g0..g${dims - 1}, p0..p${dims - 1}, value; " +
        s"got ${columns.mkString(",")}")

    new DataWriter[InternalRow] {
      // rows arrive sorted on the grid key (requiredOrdering), so exactly
      // one chunk is open at a time: flush on key change, O(chunk) memory
      private var curLoc: Array[Int] = null
      private var curShape: Array[Int] = null
      private var curData: Array[Long] = null
      private var written = 0
      // clustering sentinel: a REVISITED chunk key means the engine did
      // not honor requiredDistribution/Ordering (or a caller bypassed it)
      // — the revisit would silently overwrite the earlier flush with a
      // partial chunk, so fail loudly instead. Bounded by chunks-per-task.
      private val flushed = new java.util.HashSet[String]()
      // scratch for the per-row grid key: the writer sees every CELL, so
      // the hot loop must not allocate per row
      private val gBuf = new Array[Int](dims)

      private def tileShapeOf(loc: Array[Int]): Array[Int] =
        Array.tabulate(dims) { a =>
          math.min(meta.chunks(a).toLong,
            meta.shape(a) - loc(a).toLong * meta.chunks(a)).toInt
        }

      private def flush(): Unit = if (curLoc != null) {
        val key =
          if (v3) Zarr3IO.chunkKey(curLoc, meta.separator)
          else curLoc.mkString(meta.separator)
        if (!flushed.add(key)) throw new IllegalStateException(
          s"zarr writer revisited chunk ${curLoc.mkString(",")}: input " +
            "rows are not clustered by grid key — the write requires " +
            "the engine-enforced distribution (one chunk, one task, " +
            "contiguous rows)")
        StoreIO.write(sconf.value, new Path(stageDir, key).toString,
          ZarrIO.encodeChunk(curData, meta, curShape))
        written += 1
        curLoc = null; curShape = null; curData = null
      }

      override def write(row: InternalRow): Unit = {
        var same = curLoc != null
        var a = 0
        while (a < dims) {
          val g = row.getLong(gIdx(a)).toInt
          if (g < 0 || g >= grid(a)) throw new IllegalArgumentException(
            s"grid coordinate g$a=$g outside [0, ${grid(a)})")
          gBuf(a) = g
          if (same && g != curLoc(a)) same = false
          a += 1
        }
        if (!same) {
          flush()
          curLoc = gBuf.clone()
          curShape = tileShapeOf(curLoc)
          curData = new Array[Long](curShape.product)
        }
        var flat = 0
        a = 0
        while (a < dims) {
          val pv = row.getLong(pIdx(a)).toInt
          if (pv < 0 || pv >= curShape(a)) throw new IllegalArgumentException(
            s"in-chunk coordinate p$a=$pv outside [0, ${curShape(a)}) " +
              s"for chunk ${curLoc.mkString(",")}")
          flat = flat * curShape(a) + pv
          a += 1
        }
        curData(flat) = row.getLong(vIdx)
      }

      override def commit(): WriterCommitMessage = {
        flush()
        ZarrChunksWritten(written)
      }

      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  }
}
