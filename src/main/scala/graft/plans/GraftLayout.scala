package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}

import graft.functions.{Hilbert3, HilbertIndex}

/** Durable Hilbert layout declaration: the missing "table clustering
  * property" plain parquet has nowhere to carry.
  *
  * [[HilbertBoxCover]] rewrites plain box filters into index-range scans,
  * but only for layouts DECLARED via `spark.graft.hilbert.layout` — and a
  * session conf dies with the session, so every reader would have to know
  * the layout out of band. This helper closes the loop the way a
  * lakehouse table format would, one directory at a time:
  *
  *  - [[writeHilbert]] / [[writeHilbert3]] compute the curve index, write
  *    the store range-partitioned AND sorted by it (so every file carries
  *    a tight min/max index envelope — the statistics the cover prunes
  *    with), then drop a `_graft_layout.json` sidecar naming the key and
  *    index columns. The underscore prefix makes the sidecar invisible to
  *    Spark's file index (same convention as `_SUCCESS`), so the
  *    directory stays a perfectly ordinary parquet table for ANY reader.
  *    The write FAILS LOUDLY on a key outside the curve domain (the index
  *    is computed from masked bits, so an out-of-domain key would break
  *    the key→index containment the cover relies on) — the check rides
  *    the write's own pass, no extra scan.
  *  - [[read]] opens the directory; if the sidecar is present and its
  *    columns all exist in the store's schema, it installs the rule and
  *    registers the layout PATH-SCOPED: [[HilbertBoxCover]] applies it
  *    only to filters over a file scan rooted at this exact directory —
  *    an unrelated relation that merely reuses the column names is never
  *    touched (the session-conf route remains for by-hand declarations,
  *    with its documented name-matching semantics). A directory without
  *    a sidecar reads as plain parquet, nothing registered. A malformed,
  *    stale, or hostile sidecar fails CLOSED: the read proceeds, the
  *    layout is simply not registered (the rewrite is an optimization;
  *    correctness never depends on it).
  *
  * Registration lives for the JVM, but is FINGERPRINT-GUARDED: the
  * sidecar's (modificationTime, length) is captured at registration and
  * re-validated with one driver-side `getFileStatus` each time
  * [[HilbertBoxCover]] considers the path — an external writer that
  * overwrites or deletes the store behind the session's back (taking the
  * sidecar with it, as any `SaveMode.Overwrite` does) drops the
  * registration at the next query instead of silently covering over data
  * that no longer carries the index. [[forget]] remains for explicit
  * same-JVM invalidation. The one hole the fingerprint cannot see is
  * `SaveMode.Append` of NON-conforming rows INTO a layout directory: the
  * sidecar survives untouched, so later reads still prune by an index
  * the appended rows never computed (the scoped escapes rescue ONLY
  * out-of-domain keys — in particular, appended rows with a NULL index
  * but in-domain keys are silently pruned, since the sidecar route
  * omits the IsNull escape by design). Appending to a layout store
  * OUTSIDE [[writeHilbert]]/[[writeHilbert3]] violates the sidecar
  * contract — delete the sidecar (or call [[forget]] in-JVM) when such
  * an append is intentional.
  *
  * Scale note: the sidecar is one tiny driver-side file per store, via
  * the Hadoop FileSystem API — works unchanged against HDFS/object
  * stores, never touches executors.
  */
object GraftLayout {

  val SidecarName = "_graft_layout.json"

  /** A registration: the declared columns (keys..., index) plus the
    * sidecar fingerprint captured when they were read/written, and the
    * FileSystem to re-stat against (Hadoop caches FS instances, so the
    * reference is shared, not a leak).
    */
  private final case class Reg(names: Seq[String], modTime: Long, len: Long,
      fs: org.apache.hadoop.fs.FileSystem)

  /** Qualified-root-path → registration. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Reg]()

  private[plans] def registryEmpty: Boolean = registry.isEmpty

  private sealed trait Check
  private case object Valid extends Check
  private case object Stale extends Check   // proven: gone or rewritten
  private case object Unknown extends Check // transient FS error: no proof

  /** The sidecar still matches what was registered — one driver-side
    * metadata call per registered root per rule invocation (a HEAD on an
    * object store), which is what keeps a stale registration from
    * injecting covers after an external writer replaced the store. Only
    * a PROVEN change (missing sidecar, or a fingerprint mismatch) is
    * staleness; a transient FS error (an object-store throttle, say)
    * proves nothing and must not durably evict the registration — it
    * just declines injection for this compile.
    */
  private def check(root: String, r: Reg): Check =
    try {
      val st = r.fs.getFileStatus(new Path(new Path(root), SidecarName))
      if (st.getModificationTime == r.modTime && st.getLen == r.len) Valid
      else Stale
    } catch {
      case _: java.io.FileNotFoundException => Stale
      case _: Exception => Unknown
    }

  /** The layout for a scan over `paths` — only when EVERY scanned root is
    * registered with the SAME layout AND its sidecar fingerprint still
    * holds on disk (a PROVEN mismatch drops the registration on the spot
    * — the store was rewritten behind the session's back; eviction is
    * conditional on the exact entry we checked, so a concurrent
    * writeHilbert's fresh registration can never be the casualty of a
    * race with its own stale predecessor). A multi-path read that mixes
    * a layout store with anything else (or with a store laid out
    * differently) gets no injection: the cover would silently prune the
    * foreign rows, whose identically-named columns carry no such index.
    */
  private[plans] def layoutFor(paths: Seq[String]): Option[Seq[String]] =
    if (paths.isEmpty) None
    else {
      val found = paths.map { p =>
        Option(registry.get(p)).flatMap { r =>
          check(p, r) match {
            case Valid => Some(r.names)
            case Stale => registry.remove(p, r); None
            case Unknown => None
          }
        }
      }
      if (found.forall(_.isDefined) && found.distinct.size == 1)
        found.head
      else None
    }

  /** Drop a registration (e.g. after overwriting the store with
    * non-layout data under the same column names).
    */
  def forget(spark: SparkSession, dir: String): Unit =
    registry.remove(qualified(spark, dir))

  /** Write `df` Hilbert-sorted on (`xCol`,`yCol`) with the order-16 index
    * in `hCol`, plus the layout sidecar. `files` bounds the store's file
    * count (one tight index envelope per file).
    */
  def writeHilbert(df: DataFrame, dir: String, xCol: String, yCol: String,
      hCol: String, files: Int): Unit = {
    val laid = df.withColumn(hCol,
        HilbertIndex.hilbert(domChecked(xCol, HilbertIndex.Side - 1),
          domChecked(yCol, HilbertIndex.Side - 1)))
      .repartitionByRange(files, col(hCol))
      .sortWithinPartitions(hCol)
    laid.write.mode(SaveMode.Overwrite).parquet(dir)
    writeSidecar(df.sparkSession, dir, Seq(xCol, yCol, hCol))
  }

  /** 3-D twin: order-10 index of (`xCol`,`yCol`,`zCol`) in `hCol`. */
  def writeHilbert3(df: DataFrame, dir: String, xCol: String, yCol: String,
      zCol: String, hCol: String, files: Int): Unit = {
    val m = Hilbert3.Side - 1
    val laid = df.withColumn(hCol,
        Hilbert3.hilbert3(domChecked(xCol, m), domChecked(yCol, m),
          domChecked(zCol, m)))
      .repartitionByRange(files, col(hCol))
      .sortWithinPartitions(hCol)
    laid.write.mode(SaveMode.Overwrite).parquet(dir)
    writeSidecar(df.sparkSession, dir, Seq(xCol, yCol, zCol, hCol))
  }

  /** The key column, failing the write loudly if any value leaves the
    * curve domain [0, max]. NULL passes through (the index is null-safe).
    */
  private def domChecked(name: String, max: Long) =
    when(col(name).isNull || col(name).between(0L, max), col(name))
      .otherwise(raise_error(concat(
        lit(s"layout key '$name' outside the curve domain [0, $max]: "),
        col(name).cast("string"))))

  /** Read the store; register its layout (path-scoped) for this JVM if
    * the sidecar is present and names only columns the store carries,
    * installing [[HilbertBoxCover]] idempotently. A read that finds NO
    * (or an invalid) sidecar also CLEARS any prior registration for the
    * path — the store was overwritten with non-layout data, and a stale
    * entry would inject covers over an index that no longer exists.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(dir)
    readSidecar(spark, dir)
      .filter(_.forall(df.schema.fieldNames.contains(_))) match {
      case Some(names) =>
        HilbertBoxCover.ensureInstalled(spark)
        register(spark, dir, names)
      case None =>
        registry.remove(qualified(spark, dir))
    }
    df
  }

  private def qualified(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString
  }

  /** Record the layout with the sidecar's current fingerprint; a sidecar
    * that cannot be stat'ed registers nothing (fail closed — the rewrite
    * is an optimization).
    */
  private def register(spark: SparkSession, dir: String,
      names: Seq[String]): Unit =
    try {
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(new Path(root, SidecarName))
      registry.put(fs.makeQualified(root).toString,
        Reg(names, st.getModificationTime, st.getLen, fs))
    } catch { case _: Exception =>
      registry.remove(qualified(spark, dir))
    }

  private def writeSidecar(spark: SparkSession, dir: String,
      names: Seq[String]): Unit = {
    val json = names.map(n => "\"" + n + "\"")
      .mkString("{\"columns\":[", ",", "]}")
    val path = new Path(dir, SidecarName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // register eagerly: the writer's own JVM prunes immediately, and an
    // overwrite of a previously-registered dir refreshes the entry (with
    // the fresh sidecar's fingerprint)
    HilbertBoxCover.ensureInstalled(spark)
    register(spark, dir, names)
  }

  /** The declared column list, or None when absent/unreadable/invalid.
    * Column names are restricted to identifier characters — defense in
    * depth on top of path scoping: a corrupted sidecar must not smuggle
    * structure anywhere downstream.
    */
  private def readSidecar(spark: SparkSession,
      dir: String): Option[Seq[String]] =
    try {
      val path = new Path(dir, SidecarName)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) return None
      val in = fs.open(path)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](4096)
          var n = in.read(chunk)
          while (n >= 0 && buf.size <= 65536) {
            buf.write(chunk, 0, n); n = in.read(chunk)
          }
          buf.toByteArray
        } finally in.close()
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val m = java.util.regex.Pattern
        .compile("""\{\s*"columns"\s*:\s*\[([^\]]*)\]\s*\}""")
        .matcher(text.trim)
      if (!m.matches()) return None
      val names = m.group(1).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).toSeq
      val ident = names.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
      // distinctness matters for CORRECTNESS, not just hygiene: a
      // duplicated key name would bound the cover on one key twice and
      // the other not at all — silently pruning in-domain rows
      if (ident && (names.length == 3 || names.length == 4) &&
        names.distinct.length == names.length) Some(names)
      else None
    } catch { case _: Exception => None }
}
