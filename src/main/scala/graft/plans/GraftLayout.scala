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
  * Registration lives for the JVM, but is FINGERPRINT-GUARDED on two
  * axes, both re-validated each time [[HilbertBoxCover]] considers the
  * path (memoized per optimizer pass — one tiny GET + one LIST per
  * registered root):
  *
  *  - the sidecar's CONTENT HASH, captured at registration — an external
  *    writer that overwrites or deletes the store behind the session's
  *    back (taking the sidecar with it, as any `SaveMode.Overwrite`
  *    does) or rewrites the sidecar itself drops the registration at
  *    the next query. A content hash, not (mtime, length): a same-length
  *    rewrite inside the filesystem's mtime granularity (1 s on some
  *    stores) would pass a stat-only check.
  *  - the DATA-FILE fingerprint (file count + total bytes + a hash of
  *    the sorted (name, length) pairs), recorded INSIDE the sidecar by
  *    [[writeHilbert]]/[[writeHilbert3]] at write time and re-checked
  *    against a fresh directory listing. This mechanically closes the
  *    `SaveMode.Append` hole: appending rows into a layout directory
  *    outside the official writers leaves the sidecar intact but adds
  *    part files the recorded fingerprint has never seen, so the next
  *    box query DECLINES pruning (filter semantics, no error, no row
  *    ever silently pruned) — and [[read]] likewise declines to
  *    (re-)register until an official write refreshes the store. This
  *    matters because the scoped escapes rescue ONLY out-of-domain
  *    keys: an appended row with a NULL index but in-domain keys would
  *    otherwise be silently pruned (the sidecar route omits the IsNull
  *    escape by design). Sidecars written before the fingerprint
  *    existed (no `files` field) register with a fingerprint computed
  *    at registration time — append detection then starts at that
  *    moment rather than at write time.
  *
  * [[forget]] remains for explicit same-JVM invalidation.
  *
  * Scale note: the sidecar is one tiny driver-side file per store, via
  * the Hadoop FileSystem API — works unchanged against HDFS/object
  * stores, never touches executors. The per-pass LIST is the same
  * operation the file index itself performs to plan the scan.
  */
object GraftLayout {

  val SidecarName = "_graft_layout.json"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Paths already warned about (→ their emit count, which the spec pins
    * at 1): pruning decline is deliberately silent in RESULTS (filter
    * semantics, never a wrong row), but permanently-lost pruning after an
    * external append was invisible to the operator — queries just got
    * slower. One driver-log WARN per store (not per optimizer pass: the
    * rule re-validates on every compile, and a per-pass warn would storm
    * the log) names the path and the remedy. An official rewrite clears
    * the entry, so a LATER external mutation warns afresh.
    */
  private val warned =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[graft] def warnCount(root: String): Int =
    Option(warned.get(root)).fold(0)(_.intValue)

  private def warnDeclined(root: String, why: String): Unit =
    // putIfAbsent guards the emit, so the stored value IS the emit count
    if (warned.putIfAbsent(root, 1) == null)
      log.warn(s"graft layout pruning DECLINED for $root: $why — box " +
        "queries on this store now scan unpruned; re-run writeHilbert/" +
        "writeHilbert3 (then read) to restore pruning")

  /** What [[status]] reports for a directory. */
  sealed trait LayoutStatus
  object LayoutStatus {
    /** Registered in this JVM and still valid on disk: box filters over
      * the store are being rewritten into curve-range scans.
      */
    final case class Registered(columns: Seq[String]) extends LayoutStatus
    /** A layout sidecar exists but pruning is NOT active, with the reason
      * — the observable form of the silent decline.
      */
    final case class Declined(reason: String) extends LayoutStatus
    /** No sidecar and no registration: a plain parquet directory (or a
      * valid layout store simply not yet `read` in this JVM — the reason
      * string distinguishes the two).
      */
    final case class Unregistered(detail: String) extends LayoutStatus
  }

  /** Operability probe: is pruning active for `dir`, and if not, why not?
    * Read-only — observes the registry and the store without evicting,
    * registering, or logging, so calling it in a monitoring loop perturbs
    * nothing. The three states mirror exactly what [[HilbertBoxCover]]
    * will do on the next query over the store.
    */
  def status(spark: SparkSession, dir: String): LayoutStatus = {
    import LayoutStatus._
    val root = qualified(spark, dir)
    Option(registry.get(root)) match {
      case Some(r) =>
        check(root, r) match {
          case Valid => Registered(r.names)
          case Stale => Declined(
            "registered, but the store changed on disk since registration " +
              "(sidecar rewritten/removed, or data files appended/replaced) " +
              "— the next query declines pruning; re-run writeHilbert* to " +
              "restore it")
          case Unknown => Declined(
            "registered, but the store could not be re-validated " +
              "(transient filesystem error) — pruning declines per-query " +
              "until validation succeeds")
        }
      case None =>
        readSidecar(spark, dir) match {
          case None =>
            val hasSidecar =
              try {
                val p = new Path(dir, SidecarName)
                p.getFileSystem(spark.sparkContext.hadoopConfiguration)
                  .exists(p)
              } catch { case scala.util.control.NonFatal(_) => false }
            if (hasSidecar)
              Declined("sidecar present but unreadable or invalid — the " +
                "store reads as plain parquet; re-run writeHilbert* to " +
                "restore pruning")
            else Unregistered("no layout sidecar: plain parquet")
          case Some(sc) =>
            try {
              val p = new Path(dir)
              val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              val actual = dirFingerprint(fs, p)
              if (sc.declaredFp.forall(_ == actual))
                Unregistered("valid layout sidecar, not registered in " +
                  "this JVM — GraftLayout.read(spark, dir) activates pruning")
              else
                Declined("data files no longer match the fingerprint the " +
                  "sidecar recorded at write time (appended/replaced " +
                  "outside writeHilbert*) — read() will refuse to " +
                  "register; re-run writeHilbert* to restore pruning")
            } catch {
              case scala.util.control.NonFatal(_) =>
                Declined("store could not be listed (transient filesystem " +
                  "error)")
            }
        }
    }
  }

  /** Directory-content fingerprint over the DATA files only (underscore/
    * dot-prefixed names are metadata — `_SUCCESS`, the sidecar itself):
    * count + total bytes + an order-independent-by-sorting hash of the
    * (name, length) pairs. Spark part files carry write-unique UUIDs, so
    * any append, replace, or delete perturbs at least one component.
    * Top-level files only, which is exactly the layout contract —
    * writeHilbert* emits a FLAT store — and an append that instead
    * introduces subdirectories (a partitionBy append, say) makes the
    * directory unreadable as one table for every consumer (Spark's
    * conflicting-directory-structures error), loud rather than silent.
    */
  private final case class DirFp(count: Int, bytes: Long, namesHash: Long)

  /** A registration: the declared columns (keys..., index), the sidecar's
    * content hash captured when they were read/written, the data-file
    * fingerprint the store must still match, and the FileSystem to
    * re-validate against (Hadoop caches FS instances, so the reference is
    * shared, not a leak).
    */
  private final case class Reg(names: Seq[String], sidecarHash: Long,
      dirFp: DirFp, fs: org.apache.hadoop.fs.FileSystem)

  /** Qualified-root-path → registration. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Reg]()

  private[plans] def registryEmpty: Boolean = registry.isEmpty

  private sealed trait Check
  private case object Valid extends Check
  private case object Stale extends Check   // proven: gone or rewritten
  private case object Unknown extends Check // transient FS error: no proof

  /** The store still matches what was registered — one tiny driver-side
    * GET (the sidecar's content hash) plus one LIST (the data-file
    * fingerprint) per registered root per rule invocation, which is what
    * keeps a stale registration from injecting covers after an external
    * writer replaced, rewrote, or APPENDED TO the store. Only a PROVEN
    * change (missing sidecar, or either fingerprint mismatching) is
    * staleness; a transient FS error (an object-store throttle, say)
    * proves nothing and must not durably evict the registration — it
    * just declines injection for this compile. `NonFatal`, not
    * `Exception`: a thread interrupt or OOM during the driver-side
    * validation must propagate, not silently read as Unknown.
    */
  private def check(root: String, r: Reg): Check =
    try {
      val rootP = new Path(root)
      val bytes = readSmall(r.fs, new Path(rootP, SidecarName))
      if (contentHash(bytes) != r.sidecarHash) Stale
      else if (dirFingerprint(r.fs, rootP) != r.dirFp) Stale
      else Valid
    } catch {
      case _: java.io.FileNotFoundException => Stale
      // a checksum failure is PROVEN divergence, not a transient error:
      // the bytes on disk are not the bytes that were registered (an
      // external writer bypassed the FS's CRC bookkeeping, or the file
      // rotted) — evict, exactly like a hash mismatch
      case _: org.apache.hadoop.fs.ChecksumException => Stale
      case scala.util.control.NonFatal(_) => Unknown
    }

  /** FNV-1a over the bytes — collision resistance against ACCIDENTAL
    * divergence is all the fingerprint needs (the sidecar is defense in
    * depth for cooperating writers, not a cryptographic boundary; a
    * hostile actor with write access to the store can simply corrupt the
    * data files themselves).
    */
  private def contentHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }

  private def dirFingerprint(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): DirFp = {
    val data = fs.listStatus(root).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.sortBy(_.getPath.getName)
    var h = 0xcbf29ce484222325L
    def mix(v: Long): Unit = {
      var x = v; var i = 0
      while (i < 8) { h = (h ^ (x & 0xff)) * 0x100000001b3L; x >>>= 8; i += 1 }
    }
    var bytes = 0L
    data.foreach { st =>
      st.getPath.getName.foreach(c => mix(c.toLong))
      mix(st.getLen)
      bytes += st.getLen
    }
    DirFp(data.length, bytes, h)
  }

  /** Size cap for [[readSmall]]: far above any real sidecar (~200 bytes),
    * far below anything worth streaming.
    */
  private val ReadSmallCap = 65536L

  /** Read a small metadata file FULLY, or refuse: a file over the 64 KiB
    * cap throws `FileNotFoundException` (= proven staleness to [[check]],
    * = unparseable to [[readSidecar]]) instead of hashing a truncated
    * prefix — a prefix hash could read two differing oversized files as
    * equal, silently keeping a stale registration alive. The length is
    * checked up front via `getFileStatus` (the same stat `exists` already
    * paid), so the read itself stays one bounded GET.
    */
  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    if (len > ReadSmallCap)
      throw new java.io.FileNotFoundException(
        s"$p: metadata file exceeds the ${ReadSmallCap}B cap ($len bytes) — " +
          "not a graft sidecar")
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
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
            case Stale =>
              registry.remove(p, r)
              warnDeclined(p, "store changed on disk since registration " +
                "(sidecar rewritten/removed, or data files appended/" +
                "replaced outside the official writers)")
              None
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
    * the sidecar is present, names only columns the store carries, AND
    * the directory's data files still match the fingerprint the sidecar
    * recorded at write time (an appended store must NOT re-register:
    * the appended rows never computed the index), installing
    * [[HilbertBoxCover]] idempotently. A read that finds NO (or an
    * invalid, or a fingerprint-mismatching) sidecar also CLEARS any
    * prior registration for the path — a stale entry would inject
    * covers over an index the data no longer carries.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(dir)
    val reg = readSidecar(spark, dir)
      .filter(_.names.forall(df.schema.fieldNames.contains(_)))
      .flatMap { sc =>
        try {
          val root = new Path(dir)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val actual = dirFingerprint(fs, root)
          // legacy sidecar (no recorded fingerprint): adopt the current
          // listing — append detection starts now instead of at write time
          if (sc.declaredFp.forall(_ == actual))
            Some((fs.makeQualified(root).toString,
              Reg(sc.names, sc.hash, actual, fs)))
          else {
            warnDeclined(fs.makeQualified(root).toString,
              "data files no longer match the fingerprint the sidecar " +
                "recorded at write time (appended/replaced outside the " +
                "official writers)")
            None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    reg match {
      case Some((root, r)) =>
        HilbertBoxCover.ensureInstalled(spark)
        registry.put(root, r)
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

  /** Write the sidecar — column names plus the data-file fingerprint of
    * the store as it stands right now (the writers call this immediately
    * after the parquet commit, so the fingerprint describes exactly the
    * officially-written file set) — and register eagerly: the writer's
    * own JVM prunes immediately, and an overwrite of a previously-
    * registered dir refreshes the entry with the fresh fingerprints.
    */
  private def writeSidecar(spark: SparkSession, dir: String,
      names: Seq[String]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp = dirFingerprint(fs, root)
    val json = names.map(n => "\"" + n + "\"")
      .mkString("{\"columns\":[", ",",
        s"""],"files":{"count":${fp.count},"bytes":${fp.bytes},"hash":${fp.namesHash}}}""")
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = fs.create(new Path(root, SidecarName), true)
    try out.write(bytes) finally out.close()
    HilbertBoxCover.ensureInstalled(spark)
    val qroot = fs.makeQualified(root).toString
    registry.put(qroot, Reg(names, contentHash(bytes), fp, fs))
    // an official rewrite makes the store healthy again: re-arm the
    // warn-once so a FUTURE external mutation is reported afresh
    warned.remove(qroot)
  }

  /** What a sidecar parse yields: the declared columns, the data-file
    * fingerprint recorded at write time (None for sidecars that predate
    * it), and the content hash of the bytes read.
    */
  private final case class Sidecar(names: Seq[String],
      declaredFp: Option[DirFp], hash: Long)

  /** The parsed sidecar, or None when absent/unreadable/invalid. Column
    * names are restricted to identifier characters — defense in depth on
    * top of path scoping: a corrupted sidecar must not smuggle structure
    * anywhere downstream.
    */
  private def readSidecar(spark: SparkSession,
      dir: String): Option[Sidecar] =
    try {
      val path = new Path(dir, SidecarName)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) return None
      val bytes = readSmall(fs, path)
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val m = java.util.regex.Pattern
        .compile("""\{\s*"columns"\s*:\s*\[([^\]]*)\]\s*(?:,\s*"files"\s*:\s*\{\s*"count"\s*:\s*(\d+)\s*,\s*"bytes"\s*:\s*(\d+)\s*,\s*"hash"\s*:\s*(-?\d+)\s*\}\s*)?\}""")
        .matcher(text.trim)
      if (!m.matches()) return None
      val names = m.group(1).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).toSeq
      val ident = names.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
      val fp =
        if (m.group(2) == null) None
        else Some(DirFp(m.group(2).toInt, m.group(3).toLong,
          m.group(4).toLong))
      // distinctness matters for CORRECTNESS, not just hygiene: a
      // duplicated key name would bound the cover on one key twice and
      // the other not at all — silently pruning in-domain rows
      if (ident && (names.length == 3 || names.length == 4) &&
        names.distinct.length == names.length)
        Some(Sidecar(names, fp, contentHash(bytes)))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
}
