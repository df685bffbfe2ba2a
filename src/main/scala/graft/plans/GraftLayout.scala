package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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
  *  - [[read]] opens the directory, and if the sidecar is present,
  *    installs the rule and appends the layout to the session conf
  *    (deduplicated, `;`-separated — one session can hold many layouts).
  *    A directory without a sidecar reads as plain parquet, nothing
  *    installed. A malformed sidecar fails CLOSED: the read proceeds,
  *    the layout is simply not declared (the rewrite is an optimization;
  *    correctness never depends on it).
  *
  * Scale note: the sidecar is one tiny driver-side file per store, via
  * the Hadoop FileSystem API — works unchanged against HDFS/object
  * stores, never touches executors.
  */
object GraftLayout {

  val SidecarName = "_graft_layout.json"
  private val ConfKey = "spark.graft.hilbert.layout"

  /** Write `df` Hilbert-sorted on (`xCol`,`yCol`) with the order-16 index
    * in `hCol`, plus the layout sidecar. `files` bounds the store's file
    * count (one tight index envelope per file).
    */
  def writeHilbert(df: DataFrame, dir: String, xCol: String, yCol: String,
      hCol: String, files: Int): Unit = {
    val laid = df.withColumn(hCol,
        HilbertIndex.hilbert(col(xCol), col(yCol)))
      .repartitionByRange(files, col(hCol))
      .sortWithinPartitions(hCol)
    laid.write.mode(SaveMode.Overwrite).parquet(dir)
    writeSidecar(df.sparkSession, dir, Seq(xCol, yCol, hCol))
  }

  /** 3-D twin: order-10 index of (`xCol`,`yCol`,`zCol`) in `hCol`. */
  def writeHilbert3(df: DataFrame, dir: String, xCol: String, yCol: String,
      zCol: String, hCol: String, files: Int): Unit = {
    val laid = df.withColumn(hCol,
        Hilbert3.hilbert3(col(xCol), col(yCol), col(zCol)))
      .repartitionByRange(files, col(hCol))
      .sortWithinPartitions(hCol)
    laid.write.mode(SaveMode.Overwrite).parquet(dir)
    writeSidecar(df.sparkSession, dir, Seq(xCol, yCol, zCol, hCol))
  }

  /** Read the store; declare its layout for the session if the sidecar is
    * present (installing [[HilbertBoxCover]] idempotently).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    readSidecar(spark, dir).foreach { names =>
      HilbertBoxCover.ensureInstalled(spark)
      val layout = names.mkString(",")
      val existing = spark.conf.getOption(ConfKey).getOrElse("")
        .split(";").map(_.trim).filter(_.nonEmpty)
      if (!existing.contains(layout))
        spark.conf.set(ConfKey, (existing :+ layout).mkString(";"))
    }
    spark.read.parquet(dir)
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
  }

  /** The declared column list, or None when absent/unreadable/invalid.
    * Column names are restricted to identifier characters — the sidecar
    * rides into a SESSION CONF consumed by the optimizer rule, so a
    * hostile or corrupted sidecar must not smuggle separators through.
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
      if (ident && (names.length == 3 || names.length == 4)) Some(names)
      else None
    } catch { case _: Exception => None }
}
