package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.util.SerializableConfiguration

/** Path-scheme-aware byte I/O for the zarr stores: every read, write, list,
  * and rename goes through `org.apache.hadoop.fs.FileSystem`, so a store
  * path can be a plain local directory, an explicit `file:` URI, or any
  * Hadoop-supported object store (`s3a://`, `hdfs://`, `abfs://`, ...) —
  * the access layer the 100 TB scenario actually runs on. Plain paths
  * resolve against `fs.defaultFS` exactly as before, keeping local behavior
  * bit-identical.
  *
  * Driver-side callers pass [[hadoopConf]] (the active session's Hadoop
  * configuration, carrying `spark.hadoop.*` credentials); executor-side
  * closures capture a [[ser]]-wrapped copy — `Configuration` itself is not
  * serializable.
  */
object StoreIO {

  def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def ser(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)

  private def fsOf(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf)

  def exists(conf: Configuration, path: String): Boolean = {
    val p = new Path(path)
    fsOf(p, conf).exists(p)
  }

  def readAllBytes(conf: Configuration, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = fsOf(p, conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path: $len bytes exceeds one chunk buffer")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  def fileLen(conf: Configuration, path: String): Long = {
    val p = new Path(path)
    fsOf(p, conf).getFileStatus(p).getLen
  }

  /** Open for positioned reads; the caller closes. One open stream serves
    * many [[readRange]] calls — the access pattern of a shard read (index
    * tail + a few inner-chunk ranges), which on an object store is one
    * connection issuing ranged GETs instead of a whole-object download.
    */
  def open(conf: Configuration, path: String): org.apache.hadoop.fs.FSDataInputStream = {
    val p = new Path(path)
    fsOf(p, conf).open(p)
  }

  def readRange(in: org.apache.hadoop.fs.FSDataInputStream,
      off: Long, len: Int): Array[Byte] = {
    val buf = new Array[Byte](len)
    in.readFully(off, buf)
    buf
  }

  /** Create (overwriting) with parent directories, like `Files.write` after
    * `mkdirs` on a local path.
    */
  def write(conf: Configuration, path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val fs = fsOf(p, conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  def mkdirs(conf: Configuration, path: String): Unit = {
    val p = new Path(path)
    fsOf(p, conf).mkdirs(p); ()
  }

  def deleteRecursive(conf: Configuration, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(p, conf)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Children of `path`; empty when the directory does not exist. */
  def list(conf: Configuration, path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = fsOf(p, conf)
    if (!fs.exists(p)) Seq.empty else fs.listStatus(p).toSeq
  }

  /** Move `src` under `dstDir/rel`, replacing any existing file. */
  def moveInto(conf: Configuration, src: Path, dstDir: Path, rel: String): Unit = {
    val target = new Path(dstDir, rel)
    val fs = fsOf(target, conf)
    Option(target.getParent).foreach(fs.mkdirs(_))
    if (fs.exists(target)) fs.delete(target, false)
    require(fs.rename(src, target), s"rename $src -> $target failed")
  }
}
