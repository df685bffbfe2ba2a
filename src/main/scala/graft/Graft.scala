package graft

import org.apache.spark.sql.SparkSession

/** One-call entry point for library users: a SparkSession with everything
  * this engine registers already installed — the custom-function and
  * as-of-join extensions, the dot-product fusion rule, and the confs the
  * engine's operators assume (nanos-as-long parquet timestamps, UTC,
  * shuffle parallelism matched to the master).
  *
  * {{{
  * val spark = Graft.session()                  // local[*]
  * val spark = Graft.session("local[8]", 8)
  * spark.sql("SELECT long_dot(a, b) FROM vecs") // extension functions live
  * spark.read.format("zarr").load(store)        // DSv2 source registered
  * }}}
  *
  * An existing session can be upgraded in place with [[Graft.install]]
  * (extensions that support live injection: as-of strategy, fusion rule,
  * SQL functions).
  */
object Graft {

  def session(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    install(s) // getOrCreate may return a pre-existing session: upgrade it
    // getOrCreate silently ignores builder confs on a pre-existing session;
    // re-apply the session-scoped ones the engine's operators assume (for a
    // fresh session these are no-ops). conf.set throws on a non-modifiable
    // conf, which is the right failure: better than running with it wrong.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** Idempotently install the runtime-injectable surface on a live session:
    * SQL functions, the as-of planner strategy, and the fusion rule.
    */
  def install(spark: SparkSession): Unit = {
    functions.GraftFunctions.register(spark)
    plans.AsOf.ensureInstalled(spark)
    plans.DotProductFusion.ensureInstalled(spark)
  }
}
