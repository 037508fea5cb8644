package graft

/** RAM-backed Spark scratch dir for the LOCAL harnesses (Bench / QBench /
  * Verify). Shuffle map outputs, localCheckpoint blocks and cache
  * spill-over otherwise land on the host disk, and on this class of
  * virtualized box the disk is weather: fdatasync throughput measured
  * 27.9 → 227 MB/s across back-to-back 512 MiB writes (8×), which made
  * checkpoint-heavy queries swing 4 → 49 s rep-to-rep and turned bench
  * totals into I/O-contention reports. sf0.1 shuffle volume is sub-GB
  * while the box holds 128 GiB RAM, so /dev/shm removes the disk from
  * the measurement entirely — the engine's own work becomes the signal.
  *
  * Scale posture: this is a LOCAL-MODE measurement choice, not an engine
  * assumption — on a real cluster `spark.local.dir` points at the
  * executors' NVMe scratch (or shuffle goes through a disaggregated
  * shuffle service) and this helper is bypassed via SPARK_GRAFT_LOCAL_DIR
  * or simply not applied. Spark removes its blockmgr/spill subdirs on
  * SparkContext stop, so nothing accumulates across runs. */
object LocalScratch {
  /** The scratch base to hand to `spark.local.dir`, if a usable one
    * exists: SPARK_GRAFT_LOCAL_DIR wins (empty string = force default),
    * else /dev/shm when writable, else None (Spark's java.io.tmpdir). */
  def dir(): Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
      case Some("") => None
      case Some(d) => ensure(d)
      case None => ensure("/dev/shm/graft-scratch")
    }

  private def ensure(base: String): Option[String] = {
    val f = new java.io.File(base)
    f.mkdirs()
    if (f.isDirectory && f.canWrite) Some(base) else None
  }

  /** Applies the scratch dir to a session builder (no-op without one). */
  def apply(b: org.apache.spark.sql.SparkSession.Builder): org.apache.spark.sql.SparkSession.Builder =
    dir().fold(b)(d => b.config("spark.local.dir", d))
}
