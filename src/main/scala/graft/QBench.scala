package graft
import org.apache.spark.sql.SparkSession

/** Single-query A/B timing harness (dev tool, not a driver artifact):
  * `runMain graft.QBench q1,q2,... [reps]` times each named query
  * `reps` times under the EXACT Bench power-run regime (same session
  * confs, noop sink, cache clear between runs) after one untimed
  * warm-up rep, printing per-rep seconds + min/median. Keeps
  * per-query optimization work measurable without a 5-minute full
  * bench cycle. */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("dedup_banding_recall_eval"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalScratch(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.max(8, cpus.toInt / 4).toString))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // Suite-sized codegen compile cache — mirror Bench (measurement
      // documented there); QBench must time the same regime.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      // mirror Bench's big-partition window/SMJ buffer sizing
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
      .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "1048576")
      .config("spark.sql.sessionWindow.buffer.in.memory.threshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def clear(): Unit = {
      try spark.sharedState.cacheManager.clearCache()
      catch { case _: Throwable => () }
      // Control knob for the graph-index memo protocol (BENCH_NOTES
      // control table): with SPARK_GRAFT_GRAPH_MEMO=off the memoized
      // co-occurrence-edge / LPA-label pipelines are dropped between
      // reps, so every reference re-prices the index build (incl. its
      // one-scalar distinct-count job) — the unmemoized per-query cost.
      if (sys.env.get("SPARK_GRAFT_GRAPH_MEMO").contains("off"))
        graft.ops.Graph.clearEdgeMemo()
      // Same control for the similarity/dedup eval-tier index memo
      // (IndexMemo): with SPARK_GRAFT_INDEX_MEMO=off every rep re-trains
      // the quantizer, rebuilds the signature/code tables and re-labels
      // the truth slices — the unmemoized per-query cost for the
      // BENCH_NOTES control table.
      if (sys.env.get("SPARK_GRAFT_INDEX_MEMO").contains("off"))
        graft.ops.IndexMemo.clear()
    }
    // Per-rep job/stage/task census — the denominators of the scheduling
    // floor analysis (BENCH_NOTES: observed ≈ jobs × job floor + stage
    // waves × wave floor). Registered once; counters reset per rep.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks); ()
        }
      })
    // `__floor` pseudo-query: calibrate THIS box's per-job and per-stage
    // scheduling floors — the denominators every BENCH_NOTES floor
    // decomposition (observed ≈ jobs × jobFloor + extra stage waves ×
    // stageFloor) multiplies. Job floor: median of 40 trivial one-stage
    // jobs. Stage floor: slope of one job whose plan chains R extra
    // repartition stages over 64 rows (R = 12 vs 2, both measured after
    // a warm-up, so the delta isolates the per-wave cost from job setup).
    if (names.contains("__floor")) {
      import org.apache.spark.sql.functions.{col => fcol}
      def chain(r: Int): Unit = {
        (1 to r).foldLeft(spark.range(64).toDF("id"))(
          (d, i) => d.repartition(4, fcol("id") + i))
          .write.format("noop").mode("overwrite").save()
      }
      chain(2); chain(12) // JIT + codegen warm
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val jf = (1 to 40).map(_ => t {
        spark.range(64).toDF("id").write.format("noop").mode("overwrite").save()
      }).sorted.apply(20)
      val s2 = (1 to 7).map(_ => t { chain(2) }).min
      val s12 = (1 to 7).map(_ => t { chain(12) }).min
      println(f"QFLOOR job=$jf%.4f stage=${(s12 - s2) / 10.0}%.4f " +
        f"(chain2=$s2%.3f chain12=$s12%.3f)")
    }
    // mirror Bench's physical-layout normalization (see Bench.relayout)
    val dir = Bench.relayout(spark, sfDir)
    val warmDir = Bench.relayout(spark, "/root/testdata/sf0.001")
    names.filterNot(_ == "__floor").foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up (JIT) at the bench's warm SF, then timed reps at sfDir
      try {
        fn(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable => System.err.println(s"warm $name: $e") }
      clear()
      var (lastJ, lastS, lastT) = (0, 0, 0)
      val ts = (1 to reps).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async — poll until the counters go quiet
        // (listenerBus.waitUntilEmpty is private[spark])
        var prev = -1
        while (prev != jobs.get() + stages.get() + tasks.get()) {
          prev = jobs.get() + stages.get() + tasks.get()
          Thread.sleep(150)
        }
        lastJ = jobs.get(); lastS = stages.get(); lastT = tasks.get()
        clear()
        dt
      }
      val s = ts.sorted
      println(f"QBENCH $name%-34s min=${s.head}%.3f med=${s(s.size / 2)}%.3f jobs=$lastJ stages=$lastS tasks=$lastT all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
