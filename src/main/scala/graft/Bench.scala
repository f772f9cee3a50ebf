package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully executed via the `noop` sink (a bare `.count()`
  * would let Catalyst prune sorts/columns and under-measure).
  *
  * Robustness: each query is measured `SPARK_GRAFT_BENCH_PASSES` times
  * (default 3) and the reported per-query number is the MEDIAN — one
  * externally-loaded pass can neither fake nor mask a regression. The
  * min/max across passes is emitted alongside (`spread`) so a noisy run
  * is visible in the artifact itself instead of only in a re-run.
  */
object Bench {

  /** Median of the measured passes: middle element for odd n, lower
    * middle for even n (conservative — never averages two passes into a
    * time no pass actually achieved).
    */
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warmup: flagship star join (JIT + codegen) plus one scan of each
    // input table at the bench SF (parquet footer + page-cache warm) so
    // per-query numbers reflect steady state, not first-touch I/O.
    try {
      runToNoop(SparkEntry.entry(spark))
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        runToNoop(Tables(spark, sfDir, t))
      }
      // run EVERY query once at a tiny SF: codegen + JIT compile of
      // each plan shape happens here, so the measured pass below times
      // steady-state execution instead of first-compile latency
      val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
      if (new java.io.File(warmDir.stripPrefix("file:")).isDirectory) {
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try runToNoop(fn(spark, warmDir))
          catch { case e: Throwable =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
          }
        }
      } else System.err.println(
        s"[bench] warmup dir $warmDir missing - measured times include first-compile latency")
    } catch { case _: Throwable => () }
    // measure pass-by-pass over the WHOLE query list (pass 1 of all
    // queries, then pass 2, ...) rather than back-to-back per query:
    // a transient machine-load spike then lands on DIFFERENT queries in
    // different passes and the median discards it, whereas back-to-back
    // repeats would hand all three passes of one query to the same spike
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val failedSet = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to passes; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try { runToNoop(fn(spark, sfDir)) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failedSet += name
      }
      timings(name) = timings(name) :+ (System.nanoTime() - t0) / 1e9
    }
    val results = names.map { case (name, _) =>
      (name, median(timings(name)), timings(name).min, timings(name).max)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, mn, mx) => "\"" + k + "\":[" + f"$mn%.3f" + "," + f"$mx%.3f" + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failed queries must be visible IN the JSON line — a near-zero
    // timing for a query that threw would read as a performance win
    val failed = failedSet.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"passes":$passes,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
