package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully executed via the `noop` sink (a bare `.count()`
  * would let Catalyst prune sorts/columns and under-measure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { runToNoop(fn(spark, sfDir)); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failed queries must be visible IN the JSON line — a near-zero
    // timing for a query that threw would read as a performance win
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
