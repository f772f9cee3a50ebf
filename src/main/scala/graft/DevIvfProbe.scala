package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch instrumentation for the ivf_serve scale-probe arm: times the
  * stages of [[graft.ext.Similarity.ivfTopK]] separately at ×1/×k/×2k
  * to attribute the per-row ratio (index build vs assignment vs
  * candidate join vs rank).
  */
object DevIvfProbe {
  private def scaledBy(df: DataFrame, idCol: String, k: Int): DataFrame =
    (0 until k).map(i => df.withColumn(idCol, col(idCol) + lit(i * 1000000000L)))
      .reduce(_.unionByName(_))

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    def embAt(n: Int) = scaledBy(Tables.embeddings(spark, sfDir), "vec_id", n)
    def queries(n: Int) = embAt(n).filter(col("vec_id") < 20)

    for (n <- Seq(1, 10, 20)) {
      // warmup
      noop(Similarity.ivfTopK(queries(n), embAt(n), k = 5, nCentroids = 16, nProbe = 4))
      val full = t(noop(Similarity.ivfTopK(queries(n), embAt(n), k = 5, nCentroids = 16, nProbe = 4)))
      // stage: index build only (codebook collect + assignment pass)
      val idx = t {
        val (_, lists) = Similarity.ivfIndex(embAt(n), 16)
        noop(lists)
      }
      // stage: serve from a prebuilt (cached-in-memory) index
      val (cb, lists) = Similarity.ivfIndex(embAt(n), 16)
      val listsP = lists.persist()
      noop(listsP)
      val serve = t(noop(Similarity.ivfTopK(queries(n), embAt(n), k = 5,
        nProbe = 4, corpusIndex = Some((cb, listsP)))))
      listsP.unpersist()
      println(f"x$n%-3d full=$full%.3f idx=$idx%.3f serve_prebuilt=$serve%.3f")
    }
    spark.stop()
  }
}
