package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Similarity.randomProjection]] / [[Similarity.projectedRerankTopK]]
  * contracts: the sign matrix is a pure function of (j, k, seed); the
  * projection preserves distances within JL distortion (checked as
  * correlation of squared distances — the property serving relies on);
  * the cascade recovers most of the exact top-k; the plan is a narrow
  * scan-speed pass.
  */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def fixture(n: Int, dim: Int = 64): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian() * 100).round / 100.0f))
    }.toDF("vec_id", "embedding")
  }

  test("sign matrix: deterministic in (j,k,seed), balanced-ish, seed-sensitive") {
    val a = Similarity.projectionSigns(64, 16, 7L)
    val b = Similarity.projectionSigns(64, 16, 7L)
    assert(a == b, "same seed must give the identical matrix")
    val c = Similarity.projectionSigns(64, 16, 8L)
    assert(a != c, "different seed must give a different matrix")
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    // md5 parity should not be wildly unbalanced
    val plus = a.flatten.count(_ == 1.0)
    assert(plus > 350 && plus < 674, s"suspicious sign balance: $plus/1024")
  }

  test("JL property: projected squared distances correlate with originals") {
    import spark.implicits._
    val vecs = fixture(120).as[(Long, Array[Float])].collect().toMap
    val signs = Similarity.projectionSigns(64, 16, 7L).map(_.toArray)
    def proj(v: Array[Float]): Array[Double] =
      signs.map(s => v.indices.map(j => s(j) * v(j).toDouble).sum).toArray
    val pairs = for (i <- 0L until 40L; j <- (i + 1) until 40L) yield (i, j)
    val (orig, pj) = pairs.map { case (i, j) =>
      val (a, b) = (vecs(i), vecs(j))
      val d0 = a.indices.map(x => math.pow(a(x) - b(x), 2)).sum
      val (pa, pb) = (proj(a), proj(b))
      // scale by outDim/inDim-free 1/outDim: JL preserves up to √outDim
      val d1 = pa.indices.map(x => math.pow(pa(x) - pb(x), 2)).sum / 16.0
      (d0, d1)
    }.unzip
    val n = orig.size
    val (mx, my) = (orig.sum / n, pj.sum / n)
    val cov = orig.zip(pj).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(orig.map(x => math.pow(x - mx, 2)).sum)
    val sy = math.sqrt(pj.map(y => math.pow(y - my, 2)).sum)
    val corr = cov / (sx * sy)
    assert(corr > 0.5,
      s"projected distances must track originals (JL), corr=$corr")
    // and the scale is right: mean projected ≈ mean original (±1 signs
    // give E[d1] = d0 exactly under the 1/outDim scaling)
    assert(my > mx * 0.7 && my < mx * 1.3,
      s"projected distance scale off: $my vs $mx")
  }

  test("cascade recall: projectedRerankTopK recovers most of the exact top-k") {
    val df = fixture(200)
    val queries = df.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val casc = Similarity.projectedRerankTopK(queries, df, k = 5,
        outDim = 16, seed = 7L, candidates = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & casc).size.toDouble / exact.size
    assert(recall >= 0.7, s"cascade recall too low: $recall")
    // stage-2 scores are full-width: any overlap pair carries the same
    // sim as the exact ranking would
  }

  test("guards: candidates >= k, and a corpus-sized query frame fails loudly") {
    val df = fixture(60)
    intercept[IllegalArgumentException] {
      Similarity.projectedRerankTopK(df.limit(5), df, k = 10,
        outDim = 8, seed = 1L, candidates = 5)
    }
    val e = intercept[IllegalArgumentException] {
      Similarity.projectedRerankTopK(df, df, k = 2, outDim = 8, seed = 1L,
        candidates = 4, maxBroadcastRows = 16L)
    }
    assert(e.getMessage.contains("maxBroadcastRows"))
  }

  test("plan: the projection is a narrow pass — no exchange, no UDF, codegen dot") {
    val plan = Similarity.randomProjection(fixture(50), outDim = 16, seed = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("udf") && !plan.contains("BatchEvalPython"),
      s"projection must be codegen expressions:\n$plan")
    assert(plan.toLowerCase.contains("dotproduct"),
      s"projection should go through the native dot expression:\n${plan.take(2000)}")
  }
}
