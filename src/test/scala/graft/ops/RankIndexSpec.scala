package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The twelfth index-lifecycle family: persisted domain ranks with
  * warm-start incremental maintenance. Pins the d22/t36 lifecycle
  * contract on graph state — build == operator, update == warm
  * continuation (and, over an unchanged graph, == a longer cold run),
  * forget drops exactly the named rows, the sidecar accumulates
  * iteration provenance, and a non-artifact path fails loudly.
  */
class RankIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  private def starGraph = {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val und = Seq((1L, 2L, 900000L), (1L, 3L, 100000L)).toDF("src", "dst", "w")
    (nodes, und.union(und.select(col("dst"), col("src"), col("w"))))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      r.getLong(r.fieldIndex("rank"))).toMap

  test("write → ranksAt round-trips the operator result; sidecar records iters") {
    val (nodes, edges) = starGraph
    val path = tmp("graft_rank_idx")
    RankIndex.writeRankIndex(nodes, edges, path, iters = 3)
    assert(asMap(RankIndex.ranksAt(spark, path)) ==
      asMap(Graph.pageRankWeighted(nodes, edges, iters = 3)))
    assert(RankIndex.readRankParams(spark, path).contains(
      RankIndex.RankParams(3)))
  }

  test("update over an UNCHANGED graph == longer cold run; itersTotal accumulates") {
    val (nodes, edges) = starGraph
    val path = tmp("graft_rank_idx")
    RankIndex.writeRankIndex(nodes, edges, path, iters = 2)
    RankIndex.updateRankIndex(spark, path, nodes, edges, iters = 3)
    assert(asMap(RankIndex.ranksAt(spark, path)) ==
      asMap(Graph.pageRankWeighted(nodes, edges, iters = 5)))
    assert(RankIndex.readRankParams(spark, path).contains(
      RankIndex.RankParams(5)))
  }

  test("update with a GROWN graph: new node seeds at the uniform prior; vanished edges lose their flow") {
    val (nodes, edges) = starGraph
    val path = tmp("graft_rank_idx")
    RankIndex.writeRankIndex(nodes, edges, path, iters = 1)
    val nodes2 = Seq(1L, 2L, 3L, 4L).toDF("id")
    val grown = edges.union(
      Seq((1L, 4L, 500000L), (4L, 1L, 500000L)).toDF("src", "dst", "w"))
    RankIndex.updateRankIndex(spark, path, nodes2, grown, iters = 1)
    val got = asMap(RankIndex.ranksAt(spark, path))
    val want = asMap(Graph.pageRankWeightedFrom(nodes2, grown,
      Graph.pageRankWeighted(nodes, edges, iters = 1), iters = 1))
    assert(got == want, s"got $got want $want")
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("forget drops exactly the named ids and keeps the sidecar; non-artifact paths fail loudly") {
    val (nodes, edges) = starGraph
    val path = tmp("graft_rank_idx")
    RankIndex.writeRankIndex(nodes, edges, path, iters = 2)
    RankIndex.forgetRankIndex(spark, path, Seq(2L).toDF("id"))
    val got = asMap(RankIndex.ranksAt(spark, path))
    assert(got.keySet == Set(1L, 3L))
    assert(got == asMap(Graph.pageRankWeighted(nodes, edges, iters = 2))
      .filter(_._1 != 2L))
    assert(RankIndex.readRankParams(spark, path).contains(
      RankIndex.RankParams(2)))
    // a bare parquet dir without the sidecar is not updatable
    val bare = tmp("graft_rank_bare")
    Graph.pageRankWeighted(nodes, edges, iters = 1)
      .write.mode("overwrite").parquet(bare)
    val ex = intercept[IllegalArgumentException] {
      RankIndex.updateRankIndex(spark, bare, nodes, edges)
    }
    assert(ex.getMessage.contains("sidecar"))
    val ex2 = intercept[IllegalArgumentException] {
      RankIndex.forgetRankIndex(spark, bare, Seq(1L).toDF("id"))
    }
    assert(ex2.getMessage.contains("sidecar"))
  }
}
