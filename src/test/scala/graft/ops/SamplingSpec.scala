package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val docs = spark.read.parquet(s"${SparkTestSession.sf}/documents.parquet")

  test("perKeyExact keeps exactly min(k, group size) rows per stratum, deterministically") {
    val sample = Sampling.perKeyExact(docs, Seq("lang"), Seq("doc_id"), k = 10)
    val byLang = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == full.keySet)
    byLang.foreach { case (lang, n) => assert(n == math.min(10L, full(lang)), lang) }
    // rerun draws the SAME rows; different seed draws a different set
    val ids1 = sample.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.perKeyExact(docs, Seq("lang"), Seq("doc_id"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids3 = Sampling.perKeyExact(docs, Seq("lang"), Seq("doc_id"), k = 10, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids2 == ids1)
    assert(ids3 != ids1)
    assert(sample.columns.toSeq == docs.columns.toSeq) // helper column dropped
  }

  test("stratifiedFraction respects per-stratum fractions and is deterministic") {
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val fractions = langs.map(_ -> 0.5).toMap + (langs.head -> 0.0)
    val s = Sampling.stratifiedFraction(docs, "lang", fractions, idCols = Seq("doc_id"))
    assert(s.filter(col("lang") === langs.head).count() == 0)
    val kept = s.count().toDouble
    val eligible = docs.filter(col("lang") =!= langs.head).count().toDouble
    assert(kept > eligible * 0.3 && kept < eligible * 0.7, s"kept $kept of $eligible")
    assert(Sampling.stratifiedFraction(docs, "lang", fractions, idCols = Seq("doc_id"))
      .count() == s.count())
  }
}
