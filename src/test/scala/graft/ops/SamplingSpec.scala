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

  test("perKeyExactMd5: equals the window formulation; plan is TopKPerKey, not Window") {
    val got = Sampling.perKeyExactMd5(
      docs.select(col("source"), col("doc_id")), "source", "doc_id", k = 5)
    val pri = conv(substring(md5(concat(lit("graft:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(pri, col("doc_id"))
    val want = docs.select(col("source"), col("doc_id"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 5)
      .drop("_rn")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "md5 per-key sample != window formulation")
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"),
      s"expected the custom operator, not window machinery:\n$plan")
  }

  test("weightedPriority: deterministic, weight-biased, never samples w <= 0") {
    import spark.implicits._
    // one whale (w=10000) among 200 minnows (w=1): the whale's priority
    // is >= 10000/1 * min-u, a minnow's <= 1/u — the whale must be drawn
    val df = ((1 to 200).map(i => (i.toLong, 1.0)) :+ (999L, 10000.0) :+ (998L, 0.0))
      .toDF("id", "w")
    val s = Sampling.weightedPriority(df, "w", Seq("id"), m = 20)
    val ids = s.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(999L), "heaviest row missing from weighted sample")
    assert(!ids.contains(998L), "zero-weight row sampled")
    assert(ids.size == 20)
    // rerun identical; different seed shifts the (light-row) selection
    val ids2 = Sampling.weightedPriority(df, "w", Seq("id"), m = 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids2 == ids)
    val ids3 = Sampling.weightedPriority(df, "w", Seq("id"), m = 20, seed = "other")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids3 != ids, "seed change should redraw the sample")
    assert(ids3.contains(999L))
    // aggregate bias: across the light rows, expected inclusion is
    // uniform; heavier rows win proportionally — check with two classes
    val mix = ((1 to 300).map(i => (i.toLong, 1.0)) ++
      (301 to 600).map(i => (i.toLong, 20.0))).toDF("id", "w")
    val heavy = Sampling.weightedPriority(mix, "w", Seq("id"), m = 60)
      .filter(col("id") > 300).count()
    assert(heavy > 45, s"heavy class underrepresented: $heavy of 60")
    // a pre-existing business column named `priority` must not be
    // silently overwritten (same convention as perKeyExact's guard)
    intercept[IllegalArgumentException] {
      Sampling.weightedPriority(df.withColumn("priority", lit(1)), "w", Seq("id"), m = 5)
    }
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

  test("hashSplit: total, deterministic, stable under corpus growth, proportions ~ weights") {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSplit(df, Seq("doc_id"), splits)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = assign(docs)
    assert(full.size == docs.count(), "every row gets a label")
    assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    // rerun-deterministic
    assert(assign(docs) == full)
    // THE auditability property: a row's label is independent of what
    // else is in the corpus — the split computed on a subset agrees
    val subset = assign(docs.filter(col("doc_id") % 3 === 0))
    assert(subset.nonEmpty && subset.forall { case (id, s) => full(id) == s })
    // proportions track the weights (binomial fluctuation at n=500)
    val trainFrac = full.values.count(_ == "train").toDouble / full.size
    assert(trainFrac > 0.72 && trainFrac < 0.88, s"train fraction $trainFrac")
    assert(full.values.count(_ == "val") > 0 && full.values.count(_ == "test") > 0)
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, Seq("doc_id"), Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("temperatureMixture: sqrt-balanced quotas flatten the head and lift the tail") {
    import spark.implicits._
    // 64/16/4/1 docs -> sqrt micro-weights 8e6/4e6/2e6/1e6 (W = 15e6)
    val rows = Seq.tabulate(64)(i => (i.toLong, "A")) ++
      Seq.tabulate(16)(i => (100L + i, "B")) ++
      Seq.tabulate(4)(i => (200L + i, "C")) ++ Seq((300L, "D"))
    val df = rows.toDF("doc_id", "domain")
    // total 15 divides exactly: quotas must be 8/4/2/1 — the sqrt schedule
    val q15 = Sampling.temperatureMixture(df, "domain", total = 15L)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q15 == Map("A" -> 8L, "B" -> 4L, "C" -> 2L, "D" -> 1L), q15.toString)
    // head share shrank vs proportional (64/85 = 0.75 -> 8/15 = 0.53),
    // tail D lifted (15/85 = 0.18 of a doc -> a whole doc)
    assert(q15("A").toDouble / 15 < 64.0 / 85)
    // short domains yield what they have (capped-mixture relaxation)
    val q90 = Sampling.temperatureMixture(df, "domain", total = 90L)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q90("B") == 16L && q90("C") == 4L && q90("D") == 1L, q90.toString)
    assert(q90("A") <= 64L)
    // deterministic rerun
    val ids1 = Sampling.temperatureMixture(df, "domain", total = 15L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.temperatureMixture(df, "domain", total = 15L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("epochAllocation: even targets, truncating epochs, remainder micro-probability") {
    import spark.implicits._
    val inv = Seq(("A", 100L), ("B", 10L), ("C", 1000L))
      .toDF("source", "tokens_avail")
    // total 1110 · 2x = 2220 over 3 sources → target 740 each
    val plan = Sampling.epochAllocation(inv, budgetX = 2L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(plan == Map(
      "A" -> ((100L, 740L, 7L, 400000L)),   // 7 full passes + 40/100
      "B" -> ((10L, 740L, 74L, 0L)),        // divides exactly
      "C" -> ((1000L, 740L, 0L, 740000L))), // subsample: 740/1000
      plan)
    // the plan never over-commits: full passes stay within target and
    // the remainder probability is a proper fraction
    plan.values.foreach { case (tok, target, ep, frac) =>
      assert(ep * tok <= target && frac >= 0L && frac < 1000000L,
        s"$tok $target $ep $frac")
    }
    intercept[IllegalArgumentException] {
      Sampling.epochAllocation(inv, budgetX = 0L)
    }
  }

  test("leakageSafeSplit: components share a label; singletons agree with hashSplit") {
    import spark.implicits._
    val ids = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = Sampling.leakageSafeSplit(ids, pairs, "doc_id", splits)
      .select("doc_id", "group_id", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // group key = component min id; singletons key on their own id
    assert(Seq(1L, 2L, 3L).map(got(_)._1).toSet == Set(1L))
    assert(Seq(7L, 8L).map(got(_)._1).toSet == Set(7L))
    assert(Seq(4L, 5L, 6L, 9L, 10L).forall(id => got(id)._1 == id))
    // THE leakage property: no component straddles splits
    assert(Seq(1L, 2L, 3L).map(got(_)._2).toSet.size == 1)
    assert(Seq(7L, 8L).map(got(_)._2).toSet.size == 1)
    // singletons carry exactly the plain hashSplit label — the split
    // only changes for docs that gained a near-dup partner
    val plain = Sampling.hashSplit(ids, Seq("doc_id"), splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(4L, 5L, 6L, 9L, 10L).forall(id => got(id)._2 == plain(id)))
    // grouped members carry the hashSplit label OF THE GROUP KEY
    assert(got(2L)._2 == plain(1L) && got(3L)._2 == plain(1L))
    assert(got(8L)._2 == plain(7L))
  }
}
