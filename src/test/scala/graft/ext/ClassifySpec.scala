package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Batch-perceptron trainer/classifier: hand-computed update steps,
  * convergence + weight freeze on separable data, the zero-margin
  * contract, literal-weights inference, plan shape, and loud guards.
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def feats2(rows: Seq[(Long, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "f0", "f1", "y")
  }

  test("hand-computed batch updates: all-mistakes first step, zero-margin counts as mistake") {
    // two rows, features (1, x): A = (1, 1) y=-1, B = (1, 4) y=+1
    val df = feats2(Seq((1L, 1L, 1L, -1L), (2L, 1L, 4L, 1L)))
    val t = Classify.perceptronTrain(df, Seq("f0", "f1"), "y", iters = 2)
      .orderBy("iter").collect()
    // iter 1: w=(0,0) -> every y*(w.x)=0 <= 0 is a mistake; delta =
    // (-1)(1,1) + (1)(1,4) = (0, 3); w1 = (0, 3)
    assert(t(0).getLong(1) == 2L && t(0).getLong(2) == 0L && t(0).getLong(3) == 3L,
      s"iter 1 wrong: ${t(0)}")
    // iter 2: A margin 3 -> y*3 = -3 <= 0 mistake; B margin 12 ok;
    // delta = (-1, -1); w2 = (-1, 2)
    assert(t(1).getLong(1) == 1L && t(1).getLong(2) == -1L && t(1).getLong(3) == 2L,
      s"iter 2 wrong: ${t(1)}")
  }

  test("separable data: mistakes hit zero and the weights freeze; rows still emitted") {
    // strictly separable with margin around x = 0: y = sign(x)
    val df = feats2(Seq((1L, 1L, -3L, -1L), (2L, 1L, -2L, -1L),
      (3L, 1L, 2L, 1L), (4L, 1L, 3L, 1L)))
    val t = Classify.perceptronTrain(df, Seq("f0", "f1"), "y", iters = 8)
      .orderBy("iter").collect()
    assert(t.length == 8, "output contract is iters rows regardless of convergence")
    val converged = t.filter(_.getLong(1) == 0L)
    assert(converged.nonEmpty, s"never converged: ${t.mkString("; ")}")
    val first0 = t.indexWhere(_.getLong(1) == 0L)
    // after the first zero-mistake iteration everything repeats
    (first0 until t.length).foreach { i =>
      assert(t(i).getLong(1) == 0L && t(i).getLong(2) == t(first0).getLong(2) &&
        t(i).getLong(3) == t(first0).getLong(3), s"weights moved after convergence at row $i")
    }
  }

  test("classify: margin is the literal dot; zero margin predicts -1 (the training complement)") {
    val df = feats2(Seq((1L, 1L, 5L, 1L), (2L, 1L, -2L, 1L), (3L, 1L, 2L, 1L)))
    val out = Classify.perceptronClassify(df, Seq("f0", "f1"), Seq(-2L, 1L))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 1L)
    assert(out(1).getLong(1) == -4L && out(1).getLong(2) == -1L)
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == -1L,
      "zero margin must predict -1: training counts y=+1 at margin 0 as a mistake")
  }

  test("textFeatures: hand-checked counts; empty text is all zeros but the bias") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the cat sat"), (2L, "")).toDF("doc_id", "text")
    val f = Classify.textFeatures(docs).orderBy("doc_id").collect()
    // 5 tokens, 19 chars -> avg 3, 3 distinct tokens, 'the' twice
    assert(f(0).getLong(1) == 1L && f(0).getLong(2) == 5L && f(0).getLong(3) == 3L &&
      f(0).getLong(4) == 3L && f(0).getLong(5) == 2L, s"features wrong: ${f(0)}")
    assert(f(1).getLong(2) == 0L && f(1).getLong(3) == 0L && f(1).getLong(4) == 0L &&
      f(1).getLong(5) == 0L, s"empty text: ${f(1)}")
  }

  test("plan: inference is one narrow codegen pass — no exchange, no UDF; a training step is one aggregation") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"tok$i value the row " * (i % 5 + 1).toInt))
      .toDF("doc_id", "text")
    val feats = Classify.textFeatures(docs)
    val inferPlan = Classify.perceptronClassify(feats,
      Classify.textFeatureCols, Seq(1L, 2L, 3L, 4L, 5L))
      .queryExecution.executedPlan.toString
    assert(!inferPlan.contains("Exchange"), s"inference shuffles:\n$inferPlan")
    assert(!inferPlan.contains("BatchEvalPython") && !inferPlan.contains("ScalaUDF"),
      s"inference not codegen:\n$inferPlan")
    // the training step: filter + global aggregate — exactly one
    // exchange (the 1-row final agg), nothing keyed by row
    val labeled = feats.withColumn("y", when(col("f3") * 2 >= col("f1"), 1L).otherwise(-1L))
    val dot = Classify.textFeatureCols.map(c => col(c) * lit(1L)).reduce(_ + _)
    val stepPlan = labeled.filter(col("y") * dot <= 0)
      .agg(count(lit(1)).as("n"), sum(col("y") * col("f1")).as("d1"))
      .queryExecution.executedPlan.toString
    assert(stepPlan.split("Exchange").length <= 2, s"training step over-shuffles:\n$stepPlan")
  }

  test("guards: iteration bound and weight arity fail loudly") {
    val df = feats2(Seq((1L, 1L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Classify.perceptronTrain(df, Seq("f0", "f1"), "y", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Classify.perceptronTrain(df, Seq("f0", "f1"), "y", iters = 65)
    }
    intercept[IllegalArgumentException] {
      Classify.perceptronClassify(df, Seq("f0", "f1"), Seq(1L))
    }
  }
}
