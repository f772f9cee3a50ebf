package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine linear-classifier training — the step between heuristic
  * quality rules (gopherRules, qualityScore) and model-based curation:
  * train the filter ON the cluster, over the corpus, with the same
  * exactness guarantees as every other iterative trainer here (Lloyd's,
  * BPE, PQ). The algorithm is the BATCH perceptron (Rosenblatt 1958,
  * the full-gradient variant): per iteration, sum y·x over every
  * currently-misclassified row and add it to the weight vector.
  *
  * Why a perceptron and not logistic regression: the update is pure
  * INTEGER arithmetic (features are integer counts, labels ±1, weights
  * integer sums of them) — no sigmoid, no learning-rate float, so the
  * whole training trajectory (mistake counts AND weights per
  * iteration) replays exactly in SQL and sits under the cross-engine
  * hash gate. On linearly separable data it provably converges
  * (Novikoff 1962); on non-separable data run fixed iterations like
  * any SGD pass.
  *
  * Scale shape: one iteration = ONE map-side-combined aggregation over
  * a scan of the (narrow, integer) feature frame, collecting a single
  * (d+1)-value row to the driver — the Lloyd's-iteration convention.
  * Driver state is the d-element weight vector; nothing corpus-sized
  * ever leaves the executors. Inference ([[perceptronClassify]]) folds
  * the trained weights into the plan as literals — the linearProbe
  * broadcast-weights shape: a narrow codegen pass, no join, no
  * shuffle.
  */
object Classify {

  /** Integer per-document text features, the raw material of a lexical
    * quality probe: bias 1 (f0), whitespace token count (f1), integer
    * mean token length — chars div max(tokens, 1) (f2) —
    * distinct-token count (f3), and occurrences of the stopword "the"
    * (replace-arithmetic, the t32 counting convention; f4). All BIGINT
    * so downstream products/sums stay integer-exact cross-engine.
    * Callers should CENTER the non-bias features with corpus-typical
    * offsets before training (fold them in as literals — at scale,
    * read them off the approx column profile once): the batch
    * perceptron's update step is a sum over all current mistakes, and
    * uncentered count features make that step overshoot in the bias
    * direction every iteration.
    */
  def textFeatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val esc = textCol.replace("`", "``")
    val t = trim(col(textCol))
    val toks = split(t, "[ \\t\\n\\f\\r]+")
    docs.select(col(idCol).as("doc_id"),
      when(length(t) === 0, 0L).otherwise(size(toks).cast("long")).as("f1"),
      length(col(textCol)).cast("long").as("_chars"),
      when(length(t) === 0, 0L)
        .otherwise(size(array_distinct(toks)).cast("long")).as("f3"),
      // Column-function spelling except the integral `div` (no Column
      // API for it) — the interpolated identifier is backtick-quoted so
      // a column name with spaces/dots/metacharacters parses (r12
      // ADVICE; the backtick itself is escaped by doubling).
      expr(s"CAST((length(`$esc`) - length(regexp_replace(`$esc`, 'the', ''))) div 3 AS BIGINT)")
        .as("f4"))
      .select(col("doc_id"), lit(1L).as("f0"), col("f1"),
        expr("CAST(_chars div greatest(f1, 1) AS BIGINT)").as("f2"),
        col("f3"), col("f4"))
  }

  val textFeatureCols: Seq[String] = Seq("f0", "f1", "f2", "f3", "f4")

  /** Train a batch perceptron for `iters` iterations over integer
    * features. Returns the full training trajectory — one row per
    * iteration: (iter, n_mistakes, w0..wd) where n_mistakes is the
    * mistake count UNDER THE PREVIOUS weights and w* the weights after
    * that iteration's update (all BIGINT — the trajectory itself is
    * gate-checkable). A mistake is y·(w·x) <= 0, so the zero vector
    * misclassifies everything and a zero-margin row always updates.
    * Once an iteration finds zero mistakes the weights freeze and the
    * remaining rows repeat them (emitted anyway: the output contract
    * is `iters` rows regardless of convergence).
    */
  def perceptronTrain(feats: DataFrame, featCols: Seq[String],
      labelCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64,
      s"iters must be in [1, 64], got $iters (each iteration is one corpus pass)")
    require(featCols.nonEmpty, "featCols must be non-empty")
    val spark = feats.sparkSession
    val d = featCols.size
    val cached = feats.persist()
    try {
      var w = Array.fill[Long](d)(0L)
      val traj = Vector.newBuilder[(Long, Long, Seq[Long])]
      for (i <- 1 to iters) {
        val dot = featCols.zipWithIndex
          .map { case (c, j) => col(c) * lit(w(j)) }.reduce(_ + _)
        val mistakes = cached.filter(col(labelCol) * dot <= 0)
        val aggs = count(lit(1)).cast("long").as("n") +:
          featCols.zipWithIndex.map { case (c, j) =>
            coalesce(sum(col(labelCol) * col(c)), lit(0L)).cast("long").as(s"d$j")
          }
        val r = mistakes.agg(aggs.head, aggs.tail: _*).head()
        for (j <- 0 until d) w(j) += r.getLong(j + 1)
        traj += ((i.toLong, r.getLong(0), w.toIndexedSeq))
      }
      import spark.implicits._
      val base = traj.result().toDF("iter", "n_mistakes", "w")
      base.select(col("iter") +: col("n_mistakes") +:
        (0 until d).map(j => col("w")(j).as(s"w$j")): _*)
    } finally { cached.unpersist(); () }
  }

  /** The final weight vector of [[perceptronTrain]], driver-side —
    * d+2 values, bounded by construction.
    */
  def trainWeights(feats: DataFrame, featCols: Seq[String],
      labelCol: String, iters: Int): Seq[Long] = {
    val last = perceptronTrain(feats, featCols, labelCol, iters)
      .orderBy(col("iter").desc).limit(1).head()
    featCols.indices.map(j => last.getLong(j + 2))
  }

  /** Inference with trained weights folded into the plan as literals
    * (the linearProbe broadcast-weights shape): per row, the integer
    * margin w·x and the sign decision (margin > 0 → +1 else −1 — the
    * training rule's complement, so a zero-margin row predicts −1
    * exactly as training counts it as a mistake for y=+1). One narrow
    * codegen pass, no shuffle.
    */
  def perceptronClassify(feats: DataFrame, featCols: Seq[String],
      weights: Seq[Long], idCol: String = "doc_id"): DataFrame = {
    require(weights.size == featCols.size,
      s"weights size ${weights.size} != featCols size ${featCols.size}")
    val dot = featCols.zip(weights)
      .map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)
    feats.select(col(idCol),
      dot.cast("long").as("margin"),
      when(dot > 0, 1L).otherwise(-1L).as("pred"))
  }
}
