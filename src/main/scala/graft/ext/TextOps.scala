package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num.round6

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Catalyst built-ins (codegen'd, no UDFs) — every function is a
  * narrow map over the document row, so the operators scale linearly and
  * never shuffle.
  */
object TextOps {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "[ \\t\\n\\f\\r]+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword count: whitespace words further split on
    * letter/digit/punct boundaries, ≈ GPT-style token inflation.
    */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "[ \\t\\n\\f\\r]+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^a-zA-Z0-9 \\t\\n\\f\\r])")))

  /** GPT-style pre-tokenizer alternation, RE2-safe: optional-space
    * letter runs / digit runs / punctuation runs, residual space runs.
    * Deliberately lookaround-free so an RE2 engine (DuckDB, Go, Rust)
    * replays it verbatim — [[subwordCount]] is the finer Java-regex
    * variant whose lookarounds no RE2 oracle can express.
    */
  val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+|[ ]+"

  /** Count of [[BpePattern]] matches — the cross-engine-verifiable
    * GPT-ish token count (t07 gate).
    */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Sliding token-window chunking — the context-length prep step of
    * every RAG / training pipeline: each doc becomes ⌈n/stride⌉ chunks
    * of ≤ `window` tokens starting every `stride` tokens (overlap =
    * window − stride). Zero-token docs yield zero chunks. One narrow
    * per-row explode — the fan-out is the output size itself, no
    * shuffle, no UDF; `slice` + `array_join` are codegen built-ins, so
    * a 100 TB corpus chunks at scan speed.
    *
    * Output: (idCol, chunk_id, chunk_start, chunk_len, chunk_text) —
    * chunk_start is the 0-based token offset, chunk_text the
    * space-joined window (tokens carry no whitespace, so the join is
    * lossless and cross-engine exact).
    */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window,
      s"stride $stride must be in [1, window=$window]")
    docs
      .select(col(idCol), tokens(col(textCol)).as("_t"),
        tokenCount(col(textCol)).cast("long").as("_n"))
      .filter(col("_n") > 0)
      .select(col(idCol), col("_t"),
        posexplode(sequence(lit(0L), col("_n") - 1L, lit(stride.toLong))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_start"),
        slice(col("_t"), col("col").cast("int") + 1, lit(window)).as("_c"))
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        size(col("_c")).cast("long").as("chunk_len"),
        array_join(col("_c"), " ").as("chunk_text"))
  }

  /** Quality heuristics (length / punctuation / stopword ratios). */
  def punctCount(text: Column): Column = length(regexp_replace(text, "[^.!?]", ""))

  def upperRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text))

  private val StopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(StopwordsEn: _*))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: longer docs with moderate
    * punctuation and some stopwords score higher.
    */
  def qualityScore(text: Column): Column = round6(qualityScoreRaw(text))

  /** Un-rounded [[qualityScore]] — for callers that need a rounding mode
    * other than HALF_UP (e.g. the oracle-gated t05 floor-scales, since
    * round() tie-breaking differs between engines at exact .5 digits).
    */
  private[graft] def qualityScoreRaw(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = least(punctCount(text).cast("double") * 10.0 / greatest(tokenCount(text), lit(1)), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    lenScore * 0.5 + punctScore * 0.2 + stopScore * 0.3
  }

  /** Gopher-style quality-rule battery (Rae et al. 2021 §A1.1, public):
    * the standard pre-filter every web-scale curation pipeline runs
    * before any model-based scoring. Per doc, five rules over integer /
    * micro-unit rational metrics (no float anywhere, so the full table
    * sits under the cross-engine hash gate):
    *
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10] chars (micro-units)
    *   - symbol-to-word ratio (# / ellipsis) ≤ 0.1
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 distinct stopwords present (the "stop word filter")
    *
    * Output: doc_id + each metric + per-rule flags folded into `keep`.
    * Plan: a narrow per-row map — no shuffle, no UDF; ratios are
    * truncating integer `div` on micro-scaled counts so DuckDB's
    * flooring `//` replays them exactly (all operands non-negative).
    */
  def gopherRules(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minWords: Int = 30,
      maxWords: Int = 100000, keepCols: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = tokenCount(text).cast("long")
    // Σ word lengths == non-whitespace char count (whitespace tokenizer)
    val nonWs = length(regexp_replace(text, "[ \\t\\n\\f\\r]", "")).cast("long")
    val sym = regexp_count(text, lit("#|\\.\\.\\.|…")).cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(array_intersect(
      tokens(lower(text)), array(StopwordsEn.map(lit): _*))).cast("long")
    val passthrough = keepCols.map(col)
    docs.select(Seq(col(idCol), nWords.as("n_words"), nonWs.as("_nonws"),
        sym.as("_sym"), alphaWords.as("_alpha"), stopHits.as("stop_hits")) ++
        passthrough: _*)
      .select(Seq(col(idCol), col("n_words"),
        when(col("n_words") === 0, 0L)
          .otherwise(expr("_nonws * 1000000 div n_words")).as("mwl_micro"),
        when(col("n_words") === 0, 0L)
          .otherwise(expr("_sym * 1000000 div n_words")).as("sym_micro"),
        when(col("n_words") === 0, 0L)
          .otherwise(expr("_alpha * 1000000 div n_words")).as("alpha_micro"),
        col("stop_hits")) ++ passthrough: _*)
      .withColumn("keep",
        (col("n_words").between(minWords, maxWords) &&
          col("mwl_micro").between(3000000L, 10000000L) &&
          col("sym_micro") <= 100000L &&
          col("alpha_micro") >= 800000L &&
          col("stop_hits") >= 2L).cast("long"))
  }

  /** Per-source distinctive vocabulary: for each source, the top-k
    * tokens by SHARE of that token's corpus-wide mass concentrated in
    * the source (`tf_source·10⁶ div tf_global` — a token appearing
    * ONLY in one source scores 10⁶, an evenly-spread token scores
    * 1/n_sources of that), hapax noise suppressed by `minCount`. The
    * "what makes this source different" report a mixture policy reads
    * before reweighting. Integer rational end to end; ties broken
    * (share DESC, tf_source DESC, token ASC) — a total order, so the
    * cut hash-gates. Plan: two map-side-combined count aggs (vocab-
    * keyed, never corpus-row shuffles), one vocab-keyed join, and the
    * custom [[graft.ops.TopK.perKey]] operator for the per-source cut
    * (streamed k-row heaps, ≤ |sources|·k rows out — no window
    * machinery over the full vocabulary).
    */
  def distinctiveTerms(docs: DataFrame, k: Int = 10, minCount: Long = 5,
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val bySource = toks.groupBy("source", "token")
      .agg(count(lit(1)).as("tf_source"))
    val global = bySource.groupBy("token")
      .agg(sum(col("tf_source")).as("tf_global"))
    val scored = bySource.join(global, "token")
      .filter(col("tf_source") >= minCount)
      .withColumn("share_micro", expr("tf_source * 1000000 div tf_global"))
    graft.ops.TopK.perKey(scored, Seq("source"),
        Seq(("share_micro", true), ("tf_source", true), ("token", false)), k)
      .select(col("source"), col("token"), col("tf_source"),
        col("tf_global"), col("share_micro"))
  }

  /** Explainable filtering: [[gopherRules]]' verdict with the FIRST
    * failing rule named per document — the audit log a production
    * curation pipeline keeps so every dropped doc is attributable
    * ("why did coverage fall 3 % this ingest?" is answerable by a
    * groupBy(reason), not a re-run). The rule ORDER is part of the
    * contract (a doc failing several rules reports the earliest), so
    * the reason strings are deterministic and the whole table
    * hash-gates. Same single-pass metric derivation as gopherRules —
    * one projection chain, no joins, no extra scan.
    */
  def filterReasons(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minWords: Int = 30,
      maxWords: Int = 100000): DataFrame =
    gopherRules(docs, textCol, idCol, minWords, maxWords)
      .select(col(idCol), col("keep"),
        when(col("n_words") < minWords, "too_few_words")
          .when(col("n_words") > maxWords, "too_many_words")
          .when(col("mwl_micro") < 3000000L || col("mwl_micro") > 10000000L,
            "word_length")
          .when(col("sym_micro") > 100000L, "symbol_ratio")
          .when(col("alpha_micro") < 800000L, "alpha_ratio")
          .when(col("stop_hits") < 2L, "stopwords")
          .otherwise("keep").as("reason"))

  /** Corpus-trained bigram language-model score per document — the
    * CCNet-style "LM filter" shape (score docs against a model trained
    * on the corpus itself / a reference corpus, drop the tail), with
    * the log-prob sum rationalized to INTEGER micro-units so the whole
    * table sits under the cross-engine hash gate:
    *
    *   p_micro(w1,w2) = ((c2(w1,w2) + 1) · 10⁶) div (c1(w1) + V)
    *   lm_micro(doc)  = (Σ p_micro over the doc's bigram stream)
    *                      div n_bigrams
    *
    * — add-one smoothing, average per-bigram transition likelihood
    * (higher = more typical of the corpus). All operands non-negative,
    * truncating div, no float anywhere.
    *
    * Plan at scale: token/bigram count tables are two map-side-combined
    * aggs; each doc's bigram stream joins the count tables on their
    * natural keys (hash shuffles on bigram/unigram — vocab-sized, not
    * corpus-sized, after the combine); V is a one-row broadcast. No
    * all-pairs anything; docs with < 2 tokens score 0, preserved by
    * the final left join.
    */
  def bigramLmScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    bigramLmScoreAgainst(docs, docs, textCol, idCol)

  /** [[bigramLmScore]] generalized to a SEPARATE training corpus —
    * score `docs` against counts trained on `trainDocs`. The add-one
    * smoothing extends to the cross-corpus case: a scored bigram or
    * unigram the training set never saw keeps count 0 via LEFT joins
    * (p_micro = 10⁶ div (c1 + V)), exactly the back-off the smoothing
    * formula prescribes — an inner join would silently DROP unseen
    * transitions from the average instead. With `trainDocs eq docs`
    * this degenerates to the self-trained t22 spelling (the coalesce
    * arms never fire), which is why [[bigramLmScore]] delegates here.
    */
  def bigramLmScoreAgainst(docs: DataFrame, trainDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def toBase(df: DataFrame) = df.select(col(idCol).as("id"),
        tokens(lower(col(textCol))).as("t"))
      .withColumn("n", size(col("t")))
    def toBigrams(base: DataFrame) = base.filter(col("n") >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, n - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val base = toBase(docs)
    val bigrams = toBigrams(base)
    val trainBase = toBase(trainDocs)
    val c2 = toBigrams(trainBase).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val unigrams = trainBase.select(explode(col("t")).as("w"))
    val c1 = unigrams.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .withColumnRenamed("w", "w1")
    val vocab = unigrams.agg(countDistinct(col("w")).as("v"))
    val perDoc = bigrams
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p_micro",
        expr("(coalesce(c2, 0L) + 1) * 1000000 div (coalesce(c1, 0L) + v)"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("s"))
    base.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("s div n_bigrams"), lit(0L)).as("lm_micro"))
  }

  /** Top-k collocations by pointwise mutual information — the
    * corpus-analytics staple (Church & Hanks 1990) for finding
    * multiword units ("new york", "machine learning") worth treating
    * as single tokens: rank adjacent bigrams by p(xy)/(p(x)p(y)).
    * PMI's log is monotone, so the RANKING needs no float anywhere —
    * the score is the integer rational `c_xy·N·10⁶ div (c_x·c_y)`
    * computed through DECIMAL(38) (Spark decimal `div` == DuckDB
    * HUGEINT `//` floor on positive operands, the d26 convention), so
    * every emitted score hash-gates and the top-k cutoff is exact
    * (ties break by the bigram itself). `minCount` suppresses the
    * classic PMI pathology — a hapax pair of two hapax words scores
    * maximal PMI on zero evidence.
    *
    * Plan at scale: bigram + unigram count tables are map-side-combined
    * aggs (vocab-sized after the combine); the score joins run on
    * vocab keys; N is a 1-row broadcast; the cutoff is a TakeOrdered,
    * never a global sort. Token/bigram spelling matches
    * [[bigramLmScoreAgainst]] exactly, so the two vocabularies agree.
    */
  def collocationsPmi(docs: DataFrame, k: Int = 20, minCount: Long = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val base = docs.select(col(idCol).as("id"),
        tokens(lower(col(textCol))).as("t"))
      .withColumn("n", size(col("t")))
    val bigrams = base.filter(col("n") >= 2)
      .select(explode(expr(
        "transform(sequence(0, n - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val c1 = base.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTotal = bigrams.agg(count(lit(1)).as("n_bigrams"))
    c2.filter(col("c_xy") >= minCount)
      .join(c1.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(c1.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .withColumn("pmi_micro",
        expr("CAST(CAST(c_xy AS DECIMAL(38,0)) * n_bigrams * 1000000" +
          " div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        col("pmi_micro"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, public): per doc,
    * the integer-rationalized log-ratio proxy between a TARGET-domain
    * LM and the general corpus LM —
    * `importance_micro = lm_target_micro − lm_corpus_micro` over the
    * shared bigram stream. Docs whose transitions look more like the
    * target than like the average corpus score positive and get
    * up-sampled; the standard data-selection move when you have a
    * small in-domain seed set and a 100 TB crawl. Both scores come
    * from [[bigramLmScoreAgainst]] (map-side-combined count tables,
    * vocab-keyed joins, the V broadcast being the only BNLJ), so the
    * whole weight table is integer-exact under the oracle gate.
    */
  def dsirWeights(docs: DataFrame, targetDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // ONE shared (id, w1, w2) narrow-string bigram stream scores both
    // LMs in a single doc-keyed aggregation (r16 verdict task 4: the
    // two bigramLmScoreAgainst arms each rebuilt the docs stream —
    // tokenize + explode twice — then re-joined by id). The corpus-LM
    // bigram counts derive from the SAME cached stream; only the two
    // unigram chains (c1 needs every token, not just bigram members)
    // still tokenize. Lazy persist, the t24 discipline: narrow
    // strings, no extra action, reclaimed at the session seam.
    def toBase(df: DataFrame) = df.select(col(idCol).as("id"),
        tokens(lower(col(textCol))).as("t"))
      .withColumn("n", size(col("t")))
    def toBigrams(base: DataFrame) = base.filter(col("n") >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, n - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigrams = toBigrams(toBase(docs)).persist()
    // target-LM count tables (trained on targetDocs)
    val trainT = toBase(targetDocs)
    val c2t = toBigrams(trainT).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2t"))
    val uniT = trainT.select(explode(col("t")).as("w"))
    val c1t = uniT.groupBy(col("w")).agg(count(lit(1)).as("c1t"))
      .withColumnRenamed("w", "w1")
    val vocabT = uniT.agg(countDistinct(col("w")).as("vt"))
    // corpus-LM count tables (trained on docs — c2 off the shared stream)
    val c2c = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2c"))
    val uniC = toBase(docs).select(explode(col("t")).as("w"))
    val c1c = uniC.groupBy(col("w")).agg(count(lit(1)).as("c1c"))
      .withColumnRenamed("w", "w1")
    val vocabC = uniC.agg(countDistinct(col("w")).as("vc"))
    val perDoc = bigrams
      .join(c2t, Seq("w1", "w2"), "left")
      .join(c1t, Seq("w1"), "left")
      .join(c2c, Seq("w1", "w2"), "left")
      .join(c1c, Seq("w1"), "left")
      .crossJoin(broadcast(vocabT))
      .crossJoin(broadcast(vocabC))
      .withColumn("p_t",
        expr("(coalesce(c2t, 0L) + 1) * 1000000 div (coalesce(c1t, 0L) + vt)"))
      .withColumn("p_c",
        expr("(coalesce(c2c, 0L) + 1) * 1000000 div (coalesce(c1c, 0L) + vc)"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_t")).as("st"), sum(col("p_c")).as("sc"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("st div n_bigrams"), lit(0L)).as("lm_target_micro"),
        coalesce(expr("sc div n_bigrams"), lit(0L)).as("lm_corpus_micro"),
        (coalesce(expr("st div n_bigrams"), lit(0L)) -
          coalesce(expr("sc div n_bigrams"), lit(0L))).as("importance_micro"))
  }

  /** One learned BPE merge: `step` is 1-based rank order. */
  private[graft] case class BpeMerge(step: Long, lhs: String, rhs: String,
      merged: String, pair_count: Long)

  /** BPE tokenizer MERGE TRAINING — the standard byte-pair-encoding
    * loop (count adjacent symbol pairs, merge the most frequent,
    * repeat) in its scale-correct VOCAB-TABLE formulation: the corpus
    * is touched exactly ONCE (the word-frequency aggregation); every
    * iteration after that runs on the vocab table (|V| rows — millions
    * at 100 TB, never the corpus), with pair counts weighted by word
    * frequency. Per iteration: one vocab-sized aggregation + a 1-row
    * argmax collect (ties broken (count desc, lhs, rhs) so training is
    * deterministic), then a literal in-place merge of the winning pair.
    *
    * Symbols are tracked as a sentinel-wrapped string
    * (U+001C sym U+001D per symbol): a literal `replace` of
    * `⟨lhs⟩⟨rhs⟩ → ⟨lhsrhs⟩` is then EXACTLY one greedy left-to-right
    * BPE merge pass — per-symbol sentinels mean no boundary characters
    * are shared between adjacent matches, so non-overlapping
    * left-to-right `replace` (same semantics in Spark and DuckDB)
    * cannot miss or double-apply a merge. The corpus must contain no
    * U+001C/U+001D — true of any sane text fixture, and ENFORCED here
    * (one cheap filter-assert riding the word aggregation): a
    * binary-ish document would otherwise silently corrupt the learned
    * merges rather than fail loudly.
    *
    * Returns (step, lhs, rhs, merged, pair_count) — all strings +
    * integers, so k full training iterations sit under the
    * cross-engine hash gate (the DuckDB oracle replays every iteration
    * as a generated CTE chain).
    */
  def bpeMerges(docs: DataFrame, k: Int, textCol: String = "text",
      lowercase: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession
    val S = "\u001C"; val E = "\u001D"
    // lowercase = false for byte-level pipelines: case-folding a
    // byte-remapped string would rewrite alphabet chars and corrupt the
    // byte mapping -- the caller folds case BEFORE the remap (t29b).
    val baseText = if (lowercase) lower(col(textCol)) else col(textCol)
    var vocab = docs
      .select(explode(tokens(baseText)).as("w"))
      .filter(col("w") =!= "")
      // sentinel guard: a word containing U+001C/U+001D would alias
      // the symbol delimiters and corrupt every later merge — fail
      // loudly here instead. assert_true returns NULL on success, so
      // the coalesce'd filter passes every clean row and the check
      // rides the existing aggregation scan (no extra pass).
      .filter(coalesce(
        assert_true(!col("w").rlike(s"[$S$E]"),
          concat(lit("bpeMerges: input contains the U+001C/U+001D sentinel bytes: "),
            col("w"))), lit(true)))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      // wrap every character: "the" -> ⟨t⟩⟨h⟩⟨e⟩
      .select(regexp_replace(col("w"), "(.)", s"$S$$1$E").as("s"), col("c"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    // ONE action per merge step: the pair-count argmax below reads
    // every partition of the current (freshly-persisted) vocab, so it
    // BOTH returns the merge and materializes the generation into the
    // cache — the separate materializing count() this loop used to run
    // made t25 two jobs per step for no extra information. The
    // previous generation (what the current one derives from by a
    // single replace) stays cached until the argmax returns, then is
    // freed; a mid-loop failure frees both via the try/finally.
    //
    // An INCREMENTAL variant (carry the pair-count table across steps,
    // fold in a ± delta from only the words containing the merged
    // pair) was tried in r17 and MEASURED 2.5× SLOWER (t25 2.0 → 4.9 s,
    // family t25/t29/t29b/t49 10.2 → 20.7 s official bench): the delta
    // still re-aggregates the full pair table per step (union +
    // groupBy — DataFrames cannot update keyed state in place), pays
    // TWO extra regex extractions over the affected words, and doubles
    // the per-step persist traffic. Reverted — the per-step cost here
    // is the vocab-sized regex scan, and the incremental bookkeeping
    // costs more than it saves at every scale where the vocab fits.
    var prevGen: DataFrame = null
    try {
      var step = 1
      while (step <= k) {
        val best = vocab
          .select(regexp_extract_all(col("s"), lit(s"$S([^$E]*)$E"), lit(1)).as("sy"),
            col("c"))
          .filter(size(col("sy")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(sy) - 2), j -> struct(sy[j] AS l, sy[j+1] AS r))")).as("p"),
            col("c"))
          .groupBy(col("p.l"), col("p.r")).agg(sum(col("c")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect() // bounded: ONE row per iteration
        // vocab is now fully cached; its parent generation can go
        if (prevGen != null) { prevGen.unpersist(blocking = false); prevGen = null }
        if (best.isEmpty) { step = k + 1 } // fully merged corpus: stop early
        else {
          val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += BpeMerge(step.toLong, l, r, l + r, cnt)
          val next = vocab
            .withColumn("s", replace(col("s"), lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E")))
            .persist()
          prevGen = vocab
          vocab = next
          step += 1
        }
      }
    } finally {
      if (prevGen != null) prevGen.unpersist(blocking = false)
      vocab.unpersist(blocking = false)
    }
    spark.createDataFrame(merges.toSeq)
  }

  /** Apply `merges` (in step order, as learned by [[bpeMerges]]) to the
    * corpus — the ENCODE half of the tokenizer: per document, the
    * whitespace-normalized lowercased text is sentinel-wrapped per
    * character and the k merges are replayed as a chain of literal
    * `replace`s, exactly the greedy left-to-right merge the trainer
    * used (per-symbol sentinels, see [[bpeMerges]]). Merges can never
    * span a word boundary because the single space BETWEEN words is
    * left unwrapped — the `⟨l⟩⟨r⟩` pattern requires the two symbols to
    * be adjacent, so one whole-document pass equals the per-word
    * replay.
    *
    * Scale shape: the merge table is k driver-side rows folded into
    * the PLAN as literals (a broadcast-weights map, not a join), so
    * encoding is one narrow codegen projection over the corpus — no
    * shuffle, no UDF. Output: idCol, n_words (whitespace tokens),
    * n_subwords (symbols after all merges; == n_chars of the squashed
    * words at k=0, monotonically non-increasing in k).
    */
  def bpeEncode(docs: DataFrame, merges: Seq[BpeMerge],
      textCol: String = "text", idCol: String = "doc_id",
      lowercase: Boolean = true): DataFrame = {
    val S = "\u001C"; val E = "\u001D"
    // same loud sentinel guard as the trainer: encoding a document that
    // contains the delimiter bytes would silently mis-merge
    val guarded = docs.filter(coalesce(
      assert_true(!col(textCol).rlike(s"[$S$E]"),
        concat(lit("bpeEncode: input contains the U+001C/U+001D sentinel bytes, doc "),
          col(idCol))), lit(true)))
    val folded = if (lowercase) lower(col(textCol)) else col(textCol)
    val base = regexp_replace(trim(folded), "[ \\t\\n\\f\\r]+", " ")
    val wrapped = regexp_replace(base, "([^ ])", s"$S$$1$E")
    val encoded = merges.sortBy(_.step).foldLeft(wrapped) { (acc, m) =>
      replace(acc, lit(s"$S${m.lhs}$E$S${m.rhs}$E"), lit(s"$S${m.merged}$E"))
    }
    guarded.select(
      col(idCol),
      tokenCount(col(textCol)).cast("long").as("n_words"),
      (length(encoded) - length(replace(encoded, lit(S), lit("")))).cast("long")
        .as("n_subwords"))
  }

  /** Train k merges with [[bpeMerges]] and immediately [[bpeEncode]]
    * the same corpus with them — the end-to-end tokenizer round trip
    * (train on the corpus, tokenize the corpus). */
  def bpeTrainEncode(docs: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      lowercase: Boolean = true): DataFrame = {
    val learned = bpeMerges(docs, k, textCol, lowercase).collect().map { r =>
      BpeMerge(r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))
    }.toSeq // bounded: k rows
    bpeEncode(docs, learned, textCol, idCol, lowercase)
  }

  // ---------------------------------------- persisted tokenizer artifact

  private def tokenizerParamsPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_tokenizer_params.json")

  /** True iff `path` carries the tokenizer sidecar — the loud-failure
    * marker the serve path checks (the text-index convention: a
    * directory that is not a graft tokenizer must never be served).
    */
  def isTokenizer(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    fs.exists(tokenizerParamsPath(path))
  }

  /** Train `k` merges on `docs` and persist them as the TOKENIZER
    * ARTIFACT — the ninth lifecycle family: production trains a
    * tokenizer once per corpus snapshot and every encode job for the
    * model's lifetime reads the artifact instead of re-running the k
    * corpus-pass training iterations. The artifact is the k-row merge
    * table (step order IS the replay order) plus a params sidecar
    * (k, lowercase) so a serve call can't silently apply the merges
    * under the wrong case-folding contract. There is deliberately no
    * update-in-place: merges are globally coupled (iteration i's
    * argmax depends on every prior merge), so the honest maintenance
    * operation is retrain-and-swap, exactly what a model retrain does.
    */
  def writeTokenizer(docs: DataFrame, path: String, k: Int,
      textCol: String = "text", lowercase: Boolean = true): Unit = {
    val spark = docs.sparkSession
    bpeMerges(docs, k, textCol, lowercase)
      .select(col("step"), col("lhs"), col("rhs"), col("merged"), col("pair_count"))
      .coalesce(1) // k rows — one file reads in one footer fetch
      .write.mode("overwrite").parquet(path)
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val out = fs.create(tokenizerParamsPath(path), true)
    out.write(s"""{"k":$k,"lowercase":$lowercase}""".getBytes("UTF-8"))
    out.close()
  }

  /** The persisted merge table of [[writeTokenizer]], in step order,
    * with its case-folding contract. Driver-side k rows by design —
    * encode folds them into the PLAN as literals (see [[bpeEncode]]).
    */
  def readTokenizer(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[BpeMerge], Boolean) = {
    require(isTokenizer(spark, path),
      s"$path has no _graft_tokenizer_params.json sidecar — not a graft tokenizer")
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val in = fs.open(tokenizerParamsPath(path))
    val params = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lowercase = params.contains("\"lowercase\":true")
    val merges = spark.read.parquet(path)
      .orderBy(col("step")).collect()
      .map(r => BpeMerge(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    (merges, lowercase)
  }

  /** Encode `docs` with a PERSISTED tokenizer — the serve half: k
    * artifact rows read driver-side, folded into one narrow codegen
    * replace-chain projection over the corpus (no shuffle, no join,
    * no retraining pass). Output and semantics identical to
    * [[bpeTrainEncode]] on the training corpus, which is exactly what
    * the t49 gate pins (serve(artifact) == from-scratch).
    */
  def bpeEncodeIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val (merges, lowercase) = readTokenizer(spark, path)
    bpeEncode(docs, merges, textCol, idCol, lowercase)
  }

  /** Frequency-threshold vocabulary coverage curve — the tokenizer /
    * vocab-sizing analytic: for each min-frequency cutoff f, the number
    * of distinct words with corpus count ≥ f (the vocab you'd keep),
    * the token occurrences those words cover, and the coverage as an
    * integer micro-fraction of all occurrences.
    *
    * Scale design: deliberately a THRESHOLD curve, not a top-k-rank
    * curve — rank-k coverage needs a total order over the vocabulary
    * (a vocab-sized single-task window at 100 TB, and the c=1 tie
    * group alone is half the vocab), while threshold coverage is pure
    * aggregation: one word-count groupBy (map-side combined), then a
    * cutoffs × count-histogram sized rollup. All integer, so the curve
    * hash-matches the oracle.
    */
  def vocabCoverage(docs: DataFrame, cutoffs: Seq[Long],
      textCol: String = "text"): DataFrame = {
    require(cutoffs.nonEmpty, "cutoffs must be non-empty")
    require(cutoffs.forall(_ >= 1L), "cutoffs must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus scan: word counts (map-side combined), collapsed to
    // the COUNT histogram before the cutoff join — (c, n_words,
    // occurrences) is count-value cardinality, not vocab cardinality,
    // so everything after the histogram never touches the corpus
    val hist = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("nw"), sum(col("c")).as("occ"))
    // cutoff 1 rides along even if not requested: every word has c >= 1,
    // so its covered == total occurrences — the denominator derived
    // from the SAME single-scan rollup instead of a second aggregation
    // over the corpus (a naive `counts.agg(sum)` sibling re-scans)
    val cutsAll = (cutoffs :+ 1L).distinct.sorted.toDF("cutoff")
    val rolled = hist.join(broadcast(cutsAll), col("c") >= col("cutoff"))
      .groupBy(col("cutoff"))
      .agg(sum(col("nw")).as("vocab_size"), sum(col("occ")).as("covered"))
    // frame = |cutoffs|+1 rows by construction — bounded, documented
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    rolled
      .withColumn("total",
        max(when(col("cutoff") === 1L, col("covered"))).over(w))
      .filter(col("cutoff").isin(cutoffs.distinct: _*))
      // decimal div: covered·10⁶ overflows a long past ~9·10¹² tokens
      .select(col("cutoff"), col("vocab_size"), col("covered"), col("total"),
        expr("cast((cast(covered as decimal(38,0)) * 1000000) div total as bigint)")
          .as("coverage_micro"))
  }

  /** CCNet-style per-language typicality bucketing over
    * [[bigramLmScore]]: rank every document within its language by LM
    * typicality (lm_micro desc, doc_id as the total tie-break) and cut
    * the ranking into `nBuckets` equal NTILE buckets — bucket 1 = the
    * "head" (most corpus-typical), bucket `nBuckets` = the "tail" a
    * curation pipeline drops or down-samples.
    *
    * Scale design — NO per-language global window. `ntile() OVER
    * (PARTITION BY lang)` puts an entire language in one task; at
    * 100 TB a dominant language is half the corpus, so that spelling
    * dies on the biggest partition. Instead the exact rank is assembled
    * from two bounded pieces (the t13 prefix-sum philosophy):
    *
    *   1. a (lang, lm_micro) HISTOGRAM — score cardinality, not corpus
    *      cardinality — whose cumulative counts give every doc the
    *      number of strictly-higher-scored docs in its language, via a
    *      window over histogram rows only;
    *   2. a row_number over (lang, lm_micro) — the tie group, which is
    *      score-collision-sized, never language-sized.
    *
    * rank = higher + tie_rn, and the NTILE bucket is then pure integer
    * arithmetic on (rank, langN): with q = N div n, rem = N mod n, the
    * first `rem` buckets take q+1 rows — bucket = ⌈r/(q+1)⌉ in the
    * oversized prefix, rem + ⌈(r − rem·(q+1))/q⌉ after. Identical to
    * SQL NTILE (gated against DuckDB's), with every exchange keyed on
    * (lang, lm_micro) or histogram-sized.
    */
  def lmTypicalityBuckets(docs: DataFrame, nBuckets: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    // persisted (lazily — no extra action, statistics kept): the
    // scored table feeds both the histogram chain and the final rank
    // join, and without the cache the whole bigram-LM pipeline behind
    // it is evaluated twice per query (r16: t24's plan carried 24
    // parquet scans). The session seam (Blocks.sweep) reclaims blocks.
    val scored = docs.select(col(idCol), col(langCol))
      .join(bigramLmScore(docs, textCol, idCol).select(col(idCol), col("lm_micro")),
        Seq(idCol))
      .persist()
    val hist = scored.groupBy(col(langCol), col("lm_micro"))
      .agg(count(lit(1)).as("_c"))
    val cumW = Window.partitionBy(col(langCol)).orderBy(col("lm_micro").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("_higher", coalesce(sum(col("_c")).over(cumW), lit(0L)))
      .withColumn("_langN",
        sum(col("_c")).over(Window.partitionBy(col(langCol))))
      .select(col(langCol), col("lm_micro"), col("_higher"), col("_langN"))
    val tieW = Window.partitionBy(col(langCol), col("lm_micro")).orderBy(col(idCol))
    scored.join(cum, Seq(langCol, "lm_micro"))
      .withColumn("_rank", col("_higher") + row_number().over(tieW))
      .withColumn("_q", expr(s"_langN div $nBuckets"))
      .withColumn("_rem", col("_langN") % nBuckets)
      // ceil(a/b) on non-negative longs = (a + b - 1) div b; the CASE
      // short-circuits, so _q = 0 (language smaller than nBuckets)
      // never reaches the ELSE's div _q — every rank sits in the
      // oversized prefix when rem = N
      .withColumn("bucket", expr(
        "CAST(CASE WHEN _rank <= _rem * (_q + 1) " +
          "THEN (_rank + _q) div (_q + 1) " +
          "ELSE _rem + (_rank - _rem * (_q + 1) + _q - 1) div _q END AS BIGINT)"))
      .select(col(idCol), col(langCol), col("lm_micro"), col("bucket"))
  }

  /** Character n-gram based language ID over a fixed marker table — the
    * classic stopword/diacritic heuristic. Scores each language by
    * marker-token hits; highest wins, 'en' on tie/none.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with", "for"),
    "de" -> Seq("der", "die", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "est", "et", "dans"),
    "es" -> Seq("el", "los", "es", "y", "con", "para"),
    "zh" -> Seq("的", "是", "在", "了", "和", "我"))

  def langId(text: Column): Column = langIdScored(text).getField("lang")

  /** [[langId]] plus its winning marker-hit count, as a
    * `struct(hits, lang)` — ties broken by largest language code
    * (struct ordering under `greatest`), 'en' when nothing matched.
    */
  def langIdScored(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = LangMarkers.toSeq.map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers: _*))).as("hits"),
        // zh rarely space-separates; also count substring occurrences
        (if (lang == "zh")
          markers.map(m => (length(text) - length(regexp_replace(text, m, ""))).cast("int"))
            .reduce(_ + _)
        else lit(0)).as("charHits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores.map(s => struct((s.getField("hits") + s.getField("charHits")).as("h"), s.getField("lang").as("lang"))): _*)
    struct(
      best.getField("h").cast("long").as("hits"),
      when(best.getField("h") > 0, best.getField("lang")).otherwise(lit("en")).as("lang"))
  }

  /** Sentence segmentation — the unit between lines and token windows:
    * chunking-for-RAG and per-sentence quality filters both want
    * sentence boundaries, not arbitrary token cuts. Terminator-greedy
    * split: each sentence is a maximal run of non-terminator chars
    * plus its run of terminators (`...` and `?!` stay attached to one
    * sentence), with an un-terminated trailing remnant kept as a final
    * sentence (dropping it would silently lose text). Abbreviation
    * handling (e.g., "Dr.") is a documented boundary — it needs a
    * lexicon, and the deterministic terminator rule is what both
    * engines can replay byte-identically (the pattern is RE2-safe:
    * alternation + anchors, no lookbehind — RE2 has none). Sentences
    * are space-trimmed; empty fragments dropped. One narrow codegen
    * pass, no shuffle.
    */
  def sentences(text: Column): Column =
    filter(
      transform(
        regexp_extract_all(text, lit("[^.!?]+[.!?]+|[^.!?]+$"), lit(0)),
        s => trim(s)),
      s => s =!= "")

  /** CCNet-style PER-LINE language identification — the mixed-language
    * handler document-level [[langId]] can't be: a crawl page with an
    * English navigation line around a German article gets the doc-level
    * argmax wrong for every line. Each line (any (idCol, pos, line)
    * segmentation works; callers usually pass documents and get
    * [[linesBySeparator]] applied here) is scored independently with
    * [[langIdScored]]; the doc-level label is the MAJORITY of line
    * labels (ties → larger language code, the same convention as the
    * scorer's own `greatest` tie-break), and `is_mixed` flags documents
    * whose lines disagree — the rows a CCNet pipeline routes to
    * per-line filtering instead of whole-doc keep/drop.
    *
    * Output: (idCol, pos, line_lang, line_hits, doc_lang, is_mixed),
    * one row per line. Shuffle profile: the line split is narrow
    * (posexplode); the majority needs one doc-keyed aggregation and one
    * doc-keyed join back — both on the same key, so AQE plans the join
    * without a second exchange of the aggregated (doc-sized) side.
    */
  def langIdByLine(docs: DataFrame, sep: String = "\n",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    langLineTable(docs, sep, textCol, idCol)
      .select(col(idCol), col("pos"), col("line_lang"), col("line_hits"),
        col("doc_lang"), col("is_mixed"))

  /** The per-line assignment table WITH the line text carried through —
    * shared by [[langIdByLine]] and [[dropMinorityLanguageLines]].
    *
    * r16 shape: the majority rollup rides two DOC-KEYED windows over
    * the scored lines instead of a two-level aggregation joined back —
    * the scorer (a per-language marker scan, the expensive part of the
    * whole operator) previously appeared on BOTH sides of that join
    * and was evaluated twice per line; the window form evaluates it
    * once and drops the join. Both windows partition by the document
    * key (a document's lines — KB-bounded), never corpus-wide.
    */
  private def langLineTable(docs: DataFrame, sep: String,
      textCol: String, idCol: String): DataFrame = {
    val lines = linesBySeparator(docs, sep, textCol, idCol)
    val scored = lines.select(col(idCol), col("pos"), col("line"),
      langIdScored(col("line")).as("s"))
      .select(col(idCol), col("pos"), col("line"),
        col("s").getField("lang").as("line_lang"),
        col("s").getField("hits").as("line_hits"))
    val wLang = Window.partitionBy(col(idCol), col("line_lang"))
    val wDoc = Window.partitionBy(col(idCol))
    scored
      .withColumn("c", count(lit(1)).over(wLang))
      .withColumn("doc_lang",
        max(struct(col("c"), col("line_lang"))).over(wDoc)
          .getField("line_lang"))
      .withColumn("is_mixed",
        size(collect_set(col("line_lang")).over(wDoc)) > 1)
      .drop("c")
  }

  /** The filtering CONSUMER of [[langIdByLine]] — CCNet's actual move:
    * keep only the lines agreeing with the document's majority
    * language and reassemble the survivors in order (the t12
    * reassembly shape: collect_list of (pos, line) structs +
    * sort_array — no corpus window). One row per input document;
    * `n_dropped` counts the removed lines and a doc whose every line
    * is majority-language passes through byte-identical. The line TEXT
    * rides the shared [[langLineTable]], so no re-split and no
    * (id, pos) join back — one doc-keyed reassembly aggregation over
    * the already-assigned lines.
    */
  def dropMinorityLanguageLines(docs: DataFrame, sep: String = "\n",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // r16: the shared [[langLineTable]] already carries the line text,
    // so the former re-split + (id, pos) join back is gone — one
    // scored-line pass feeds the reassembly directly
    langLineTable(docs, sep, textCol, idCol)
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep,
          transform(
            sort_array(collect_list(when(col("line_lang") === col("doc_lang"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("cleaned"),
        max(col("doc_lang")).as("doc_lang"),
        sum(when(col("line_lang") === col("doc_lang"), 0L).otherwise(1L))
          .cast("long").as("n_dropped"))
  }

  /** Rolling-hash document fingerprint: polynomial rolling hash over the
    * token-hash stream, mod 1e9+7 (keeps every intermediate < 2^35, so no
    * ANSI-mode overflow), order-sensitive.
    */
  def fingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(
      transform(tokens(text), t => pmod(xxhash64(t), p)),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, p))
  }

  /** Word-level shingles (n-grams) as space-joined strings; documents
    * shorter than n words yield their full token string.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** Out-of-vocabulary rate per document against the corpus's own
    * `topK` most-frequent tokens (ties broken by token) — the
    * rare-token quality signal a filtering pipeline thresholds on:
    * high OOV against a reasonable vocabulary flags gibberish, boiler
    * code, or wrong-domain text. Pure counting (no log-prob floats, so
    * the result is bit-reproducible cross-engine and sits under the
    * oracle gate). The vocabulary is `topK` rows and BROADCASTS — the
    * exploded token stream never shuffles for the membership probe;
    * the only wide stages are the vocabulary aggregation and the
    * per-doc grouping. Docs with no tokens yield no row (no tokens to
    * rate). Output: (idCol, n_oov, oov_rate ∈ [0,1] floor-scaled).
    */
  def oovRate(docs: DataFrame, topK: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val top = toks.groupBy("token").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(topK)
      .select(col("token"), lit(1).as("inVocab"))
    val oov = count(lit(1)) - sum(coalesce(col("inVocab"), lit(0)))
    toks.join(broadcast(top), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(oov.cast("long").as("n_oov"),
        (floor(oov.cast("double") / count(lit(1)) * 1e6) / 1e6).as("oov_rate"))
  }

  /** Within-document repetition (the Gopher-style "repetitious text"
    * quality filter): 1 − distinct/total word n-grams. Fully narrow —
    * total gram count is arithmetic on the token count
    * (`max(len − n + 1, 1)`, the same formula for the short-doc case
    * the shingle operators use) and the distinct count is the size of
    * the one-pass native shingle SET; no explode, no shuffle. dup_ratio
    * floor-scaled for cross-engine hash equality.
    */
  def repetitionRatio(docs: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    // RAW split length (no empty-text guard): the shingle machinery
    // derives its short-doc case from the raw token array, so the
    // instance count must come from the same array
    val nGrams = greatest(size(tokens(col(textCol))) - (n - 1), lit(1))
    val nDistinct = size(graft.functions.GraftFunctions.graftShingles(col(textCol), n))
    docs.select(col(idCol),
      nGrams.cast("long").as("n_grams"),
      nDistinct.cast("long").as("n_distinct"),
      (floor((lit(1.0) - nDistinct.cast("double") / nGrams) * 1e6) / 1e6).as("dup_ratio"))
  }

  // ------------------------------------------------- line-level dedup

  /** (idCol, pos, line) segmentation of each document on an explicit
    * separator — the natural segmentation for corpora with real line
    * structure (C4/CCNet remove boilerplate at newline granularity).
    */
  def linesBySeparator(docs: DataFrame, sep: String = "\n",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("col", "line")

  /** (idCol, pos, line) segmentation into fixed token windows — for
    * corpora WITHOUT line structure (a flat token stream still repeats
    * its boilerplate as identical windows). Narrow: the window split is
    * arithmetic over the token array, one posexplode total.
    */
  def linesByTokenWindow(docs: DataFrame, tokensPerLine: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(tokensPerLine > 0, "tokensPerLine must be positive")
    val toks = tokens(col(textCol))
    val nGroups = ceil(size(toks) / lit(tokensPerLine.toDouble)).cast("int")
    val lineArr = transform(sequence(lit(0), greatest(nGroups, lit(1)) - 1),
      i => concat_ws(" ", slice(toks, i * tokensPerLine + 1, lit(tokensPerLine))))
    docs.select(col(idCol), posexplode(lineArr))
      .withColumnRenamed("col", "line")
  }

  /** The corpus-level `(line, line_df)` document-frequency table behind
    * [[dropBoilerplateLines]] — persistable parquet exactly like
    * [[graft.ext.Dedup.shingleDfTable]]/`contaminationIndex`, so
    * ingest batches probe an artifact instead of re-aggregating the
    * corpus per call.
    */
  def lineDfTable(lines: DataFrame, idCol: String = "doc_id"): DataFrame =
    lines.groupBy(col("line")).agg(countDistinct(col(idCol)).as("line_df"))

  /** C4/CCNet-style boilerplate removal: drop every line occurring in
    * ≥ `minDf` distinct documents, reassemble the survivors in
    * document order. Takes any (idCol, pos, line) segmentation
    * ([[linesBySeparator]] or [[linesByTokenWindow]]). Output one row
    * per INPUT document — (idCol, cleaned, n_lines, n_removed) — a doc
    * that was pure boilerplate survives with `cleaned = ""`, so the
    * operator never silently drops rows (filtering is the caller's
    * policy decision).
    *
    * Shuffle profile: one line-keyed aggregation for the df table (the
    * corpus-scale stage — pass a persisted [[lineDfTable]] to skip
    * it), one line-keyed join, one per-doc aggregation. Reassembly is
    * collect_list of (pos, line) structs + sort_array — deterministic
    * order without a window over the whole corpus.
    */
  def dropBoilerplateLines(lines: DataFrame, minDf: Int, sep: String = "\n",
      idCol: String = "doc_id", dfTable: Option[DataFrame] = None): DataFrame = {
    val freq = dfTable.getOrElse(lineDfTable(lines, idCol))
    // a subset/stale df table must stay CONSERVATIVE the cheap way
    // round: a line missing from the table is UNKNOWN, keep it (df 1)
    val joined = lines.join(freq, Seq("line"), "left")
      .withColumn("keep", coalesce(col("line_df"), lit(1L)) < minDf)
    // collect_list skips nulls, so kept lines ride one aggregation and
    // the removed count falls out of the same pass
    joined.groupBy(col(idCol))
      .agg(
        concat_ws(sep,
          transform(
            sort_array(collect_list(when(col("keep"), struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("cleaned"),
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).cast("long").as("n_removed"))
  }

  /** The per-domain `(domain, line, line_df)` document-frequency table
    * — [[lineDfTable]] keyed by registrable domain. Site chrome
    * (navigation, footers, cookie banners) repeats WITHIN one domain
    * and nowhere else, so the corpus-wide table either misses it
    * (small sites never reach a global threshold) or needs a threshold
    * so low it eats real prose; CCNet's per-shard dedup is the same
    * idea — the domain key is its web-crawl instantiation. Persistable
    * parquet like [[lineDfTable]].
    */
  def domainLineDfTable(lines: DataFrame, idCol: String = "doc_id",
      domainCol: String = "domain"): DataFrame =
    lines.groupBy(col(domainCol), col("line"))
      .agg(countDistinct(col(idCol)).as("line_df"))

  /** [[dropBoilerplateLines]] scoped to a domain: drop every line seen
    * in ≥ `minDf` distinct documents OF THE SAME DOMAIN, reassemble
    * survivors in document order. `lines` must carry the domain column
    * alongside (idCol, pos, line); a cross-domain duplicate line is
    * deliberately NOT dropped here (that is t12's corpus-wide job —
    * the two operators compose). Same conservative unknown-line rule
    * and shuffle profile as the corpus-wide twin, with the df stage
    * keyed (domain, line) — at crawl scale that key never skews (a
    * domain's chrome vocabulary is KB-sized).
    */
  def dropDomainBoilerplate(lines: DataFrame, minDf: Int, sep: String = "\n",
      idCol: String = "doc_id", domainCol: String = "domain",
      dfTable: Option[DataFrame] = None): DataFrame = {
    val freq = dfTable.getOrElse(domainLineDfTable(lines, idCol, domainCol))
    val joined = lines.join(freq, Seq(domainCol, "line"), "left")
      .withColumn("keep", coalesce(col("line_df"), lit(1L)) < minDf)
    joined.groupBy(col(idCol), col(domainCol))
      .agg(
        concat_ws(sep,
          transform(
            sort_array(collect_list(when(col("keep"), struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("cleaned"),
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).cast("long").as("n_removed"))
  }

  /** Per-document top-k KEYWORDS by the [[tfidfCosineTopK]] integer
    * weight (saturated tf × rational milli-idf) — the doc-tagging /
    * index-summary op next to t44's per-SOURCE distinctive terms.
    * Exact longs rank (w desc, token asc), so the whole table
    * hash-gates; the cut is the custom TopKPerKey prune (one shuffle,
    * no corpus-wide window), rank re-derived per doc on the k
    * survivors only.
    */
  def docKeywords(docs: DataFrame, k: Int = 3, tfCap: Long = 100L,
      idfCap: Long = 100000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("doc_id", "token")
      .agg(least(count(lit(1)), lit(tfCap)).as("tfs"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = dfT.crossJoin(nDocs).select(col("token"),
      least(lit(idfCap), expr("(1000 * (n_docs + 1)) div (df + 1)")).as("idf"))
    val w = tf.join(idf, "token")
      .select(col("doc_id"), col("token"), (col("tfs") * col("idf")).as("w"))
    val cut = graft.ops.TopK.perKey(w, Seq("doc_id"),
      Seq(("w", true), ("token", false)), k)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w").desc, col("token"))
    cut.withColumn("rank", row_number().over(win).cast("long"))
  }

  // ------------------------------------------- repeated-span removal

  /** (idCol, pos, gram) sliding word n-grams per document — imperative
    * per-row emission on purpose: the declarative spelling —
    * posexplode(transform(sequence, i => concat_ws(slice(split(
    * text))))) — runs the nested lambda INTERPRETED, re-splitting the
    * text per gram (measured 20× slower than this one-pass loop, and
    * the grams stage feeds two consumers so it would run twice).
    */
  private def slidingGrams(docs: DataFrame, n: Int,
      textCol: String, idCol: String): DataFrame = {
    val base = docs.select(col(idCol), col(textCol))
    val gramSchema = org.apache.spark.sql.types.StructType(Seq(
      base.schema.head,
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("gram", org.apache.spark.sql.types.StringType)))
    base.mapPartitions { rows =>
      rows.flatMap { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        // same tokenization as tokens(): split of the trimmed text on the
        // explicit whitespace class (Java/RE2-identical spelling of \s+)
        val w = text.trim.split("[ \\t\\n\\f\\r]+")
        if (w.length < n) Iterator.empty
        else (0 to w.length - n).iterator.map { p =>
          org.apache.spark.sql.Row(r.get(0), p, w.slice(p, p + n).mkString(" "))
        }
      }
    }(org.apache.spark.sql.Encoders.row(gramSchema))
  }

  /** The `(gram)` set of word n-grams occurring in ≥ `minDocs` distinct
    * documents — [[removeRepeatedSpans]]' corpus-scale side as a
    * persistable parquet artifact (the contaminationIndex pattern:
    * compute once per corpus snapshot, probe per batch; same "as of
    * build" staleness semantics — spans repeated only via NEWER docs
    * stay until a rebuild).
    */
  def repeatedGramTable(docs: DataFrame, n: Int = 5, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minDocs > 1, "cross-doc threshold minDocs must be > 1")
    slidingGrams(docs, n, textCol, idCol)
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("gdf"))
      .filter(col("gdf") >= minDocs)
      .select(col("gram"))
  }

  /** Cross-document repeated-span removal — the removal half of
    * substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499), at token
    * granularity: every token covered by ANY word n-gram that occurs in
    * ≥ `minDocs` DISTINCT documents is cut, survivors reassembled in
    * order. Complements [[repetitionRatio]] (within-doc) and
    * [[dropBoilerplateLines]] (whole-line): this catches verbatim
    * cross-doc spans at arbitrary offsets, the license-header /
    * quoted-chunk case line boundaries miss.
    *
    * Shuffle profile: one gram-keyed df aggregation (corpus-scale,
    * map-side combined — SKIPPED entirely when a persisted
    * [[repeatedGramTable]] is passed as `repeatedGrams`), one
    * gram-keyed join of the instances, a coverage explode bounded by n
    * per repeated instance, and one per-doc reassembly aggregation.
    * Docs shorter than n tokens have no grams and pass through
    * untouched. Output one row per input doc:
    * (idCol, cleaned, n_tokens, n_removed).
    */
  def removeRepeatedSpans(docs: DataFrame, n: Int = 5, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id",
      repeatedGrams: Option[DataFrame] = None): DataFrame = {
    require(n > 0 && minDocs > 1, "need n > 0 and a cross-doc threshold minDocs > 1")
    val toks = docs.select(col(idCol),
      posexplode(tokens(col(textCol)))).withColumnRenamed("col", "tok")
      // split of an empty/whitespace-only doc yields one "" token — the
      // only way an empty token arises; dropping it keeps n_kept
      // consistent with the guarded n_tokens
      .filter(col("tok") =!= "")
    val grams = slidingGrams(docs, n, textCol, idCol)
    // the corpus-scale side — pass a persisted [[repeatedGramTable]] to
    // skip re-aggregating the corpus per batch
    val repeated = repeatedGrams.map(_.select(col("gram")))
      .getOrElse(repeatedGramTable(docs, n, minDocs, textCol, idCol))
    // covered token indices per doc: each repeated instance spans [p, p+n-1]
    val covered = grams.join(repeated, "gram")
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
    // reassemble in order; docs losing everything survive as "" (one
    // row per input doc — dropping rows is the caller's policy)
    docs.select(col(idCol),
        when(length(trim(col(textCol))) === 0, lit(0))
          .otherwise(size(tokens(col(textCol)))).cast("long").as("n_tokens"))
      .join(kept.groupBy(col(idCol))
        .agg(concat_ws(" ", transform(
            sort_array(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok"))).as("cleaned"),
          count(lit(1)).cast("long").as("n_kept")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cleaned"), lit("")).as("cleaned"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** PII scrubbing patterns — deliberately RE2-safe (no lookarounds, no
    * backrefs) so a Go/Rust/SQL scrubber replays them byte-identically;
    * the t10 gate pins exactly that. Narrow regexp_replace chain:
    * codegen'd, no UDF, no shuffle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact emails → `<EMAIL>`, then IPv4s → `<IP>`, then phone-like
    * runs → `<PHONE>`. Order matters and is part of the contract: an
    * email is redacted before its digits can look like a phone, and IPs
    * go BEFORE phones because [[PhonePattern]]'s separator class
    * includes `.`, so any dotted-quad of ≥ 8 chars also matches it —
    * phone-first would tag every IPv4 `<PHONE>`, scrubbing the data but
    * lying to any consumer that distinguishes PII classes. The oracle
    * applies the same sequence.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Extended-PII patterns (r13 verdict task 5) — the classes a
    * takedown/compliance pass is actually asked for beyond
    * email/phone/IP. All RE2-safe (no lookarounds, no backrefs) like
    * the t10 set, so any RE2 engine replays them byte-identically.
    *
    * [[CardPattern]] deliberately requires SEPARATED groups
    * (dddd-dddd-dddd-dddd or space-separated): an unseparated 16-digit
    * run can't be told from an order id by shape alone, and it is
    * still scrubbed downstream by [[PhonePattern]]'s ≥8-digit-run
    * stage — the data never leaks, only the class label coarsens.
    * Separated candidates are then VALIDATED (Luhn) before redaction,
    * so a dashed order-id that fails the checksum survives.
    */
  val SsnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val CardPattern = "[0-9]{4}([ -][0-9]{4}){3}"
  val IbanPattern = "[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}"

  private def nonEmptyChars(s: Column): Column =
    filter(split(s, ""), c => c =!= "")

  /** Luhn checksum over the digits of `s` (separators stripped): from
    * the rightmost digit, every second digit doubles (minus 9 above 9)
    * and the total must divide by 10. Pure codegen'd higher-order
    * built-ins (transform with index + aggregate) — no UDF; the oracle
    * replays the identical fold with DuckDB list lambdas.
    */
  def luhnValid(s: Column): Column = {
    val rev = reverse(nonEmptyChars(regexp_replace(s, "[^0-9]", "")))
    val total = aggregate(
      transform(rev, (d, i) => {
        val v = d.cast("long")
        when(i % 2 === 0, v)
          .otherwise(when(v * 2 > 9, v * 2 - 9).otherwise(v * 2))
      }),
      lit(0L), (acc, x) => acc + x)
    total % 10 === 0
  }

  /** IBAN mod-97 check (ISO 7064): move the first four chars to the
    * end, expand letters to two-digit values (A=10 … Z=35), and fold
    * the digit string left-to-right as (acc·10 + d) mod 97 — the
    * standard chunk-free spelling that never leaves long range. Valid
    * iff the remainder is 1.
    */
  def ibanValid(s: Column): Column = {
    val rearranged = concat(substring(s, 5, 64), substring(s, 1, 4))
    val expanded = array_join(
      transform(nonEmptyChars(rearranged),
        ch => when(ch >= "A" && ch <= "Z", (ascii(ch) - 55).cast("string"))
          .otherwise(ch)), "")
    aggregate(nonEmptyChars(expanded), lit(0L),
      (acc, d) => (acc * 10 + d.cast("long")) % 97) === 1
  }

  /** Redact every `pattern` match in `text` that passes `valid` with
    * `tag`: extract candidates, filter by the checksum, fold the
    * survivors through `replace`. The fold is over the (tiny)
    * candidate list per row — still a narrow codegen projection, no
    * shuffle, no UDF.
    */
  def redactValidated(text: Column, pattern: String,
      valid: Column => Column, tag: String): Column =
    aggregate(
      filter(regexp_extract_all(text, lit(pattern), lit(0)), valid),
      text, (acc, c) => replace(acc, c, lit(tag)))

  /** [[redactPii]] extended with checksum-validated credit cards
    * (Luhn), IBANs (mod-97), and SSN-shaped ids. Stage order is part
    * of the contract, extending t10's email → IP → phone reasoning:
    * cards and IBANs go BEFORE ssn/phone because a separated card is
    * also a ≥8-char digit-dash run ([[PhonePattern]] would tag it
    * `<PHONE>`) and an IBAN's digit tail is a plain digit run; SSN
    * goes before phone for the same reason. A candidate that FAILS
    * its checksum is left for the phone stage's digit-run scrubber —
    * scrubbed, but not mislabeled as a card/IBAN.
    */
  def redactPiiExtended(text: Column): Column = {
    val t1 = regexp_replace(text, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val t3 = redactValidated(t2, CardPattern, luhnValid, "<CARD>")
    val t4 = redactValidated(t3, IbanPattern, ibanValid, "<IBAN>")
    val t5 = regexp_replace(t4, SsnPattern, "<SSN>")
    regexp_replace(t5, PhonePattern, "<PHONE>")
  }

  /** Per-class redaction counts for [[redactPiiExtended]], each
    * counted on the progressively redacted text exactly as its stage
    * sees it (so an email's digits never count as a phone, and an
    * invalid card never counts as a card). Returns the six stage
    * counts in stage order.
    */
  def piiCountsExtended(text: Column): Seq[(String, Column)] = {
    val t1 = regexp_replace(text, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val t3 = redactValidated(t2, CardPattern, luhnValid, "<CARD>")
    val t4 = redactValidated(t3, IbanPattern, ibanValid, "<IBAN>")
    val t5 = regexp_replace(t4, SsnPattern, "<SSN>")
    Seq(
      "n_email" -> regexp_count(text, lit(EmailPattern)),
      "n_ip" -> regexp_count(t1, lit(Ipv4Pattern)),
      "n_card" -> size(filter(regexp_extract_all(t2, lit(CardPattern), lit(0)), luhnValid(_))),
      "n_iban" -> size(filter(regexp_extract_all(t3, lit(IbanPattern), lit(0)), ibanValid(_))),
      "n_ssn" -> regexp_count(t4, lit(SsnPattern)),
      "n_phone" -> regexp_count(t5, lit(PhonePattern)))
  }

  /** Whole-table extended-PII report: the [[redactPiiExtended]] chain
    * with every intermediate stage materialized ONCE as a column
    * (nested projections Catalyst keeps apart — each alias is
    * referenced more than once downstream and regex work is not
    * "cheap", so CollapseProject won't re-inline it), then the final
    * redacted text and all six per-class counts read the shared
    * stages. The naive spelling recomputes each count's whole prefix
    * chain per column — ~3× the regex work of this one.
    */
  def piiExtendedReport(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cardsOf = (t: Column) =>
      filter(regexp_extract_all(t, lit(CardPattern), lit(0)), luhnValid(_))
    val ibansOf = (t: Column) =>
      filter(regexp_extract_all(t, lit(IbanPattern), lit(0)), ibanValid(_))
    docs.select(col(idCol), col(textCol).as("_t0"))
      .withColumn("_t1", regexp_replace(col("_t0"), EmailPattern, "<EMAIL>"))
      .withColumn("_t2", regexp_replace(col("_t1"), Ipv4Pattern, "<IP>"))
      .withColumn("_cards", cardsOf(col("_t2")))
      .withColumn("_t3",
        aggregate(col("_cards"), col("_t2"), (acc, c) => replace(acc, c, lit("<CARD>"))))
      .withColumn("_ibans", ibansOf(col("_t3")))
      .withColumn("_t4",
        aggregate(col("_ibans"), col("_t3"), (acc, c) => replace(acc, c, lit("<IBAN>"))))
      .withColumn("_t5", regexp_replace(col("_t4"), SsnPattern, "<SSN>"))
      .select(col(idCol),
        regexp_replace(col("_t5"), PhonePattern, "<PHONE>").as("redacted"),
        regexp_count(col("_t0"), lit(EmailPattern)).cast("long").as("n_email"),
        regexp_count(col("_t1"), lit(Ipv4Pattern)).cast("long").as("n_ip"),
        size(col("_cards")).cast("long").as("n_card"),
        size(col("_ibans")).cast("long").as("n_iban"),
        regexp_count(col("_t4"), lit(SsnPattern)).cast("long").as("n_ssn"),
        regexp_count(col("_t5"), lit(PhonePattern)).cast("long").as("n_phone"))
  }

  /** Count of redactions [[redactPii]] performs, counted stage by stage
    * on the progressively redacted text (so a digit run inside an email
    * is never double-counted, and an IP never counts as a phone).
    */
  def piiCount(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    regexp_count(text, lit(EmailPattern)) +
      regexp_count(afterEmail, lit(Ipv4Pattern)) +
      regexp_count(afterIp, lit(PhonePattern))
  }

  // ------------------------------------------------ HTML extraction

  /** Decode decimal character references (`&#NNN;`) in the Latin-1
    * range 1–255 — the numeric half of [[htmlToText]]'s entity stage.
    * Codes above 255 (and malformed references) are left INTACT: Spark's
    * `char(n)` wraps at 256 while DuckDB's `chr(n)` is a Unicode
    * codepoint, so 1–255 is exactly the range where the two engines
    * agree byte-for-byte; outside it the conservative move for a
    * curation pipeline is to keep the reference visible rather than
    * decode it differently on different engines. Hex references
    * (`&#xNN;`) are likewise out of scope — rare in crawl HTML next to
    * the decimal + named-core forms, and documented as a boundary.
    *
    * Spelling: split on the literal `&#`, then each tail either starts
    * with `digits;` (decode + re-attach the remainder) or gets its
    * `&#` restored. Pure codegen'd built-ins (split/transform/concat)
    * — one narrow pass, no UDF, and DuckDB replays the identical
    * list-transform.
    */
  def decodeDecimalEntities(text: Column): Column = {
    val parts = split(text, java.util.regex.Pattern.quote("&#"), -1)
    val tails = transform(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))), p => {
      val digits = regexp_extract(p, "^([0-9]{1,3});", 1)
      val code = when(digits =!= "", digits.cast("int")).otherwise(lit(-1))
      when(code.between(1, 255),
        concat(call_function("char", code),
          p.substr(length(digits) + lit(2), length(p))))
        .otherwise(concat(lit("&#"), p))
    })
    concat(element_at(parts, 1), concat_ws("", tails))
  }

  /** HTML-to-text extraction — the stage zero of every web-crawl
    * curation pipeline (CommonCrawl → text before any of
    * [[dropBoilerplateLines]]/[[gopherRules]]/[[qualityScore]] apply):
    *
    *   1. remove `<script>`/`<style>` BLOCKS wholesale (their contents
    *      are code, not content — tag-stripping alone would leak them),
    *      and `<!-- comments -->`;
    *   2. strip every remaining tag (`<...>`, incl. doctype/closers);
    *   3. decode character references — decimal Latin-1
    *      ([[decodeDecimalEntities]]) first, then the named core set
    *      (`&nbsp; &lt; &gt; &quot; &apos;`), with `&amp;` LAST so
    *      `&amp;lt;` correctly yields the literal text `&lt;`;
    *   4. collapse whitespace runs to single spaces and trim.
    *
    * Decoding runs AFTER tag-stripping, so `&lt;b&gt;` survives as the
    * literal text `<b>` — the standard extractor contract (escaped
    * markup IS content). All patterns are RE2-safe (no lookarounds or
    * backrefs; `(?is)` + non-greedy only), so DuckDB replays the chain
    * byte-identically under the oracle gate. One narrow codegen
    * projection per document — no shuffle, linear at 100 TB.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(decodeDecimalEntities(noTags)) { case (acc, (ent, ch)) =>
        replace(acc, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r]+", " "))
  }

  /** One attribute-VALUE grammar shared by every HTML extractor here:
    * double-quoted, single-quoted, or unquoted (terminated by
    * whitespace / quote / `>`) — the three spellings real crawl HTML
    * actually uses. The single capture group INCLUDES the delimiters
    * (a group cannot span alternation arms); strip them with
    * [[stripAttrValueQuotes]] after extraction. RE2-safe, so the
    * identical alternation replays in DuckDB.
    */
  private[ext] val AttrValuePattern: String =
    "(\"[^\"]*\"|'[^']*'|[^\\s\"'>]+)"

  /** Drop the surrounding quotes of one [[AttrValuePattern]] capture —
    * the grammar guarantees matched delimiters, so a first-character
    * check suffices (and replays as a plain CASE/substr in SQL).
    */
  def stripAttrValueQuotes(v: Column): Column =
    when(v.startsWith("\"") || v.startsWith("'"),
      v.substr(lit(2), length(v) - 2)).otherwise(v)

  /** Href extraction from anchor tags — the OTHER half of crawl-page
    * processing next to [[htmlToText]]: the text feeds curation, the
    * links feed the frontier/link-graph. Returns the `href` values of
    * `<a>` tags (double-quoted, single-quoted, or unquoted values —
    * [[AttrValuePattern]] — any attribute order, any case, whitespace
    * around `=` tolerated) in document order; empty hrefs are kept for
    * the caller to filter (they are real anchors; only the quoted
    * spellings can be empty — an unquoted value needs ≥ 1 char). Pair
    * with [[graft.ext.UrlOps.canonicalizeUrl]]/`registrableDomain` for
    * the link graph — the t48 gate runs exactly that composition.
    */
  def htmlLinks(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("(?is)<a\\b[^>]*?href\\s*=\\s*" + AttrValuePattern + "[^>]*>"),
        lit(1)),
      v => stripAttrValueQuotes(v))

  /** Whole `<a href=...>text</a>` elements in document order — the
    * anchor-TEXT half of link harvesting ([[htmlLinks]] yields only
    * the hrefs): what a page's neighbors SAY about a target is the
    * classic relevance/quality signal a crawl ranks frontier URLs by.
    * Same three-spelling href grammar as [[htmlLinks]]
    * ([[AttrValuePattern]]), plus the anchor body up to the closing
    * tag restricted to markup-free text (`[^<]*` — nested elements are
    * the remaining documented boundary). Callers split each element
    * with [[anchorHref]] / [[anchorText]]; all three are
    * byte-replayable in any RE2 engine, which is what puts the t54
    * rollup under the hash gate.
    */
  def htmlAnchorElements(html: Column): Column =
    regexp_extract_all(html, lit(AnchorElementPattern), lit(0))

  /** The anchor-element grammar shared by both engines (group 1 =
    * href with its delimiters — strip with [[stripAttrValueQuotes]] —
    * group 2 = anchor text).
    */
  val AnchorElementPattern: String =
    "(?is)<a\\b[^>]*?href\\s*=\\s*" + AttrValuePattern + "[^>]*>([^<]*)</a>"

  /** Structured page metadata — title, meta description, canonical
    * URL: the three fields a crawl's PAGE TABLE carries next to the
    * extracted text (title for retrieval/display, description for
    * snippet quality signals, canonical for dedup — a page declaring
    * another URL canonical is the site itself saying "duplicate").
    * First match wins (document order — `regexp_extract` semantics in
    * both engines); no match yields `''`, never NULL. Attribute VALUES
    * follow the three-spelling [[AttrValuePattern]] grammar (the
    * name/rel selector values too); the name-before-content /
    * rel-before-href attribute order is the documented boundary (the
    * overwhelmingly common spelling).
    */
  val TitlePattern: String = "(?is)<title[^>]*>([^<]*)</title>"
  val MetaDescPattern: String =
    "(?is)<meta\\s[^>]*?name\\s*=\\s*[\"']?description[\"']?[\\s>][^>]*?content\\s*=\\s*" +
      AttrValuePattern + "[^>]*>"
  val CanonicalPattern: String =
    "(?is)<link\\s[^>]*?rel\\s*=\\s*[\"']?canonical[\"']?[\\s>][^>]*?href\\s*=\\s*" +
      AttrValuePattern + "[^>]*>"

  def pageTitle(html: Column): Column = regexp_extract(html, TitlePattern, 1)
  def pageMetaDescription(html: Column): Column =
    stripAttrValueQuotes(regexp_extract(html, MetaDescPattern, 1))
  def pageCanonical(html: Column): Column =
    stripAttrValueQuotes(regexp_extract(html, CanonicalPattern, 1))

  /** The `href` of one [[htmlAnchorElements]] element (delimiters
    * stripped).
    */
  def anchorHref(element: Column): Column =
    stripAttrValueQuotes(regexp_extract(element, AnchorElementPattern, 1))

  /** The text body of one [[htmlAnchorElements]] element. */
  def anchorText(element: Column): Column =
    regexp_extract(element, AnchorElementPattern, 2)

  /** WARC-style container ingestion — the step BEFORE [[htmlToText]] /
    * [[htmlLinks]]: explode each crawl-file row into its framed
    * records. One narrow pass per row through the codegen'd
    * Content-Length byte walk ([[graft.functions.WarcRecords]] — see
    * there for the framing contract and the prefix-keeping rejection
    * rule), then a `posexplode`; no shuffle, records ordered as framed.
    * Output keeps every input column except the container and adds
    * `rec_pos, rec_type, uri, content_length, payload`.
    */
  def warcRecords(pages: DataFrame, containerCol: String = "warc"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(pages.sparkSession)
    val keep = pages.columns.filterNot(_ == containerCol).map(col).toSeq
    pages
      .select(keep :+ posexplode(
        graft.functions.GraftFunctions.graftWarcRecords(col(containerCol))): _*)
      .withColumnRenamed("pos", "rec_pos")
      .select(keep ++ Seq(col("rec_pos").cast("long"),
        col("col.rec_type").as("rec_type"), col("col.uri").as("uri"),
        col("col.content_length").as("content_length"),
        col("col.payload").as("payload")): _*)
  }

  /** BM25-style query-relevance top-k over the corpus — the retrieval
    * primitive a curation pipeline uses for targeted filtering and
    * benchmark decontamination ("pull the k documents most relevant to
    * this eval prompt"). Scoring is a PURE-INTEGER rational BM25
    * (k1 = 2, b = 0):
    *
    *   sat(tf)  = (tf · 3·10⁶) div (tf + 2)            — the tf/(tf+k1)
    *              saturation, scaled to micro-units
    *   idf(df)  = min(idfCap, (10⁶ · (2N − 2df + 1)) div (2df + 1))
    *              — the BM25 (N−df+0.5)/(df+0.5) ratio in halves, no log
    *   score(d) = Σ_t (sat · idf) div 10⁶
    *
    * Every step is integer multiply/divide of positive longs, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree exactly and the
    * result sits under the hash gate with no float comparison anywhere
    * (the t08/t09 counting-signal principle). `idfCap` (default 10⁹,
    * i.e. rarer than ~1/500 of the corpus all weigh the same) bounds the
    * linear-in-N rational idf so `sat·idf ≤ 3·10¹⁵` never overflows a
    * long at ANY corpus size — the role log plays in textbook BM25.
    *
    * Scale shape: the broadcast-literal `isin(terms)` prune runs IN THE
    * SCAN (narrow, before any exchange), so the only data-sized shuffle
    * is the (doc, term) tf aggregation over rows that matched a query
    * term — for a selective query that is a sliver of the corpus. The
    * df/N statistics are term-cardinality-sized and broadcast back;
    * top-k is a TakeOrdered, never a global sort.
    */
  /** Exact-PHRASE occurrence search — the retrieval primitive
    * bag-of-words BM25 cannot express (and the shape benchmark
    * decontamination actually needs: "does this eval PROMPT appear
    * verbatim", not "do its words co-occur"). Token-sequence
    * semantics over the house whitespace tokenization (lowercased, so
    * it composes with [[bm25TopK]]'s convention): a hit at position p
    * means tokens p..p+k−1 equal the phrase. Returns one row per doc
    * with ≥ 1 hit: `(doc_id, n_hits, first_pos)` (0-based).
    *
    * Plan shape, the reason this scales: positions of NON-PHRASE
    * tokens never leave the scan — the per-word `token = w_i` filters
    * run against the exploded projection before any exchange, so the
    * k−1 adjacency semi-joins shuffle only the phrase words'
    * positions (corpus-frequency-of-w sized, not corpus sized), keyed
    * (doc_id, pos). Overlapping occurrences all count ("aaa" has two
    * "a a" hits) — the honest sliding-window contract, pinned by the
    * oracle's window replay.
    */
  def phraseOccurrences(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val words = phrase.map(_.toLowerCase)
    val p = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(lower(col(textCol)))))
      .toDF("doc_id", "pos", "tok")
    var cur = p.filter(col("tok") === words.head)
      .select(col("doc_id"), col("pos"))
    for (i <- 1 until words.length) {
      val pi = p.filter(col("tok") === words(i))
        .select(col("doc_id"), (col("pos") - i).as("pos"))
      cur = cur.join(pi, Seq("doc_id", "pos"), "left_semi")
    }
    cur.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("pos")).cast("long").as("first_pos"))
  }

  /** Within-window term CO-OCCURRENCE search — the proximity
    * generalization of [[phraseOccurrences]] (a phrase is the ordered
    * window-1 special case): a hit is a position pair `(pa, pb)` with
    * `termA` at pa, `termB` at pb and `|pb − pa| ≤ window`, unordered
    * — "vector NEAR merge" retrieval, the query shape between
    * bag-of-words BM25 (no position constraint) and exact phrase
    * (adjacency). One row per doc with ≥ 1 pair:
    * `(doc_id, n_pairs, min_span)`. All pairs count (two term-A
    * occurrences near one term-B yield two) — the honest contract the
    * oracle's pair replay pins.
    *
    * Plan shape, same argument as [[phraseOccurrences]]: the per-term
    * `token = w` filters run against the exploded projection before
    * any exchange, so only the two terms' positions (corpus term
    * frequency sized, not corpus sized) shuffle into the doc-keyed
    * equi-join; the window test is a post-join filter on the co-doc
    * pairs.
    */
  def proximityOccurrences(docs: DataFrame, termA: String, termB: String,
      window: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val (wa, wb) = (termA.toLowerCase, termB.toLowerCase)
    require(wa != wb, "proximity terms must differ")
    val p = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(lower(col(textCol)))))
      .toDF("doc_id", "pos", "tok")
    val a = p.filter(col("tok") === wa)
      .select(col("doc_id"), col("pos").as("pa"))
    val b = p.filter(col("tok") === wb)
      .select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .filter(abs(col("pb") - col("pa")) <= window)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pb") - col("pa"))).cast("long").as("min_span"))
  }

  /** Sparse tf-idf COSINE retrieval — the vector-space twin of
    * [[bm25TopK]] over the same inverted-index plan shape. Weights are
    * integer-rationalized (saturated tf times a rational milli-idf,
    * the t16 pattern): dot product, query norm² and document norm² are
    * EXACT longs, order-free under summation; the only float steps are
    * the final long→double casts and the correctly-rounded IEEE
    * sqrt/multiply/divide — bit-identical in any IEEE engine — and the
    * emitted rank key is the TRUNCATED micro-cosine, so no
    * rounding-sensitive float ever decides a row. Query terms absent
    * from the corpus drop out of the query vector (df = 0 ⇒ no posting
    * to weigh — the boundary a from-scratch replay shares). Returns
    * `(doc_id, dot, d2, cos_micro)` for the top k by
    * (cos_micro desc, doc_id).
    *
    * Scale shape: the df/idf table is token-keyed (the inverted-index
    * build — one corpus-sized token shuffle shared with the norm
    * pass); the dot product aggregates only rows whose token is in
    * the broadcast-literal query list; the top-k is a TakeOrdered,
    * never a global sort. This is the FROM-SCRATCH twin: at corpus
    * scale, build the [[writeTfidfIndex]] artifact once and serve
    * queries through [[tfidfCosineTopKAt]] — it touches only the
    * query terms' postings (t62b pins serve(index) == this).
    */
  def tfidfCosineTopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      tfCap: Long = 100L, idfCap: Long = 100000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("doc_id", "token")
      .agg(least(count(lit(1)), lit(tfCap)).as("tfs"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = dfT.crossJoin(nDocs).select(col("token"),
      least(lit(idfCap), expr("(1000 * (n_docs + 1)) div (df + 1)")).as("idf"))
    val w = tf.join(idf, "token")
      .select(col("doc_id"), col("token"),
        (col("tfs") * col("idf")).as("w"), col("idf"))
    val dnorm = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("d2"))
    val q2 = idf.where(col("token").isin(terms: _*))
      .agg(sum(col("idf") * col("idf")).as("q2"))
    val dot = w.where(col("token").isin(terms: _*))
      .groupBy("doc_id").agg(sum(col("idf") * col("w")).as("dot"))
    dot.join(dnorm, "doc_id").crossJoin(q2)
      .select(col("doc_id"), col("dot"), col("d2"),
        floor(col("dot").cast("double") /
          (sqrt(col("q2").cast("double")) * sqrt(col("d2").cast("double")))
          * 1e6).cast("long").as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("doc_id")).limit(k)
  }

  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      idfCap: Long = 1000000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .where(col("token").isin(terms: _*))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // one row per matched (doc, term) → df = plain row count per term
    val dfTable = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idfTable = dfTable.crossJoin(nDocs)
      .withColumn("idf", least(lit(idfCap),
        expr("(1000000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")))
      .select(col("token"), col("idf"))
    tf.join(broadcast(idfTable), "token")
      .withColumn("contrib",
        expr("(((tf * 3000000) div (tf + 2)) * idf) div 1000000"))
      .groupBy("doc_id").agg(sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** [[bm25TopK]] with the textbook LENGTH NORMALIZATION (k1 = 2,
    * b = 3/4) — long documents stop winning on raw term count. The
    * saturation denominator `tf + k1·(1−b + b·dl/avgdl)` rationalizes
    * to pure integers: with `A = avgdl` in CENTI-tokens
    * (`(Σdl·100) div N`, bounded ~10⁴ so no product overflows) and
    * `d = dl·100`,
    *
    *   sat = (6·A·tf·10⁶) div (2·A·tf + A + 3·d)
    *
    * equals `10⁶ · tf·(k1+1)/(tf + k1((1−b) + b·dl/avgdl))` to within
    * integer rounding, identically in both engines — full BM25 with
    * still NO float anywhere in the gate. Corpus stats (N, Σdl) ride
    * the same 1-row broadcast as n_docs; dl rides the tf aggregation
    * as a per-doc max (every token row of a doc carries the same
    * count, computed in the scan).
    */
  def bm25TopKNormalized(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      idfCap: Long = 1000000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val withDl = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("dl"),
      lower(col(textCol)).as("lc"))
    val toks = withDl.select(col("doc_id"), col("dl"),
        explode(tokens(col("lc"))).as("token"))
      .where(col("token").isin(terms: _*))
    val tf = toks.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfTable = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = withDl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val idfTable = dfTable.crossJoin(stats)
      .withColumn("idf", least(lit(idfCap),
        expr("(1000000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")))
      .withColumn("avgdl_c", expr("(sum_dl * 100) div n_docs"))
      .select(col("token"), col("idf"), col("avgdl_c"))
    tf.join(broadcast(idfTable), "token")
      .withColumn("sat",
        expr("(6 * avgdl_c * tf * 1000000) div (2 * avgdl_c * tf + avgdl_c + 3 * dl * 100)"))
      .withColumn("contrib", expr("(sat * idf) div 1000000"))
      .groupBy("doc_id").agg(sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  // ------------------------------------------------ persisted text index

  private def textParamsPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_text_params.json")

  /** True iff `path` carries the text-index sidecar — the loud-failure
    * marker every lifecycle entry point checks (a directory that is
    * not a graft text index must never be served, updated, or
    * swap-clobbered).
    */
  def isTextIndex(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    fs.exists(textParamsPath(path))
  }

  private def requireTextIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit =
    require(isTextIndex(spark, path),
      s"$path has no _graft_text_params.json sidecar — not a graft text index")

  /** (postings, docs) frames of a corpus — the build shape shared by
    * [[writeTextIndex]] and [[updateTextIndex]]'s fresh side. Postings
    * are (token, doc_id, tf, dl) at matched-(doc, term) grain — tf and
    * the doc length ride together so BOTH scoring variants serve from
    * the one artifact; the docs table is (doc_id, dl) at doc grain and
    * exists so corpus statistics stay EXACT under update/forget (a doc
    * with no tokens has no postings row but still counts in n_docs —
    * deriving stats from postings would silently drop it).
    */
  private[ext] def textIndexFrames(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val withDl = docs.select(col(idCol).cast("long").as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("dl"),
      lower(col(textCol)).as("lc"))
    val postings = withDl.select(col("doc_id"), col("dl"),
        explode(tokens(col("lc"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    (postings, withDl.select(col("doc_id"), col("dl")))
  }

  private def writeTextIndexAt(spark: org.apache.spark.sql.SparkSession,
      postings: DataFrame, docsT: DataFrame, path: String): Unit = {
    // column order pinned explicitly: the update path's anti joins move
    // their key to the front, and a rebuild must be file-comparable to
    // a fresh build (positional exceptAll in the specs, schema-stable
    // readers). Range-partitioned + sorted by token: parquet min/max
    // stats prune a query's term slice to a handful of files — serving
    // never scans the full postings
    postings.select(col("token"), col("doc_id"), col("tf"), col("dl"))
      .repartitionByRange(col("token"))
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(s"$path/postings")
    docsT.select(col("doc_id"), col("dl"))
      .write.mode("overwrite").parquet(s"$path/docs")
    docsT.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats")
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val out = fs.create(textParamsPath(path), true)
    try out.write("""{"v":1,"tokenizer":"ws"}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Persist the inverted index of a corpus — the SIXTH index-lifecycle
    * family (minhash / LSH / IVF / PQ / fuzzy-catalog / this):
    * `postings/` at matched-(doc, term) grain (token-range-partitioned
    * and sorted so a term predicate prunes to a file slice), `docs/` at
    * doc grain, `stats/` as the 1-row (n_docs, Σdl) broadcast side, a
    * sidecar marking the artifact. [[bm25ServeIndexed]] answers
    * retrieval/decontamination queries against it WITHOUT re-tokenizing
    * the corpus — at 100 TB the build is the one corpus-scale pass, and
    * every query after it touches only its term slice plus two
    * kilobyte-sized sides. Maintained at batch cost by
    * [[updateTextIndex]]/[[forgetTextIndex]] under the fuse-guarded
    * swap; `serve(index) == from-scratch` is the t36 hash gate.
    */
  def writeTextIndex(docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (postings, docsT) = textIndexFrames(docs, idCol, textCol)
    writeTextIndexAt(docs.sparkSession, postings, docsT, path)
  }

  /** [[bm25TopK]] served from a persisted [[writeTextIndex]] artifact:
    * identical integer-rational scoring (df of each query term is the
    * row count of its postings slice — the same number the from-scratch
    * pass derives, so the two paths are hash-equal), but the corpus
    * contribution is a PRUNED postings read (token pushdown into the
    * parquet scan) instead of a tokenize-everything pass. `normalized`
    * switches to [[bm25TopKNormalized]]'s length-normalized saturation,
    * served off the same artifact (dl rides the postings, avgdl comes
    * from `stats/`).
    */
  def bm25ServeIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int = 20, idfCap: Long = 1000000000L,
      normalized: Boolean = false): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    requireTextIndex(spark, path)
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = spark.read.parquet(s"$path/postings")
      .where(col("token").isin(terms: _*))
    val dfTable = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(s"$path/stats")
    val idfTable = dfTable.crossJoin(stats)
      .withColumn("idf", least(lit(idfCap),
        expr("(1000000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")))
      .withColumn("avgdl_c", expr("(sum_dl * 100) div n_docs"))
      .select(col("token"), col("idf"), col("avgdl_c"))
    val scored = tf.join(broadcast(idfTable), "token")
      .withColumn("contrib",
        if (normalized)
          expr("(((6 * avgdl_c * tf * 1000000) div " +
            "(2 * avgdl_c * tf + avgdl_c + 3 * dl * 100)) * idf) div 1000000")
        else expr("(((tf * 3000000) div (tf + 2)) * idf) div 1000000"))
    scored.groupBy(col("doc_id")).agg(sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Fold an ingest batch into a persisted text index WITHOUT
    * re-tokenizing the corpus: stale rows of re-ingested ids drop
    * first (their text may have changed — a stale posting would keep
    * scoring the old content), the batch tokenizes in one narrow pass,
    * stats recompute from the doc-grain table (exact, including
    * token-less docs), and the merged build promotes through the
    * fuse-guarded [[IndexLifecycle.swapIn]]. `update == rebuild` over
    * the grown corpus — supersede included — is spec-pinned.
    */
  def updateTextIndex(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    requireTextIndex(spark, path)
    val newIds = newDocs.select(col(idCol).cast("long").as("doc_id"))
    val keptP = spark.read.parquet(s"$path/postings")
      .join(newIds, Seq("doc_id"), "left_anti")
    val keptD = spark.read.parquet(s"$path/docs")
      .join(newIds, Seq("doc_id"), "left_anti")
    val (freshP, freshD) = textIndexFrames(newDocs, idCol, textCol)
    val rebuild = s"${path}_rebuild"
    writeTextIndexAt(spark, keptP.unionByName(freshP),
      keptD.unionByName(freshD), rebuild)
    graft.ext.IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Deletion propagation for a persisted text index: every posting and
    * doc row of the forgotten ids goes, stats recompute, the purged
    * build swaps in — `forget == rebuild(minus ids)` is spec-pinned.
    */
  def forgetTextIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, forgetIds: DataFrame, idCol: String = "doc_id"): Unit = {
    requireTextIndex(spark, path)
    val ids = forgetIds.select(col(idCol).cast("long").as("doc_id"))
    val keptP = spark.read.parquet(s"$path/postings")
      .join(ids, Seq("doc_id"), "left_anti")
    val keptD = spark.read.parquet(s"$path/docs")
      .join(ids, Seq("doc_id"), "left_anti")
    val rebuild = s"${path}_rebuild"
    writeTextIndexAt(spark, keptP, keptD, rebuild)
    graft.ext.IndexLifecycle.swapIn(spark, rebuild, path)
  }

  // ---------------------------------------------- persisted tf-idf index

  /** Build parameters of a persisted tf-idf index — baked into every
    * weight/norm in the artifact, so they ride a sidecar and serving
    * reads them from there (a call-site literal can't disagree with
    * the build).
    */
  case class TfidfParams(tfCap: Long, idfCap: Long)

  private def tfidfParamsPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_tfidf_params.json")

  /** True iff `path` carries the tf-idf sidecar — the loud-failure
    * marker every lifecycle entry point checks.
    */
  def isTfidfIndex(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    fs.exists(tfidfParamsPath(path))
  }

  private def requireTfidfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit =
    require(isTfidfIndex(spark, path),
      s"$path has no _graft_tfidf_params.json sidecar — not a graft tf-idf index")

  /** The [[TfidfParams]] sidecar of a persisted index. */
  def readTfidfIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[TfidfParams] = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    if (!fs.exists(tfidfParamsPath(path))) return None
    val in = fs.open(tfidfParamsPath(path))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(key: String) = s""""$key":(-?[0-9]+)""".r.findFirstMatchIn(txt).map(_.group(1))
    for { t <- field("tfCap"); i <- field("idfCap") }
      yield TfidfParams(t.toLong, i.toLong)
  }

  /** (tf grain, doc grain) of a corpus under the tf-idf model: the
    * SATURATED term-frequency rows `(doc_id, token, tfs)` — the only
    * per-document state the model needs (df/idf/norms are derived
    * corpus statistics, recomputed by every build so update/forget
    * stay exact) — and the doc-grain id table (a token-less doc has no
    * tf row but still counts in n_docs, the textIndexFrames rule).
    */
  private[ext] def tfidfGrainFrames(docs: DataFrame, tfCap: Long,
      idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val grain = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(least(count(lit(1)), lit(tfCap)).as("tfs"))
    (grain, ids)
  }

  private def writeTfidfIndexAt(spark: org.apache.spark.sql.SparkSession,
      grain: DataFrame, docIds: DataFrame, p: TfidfParams, path: String): Unit = {
    // corpus statistics re-derived from the grain on EVERY build: an
    // added/forgotten doc moves df of its tokens, which moves idf,
    // which moves the weight of every doc sharing those tokens — norms
    // are global by construction, so they recompute (integer-narrow
    // shuffles at token/doc cardinality; never a re-tokenize)
    val dfT = grain.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = docIds.agg(count(lit(1)).as("n_docs"))
    val idf = dfT.crossJoin(nDocs).select(col("token"),
      least(lit(p.idfCap), expr("(1000 * (n_docs + 1)) div (df + 1)")).as("idf"))
    val w = grain.join(idf, "token")
      .select(col("doc_id"), col("token"), col("tfs"),
        (col("tfs") * col("idf")).as("w"))
    val dnorm = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("d2"))
    // the norm DENORMALIZES onto each posting row (the dl-rides-the-
    // postings rule of the text index): a query then reads ONLY its
    // terms' slices — no doc-cardinality norms join at serve time
    val postings = w.join(dnorm, "doc_id")
      .select(col("token"), col("doc_id"), col("tfs"), col("d2"))
    postings
      .repartitionByRange(col("token"))
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(s"$path/postings")
    docIds.select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/docs")
    docIds.agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$path/stats")
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val out = fs.create(tfidfParamsPath(path), true)
    try out.write(
      s"""{"v":1,"tfCap":${p.tfCap},"idfCap":${p.idfCap},"tokenizer":"ws"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Persist the tf-idf vector-space index of a corpus — the ELEVENTH
    * index-lifecycle family (and the artifact [[tfidfCosineTopK]]'s
    * doc promised): `postings/` at (token, doc) grain carrying the
    * saturated tf AND the doc's norm² (token-range-partitioned and
    * sorted, so a term predicate prunes to a file slice), `docs/` at
    * doc grain (exact n_docs under token-less docs), `stats/` as the
    * 1-row broadcast side, the params sidecar marking the artifact.
    * [[tfidfCosineTopKAt]] answers cosine retrieval against it
    * touching ONLY the query terms' postings — at 100 TB the build is
    * the one corpus pass, and a per-query corpus pass is the
    * difference between serving and a batch job. Maintained at batch
    * cost by [[updateTfidfIndex]]/[[forgetTfidfIndex]] under the
    * fuse-guarded swap; `serve(index) == from-scratch` is the t62b
    * hash gate (t62's oracle, unchanged).
    */
  def writeTfidfIndex(docs: DataFrame, path: String, tfCap: Long = 100L,
      idfCap: Long = 100000L,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (grain, ids) = tfidfGrainFrames(docs, tfCap, idCol, textCol)
    writeTfidfIndexAt(docs.sparkSession, grain, ids,
      TfidfParams(tfCap, idfCap), path)
  }

  /** [[tfidfCosineTopK]] served from a persisted [[writeTfidfIndex]]
    * artifact: identical integer-rational weighting (df of each query
    * term is the row count of its postings slice — every posting of a
    * token lives in that slice, so it is the same number the
    * from-scratch pass derives; idf re-derives from it and the 1-row
    * stats side under the sidecar's caps) and the identical
    * IEEE-exact cosine finish, but the corpus contribution is a PRUNED
    * postings read with the doc norm riding each row — query cost is
    * the query terms' postings plus two kilobyte-sized sides,
    * independent of corpus size.
    */
  def tfidfCosineTopKAt(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    requireTfidfIndex(spark, path)
    val p = readTfidfIndexParams(spark, path).get
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = spark.read.parquet(s"$path/postings")
      .where(col("token").isin(terms: _*))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(s"$path/stats")
    val idf = dfT.crossJoin(stats).select(col("token"),
      least(lit(p.idfCap), expr("(1000 * (n_docs + 1)) div (df + 1)")).as("idf"))
    val q2 = idf.agg(sum(col("idf") * col("idf")).as("q2"))
    val dot = tf.join(broadcast(idf), "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("idf") * col("tfs") * col("idf")).as("dot"),
        max(col("d2")).as("d2"))
    dot.crossJoin(q2)
      .select(col("doc_id"), col("dot"), col("d2"),
        floor(col("dot").cast("double") /
          (sqrt(col("q2").cast("double")) * sqrt(col("d2").cast("double")))
          * 1e6).cast("long").as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("doc_id")).limit(k)
  }

  /** [[docKeywords]] served from a persisted [[writeTfidfIndex]]
    * artifact — the batch half of the t62b serve story (r15 verdict
    * "what's wrong" #3 named t65 next to t62 as the operators
    * recomputing corpus statistics per call; t62 got
    * [[tfidfCosineTopKAt]], this is t65's): the postings already hold
    * the corpus at SATURATED (doc, token, tf) integer grain, so
    * per-doc keyword extraction is one artifact scan — a token-count
    * df aggregation, the idf join under the sidecar's caps, and the
    * per-doc TopKPerKey cut — with NO corpus re-tokenize (at 100 TB
    * the raw-text explode pass is the cost; the integer grain is two
    * orders narrower). Exactness: df of a token is its slice's row
    * count and n_docs rides `stats/`, the same numbers the
    * from-scratch pass derives, so `serve(index) == from-scratch`
    * hash-gates under t65's unchanged oracle (t65b).
    */
  def docKeywordsAt(spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    requireTfidfIndex(spark, path)
    val p = readTfidfIndexParams(spark, path).get
    val tf = spark.read.parquet(s"$path/postings")
      .select(col("doc_id"), col("token"), col("tfs"))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(s"$path/stats")
    val idf = dfT.crossJoin(stats).select(col("token"),
      least(lit(p.idfCap), expr("(1000 * (n_docs + 1)) div (df + 1)")).as("idf"))
    val w = tf.join(idf, "token")
      .select(col("doc_id"), col("token"), (col("tfs") * col("idf")).as("w"))
    val cut = graft.ops.TopK.perKey(w, Seq("doc_id"),
      Seq(("w", true), ("token", false)), k)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w").desc, col("token"))
    cut.withColumn("rank", row_number().over(win).cast("long"))
  }

  /** Fold an ingest batch into a persisted tf-idf index WITHOUT
    * re-tokenizing the corpus: stale rows of re-ingested ids drop
    * first, the batch tokenizes in one narrow pass, df/idf/norms
    * re-derive from the merged tf grain (exact — see
    * [[writeTfidfIndexAt]]'s recompute note), and the merged build
    * promotes through the fuse-guarded [[IndexLifecycle.swapIn]].
    * Params come from the live sidecar and are rewritten unchanged;
    * `update == rebuild` over the grown corpus is spec-pinned.
    */
  def updateTfidfIndex(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    requireTfidfIndex(spark, path)
    val p = readTfidfIndexParams(spark, path).get
    val newIds = newDocs.select(col(idCol).cast("long").as("doc_id"))
    val keptG = spark.read.parquet(s"$path/postings")
      .join(newIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("token"), col("tfs"))
    val keptD = spark.read.parquet(s"$path/docs")
      .join(newIds, Seq("doc_id"), "left_anti")
    val (freshG, freshD) = tfidfGrainFrames(newDocs, p.tfCap, idCol, textCol)
    val rebuild = s"${path}_rebuild"
    writeTfidfIndexAt(spark, keptG.unionByName(freshG),
      keptD.unionByName(freshD), p, rebuild)
    graft.ext.IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Deletion propagation for a persisted tf-idf index: the forgotten
    * ids' grain and doc rows go, df/idf/norms re-derive, the purged
    * build swaps in — `forget == rebuild(minus ids)` is spec-pinned.
    */
  def forgetTfidfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, forgetIds: DataFrame, idCol: String = "doc_id"): Unit = {
    requireTfidfIndex(spark, path)
    val p = readTfidfIndexParams(spark, path).get
    val ids = forgetIds.select(col(idCol).cast("long").as("doc_id"))
    val keptG = spark.read.parquet(s"$path/postings")
      .join(ids, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("token"), col("tfs"))
    val keptD = spark.read.parquet(s"$path/docs")
      .join(ids, Seq("doc_id"), "left_anti")
    val rebuild = s"${path}_rebuild"
    writeTfidfIndexAt(spark, keptG, keptD, p, rebuild)
    graft.ext.IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Per-document text metrics via [[graft.functions.TextMetrics]] — ONE
    * pass over each text (the column-primitive formulation above is kept
    * for à-la-carte use; this fused path is ~5× faster and verified
    * equivalent in ExtSpec).
    */
  def analyze(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.graftTextMetrics(col("text")).as("m"))
      .select(
        col("doc_id"),
        col("m.n_tokens").as("n_tokens"),
        col("m.n_subwords").as("n_subwords"),
        col("m.n_chars").as("n_chars"),
        col("m.n_punct").as("n_punct"),
        when(col("m.n_tokens") === 0, lit(0.0))
          .otherwise(round6(col("m.stop_hits").cast("double") / col("m.n_tokens")))
          .as("stopword_ratio"),
        col("m.lang_pred").as("lang_pred"),
        col("m.fingerprint").as("fingerprint"),
        col("m.stop_hits").as("stop_hits"))
      .withColumn("quality", {
        val lenScore = least(col("n_chars").cast("double") / 500.0, lit(1.0))
        val punctScore = least(col("n_punct").cast("double") * 10.0 / greatest(col("n_tokens"), lit(1)), lit(1.0))
        val stopScore = least(
          when(col("n_tokens") === 0, lit(0.0))
            .otherwise(col("stop_hits").cast("double") / col("n_tokens")) * 5.0, lit(1.0))
        round6(lenScore * 0.5 + punctScore * 0.2 + stopScore * 0.3)
      })
      .drop("stop_hits")
  }

  /** Banned-term hits per document via the one-pass Aho-Corasick
    * expression ([[graft.functions.BlocklistCounts]]): (doc, pattern,
    * count) rows for every pattern with ≥ 1 greedy non-overlapping
    * occurrence — the C4-style blocklist primitive. ONE text scan per
    * row regardless of list size (the naive spelling is |patterns|
    * `instr` passes); counts follow SQL `replace()` semantics exactly,
    * so the t32 gate hash-compares every count. Narrow map + explode
    * at hit cardinality — no shuffle before the caller's presentation
    * sort.
    */
  def blocklistHits(docs: DataFrame, patterns: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs
      .select(col(idCol), posexplode(
        graft.functions.GraftFunctions.graftBlocklist(col(textCol), patterns))
        .as(Seq("pattern_id", "cnt")))
      .filter(col("cnt") > 0)
      .withColumn("pattern",
        element_at(lit(patterns.toArray), col("pattern_id") + 1))
      .select(col(idCol), col("pattern_id"), col("pattern"), col("cnt"))
  }
}
