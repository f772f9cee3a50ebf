package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — block-broadcast join + per-row
  * dot product with `zip_with`/`aggregate` (codegen'd higher-order
  * functions, no UDF). The scale path is LSH bucketing with random
  * hyperplanes: sign-bit signatures → equi-join on (table, bucket) so
  * only same-bucket vectors are compared; probing multiple tables
  * recovers recall, identical to the MinHash banding trade-off.
  */
object Similarity {

  /** Cast to double once; all arithmetic in f64 so results are
    * deterministic and engine-comparable.
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k neighbors for each query vector (brute force).
    * The corpus side is broadcast when small; at scale, partition the
    * corpus and take per-partition top-k then global top-k (the
    * `Window`+filter shape below already reduces per-partition before
    * the final shuffle thanks to AQE partial aggregation of rank).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits, hyperplane h_i
    * deterministic from (seed, i, dim index) via a hash-derived
    * pseudo-gaussian (sum of 4 uniform hashes, central-limit-ish).
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val v = asDouble(vec)
    val bitCols = (0 until bits).map { i =>
      // dot(v, h_i) where h_i(d) = hash(seed,i,d) mapped to [-0.5, 0.5]
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, d) => x * ((pmod(xxhash64(lit(seed), lit(i), d), lit(1000000L)).cast("double") / 1000000.0) - 0.5)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k: compare only vectors sharing an LSH bucket in at
    * least one of `tables` independent hash tables, then exact cosine +
    * rank within the candidate set.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      bitsPerTable: Int = 12, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String) = {
      val base = df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))
      val tableCols = (0 until tables).map(t =>
        struct(lit(t).as("table"),
          hyperplaneSignature(col(vecAs), dim, bitsPerTable, seed = 1000L + t).as("bucket")))
      base.select(col(idAs), col(vecAs), explode(array(tableCols: _*)).as("tb"))
        .select(col(idAs), col(vecAs), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    }
    val q = bucketed(queries, "query_id", "qv")
    val c = bucketed(corpus, "neighbor_id", "cv")
    val cand = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** All pairs with cosine ≥ minSim (embedding near-dup detection),
    * brute force; a < b.
    */
  def cosineDupPairs(vectors: DataFrame, minSim: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = vectors.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }
}
