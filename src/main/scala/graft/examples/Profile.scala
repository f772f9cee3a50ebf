package graft.examples

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.Dedup
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.graftShingles

/** Scratch profiler for hot queries (not part of the public surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    GraftFunctions.ensureRegistered(spark)
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    docs.count()
    val t = 0.5
    val sets = docs.select(col("doc_id").as("id"), graftShingles(col("text"), 3).as("set"))
      .withColumn("setSize", size(col("set")).cast("long"))
    time("sets")(sets.count())
    val sh = sets.select(col("id"), col("setSize"), explode(col("set")).as("shingle"))
    time("explode")(sh.count())
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val prefixLen = greatest(lit(1),
      (col("setSize") - ceil(lit(t) * col("setSize")) + 1).cast("int"))
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    val prefix = sh.join(freq, "shingle")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen)
      .select(col("id"), col("setSize"), col("shingle"))
    time("prefix (freq join + window)")(println("prefix rows: " + prefix.count()))
    val a = prefix.as("a"); val b = prefix.as("b")
    val cand = a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id")
        && least(col("a.setSize"), col("b.setSize")).cast("double") >=
           lit(t) * greatest(col("a.setSize"), col("b.setSize")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("cand join")(println("cand rows: " + cand.count()))
    val candD = cand.distinct()
    time("cand distinct")(println("cand distinct: " + candD.count()))
    time("full d02 (prefix strategy)")(
      Dedup.ngramJaccardPairs(docs, 3, t, prefixFilter = true).count())
    time("full d02 (naive strategy)")(Dedup.ngramJaccardPairs(docs, 3, t).count())
    // naive formulation for comparison
    val shN = sh.select("id", "shingle")
    val aN = shN.as("a"); val bN = shN.as("b")
    val interN = aN.join(bN, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("interSize"))
    time("naive self-join+paircount")(println("naive pairs: " + interN.count()))
    val sizes = sets.select(col("id"), col("setSize"))
    def naiveFull(szA: org.apache.spark.sql.DataFrame, szB: org.apache.spark.sql.DataFrame) = interN
      .join(szA.withColumnRenamed("id", "id_a").withColumnRenamed("setSize", "size_a"), "id_a")
      .join(szB.withColumnRenamed("id", "id_b").withColumnRenamed("setSize", "size_b"), "id_b")
      .withColumn("jaccard",
        col("interSize").cast("double") / (col("size_a") + col("size_b") - col("interSize")))
      .filter(col("jaccard") >= t)
    time("naive full (no hint)")(println("rows: " + naiveFull(sizes, sizes).count()))
    time("naive full (broadcast sizes)")(
      println("rows: " + naiveFull(broadcast(sizes), broadcast(sizes)).count()))
    time("naive full again (broadcast)")(
      println("rows: " + naiveFull(broadcast(sizes), broadcast(sizes)).count()))
    // vocab formulations: count+countDistinct (Expand) vs two-stage agg
    val tok = docs.select(col("doc_id"),
        explode(graft.ext.TextOps.tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
    def vocabExpand() = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    def vocabTwoStage() = tok.groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("tf"), count(lit(1)).as("df"))
    (1 to 3).foreach(i => time(s"vocab expand #$i")(vocabExpand().count()))
    (1 to 3).foreach(i => time(s"vocab two-stage #$i")(vocabTwoStage().count()))
    spark.stop()
  }
}
