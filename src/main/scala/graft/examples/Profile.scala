package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{Dedup, TextOps}

/** Scratch profiler for hot queries (not part of the public surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    docs.count()
    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(transform(TextOps.shingles(col("text"), 3), s => xxhash64(s)))).as("shingle"))
    time("shingle gen + count")(sh.count())
    time("shingle gen x3")(Seq(1, 2, 3).foreach(_ => sh.count()))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("setSize"))
    time("sizes")(sizes.count())
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("interSize"))
    time("self-join+paircount")(inter.count())
    time("full d02")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
    time("full d02 again")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
    spark.stop()
  }
}
