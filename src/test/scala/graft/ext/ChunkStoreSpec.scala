package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The chunk store — the content-defined-chunking index family
  * ([[Dedup.writeChunkIndex]]): artifact round trip, serve ==
  * from-scratch, lifecycle identities (update == rebuild, forget ==
  * rebuild-minus), the supersede rule, loud non-index failure, and
  * the serving plan's scale shape.
  */
class ChunkStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def docs = Tables.documents(spark, sf)

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def batchOf(df: DataFrame): DataFrame =
    df.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("EDIT >> "), col("text")).as("text"))

  test("artifact read-back == chunkTable recompute; sidecar carries the mask") {
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    Dedup.writeChunkIndex(docs, s"$root/ci", maskBits = 6)
    assert(Dedup.readChunkIndexParams(spark, s"$root/ci")
      .contains(Dedup.ChunkIndexParams(6)), "sidecar missing or wrong")
    assert(sameRows(Dedup.readChunkIndex(spark, s"$root/ci"),
      Dedup.chunkTable(docs, maskBits = 6)), "artifact != recompute")
  }

  test("serve(index) == from-scratch provenance; a doc quoting corpus content at a shifted offset is seen") {
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    Dedup.writeChunkIndex(docs, s"$root/ci")
    val batch = batchOf(docs)
    val served = Dedup.chunkProvenanceIndexed(spark, s"$root/ci", batch)
    assert(sameRows(served, Dedup.chunkProvenance(batch, docs)),
      "indexed serve != from-scratch")
    // the d34 property through the serving path: head-edited copies
    // (every byte offset shifted) still match most corpus chunks
    val agg = served.agg(sum("n_chunks").cast("long"), sum("n_seen").cast("long"))
      .head()
    assert(agg.getLong(1) * 2 > agg.getLong(0),
      s"shift-robust overlap too low: ${agg.getLong(1)} of ${agg.getLong(0)}")
  }

  test("supersede: a re-ingested id never sees its own previous content") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    // synthetic corpus with full control: A and B share no content
    val textA = (1 to 80).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 80).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    Dedup.writeChunkIndex(corpus, s"$root/ci")
    // re-ingest A UNEDITED under its own id: its stored rows are
    // superseded, B shares nothing — nothing may self-match
    val row = Dedup.chunkProvenanceIndexed(spark, s"$root/ci",
      Seq((1L, textA)).toDF("doc_id", "text")).head()
    assert(row.getLong(2) == 0L,
      s"self-match: doc saw its own stored chunks ($row)")
    // the same text under a FRESH id is fully seen (it matches doc 1's
    // rows, which are NOT superseded)
    val row2 = Dedup.chunkProvenanceIndexed(spark, s"$root/ci",
      Seq((99L, textA)).toDF("doc_id", "text")).head()
    assert(row2.getLong(1) > 0L && row2.getLong(1) === row2.getLong(2),
      s"fresh-id duplicate should be fully seen ($row2)")
  }

  test("update == rebuild(grown, superseded); forget == rebuild-minus; loud without sidecar") {
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    // batch = the held-out third PLUS a changed re-ingest of some base ids
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .unionByName(docs.filter(col("doc_id") % 6 === 1)
        .withColumn("text", concat(col("text"), lit(" appended tail"))))
    Dedup.writeChunkIndex(base, s"$root/ci")
    Dedup.updateChunkIndex(batch, s"$root/ci")
    val finalCorpus = docs.filter(col("doc_id") % 6 =!= 1)
      .unionByName(docs.filter(col("doc_id") % 6 === 1)
        .withColumn("text", concat(col("text"), lit(" appended tail"))))
    assert(sameRows(Dedup.readChunkIndex(spark, s"$root/ci"),
      Dedup.chunkTable(finalCorpus)), "update != rebuild")

    val forgetIds = docs.filter(col("doc_id") % 5 === 0).select("doc_id")
    Dedup.forgetChunkIndex(spark, s"$root/ci", forgetIds)
    val purged = finalCorpus.join(forgetIds, Seq("doc_id"), "left_anti")
    assert(sameRows(Dedup.readChunkIndex(spark, s"$root/ci"),
      Dedup.chunkTable(purged)), "forget != rebuild-minus")

    val bare = s"$root/not_an_index"
    docs.limit(2).write.mode("overwrite").parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Dedup.chunkProvenanceIndexed(spark, bare, batchOf(docs))
    }
    assert(e.getMessage.contains("sidecar"), s"wrong failure: ${e.getMessage}")
  }

  test("bounded probe: a corpus-sized batch fails loud, not with an executor OOM") {
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    Dedup.writeChunkIndex(docs, s"$root/ci")
    val eFrom = intercept[IllegalArgumentException] {
      Dedup.chunkProvenance(batchOf(docs), docs, maxProbeChunks = 1L)
    }
    assert(eFrom.getMessage.contains("maxProbeChunks"),
      s"wrong failure: ${eFrom.getMessage}")
    val eServed = intercept[IllegalArgumentException] {
      Dedup.chunkProvenanceIndexed(spark, s"$root/ci", batchOf(docs),
        maxProbeChunks = 1L)
    }
    assert(eServed.getMessage.contains("broadcast"),
      s"wrong failure: ${eServed.getMessage}")
    // the override admits the same batch the default admits
    assert(Dedup.chunkProvenanceIndexed(spark, s"$root/ci", batchOf(docs),
      maxProbeChunks = 100000000L).count() > 0)
  }

  test("chunkDedupStats: hand-checked keeper rule; artifact-fed stats == from-scratch") {
    import spark.implicits._
    // A and B share their text exactly; C is unique. Every chunk of B
    // loses the (doc_id, start) race to A's copy.
    val textA = (1 to 80).map(i => s"tok$i").mkString(" ")
    val textC = (1 to 80).map(i => s"other$i").mkString(" ")
    val corpus = Seq((1L, textA), (2L, textA), (3L, textC)).toDF("doc_id", "text")
    val stats = Dedup.chunkDedupStats(Dedup.chunkTable(corpus))
      .orderBy("doc_id").collect()
    assert(stats(0).getLong(1) == stats(0).getLong(2) &&
      stats(0).getLong(3) == stats(0).getLong(4), s"doc 1 must keep everything: ${stats(0)}")
    assert(stats(1).getLong(2) == 0L && stats(1).getLong(4) == 0L,
      s"doc 2 is a pure duplicate — keeps nothing: ${stats(1)}")
    assert(stats(2).getLong(1) == stats(2).getLong(2),
      s"doc 3 is unique — keeps everything: ${stats(2)}")
    // the persisted store feeds the same rollup
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    Dedup.writeChunkIndex(corpus, s"$root/ci")
    assert(sameRows(Dedup.chunkDedupStats(Dedup.readChunkIndex(spark, s"$root/ci")),
      Dedup.chunkDedupStats(Dedup.chunkTable(corpus))),
      "artifact-fed stats != from-scratch")
  }

  test("plan: serving never shuffles the corpus — broadcast semi probe, no sort-merge join") {
    val root = Files.createTempDirectory("graft_chunkstore").toFile.getAbsolutePath
    Dedup.writeChunkIndex(docs, s"$root/ci")
    val plan = Dedup.chunkProvenanceIndexed(spark, s"$root/ci", batchOf(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-keyed shuffle join in the serving plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
    assert(plan.contains("LeftSemi"), s"expected a semi probe:\n$plan")
  }
}
