package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class JsonlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("documents round-trip through JSONL") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf}/documents.parquet")
    val dir = "file:" + Files.createTempDirectory("jsonl").toFile.getAbsolutePath + "/docs"
    Jsonl.writeJsonl(docs.select("doc_id", "text", "lang"), dir)
    val back = Jsonl.readJsonl(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text", "lang").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(key(back) == key(docs))
  }

  test("explicit schema skips inference and quarantines corrupt lines") {
    val dir = Files.createTempDirectory("jsonl_bad").toFile
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "good line"}""")
    w.println("""{"doc_id": oops not json""")
    w.println("""{"doc_id": 2, "text": "another good line"}""")
    w.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val df = Jsonl.readJsonl(spark, "file:" + dir.getAbsolutePath, Some(schema)).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).select(sum("doc_id")).head.getLong(0) == 3)
  }
}
