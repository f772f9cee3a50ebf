package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the de-facto interchange format for LLM
  * training corpora (one document object per line).
  *
  * Schema inference reads the data twice; at 100 TB always pass the
  * explicit schema. Corrupt lines are kept, not dropped: PERMISSIVE mode
  * routes them to `_corrupt_record` when the column is declared, so a
  * pipeline can quarantine bad lines instead of silently shrinking.
  */
object Jsonl {

  def readJsonl(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.format("json").option("mode", "PERMISSIVE")
    schema match {
      case Some(s) => base.schema(s).load(path)
      case None    => base.load(path)
    }
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
