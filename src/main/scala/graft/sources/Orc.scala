package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the columnar alternative to parquet Spark ships
  * natively (orc-core is on every Spark classpath). Same engine
  * benefits as the parquet path: predicate pushdown and column pruning
  * reach the file reader, per-stripe min/max statistics prune splits,
  * and vectorized reading keeps the scan inside whole-stage codegen —
  * all free through `spark.read.orc`, nothing custom to maintain
  * (OrcSpec pins the pushdown actually reaching the scan).
  */
object Orc {

  def readOrc(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).orc(path)
      case None    => spark.read.orc(path)
    }

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
