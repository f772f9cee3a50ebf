package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV source/sink with the reference's reader semantics (header +
  * inferSchema — reference src/test/scala/Test.scala:81-86).
  *
  * Schema inference costs an extra pass over the data; at 100 TB pass an
  * explicit schema via [[readCsv]]'s `schema` parameter instead.
  */
object Csv {

  def readCsv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read.format("csv").option("header", "true")
    schema match {
      case Some(s) => base.schema(s).load(path)
      case None    => base.option("inferSchema", "true").load(path)
    }
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
