package graft.meta

import org.apache.spark.sql.SparkSession

/** Pre-flight validation before promoting files between tables: both
  * must agree on partition columns, schema and storage formats
  * (reference: metastore/TableMetadataValidator.scala:11-30).
  */
object TableMetadataValidator {

  def validate(srcDb: String, srcTable: String, trgDb: String, trgTable: String)(
      implicit spark: SparkSession): Unit = {
    val src = Meta.tableMeta(srcDb, srcTable)
    val trg = Meta.tableMeta(trgDb, trgTable)
    require(src.partitionColumnNames == trg.partitionColumnNames,
      s"partition columns differ: ${src.partitionColumnNames} vs ${trg.partitionColumnNames}")
    require(src.schema == trg.schema,
      s"schemas differ:\n${src.schema.treeString}\nvs\n${trg.schema.treeString}")
    require(src.storage.inputFormat == trg.storage.inputFormat,
      s"input formats differ: ${src.storage.inputFormat} vs ${trg.storage.inputFormat}")
    require(src.storage.outputFormat == trg.storage.outputFormat,
      s"output formats differ: ${src.storage.outputFormat} vs ${trg.storage.outputFormat}")
    require(src.storage.serde == trg.storage.serde,
      s"serdes differ: ${src.storage.serde} vs ${trg.storage.serde}")
  }
}
