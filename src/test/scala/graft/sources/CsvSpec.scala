package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class CsvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("csv roundtrip with header + inferSchema preserves data") {
    val dir = "file:" + Files.createTempDirectory("csv").toFile.getAbsolutePath + "/nation"
    val nation = Tables.nation(spark, SparkTestSession.sf)
    Csv.writeCsv(nation, dir)
    val back = Csv.readCsv(spark, dir)
    assert(back.schema.fieldNames.toSeq == nation.schema.fieldNames.toSeq)
    assert(back.count() == nation.count())
    val a = nation.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
