package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

object SparkTestSession {
  // One shared session across all suites (sbt forks one test JVM).
  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_warehouse").toFile.getAbsolutePath
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}
