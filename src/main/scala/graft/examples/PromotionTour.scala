package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.compact.Compactor
import graft.promotor.Promotor

/** End-to-end tour of table promotion + compaction through the public
  * API: build partitioned tables from the lineitem fixture, promote a
  * partition, overwrite a table, compact small files.
  * Run: `sbt "runMain graft.examples.PromotionTour"`.
  */
object PromotionTour {
  def main(args: Array[String]): Unit = {
    val wh = Files.createTempDirectory("ptour_wh").toFile.getAbsolutePath
    implicit val spark = GraftSession.builder("local[8]", 8)
      .config("spark.sql.warehouse.dir", wh).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch { case e: Throwable => println(s"  ! $name: $e"); false }
      println(f"${if (ok) "OK  " else "FAIL"} $name"); if (!ok) failed += 1
    }

    val root = "file:" + Files.createTempDirectory("ptour_data").toFile.getAbsolutePath
    val db = "tour"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("m", date_format(col("l_shipdate"), "yyyy-MM"))
      .where("m >= '2001-01'")
    li.withColumn("l_quantity", col("l_quantity") * 2)
      .write.partitionBy("m").option("path", s"$root/src").saveAsTable(s"$db.src")
    li.write.partitionBy("m").option("path", s"$root/trg").saveAsTable(s"$db.trg")

    def q(t: String, m: String) = spark.table(s"$db.$t")
      .where(s"m = '$m'").agg(sum("l_quantity")).head().getDouble(0)

    check("partition promote doubles the quantity") {
      val before = q("trg", "2001-05")
      Promotor.copyOverwritePartitions(db, "src", db, "trg", Seq("2001-05"))
      q("trg", "2001-05") == 2 * before
    }
    check("other partitions untouched") { q("trg", "2001-04") == q("src", "2001-04") / 2 }
    check("compaction preserves rows") {
      val dir = s"$root/compactme"
      li.repartition(12).write.parquet(dir)
      val before = spark.read.parquet(dir).count()
      Compactor.doAutoCoalesce(dir, 100) == 1 && spark.read.parquet(dir).count() == before
    }

    spark.stop()
    if (failed > 0) { println(s"$failed FAILED"); sys.exit(1) }
    println("PromotionTour: all checks passed")
  }
}
