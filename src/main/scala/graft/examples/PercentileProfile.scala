package graft.examples

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scratch profiler: q14 exact-percentile formulations (not part of the
  * public surface). `percentile` buffers every value per group in agg
  * state; the sort-based twin shuffles once, sorts within groups, and
  * interpolates from the two boundary rows per fraction.
  */
object PercentileProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.count()
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def agg() = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.5, 0.9))").as("p_qty"),
        expr("percentile(l_extendedprice, array(0.95))").as("p_price"))
      .select(col("l_returnflag"),
        round(element_at(col("p_qty"), 1), 6).as("p50_qty"),
        round(element_at(col("p_qty"), 2), 6).as("p90_qty"),
        round(element_at(col("p_price"), 1), 6).as("p95_price"))

    // sort-based: one row per (flag, metric, value); row_number + count
    // within (flag, metric); each target fraction interpolates from the
    // rows at floor(h) and ceil(h), h = (n-1)*f
    def sorted() = {
      val long = li.select(col("l_returnflag"),
          explode(array(
            struct(lit("qty").as("metric"), col("l_quantity").as("value")),
            struct(lit("price").as("metric"), col("l_extendedprice").as("value")))).as("mv"))
        .select(col("l_returnflag"), col("mv.metric").as("metric"), col("mv.value").as("value"))
      val w = Window.partitionBy(col("l_returnflag"), col("metric")).orderBy(col("value"))
      val wc = Window.partitionBy(col("l_returnflag"), col("metric"))
      val ranked = long
        .withColumn("i", row_number().over(w).cast("double") - 1)
        .withColumn("n", count(lit(1)).over(wc).cast("double"))
      def contrib(metric: String, f: Double) = {
        val h = (col("n") - 1) * lit(f)
        val weight = when(col("i") === floor(h),
            when(ceil(h) === floor(h), lit(1.0)).otherwise(ceil(h) - h))
          .when(col("i") === ceil(h), h - floor(h))
          .otherwise(lit(0.0))
        sum(when(col("metric") === metric, col("value") * weight).otherwise(lit(0.0)))
      }
      ranked.groupBy(col("l_returnflag"))
        .agg(
          round(contrib("qty", 0.5), 6).as("p50_qty"),
          round(contrib("qty", 0.9), 6).as("p90_qty"),
          round(contrib("price", 0.95), 6).as("p95_price"))
    }

    // warm both plans
    agg().write.format("noop").mode("overwrite").save()
    sorted().write.format("noop").mode("overwrite").save()
    (1 to 3).foreach(i => time(s"percentile agg #$i")(
      agg().write.format("noop").mode("overwrite").save()))
    (1 to 3).foreach(i => time(s"sort-based #$i")(
      sorted().write.format("noop").mode("overwrite").save()))
    println("equal: " + (agg().orderBy("l_returnflag").collect().toSeq ==
      sorted().orderBy("l_returnflag").collect().toSeq))
    spark.stop()
  }
}
