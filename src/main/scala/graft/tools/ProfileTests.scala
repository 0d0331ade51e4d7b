package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TpchProject

/** Scratch profiler for the m04_data_tests pipeline (not part of the
  * driver contract; run manually: `runMain graft.tools.ProfileTests <sfDir>`).
  */
object ProfileTests {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val r = TpchProject.runner(dir)
    t("run +customer_order_metrics")(
      r.run(spark, select = Some("+customer_order_metrics")))
    t("run again (2nd)")(
      r.run(spark, select = Some("+customer_order_metrics")))
    val report = t("testReport plan build")(r.testReport(spark))
    t("testReport collect")(report.orderBy(col("test_id")).collect()
      .foreach(x => println("  " + x)))
    t("testReport collect 2nd")(report.orderBy(col("test_id")).count())
    spark.stop()
  }
}
