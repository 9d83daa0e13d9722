package graft

import org.apache.spark.sql.functions._

/** Scratch main for environment probes during development. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
