package graft

import org.apache.spark.sql.functions._

/** Scratch main for environment probes during development. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.25)").as("q25"))
      .orderBy(col("l_returnflag"))
      .collect()
      .foreach(r => println(s"PCT ${r.getString(0)} ${r.getDouble(1)} ${r.getDouble(2)} ${r.getDouble(3)}"))
    spark.stop()
  }
}
