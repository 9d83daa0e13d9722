package graft

import graft.operators.Salted
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {

  test("salted sum equals plain groupBy sum") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q"),
        col("l_orderkey"))
    val salted = Salted.sumByKey(li, "l_returnflag", col("q"), "total",
      saltBy = col("l_orderkey"), salt = 8)
      .orderBy("l_returnflag").collect().toSeq
    val plain = li.groupBy(col("l_returnflag")).agg(sum(col("q")).as("total"))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDecimal(1))) ==
      plain.map(r => (r.getString(0), r.getDecimal(1))))
  }
}
