package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopK

/** The custom heap-based operator must agree with the composable
  * window row_number() formulation on real data.
  */
class TopKPerKeySpec extends SparkSpec {

  test("TopK.perKey equals window row_number <= k") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val got = TopK.perKey(o, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 5)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    assert(got == expected)
  }

  test("TopK.perKey with k larger than group size returns whole groups") {
    val o = Tables.orders(spark, sf).limit(7)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val got = TopK.perKey(o, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 1000)
    assert(got.count() == 7)
  }
}
