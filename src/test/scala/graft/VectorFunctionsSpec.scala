package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("cosine of a vector with itself is 1") {
    val c = df2(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))
      .select(VectorFunctions.cosine("a", "b")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val c = df2(Seq(1f, 0f), Seq(0f, 1f))
      .select(VectorFunctions.cosine("a", "b")).as[Double].head()
    assert(c == 0.0)
  }

  test("dot matches manual sequential fold") {
    val a = Seq(0.1f, -0.2f, 0.3f)
    val b = Seq(0.4f, 0.5f, -0.6f)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val got = df2(a, b).select(VectorFunctions.dot("a", "b")).as[Double].head()
    assert(got == expected)
  }

  test("l2sq is zero for identical vectors and exact for known ones") {
    val df = Seq((Seq(1f, 2f), Seq(1.0, 2.0), Seq(4.0, 6.0))).toDF("a", "same", "far")
    assert(df.select(VectorFunctions.l2sq("a", "same")).as[Double].head() == 0.0)
    assert(df.select(VectorFunctions.l2sq("a", "far")).as[Double].head() == 25.0)
  }

  test("dot of mismatched-length arrays is null, like the zip_with fold") {
    val got = df2(Seq(1f, 2f, 3f), Seq(1f, 2f))
      .select(VectorFunctions.dot("a", "b")).collect().head
    assert(got.isNullAt(0))
  }

  test("signBucket encodes sign bits at requested dims") {
    val got = Seq(Tuple1(Seq(1f, -1f, 2f))).toDF("v")
      .select(VectorFunctions.signBucket("v", Seq(1, 2, 3))).as[String].head()
    assert(got == "101")
  }
}
