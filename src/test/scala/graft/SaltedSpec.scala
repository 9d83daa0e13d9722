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

  test("q3's revenue aggregation under synthetic orderkey skew: salted equals plain") {
    import spark.implicits._
    // 90% of rows hit ONE hot orderkey — the shape that routes a hot
    // key's whole volume to a single reducer in a plain groupBy. AQE's
    // skew handling covers joins, not aggregations; Salted is the
    // aggregation-side fix, and it must be EXACTLY equivalent (decimal
    // revenue, so no float reassociation slack).
    val rows = (1 to 20000).map { i =>
      val key = if (i % 10 != 0) 1L else (i % 997).toLong + 10L
      (key, (i % 50) + 1, 0.01 * (i % 100) + 1.0)
    }
    val df = rows.toDF("l_orderkey", "l_quantity", "l_extendedprice")
      .select(col("l_orderkey"),
        (col("l_quantity") * col("l_extendedprice")).cast("decimal(18,4)").as("rev"))
    val salted = Salted.sumByKey(df, "l_orderkey", col("rev"), "revenue",
      saltBy = col("rev"), salt = 16)
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap
    val plain = df.groupBy(col("l_orderkey")).agg(sum(col("rev")).as("revenue"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap
    assert(salted == plain)
    // the hot key really is hot (the test exercises the skew path, not
    // a uniform corpus), and survives salting exactly
    assert(rows.count(_._1 == 1L) > rows.length / 2)
    assert(salted(1L) == plain(1L))
  }

  test("hotLookupJoin equals the plain join on random skewed data (all salt/threshold corners)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def samples[T](g: Gen[T], seed: Long): Seq[T] =
      Seq.tabulate(120)(i => g.apply(Gen.Parameters.default, Seed(seed * 1000 + i))).flatten
    // fact keys Zipf-ish: key 1 dominates, a handful of cold keys, and
    // key 99 appears only in the dict (never matched)
    val keyGen = Gen.frequency((8, Gen.const(1L)), (3, Gen.chooseNum(2L, 9L)))
    for (seed <- 0 until 3) {
      val factRows = samples(Gen.zip(keyGen, Gen.chooseNum(0L, 500L)), seed)
        .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      val fact = factRows.toDF("k", "v", "rid").repartition(5, col("rid"))
      // dict = per-key fact row count (the df join-back contract:
      // unique keys, value = probe-side multiplicity) + an unmatched key
      val dict = fact.groupBy(col("k")).agg(count(lit(1)).as("df"))
        .unionByName(Seq((99L, 1L)).toDF("k", "df"))
      val total = fact.agg(count(lit(1)).as("n"))
      val plain = fact.join(dict, Seq("k"))
        .select("k", "v", "rid", "df").collect().toSet
      // corners: everything hot (hotInv huge), nothing hot (hotInv=1
      // can only mark a key with df == total), mixed, salt = 1
      for ((hotInv, salt) <- Seq((1000, 8), (1, 8), (4, 8), (4, 1))) {
        val got = Salted.hotLookupJoin(fact, dict, "k", "df", total, "n",
          saltBy = col("rid"), hotInv = hotInv, salt = salt)
          .select("k", "v", "rid", "df").collect().toSet
        assert(got == plain,
          s"seed=$seed hotInv=$hotInv salt=$salt diverged from the plain join")
      }
    }
  }

  test("reserved intermediate columns in the input are rejected loudly") {
    // ADVICE r10: an input already carrying __salt / __c / __p_<name>
    // would be silently clobbered or mis-grouped — reject instead
    import spark.implicits._
    val withSalt = Seq((1L, 2L, 3.0)).toDF("k", "__salt", "v")
    val e1 = intercept[IllegalArgumentException] {
      Salted.sumByKey(withSalt, "k", col("v"), "total", saltBy = col("k"))
    }
    assert(e1.getMessage.contains("__salt"), e1.getMessage)
    val withPartial = Seq((1L, 2L, 3.0)).toDF("k", "__p_total", "v")
    val e2 = intercept[IllegalArgumentException] {
      Salted.countAndSumsByKey(withPartial, "k", Seq(col("v") -> "total"), "n",
        saltBy = col("k"))
    }
    assert(e2.getMessage.contains("__p_total"), e2.getMessage)
    // clean inputs still pass
    val ok = Salted.countAndSumsByKey(
      Seq((1L, 2.0), (1L, 3.0)).toDF("k", "v"), "k",
      Seq(col("v").cast("decimal(18,2)") -> "total"), "n", saltBy = col("v"))
      .collect()
    assert(ok.length == 1 && ok(0).getLong(1) == 2L)
  }
}
