package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Conf-override validation (ADVICE r6/r7): a bad `graft.pack.bucket`
  * or `graft.lsh.signBits` must fail loudly at parse time — never
  * `div 0` null buckets or a confusing element_at error mid-plan.
  */
class ConfValidationSpec extends SparkSpec {

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("graft.pack.bucket rejects zero, negatives, and non-numerics") {
    for (bad <- Seq("0", "-5", "abc")) withConf("graft.pack.bucket", bad) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("t10_pack")(spark, sf).collect()
      }
      assert(e.getMessage.contains("graft.pack.bucket"), s"message for '$bad': ${e.getMessage}")
    }
  }

  test("graft.pack.bucket override does not change t10's output (bucketing-invariant offsets)") {
    val default = SparkEntry.queries("t10_pack")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    withConf("graft.pack.bucket", "17") {
      val overridden = SparkEntry.queries("t10_pack")(spark, sf)
        .orderBy("doc_id").collect().toSeq
      assert(overridden === default)
    }
  }

  test("graft.lsh.signBits rejects out-of-range and non-numeric widths") {
    for (bad <- Seq("0", "65", "-1", "wide")) withConf("graft.lsh.signBits", bad) {
      val e = intercept[IllegalArgumentException] {
        VectorFunctions.sessionSignDims(spark)
      }
      assert(e.getMessage.contains("graft.lsh.signBits") || e.getMessage.contains("bits"),
        s"message for '$bad': ${e.getMessage}")
    }
  }

  test("graft.stream.partitions rejects non-positive and non-numeric values") {
    for (bad <- Seq("0", "-2", "many")) withConf("graft.stream.partitions", bad) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("st2_stream_dedup")(spark, sf).collect()
      }
      assert(e.getMessage.contains("graft.stream.partitions"), s"message for '$bad': ${e.getMessage}")
    }
  }

  test("graft.topk.partial rejects non-boolean values") {
    withConf("graft.topk.partial", "maybe") {
      val e = intercept[Exception] {
        graft.plans.TopK.perKey(
          Tables.orders(spark, sf).select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
          Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("graft.topk.partial")), e.toString)
    }
  }

  test("graft.lsh.signBits accepts a valid width; default is 8 bits") {
    assert(VectorFunctions.sessionSignDims(spark) === VectorFunctions.defaultSignDims)
    withConf("graft.lsh.signBits", "16") {
      assert(VectorFunctions.sessionSignDims(spark).size === 16)
    }
  }

  test("graft.frame.bucket rejects zero, negatives, and non-numerics") {
    for (bad <- Seq("0", "-3", "wide")) withConf("graft.frame.bucket", bad) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("m2_frame_sample")(spark, sf).collect()
      }
      assert(e.getMessage.contains("graft.frame.bucket"), s"message for '$bad': ${e.getMessage}")
    }
  }

  test("graft.frame.bucket override does not change m2's output (bucketing-invariant ranks)") {
    val default = SparkEntry.queries("m2_frame_sample")(spark, sf)
      .orderBy("user_id", "frame_idx").collect().toSeq
    withConf("graft.frame.bucket", "1000003") {
      assert(SparkEntry.queries("m2_frame_sample")(spark, sf)
        .orderBy("user_id", "frame_idx").collect().toSeq === default)
    }
  }

  test("graft.bucket.n rejects zero, negatives, and non-numerics") {
    for (bad <- Seq("0", "-1", "lots")) withConf("graft.bucket.n", bad) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q27_bucketed_join")(spark, sf).collect()
      }
      assert(e.getMessage.contains("graft.bucket.n"), s"message for '$bad': ${e.getMessage}")
    }
  }

  test("graft.bucket.n override does not change q27's output (bucketing is layout, not semantics)") {
    val default = SparkEntry.queries("q27_bucketed_join")(spark, sf).collect().toSeq
    withConf("graft.bucket.n", "4") {
      assert(SparkEntry.queries("q27_bucketed_join")(spark, sf).collect().toSeq === default)
    }
    // restore the default-bucketed external tables for later suites
    SparkEntry.queries("q27_bucketed_join")(spark, sf).collect()
  }

  test("Verify refuses to emit oracle SQL under an oracle-breaking conf override") {
    // the s2/s5 oracle strings pin the DEFAULT sign dims at class load;
    // a session override would change the query side only and surface
    // as a spurious driver hash mismatch — the guard turns that into a
    // loud refusal at verify start instead
    for (key <- Seq("graft.lsh.signBits", "graft.stream.partitions",
        "graft.bloom.bits")) {
      withConf(key, "16") {
        val e = intercept[IllegalStateException](Verify.assertOracleSafeConfs(spark))
        assert(e.getMessage.contains(key), e.getMessage)
      }
    }
    Verify.assertOracleSafeConfs(spark) // defaults: no throw
  }

  test("graft.bloom.bits rejects out-of-range widths and non-numerics") {
    for (bad <- Seq("5", "27", "wide")) withConf("graft.bloom.bits", bad) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("d17_bloom_admit")(spark, sf).collect()
      }
      assert(e.getMessage.contains("graft.bloom.bits"), s"message for '$bad': ${e.getMessage}")
    }
  }
}
