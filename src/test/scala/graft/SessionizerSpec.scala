package graft

import graft.streaming.{SessionEvent, SessionOut, Sessionizer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizerSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val min = 60L * 1000000L
  private val events = Seq(
    SessionEvent(1, 1, 0, 1.0),
    SessionEvent(1, 2, 10 * min, 2.0),       // same session (10 min gap)
    SessionEvent(1, 3, 60 * min, 4.0),       // new session (50 min gap)
    SessionEvent(2, 4, 5 * min, 8.0))

  test("batch sessionizer closes sessions on gap") {
    val out = Sessionizer.sessionizeBatch(events.toDS()).collect().sortBy(o => (o.user_id, o.session_start_us))
    assert(out.toSeq == Seq(
      SessionOut(1, 0, 10 * min, 2, 3.0),
      SessionOut(1, 60 * min, 60 * min, 1, 4.0),
      SessionOut(2, 5 * min, 5 * min, 1, 8.0)))
  }

  test("streaming sessionizer emits closed sessions across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionizer.sessions(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_test").start()
    input.addData(events.take(2): _*)
    q.processAllAvailable()
    input.addData(events.drop(2): _*)  // event 3 closes user 1's first session
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_test").as[SessionOut].collect().toSeq
    assert(out.contains(SessionOut(1, 0, 10 * min, 2, 3.0)))
  }

  test("decode stub produces deterministic features") {
    import graft.multimodal.{DecodeStub, MediaRecord}
    val recs = Seq(MediaRecord(1, "hello".getBytes("UTF-8")),
      MediaRecord(2, Array.emptyByteArray)).toDS()
    val feats = DecodeStub.decode(recs).collect().sortBy(_.doc_id)
    assert(feats(0).width == 64 + 5 && feats(0).height == 64 + 35)
    assert(math.abs(feats(0).meanLuma - ("hello".getBytes("UTF-8").map(_ & 0xff).sum.toDouble / 5 / 255.0)) < 1e-12)
    assert(feats(1).meanLuma == 0.0)
  }
}
