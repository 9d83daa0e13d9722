package graft

/** Entry smoke probe (see .claude/skills/verify): prints the flagship
  * query's row count; also a scratch main for environment probes.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
