package object graft {
  /** A named query: (session, sfDir) => result DataFrame. */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
