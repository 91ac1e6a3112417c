package graft.util

/** Job labeling (optimization guide §1.5): protocol-heavy operators run
  * several Spark jobs per call — naming each phase makes the UI / any
  * job-level listener attribute wall time to the right phase instead of
  * an anonymous action. Descriptions are thread-local; the previous value
  * is restored so nested labels compose. */
object JobLabel {
  def apply[T](spark: org.apache.spark.sql.SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
