package graft

import org.apache.spark.sql.SparkSession

/** Thread-local Spark job descriptions around engine phases, so the UI /
  * job-profile listeners attribute every job to the writer or operator
  * phase that ran it (optimization-guide §1.5) instead of an opaque
  * callsite. Restores the caller's description on exit — labels must not
  * leak into user jobs on the same thread. */
object JobDesc {
  def apply[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
