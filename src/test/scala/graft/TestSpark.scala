package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object TestSpark {
  private lazy val underlying: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The accessor pins the shared session as the CALLING thread's active
    * session: the active session is a thread-local, ScalaTest runs suites on
    * pooled threads, and a SparkPlan node constructed on a thread with no
    * active session captures a null session whose metrics access NPEs later
    * (the r17 VERIFY flake — see Analytics.roundBarrier's session-propagation
    * note). Only the builder's creating thread gets the thread-local set
    * automatically; every other suite thread needs this pin. */
  def session: SparkSession = {
    val s = underlying
    SparkSession.setActiveSession(s)
    s
  }
}
