package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
}
