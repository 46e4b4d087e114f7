package graft

import org.apache.spark.sql.SparkSession

/** Driver-facing suite session tuning shared by [[Verify]] and
  * [[Bench]].
  *
  * Eager aggregation ([[graft.plans.EagerAggregation]]) is opt-in per
  * session because its soundness premise — a duplicate-free join key —
  * must be PROVED, not assumed. For the suite session the proof is
  * cheap and the payoff is real (the q196-class SQL-text shapes plan
  * their COUNT(DISTINCT)-over-join Expand over pre-shrunk grain), so
  * both mains: EXACTLY verify the star-schema dim keys that matter
  * (one grouped probe each, memoized per JVM per data dir, served
  * under a file-set fingerprint that any rewrite withdraws), then
  * enable the rule for the session. Ad-hoc sessions that skip this
  * setup see zero behavior change — the registry answers empty and
  * the rule stands down everywhere. */
object SuiteTuning {

  private val verified = java.util.concurrent.ConcurrentHashMap
    .newKeySet[String]()

  /** Star-schema keys the suite proves: the two dims large enough to
    * matter in aggregate-over-join shapes. The tiny dims (nation,
    * region, supplier) broadcast at every scale the suite runs, where
    * the rewrite's cost guard stands down anyway — verifying them
    * would be dead weight. */
  private val SuiteKeys: Seq[(String, String)] = Seq(
    "orders" -> "o_orderkey",
    "customer" -> "c_custkey")

  def enableEagerAgg(spark: SparkSession, sfDir: String): Unit = {
    if (verified.add(sfDir))
      SuiteKeys.foreach { case (table, key) =>
        graft.operators.CatalogStats.verifyUnique(
          spark, s"$sfDir/$table.parquet", Seq(key))
      }
    spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    // the fixed-point optimizer probes uniqueness freshness MANY times
    // per query; without a TTL every probe re-lists the relation's
    // files. The suite's testdata is immutable, so a 30 s memo costs
    // nothing and keeps planning metadata-light — the same setting a
    // production deployment would run with on object storage
    spark.conf.set("spark.graft.eagerAgg.fingerprint.ttl.ms", "30000")
  }
}
