package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's
  * runtime skew-join splitting (which the session enables; salting is
  * for when skew is KNOWN ahead of time — e.g. a null-heavy foreign
  * key or one whale customer — and the plan should never build the hot
  * partition in the first place).
  *
  * The big side spreads each key over `salt` sub-keys round-robin
  * within each input partition (monotonically_increasing_id is stable
  * for a given scan order, so retries of a task agree, and BYTE-
  * IDENTICAL duplicate rows of the hot key still spread — a row-content
  * hash would send them all to one sub-key and keep the hot
  * partition); the small side replicates each row `salt` times via one
  * `explode` of a literal range. Join runs on (key, salt): the hot
  * key's rows land in `salt` partitions instead of one.
  *
  * Cost model: replicates the small side salt-fold — right when
  * big >> small * salt. For two huge skewed sides, prefer AQE's
  * skew-join or split hot keys out and broadcast them separately.
  */
object SkewJoin {

  /** Inner/left equi-join of `big` with `small` on `key`, salted. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // right/full would emit each unmatched replicated small-side row
    // `salt` times — silently wrong; only the big-side-preserving
    // types are expressible with this encoding
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins, not $joinType")
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
