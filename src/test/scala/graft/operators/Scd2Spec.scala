package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.LarkFunctions.surrogateKey

/** SCD2 invariants + the fold-vs-window equivalence:
  * applying [[Scd2.delta]] batch-by-batch must produce exactly what
  * [[Scd2.fromHistory]] computes in one pass (SURVEY.md §2.8 quirks
  * included). */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Version history: (key, ts-seconds-offset, attribute)
  private val history = Seq(
    ("E1", 100, "a"), ("E1", 200, "b"), ("E1", 300, "c"),
    ("E2", 150, "x"),
    ("E3", 100, "p"), ("E3", 400, "q"))

  private def versionsDf = history
    .toDF("user_id", "off", "attr")
    .withColumn("datetime_updated", timestamp_seconds(lit(1700000000) + col("off")))
    .drop("off")
    .select("user_id", "datetime_updated", "attr")

  private def batchAt(off: Int) = versionsDf
    .filter(unix_timestamp(col("datetime_updated")) === 1700000000L + off)
    .withColumn("user_sur_id", surrogateKey(col("user_id"), col("datetime_updated")))
    .select("user_sur_id", "user_id", "datetime_updated", "attr")

  private lazy val folded = {
    val empty = batchAt(-1).withColumn("valid_from", col("datetime_updated"))
      .withColumn("valid_to", col("datetime_updated"))
      .withColumn("is_current", lit(true))
    Seq(100, 150, 200, 300, 400).foldLeft(empty) { (dim, off) =>
      Scd2.applyBatch(dim, batchAt(off), "user_id", "datetime_updated", "user_sur_id")
        .localCheckpoint()
    }
  }

  private lazy val oneShot = Scd2
    .fromHistory(versionsDf, "user_id", "datetime_updated", "user_sur_id")
    .select("user_sur_id", "user_id", "datetime_updated", "attr",
            "valid_from", "valid_to", "is_current")

  test("fold over batches == one-pass window rebuild") {
    val a = folded.select("user_sur_id", "user_id", "datetime_updated", "attr",
                          "valid_from", "valid_to", "is_current")
    assert(a.exceptAll(oneShot).isEmpty && oneShot.exceptAll(a).isEmpty)
  }

  test("exactly one current row per natural key") {
    val counts = folded.filter(col("is_current"))
      .groupBy("user_id").count().collect()
    assert(counts.length === 3 && counts.forall(_.getLong(1) == 1))
  }

  test("version count = distinct change timestamps per key") {
    val got = folded.groupBy("user_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("E1" -> 3, "E2" -> 1, "E3" -> 2))
  }

  test("replaying the same batch is a no-op (idempotence)") {
    val once = folded
    val twice = Scd2.applyBatch(once, batchAt(400), "user_id",
                                "datetime_updated", "user_sur_id")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("expired rows carry next version's ts but their own valid_from (branch-3 quirk)") {
    val e1 = oneShot.filter(col("user_id") === "E1" && !col("is_current"))
      .orderBy("valid_from")
      .select(unix_timestamp(col("valid_from")), unix_timestamp(col("datetime_updated")),
              unix_timestamp(col("valid_to")))
      .collect().map(r => (r.getLong(0) - 1700000000, r.getLong(1) - 1700000000,
                           r.getLong(2) - 1700000000))
    assert(e1.toSeq === Seq((100L, 200L, 200L), (200L, 300L, 300L)))
  }

  test("a batch with two versions of one key opens ONE current row (the latest)") {
    // both E1 versions arrive in a single micro-batch against a dim
    // holding E1@100 — without latest-per-key collapse the delta would
    // open both as current and expire the old row twice
    val dim = Scd2.fromHistory(
      versionsDf.filter(col("attr") === "a"),
      "user_id", "datetime_updated", "user_sur_id")
      .select("user_sur_id", "user_id", "datetime_updated", "attr",
        "valid_from", "valid_to", "is_current")
    val batch = versionsDf.filter(col("attr").isin("b", "c")) // E1@200, E1@300
      .withColumn("user_sur_id", surrogateKey(col("user_id"), col("datetime_updated")))
      .select("user_sur_id", "user_id", "datetime_updated", "attr")
    val after = Scd2.applyBatch(dim, batch, "user_id", "datetime_updated", "user_sur_id")
    assert(after.filter(col("is_current")).count() == 1)
    assert(after.filter(col("is_current")).select("attr").head().getString(0) == "c")
    // no duplicate surrogate keys
    assert(after.count() == after.select("user_sur_id").distinct().count())
  }

  test("identical-ts intra-batch versions pick a deterministic winner") {
    // two E9 versions share one change ts; the kept attributes must be
    // the same on every run/engine (ordering ties break on attr values:
    // "z2" > "z1" lexicographically)
    val batch = Seq(("E9", "z1"), ("E9", "z2")).toDF("user_id", "attr")
      .withColumn("datetime_updated", timestamp_seconds(lit(1700000500L)))
      .withColumn("user_sur_id", surrogateKey(col("user_id"), col("datetime_updated")))
      .select("user_sur_id", "user_id", "datetime_updated", "attr")
    val empty = batch.limit(0)
      .withColumn("valid_from", col("datetime_updated"))
      .withColumn("valid_to", col("datetime_updated"))
      .withColumn("is_current", lit(true))
    (1 to 3).foreach { _ =>
      val dim = Scd2.applyBatch(empty, batch.repartition(8),
        "user_id", "datetime_updated", "user_sur_id")
      assert(dim.count() == 1)
      assert(dim.select("attr").head().getString(0) == "z2")
    }
  }

  test("map-typed attrs still get a deterministic identical-ts winner (via JSON)") {
    val batch = Seq(("E9", Map("k" -> "v1")), ("E9", Map("k" -> "v2")))
      .toDF("user_id", "attrs")
      .withColumn("datetime_updated", timestamp_seconds(lit(1700000500L)))
      .withColumn("user_sur_id", surrogateKey(col("user_id"), col("datetime_updated")))
      .select("user_sur_id", "user_id", "datetime_updated", "attrs")
    val empty = batch.limit(0)
      .withColumn("valid_from", col("datetime_updated"))
      .withColumn("valid_to", col("datetime_updated"))
      .withColumn("is_current", lit(true))
    (1 to 3).foreach { _ =>
      val dim = Scd2.applyBatch(empty, batch.repartition(8),
        "user_id", "datetime_updated", "user_sur_id")
      assert(dim.count() == 1)
      // JSON tie-break: {"k":"v2"} > {"k":"v1"} lexicographically
      assert(dim.select(col("attrs")("k")).head().getString(0) == "v2")
    }
  }

  test("current rows keep sentinel valid_to") {
    val cur = oneShot.filter(col("is_current"))
    assert(cur.filter(col("valid_to") =!= to_timestamp(lit(Scd2.Sentinel))).isEmpty)
  }
}
