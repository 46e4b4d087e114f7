package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("picks the latest version at or before each event, null before any") {
    val events = Seq(
      (1L, "u1", ts("2024-06-01 08:00:00")), // before any version -> null
      (2L, "u1", ts("2024-06-01 10:00:00")), // after v1
      (3L, "u1", ts("2024-06-01 12:00:00")), // exactly at v2 -> sees v2
      (4L, "u1", ts("2024-06-02 00:00:00")), // after v2
      (5L, "u2", ts("2024-06-01 10:00:00"))  // other key, only v3
    ).toDF("event_id", "user_id", "ts")
    val versions = Seq(
      ("u1", ts("2024-06-01 09:00:00"), "v1"),
      ("u1", ts("2024-06-01 12:00:00"), "v2"),
      ("u2", ts("2024-06-01 09:30:00"), "v3")
    ).toDF("user_id", "vts", "label")

    val got = AsOfJoin.asOf(events, versions, "user_id", "ts", "vts", Seq("label"))
      .orderBy("event_id")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("label"))).toMap
    assert(got === Map(1L -> None, 2L -> Some("v1"), 3L -> Some("v2"),
                       4L -> Some("v2"), 5L -> Some("v3")))
  }

  test("null keys never match (join semantics, matching the ASOF oracle)") {
    val events = Seq((1L, Option.empty[String], ts("2024-06-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val versions = Seq(
      (Option.empty[String], ts("2024-06-01 09:00:00"), "ghost"))
      .toDF("user_id", "vts", "label")
    val got = AsOfJoin.asOf(events, versions, "user_id", "ts", "vts", Seq("label"))
      .head()
    assert(got.isNullAt(got.fieldIndex("label")))
  }

  test("a version whose value is null is still the one in effect") {
    val events = Seq((1L, "k", ts("2024-06-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val versions = Seq(
      ("k", ts("2024-06-01 09:00:00"), Some("v1")),
      ("k", ts("2024-06-01 10:00:00"), None) // later version, null value
    ).toDF("user_id", "vts", "label")
    val got = AsOfJoin.asOf(events, versions, "user_id", "ts", "vts", Seq("label"))
      .head()
    // the in-effect version is the 10:00 one — its null must NOT be
    // skipped in favor of the older v1
    assert(got.isNullAt(got.fieldIndex("label")))
  }

  test("matches a brute-force as-of on randomized input (fixed seed)") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c")
    val events = (1 to 120).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), ts(f"2024-06-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
    val versions = (1 to 30).map { i =>
      (keys(rnd.nextInt(3)), ts(f"2024-06-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), s"v$i")
    } // duplicate (key, ts) possible: keep the lexicographically-last label
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val eDf = events.toDF("event_id", "user_id", "ts")
    val vDf = versions.toDF("user_id", "vts", "label")

    val got = AsOfJoin.asOf(eDf, vDf, "user_id", "ts", "vts", Seq("label"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("label"))).toMap

    val expect = events.map { case (id, k, t) =>
      val candidates = versions.filter(v => v._1 == k && !v._2.after(t))
      id -> candidates.sortBy(v => (v._2.getTime, v._3)).lastOption.map(_._3)
    }.toMap
    assert(got === expect)
  }

  test("left columns survive untouched; multiple value columns carried") {
    val events = Seq((1L, "k", ts("2024-06-01 10:00:00"), 7.5))
      .toDF("event_id", "user_id", "ts", "amount")
    val versions = Seq(("k", ts("2024-06-01 09:00:00"), "a", 42L))
      .toDF("user_id", "vts", "label", "score")
    val out = AsOfJoin.asOf(events, versions, "user_id", "ts", "vts",
      Seq("label", "score"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "amount",
      "label", "score"))
    val r = out.head()
    assert(r.getAs[Double]("amount") === 7.5)
    assert(r.getAs[String]("label") === "a")
    assert(r.getAs[Long]("score") === 42L)
  }
}
