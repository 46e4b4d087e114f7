package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.ConstraintAudit.Rule

/** Constraint audit: NOT-TRUE violation semantics (NULL predicate =
  * violation), one-scan evaluation of the whole rule set, FK orphan
  * counting including NULL child keys. */
class ConstraintAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("row rules: null predicate results count as violations") {
    val df = Seq[(java.lang.Long, String)](
      (5L, "ok"), (-1L, "ok"), (null, "ok"), (7L, null))
      .toDF("amount", "status")
    val got = ConstraintAudit.audit(df, Seq(
      Rule("amount_positive", col("amount") > 0),
      Rule("status_present", col("status").isNotNull)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // amount > 0: -1 fails, null amount is NOT TRUE -> 2 violations
    assert(got("amount_positive") === ((4L, 2L, false)))
    assert(got("status_present") === ((4L, 1L, false)))
  }

  test("a fully-passing rule reports pass = true") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val got = ConstraintAudit.audit(df, Seq(Rule("id_positive", col("id") > 0)))
      .collect().head
    assert(got.getLong(2) === 0L && got.getBoolean(3))
  }

  test("rule set evaluates in one scan of the table") {
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val audited = ConstraintAudit.audit(df, Seq(
      Rule("price_pos", col("o_totalprice") > 0),
      Rule("date_present", col("o_orderdate").isNotNull),
      Rule("status_domain", col("o_orderstatus").isin("O", "F", "P"))))
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scans = audited.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
        case _ => ""
      }
    }.count(_.contains("orders.parquet"))
    assert(scans == 1)
  }

  test("rule names must be bare identifiers (they enter a parsed stack expr)") {
    intercept[IllegalArgumentException] {
      Rule("price > 0", col("id") > 0)
    }
    intercept[IllegalArgumentException] {
      Rule("o'brien check", col("id") > 0)
    }
  }

  test("fkAudit counts orphans, including null child keys") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (9L, "orphan"), (null, "null-key"))
      .toDF("ck", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = ConstraintAudit.fkAudit("fk", child, "ck", parent, "pk")
      .collect().head
    assert(got.getString(0) === "fk")
    assert(got.getLong(1) === 4L)
    assert(got.getLong(2) === 2L) // 9L and the null key
    assert(!got.getBoolean(3))
  }
}
