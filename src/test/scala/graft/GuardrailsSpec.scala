package graft

import org.apache.spark.sql.functions._
import graft.plans.Guardrails

/** The cartesian circuit breaker: accidental cross joins must fail at
  * planning time, deliberate ones must still be expressible.
  */
class GuardrailsSpec extends SparkSpecBase {

  private def freshSession = {
    val s = spark.newSession()
    Guardrails.install(s)
    s
  }

  test("accidental cartesian product is rejected at planning time") {
    val s = freshSession
    import s.implicits._
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    val boom = intercept[Exception] { a.crossJoin(b).collect() }
    assert(boom.getMessage.contains("NoCartesian"), boom.getMessage)
    // a join whose condition references no columns is the same trap
    val boom2 = intercept[Exception] { a.join(b).collect() }
    assert(boom2.getMessage.contains("NoCartesian"), boom2.getMessage)
  }

  test("equi-joins and scoped deliberate cross joins still work") {
    val s = freshSession
    import s.implicits._
    val a = Seq((1, "a"), (2, "b")).toDF("k", "va")
    val b = Seq((1, "x")).toDF("k", "vb")
    assert(a.join(b, Seq("k")).count() == 1) // normal joins untouched
    val n = Guardrails.withCartesian(s) {
      a.crossJoin(broadcast(b)).count() // the broadcast-scalar pattern
    }
    assert(n == 2)
    // and the allowance is scoped: outside the block it throws again
    assert(intercept[Exception] { a.crossJoin(b).collect() }
      .getMessage.contains("NoCartesian"))
  }

  test("guardrailed session leaves the shared session untouched") {
    import spark.implicits._
    // the library queries themselves use deliberate broadcast cross
    // joins (scalar counts) — the rule is strictly opt-in per session
    val a = Seq(1).toDF("x")
    assert(a.crossJoin(Seq(2).toDF("y")).count() == 1)
  }
}
