package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-level guardrails (SURVEY §4 custom-operator layer (c)): a
  * `Rule[LogicalPlan]` that REJECTS condition-less joins before they
  * run. On a laptop an accidental cartesian product is a slow query;
  * on a 1000-executor cluster it is an outage — |A|·|B| rows leave the
  * stage before anyone notices. Spark 3 removed the old
  * `spark.sql.crossJoin.enabled` block, so the engine itself will
  * happily plan one.
  *
  * The rule throws on any `Join` with Cross type or no join condition
  * unless the session opts in via `graft.guardrails.allowCartesian`
  * (deliberate small cross joins — e.g. a broadcast scalar — set it,
  * compute, unset it; [[withCartesian]] scopes that). Installed via
  * `spark.experimental.extraOptimizations` ([[install]]) so it rides
  * the optimizer without a session extension.
  */
object Guardrails {

  val AllowKey = "graft.guardrails.allowCartesian"

  /** The guardrail rule: no condition-less join leaves planning. */
  object NoCartesian extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val allowed = plan.conf.getConfString(AllowKey, "false").toBoolean
      if (!allowed) plan.foreach {
        case j: Join if j.joinType == Cross || j.condition.isEmpty =>
          throw new IllegalStateException(
            s"Guardrails.NoCartesian: condition-less ${j.joinType} join in plan — " +
              s"an accidental cartesian product at cluster scale; set $AllowKey=true " +
              "(or use Guardrails.withCartesian) if this is deliberate")
        case _ =>
      }
      plan
    }
  }

  /** Install the guardrails on a session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NoCartesian))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NoCartesian

  /** Run `body` with cartesian joins temporarily allowed. */
  def withCartesian[T](spark: SparkSession)(body: => T): T = {
    val old = spark.conf.getOption(AllowKey)
    spark.conf.set(AllowKey, "true")
    try body
    finally old match {
      case Some(v) => spark.conf.set(AllowKey, v)
      case None    => spark.conf.unset(AllowKey)
    }
  }
}
