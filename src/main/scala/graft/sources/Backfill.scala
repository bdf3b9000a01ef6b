package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** LOGICAL-DATE BACKFILL over [[StepRunner]] — the reference DAG's
  * `schedule_interval`/`catchup` semantics (reference
  * airflow/dags/etl.py:29-31: a daily schedule whose missed logical
  * dates are filled in order when catchup is on), re-expressed as
  * per-date RUN DIRECTORIES on the step ledger:
  *
  * {{{
  *   <root>/run_date=2012-03-01/_steps/...   // one StepRunner per date
  *   <root>/run_date=2012-03-01/artifacts/...
  * }}}
  *
  * A logical date is COMPLETE exactly when its run directory carries
  * the `__run_complete` marker — published through the same atomic
  * link(2) putIfAbsent as every other step, AFTER the date's pipeline
  * body finished. Enumeration → the missing dates, in calendar order
  * (Airflow's catchup order, so downstream date-partitioned consumers
  * see a monotone frontier); each missing date resumes mid-pipeline
  * via its own step ledger, so a backfill killed on date k re-runs
  * only date k's unfinished steps and then continues — dates before k
  * are marker-skipped without invoking the pipeline at all.
  *
  * Idempotence layers (each independently safe to repeat):
  *  1. complete date → skipped, pipeline not invoked;
  *  2. incomplete date, complete step → step marker skips the body;
  *  3. incomplete step → at-least-once execution, exactly-once
  *     publication (the StepRunner contract).
  *
  * At 100 TB the per-date isolation is the scaling story: a backfill
  * of N dates is N independent bounded runs (each date's shuffle
  * state, artifacts, and ledger are its own), not one unbounded job —
  * and dates can be sharded across drivers by partitioning the date
  * range, with the marker protocol arbitrating any overlap.
  */
object Backfill {

  /** One backfilled range's outcome: which dates ran, which were
    * already complete and skipped.
    */
  final case class Report(executed: Seq[LocalDate], skipped: Seq[LocalDate])

  /** The run directory for a logical date (Hive-style so the
    * artifacts double as a date-partitioned layout).
    */
  def runDir(root: String, date: LocalDate): String =
    s"$root/run_date=$date"

  private val RunComplete = "__run_complete"

  /** Is `date`'s run durably complete under `root`? */
  def isComplete(spark: SparkSession, root: String, date: LocalDate): Boolean =
    new StepRunner(spark, runDir(root, date)).completed(RunComplete)

  /** Inclusive calendar enumeration of [start, end]. */
  def dateRange(start: LocalDate, end: LocalDate): Seq[LocalDate] = {
    require(!start.isAfter(end), s"backfill range is empty: $start > $end")
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).toSeq
  }

  /** The dates in [start, end] that still need a run. */
  def missingDates(spark: SparkSession, root: String,
      start: LocalDate, end: LocalDate): Seq[LocalDate] =
    dateRange(start, end).filterNot(isComplete(spark, root, _))

  /** Fill every missing logical date in [start, end], oldest first.
    * `pipeline` receives the date's own [[StepRunner]] plus the
    * logical date and structures its work as [[StepRunner.step]] /
    * [[StepRunner.effect]] calls; the run-complete marker publishes
    * only after `pipeline` returns, so a mid-date kill resumes inside
    * that date. Re-running a fully backfilled range is a no-op.
    */
  def run(spark: SparkSession, root: String, start: LocalDate, end: LocalDate,
      retries: Int = 0, retryDelayMs: Long = 0L)(
      pipeline: (StepRunner, LocalDate) => Unit): Report = {
    val (done, todo) = dateRange(start, end).partition(isComplete(spark, root, _))
    todo.foreach { d =>
      val runner = new StepRunner(spark, runDir(root, d), retries, retryDelayMs)
      pipeline(runner, d)
      runner.effect(RunComplete)(())
      ()
    }
    Report(executed = todo, skipped = done)
  }
}
