package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** RESUMABLE PIPELINE RUNNER — the Airflow half of the reference's
  * value (durable task state, per-task retries, dependency-ordered
  * execution — reference airflow/dags/etl.py:18-22 `default_args`
  * retries/retry_delay, etl.py:273-274 `ini_clean >> st_dims >>
  * l_dims >> st_fct >> l_fct`) re-expressed as a STEP LEDGER on the
  * same atomic-publish primitive as [[TxTable]]'s commit protocol:
  * a step is COMPLETE exactly when its marker file exists, and the
  * marker publishes via temp-write + `link(2)` — the putIfAbsent
  * that makes completion atomic, crash-safe, and exclusive against a
  * concurrent runner of the same run directory (the generalization
  * of [[TxTable.appendBatchExactlyOnce]] from numbered micro-batches
  * to NAMED steps).
  *
  * Two step kinds:
  *  - [[step]] — produces a DataFrame ARTIFACT, materialized under
  *    `<runDir>/artifacts/<name>` before the marker publishes. On
  *    resume a completed step's artifact is READ BACK, never
  *    recomputed — the downstream chain re-binds to the stored
  *    frames, so a mid-chain kill costs only the killed step.
  *  - [[effect]] — a side-effecting load (JDBC append, external
  *    sink) with no readable artifact; the ledger alone carries its
  *    completion, so a resume SKIPS it rather than double-loading
  *    (the non-idempotent-sink case the reference handles by Airflow
  *    task state, not by sink dedup).
  *
  * Crash anatomy (why this is exactly-once *publication* over
  * at-least-once *execution*):
  *  - killed mid-body or mid-materialize → no marker; resume finds a
  *    partial artifact directory, DELETES it, recomputes. Data files
  *    are never read without their marker, so a half-written
  *    artifact is unreachable garbage, not corruption.
  *  - killed between materialize and marker publish → same: the
  *    artifact is discarded and rebuilt (write-then-publish, the
  *    manifest-log ordering).
  *  - marker published → the step NEVER re-executes, in this process
  *    or any later one.
  *
  * Retries ride inside the step: a failing body re-runs up to
  * `retries` extra attempts (reference `retries`/`retry_delay`) with
  * the partial artifact cleared between attempts; exhaustion
  * propagates the last failure and leaves the ledger unmarked so a
  * later run retries from exactly this step.
  *
  * At 100 TB the artifacts directory is the inter-stage bus a real
  * orchestrator already pays for (Airflow's temp parquet drops,
  * reference etl.py:15 DIR_TEMP): resumability costs nothing beyond
  * the materialization the DAG boundary forces anyway.
  */
final class StepRunner(spark: SparkSession, runDir: String,
    retries: Int = 0, retryDelayMs: Long = 0L) {

  private val M = new ObjectMapper()

  private def marker(name: String): Path = Paths.get(runDir, "_steps", s"$name.json")
  private def artifact(name: String): Path = Paths.get(runDir, "artifacts", name)

  /** Is `name` durably complete in this run directory? */
  def completed(name: String): Boolean = Files.exists(marker(name))

  /** Names of all completed steps (the resume report). */
  def completedSteps: Set[String] = {
    val dir = Paths.get(runDir, "_steps")
    if (!Files.isDirectory(dir)) return Set.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.endsWith(".json") => s.stripSuffix(".json") }
      .toSet
  }

  /** Publish `name`'s marker atomically; false when a concurrent
    * runner already published it (the loser defers, as in
    * [[TxTable.commit]]'s version race).
    */
  private def publish(name: String, kind: String, rows: Long): Boolean = {
    val root = M.createObjectNode()
    root.put("step", name)
    root.put("kind", kind)
    if (rows >= 0) root.put("rows", rows)
    val dir = marker(name).getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-$name-${Thread.currentThread().getId}")
    Files.write(tmp, M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    try {
      Files.createLink(marker(name), tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    Files.walk(p).iterator().asScala.toSeq.reverseIterator
      .foreach(Files.deleteIfExists(_))
  }

  private def withRetries[A](name: String)(attempt: () => A): A = {
    var left = retries
    while (true) {
      try return attempt()
      catch {
        case e: Exception if left > 0 =>
          left -= 1
          if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
          // partial output of the failed attempt must not trip the
          // next one's errorifexists write
          deleteRecursively(artifact(name))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run (or resume) an artifact-producing step: returns the stored
    * frame when `name` is already complete, otherwise executes
    * `body`, materializes it, publishes the marker, and returns the
    * read-back artifact (so downstream stages consume the SAME bytes
    * in first-run and resumed chains — no plan-vs-file drift).
    */
  def step(name: String)(body: => DataFrame): DataFrame = {
    val art = artifact(name)
    if (completed(name)) return spark.read.parquet(art.toString)
    withRetries(name) { () =>
      // re-check INSIDE the attempt: a concurrent runner may have
      // published while we waited/retried, and its artifact must not
      // be deleted out from under its marker
      if (!completed(name)) {
        deleteRecursively(art) // partial output of a killed prior run
        val df = body
        df.write.mode("errorifexists").parquet(art.toString)
      }
      ()
    }
    // a lost publish race means another runner completed it — either
    // way the artifact under the marker is the step's truth
    publish(name, "artifact", -1L)
    spark.read.parquet(art.toString)
  }

  /** Run (or skip) a side-effecting step. Returns true when `body`
    * executed this call, false when the ledger (or a concurrent
    * runner) already carried it — the caller's sink is touched at
    * most once per run directory.
    */
  def effect(name: String)(body: => Unit): Boolean = {
    if (completed(name)) return false
    withRetries(name) { () => body }
    publish(name, "effect", -1L)
    true // body executed this call, whoever won the marker race
  }

  /** DIAMOND fan-out: run independent branches CONCURRENTLY — the
    * reference DAG runs `initial_clean` alongside `init_db` before
    * both feed `load_dims` (etl.py:273-274's `>>` chain is the
    * sequential flattening of that diamond; Airflow's scheduler runs
    * the independent tasks in parallel). Each thunk should wrap its
    * work in [[step]]/[[effect]] so the ledger still arbitrates —
    * the marker race makes concurrent execution safe, this just
    * overlaps the wall-clock. Spark's scheduler is thread-safe:
    * concurrent branches submit jobs from their own threads and the
    * FAIR/FIFO pool interleaves stages across the cluster, which at
    * 100 TB keeps executors busy while one branch waits on a shuffle.
    *
    * ALL branches settle before this returns (no orphaned threads);
    * the FIRST failure (in argument order) then propagates — with
    * every OTHER branch's failure attached as a suppressed exception
    * (two loaders dying on a shared outage must both surface in the
    * log and the resume diagnosis, not just whichever ran first) —
    * and the surviving branches' ledger progress preserved for the
    * resume.
    */
  def concurrently[A](tasks: (() => A)*): Seq[A] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.size == 1) return Seq(tasks.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] { def call(): A = t() })
      }
      def unwrap(e: Throwable): Throwable = e match {
        case ee: java.util.concurrent.ExecutionException if ee.getCause != null => ee.getCause
        case other => other
      }
      val results = futs.map(f => scala.util.Try(f.get()))
      val failures = results.collect { case scala.util.Failure(e) => unwrap(e) }
      failures.headOption.foreach { first =>
        failures.drop(1).filter(_ ne first).foreach(first.addSuppressed)
        throw first
      }
      results.map(_.get)
    } finally {
      pool.shutdown()
      ()
    }
  }

  /** ALL_DONE finalizer (Airflow `trigger_rule="all_done"`; the
    * reference's end-of-run cleanup, etl.py:265-274): run `body`,
    * then run `cleanup` REGARDLESS of the body's outcome, then
    * rethrow the body's failure if there was one. The cleanup is
    * deliberately NOT ledger-tracked — its contract is "runs after
    * every attempt" (temp-dir removal, lock release), so a resumed
    * run must execute it again; a cleanup failure on a FAILED body is
    * attached as a suppressed exception so the root cause surfaces,
    * while on a successful body it propagates as the run's failure.
    */
  def withFinalizer[A](cleanup: => Unit)(body: => A): A = {
    val result =
      try Right(body)
      catch { case e: Throwable => Left(e) }
    result match {
      case Right(a) => cleanup; a
      case Left(e) =>
        try cleanup
        catch { case c: Throwable if c ne e => e.addSuppressed(c) }
        throw e
    }
  }
}
