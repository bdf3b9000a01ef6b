package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.RetailEtl
import graft.sources.{JdbcSink, StepRunner}

/** The resumable step-ledger runner: the Airflow semantics the
  * reference DAG leans on (durable task state, retries, ordered
  * dependencies — etl.py:18-22, 273-274) proven on the runner itself
  * and then on the reference chain shape: a run KILLED between
  * stage_dims and load_fact resumes to the identical star with the
  * completed steps skipped, and the non-idempotent JDBC loads land
  * exactly once.
  */
class StepRunnerSpec extends SparkSpecBase {

  private def freshRunDir(): String =
    Files.createTempDirectory("graft_steprun").resolve("run").toString

  test("step executes once, resumes from the stored artifact; effect skips on resume") {
    import spark.implicits._
    val runDir = freshRunDir()
    val stepRuns = new AtomicInteger(0)
    val effectRuns = new AtomicInteger(0)
    def chain(r: StepRunner): DataFrame = {
      val a = r.step("mk") { stepRuns.incrementAndGet(); Seq(1, 2, 3).toDF("x") }
      r.effect("load") { effectRuns.incrementAndGet(); () }
      a
    }
    val r1 = new StepRunner(spark, runDir)
    val first = chain(r1)
    assert(first.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(stepRuns.get() == 1 && effectRuns.get() == 1)
    // a brand-new runner over the same run dir: everything resumes
    val r2 = new StepRunner(spark, runDir)
    val resumed = chain(r2)
    assert(resumed.as[Int].collect().sorted.toSeq == Seq(1, 2, 3),
      "resumed step must return the stored artifact")
    assert(stepRuns.get() == 1, "completed step must not recompute")
    assert(effectRuns.get() == 1, "completed effect must not re-fire")
    assert(r2.completedSteps == Set("mk", "load"))
  }

  test("a partial artifact without its marker is discarded and recomputed (crash mid-materialize)") {
    import spark.implicits._
    val runDir = freshRunDir()
    // simulate a kill mid-write: artifact bytes exist, marker does not
    val partial = Paths.get(runDir, "artifacts", "mk")
    Files.createDirectories(partial)
    Files.write(partial.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    val runs = new AtomicInteger(0)
    val r = new StepRunner(spark, runDir)
    val out = r.step("mk") { runs.incrementAndGet(); Seq(7L).toDF("x") }
    assert(runs.get() == 1, "unmarked partial artifact must recompute")
    assert(out.as[Long].collect().toSeq == Seq(7L))
  }

  test("retries: a flaky body re-runs inside the step; exhaustion leaves the ledger unmarked") {
    import spark.implicits._
    val runDir = freshRunDir()
    val attempts = new AtomicInteger(0)
    val r = new StepRunner(spark, runDir, retries = 2)
    val out = r.step("flaky") {
      if (attempts.incrementAndGet() < 3) sys.error("transient")
      Seq(42L).toDF("x")
    }
    assert(attempts.get() == 3, "two retries then success")
    assert(out.as[Long].collect().toSeq == Seq(42L))
    // exhaustion: the failure propagates and the step stays incomplete
    val r2 = new StepRunner(spark, runDir, retries = 1)
    val fails = new AtomicInteger(0)
    intercept[RuntimeException] {
      r2.step("dead") { fails.incrementAndGet(); sys.error("always"); spark.range(1).toDF() }
    }
    assert(fails.get() == 2, "initial attempt + one retry")
    assert(!r2.completed("dead"), "a failed step must stay resumable")
  }

  test("reference chain killed between stage_dims and load_fact resumes to the identical star, completed steps skipped, loads land once") {
    val runDir = freshRunDir()
    val home = Files.createTempDirectory("graft_derby_resume").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/dwh;create=true"
    val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
    val log = scala.collection.mutable.ArrayBuffer.empty[String]

    // the reference DAG ordering (etl.py:273-274): clean >> stage_dims
    // >> load_dims >> stage_fact >> load_fact — with an injected kill
    // where the verdict demands it
    final class Killed extends RuntimeException("killed between stage_dims and load_fact")
    def runChain(r: StepRunner, killAfterStageDims: Boolean): Unit = {
      r.step("clean") { log += "clean"; RetailEtl.clean(spark, SfDir) }
      val dims = r.step("stage_dims") { log += "stage_dims"; RetailEtl.scd1Customers(spark, SfDir) }
      if (killAfterStageDims) throw new Killed
      r.effect("load_dims") {
        log += "load_dims"
        JdbcSink.loadTable(dims, url, "RESUME_DIM", SaveMode.Append, driver)
      }
      val fact = r.step("stage_fact") { log += "stage_fact"; RetailEtl.factBuild(spark, SfDir) }
      r.effect("load_fact") {
        log += "load_fact"
        JdbcSink.loadTable(fact, url, "RESUME_FACT", SaveMode.Append, driver)
      }
    }

    intercept[Killed] { runChain(new StepRunner(spark, runDir), killAfterStageDims = true) }
    assert(log.toSeq == Seq("clean", "stage_dims"), "the kill lands after stage_dims")

    // resume with a FRESH runner over the same run dir (a new process)
    log.clear()
    runChain(new StepRunner(spark, runDir), killAfterStageDims = false)
    assert(log.toSeq == Seq("load_dims", "stage_fact", "load_fact"),
      s"completed steps must be skipped, remaining steps run in order: $log")

    // the loaded star is row-for-row identical to a direct one-shot
    // computation — resume produced THE star, not a variant of it
    val factBack = JdbcSink.readTable(spark, url, "RESUME_FACT", driver)
    val oneShot = RetailEtl.factBuild(spark, SfDir)
    assert(factBack.count() == oneShot.count(), "load_fact landed exactly once")
    assert(factBack.exceptAll(oneShot).count() == 0 && oneShot.exceptAll(factBack).count() == 0,
      "resumed star differs from the one-shot star")
    val dimBack = JdbcSink.readTable(spark, url, "RESUME_DIM", driver)
    assert(dimBack.count() == RetailEtl.scd1Customers(spark, SfDir).count(),
      "load_dims landed exactly once")

    // re-running the WHOLE chain a third time is a no-op end to end:
    // every load is ledger-guarded, so the star cannot double
    log.clear()
    runChain(new StepRunner(spark, runDir), killAfterStageDims = false)
    assert(log.isEmpty, "a fully-completed run must skip every step")
    assert(JdbcSink.readTable(spark, url, "RESUME_FACT", driver).count() == oneShot.count())
  }
}
