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

  test("diamond DAG: init_db runs concurrently with the clean branch into a shared load_dims; finalizer runs even on failure") {
    import spark.implicits._
    val runDir = freshRunDir()
    val initRan = new AtomicInteger(0)
    val cleanRan = new AtomicInteger(0)
    val cleanupRan = new AtomicInteger(0)
    // the reference diamond: init_db ∥ initial_clean, both into load_dims
    def diamond(r: StepRunner): DataFrame = r.withFinalizer(cleanupRan.incrementAndGet()) {
      val Seq(_, cleanAny) = r.concurrently[Any](
        () => r.effect("init_db") { initRan.incrementAndGet(); Thread.sleep(50) },
        () => r.step("clean") {
          cleanRan.incrementAndGet(); Thread.sleep(50)
          Seq((1, "a"), (2, "b")).toDF("id", "v")
        })
      val clean = cleanAny.asInstanceOf[DataFrame]
      r.step("load_dims") { clean.select(col("id"), upper(col("v")).as("v")) }
    }
    val out = diamond(new StepRunner(spark, runDir))
    assert(out.as[(Int, String)].collect().sorted.toSeq == Seq((1, "A"), (2, "B")))
    assert(initRan.get() == 1 && cleanRan.get() == 1 && cleanupRan.get() == 1)
    // resume over the same run dir: both branches skip, finalizer re-runs
    diamond(new StepRunner(spark, runDir))
    assert(initRan.get() == 1 && cleanRan.get() == 1, "completed branches must skip")
    assert(cleanupRan.get() == 2, "all_done cleanup runs on every attempt")

    // FAILURE leg: one branch dies — the other branch's ledger
    // progress survives, the cleanup still runs, the failure surfaces
    val runDir2 = freshRunDir()
    val okRan = new AtomicInteger(0)
    val cleanup2 = new AtomicInteger(0)
    val r2 = new StepRunner(spark, runDir2)
    val e = intercept[RuntimeException] {
      r2.withFinalizer(cleanup2.incrementAndGet()) {
        r2.concurrently[Any](
          () => r2.step("ok") { okRan.incrementAndGet(); Seq(1).toDF("x") },
          () => r2.effect("boom") { throw new RuntimeException("branch died") })
      }
    }
    assert(e.getMessage == "branch died")
    assert(cleanup2.get() == 1, "all_done cleanup must run on the failed attempt")
    assert(r2.completed("ok") && !r2.completed("boom"),
      "the surviving branch's progress must be durable")
    // resume: only the failed branch re-runs
    val resumed = new AtomicInteger(0)
    new StepRunner(spark, runDir2).concurrently[Any](
      () => new StepRunner(spark, runDir2).step("ok") { okRan.incrementAndGet(); Seq(1).toDF("x") },
      () => new StepRunner(spark, runDir2).effect("boom") { resumed.incrementAndGet(); () })
    assert(okRan.get() == 1 && resumed.get() == 1)
  }

  test("backfill: missing logical dates fill in order, pre-completed dates skip, re-run is a no-op, a mid-backfill kill resumes") {
    import java.time.LocalDate
    import graft.sources.Backfill
    import spark.implicits._
    val root = Files.createTempDirectory("graft_backfill").resolve("daily").toString
    val start = LocalDate.parse("2012-03-01")
    val end = LocalDate.parse("2012-03-05")
    val stepRuns = new AtomicInteger(0)
    def pipeline(fail: Set[LocalDate])(r: StepRunner, d: LocalDate): Unit = {
      val day = r.step("extract") {
        stepRuns.incrementAndGet()
        Seq((d.toString, 1L)).toDF("run_date", "n")
      }
      if (fail(d)) throw new RuntimeException(s"killed on $d")
      r.step("load") { day.withColumn("loaded", lit(true)) }
      ()
    }
    // pre-complete 2012-03-03 (an earlier partial backfill finished it)
    Backfill.run(spark, root, LocalDate.parse("2012-03-03"),
      LocalDate.parse("2012-03-03"))(pipeline(Set.empty))
    assert(stepRuns.get() == 1)

    // mid-backfill kill on 03-04: 01 and 02 complete first (catchup
    // order), 03 skips, 04 dies AFTER its extract step committed
    val e = intercept[RuntimeException] {
      Backfill.run(spark, root, start, end)(
        pipeline(Set(LocalDate.parse("2012-03-04"))))
    }
    assert(e.getMessage == "killed on 2012-03-04")
    assert(stepRuns.get() == 4, "01, 02 ran; 03 skipped; 04's extract ran then died")
    assert(Backfill.missingDates(spark, root, start, end)
      .map(_.toString) == Seq("2012-03-04", "2012-03-05"))

    // resume: only the 4 missing dates execute — and 04's completed
    // extract step is marker-skipped inside its resumed run
    val rep = Backfill.run(spark, root, start, end)(pipeline(Set.empty))
    assert(rep.executed.map(_.toString) == Seq("2012-03-04", "2012-03-05"))
    assert(rep.skipped.map(_.toString) == Seq("2012-03-01", "2012-03-02", "2012-03-03"))
    assert(stepRuns.get() == 5, "exactly one extract per date across the whole backfill")

    // every date's artifact is in place exactly once
    val all = spark.read.parquet(
      Backfill.dateRange(start, end).map(d => s"${Backfill.runDir(root, d)}/artifacts/load"): _*)
    assert(all.select("run_date").as[String].collect().sorted.toSeq ==
      Backfill.dateRange(start, end).map(_.toString))

    // full re-run is a no-op end to end
    val rep2 = Backfill.run(spark, root, start, end)(pipeline(Set.empty))
    assert(rep2.executed.isEmpty && rep2.skipped.size == 5)
    assert(stepRuns.get() == 5)
  }

  test("concurrently: when several branches fail, the first propagates with the others attached as suppressed (no lost root cause)") {
    val runDir = Files.createTempDirectory("graft_steps_sup").toString
    val r = new StepRunner(spark, runDir)
    val e = intercept[IllegalStateException] {
      r.concurrently[Any](
        () => throw new IllegalStateException("loader A: warehouse down"),
        () => "branch B survives",
        () => throw new IllegalArgumentException("loader C: warehouse down too"))
    }
    assert(e.getMessage.contains("loader A"))
    assert(e.getSuppressed.exists(_.getMessage.contains("loader C")),
      "the second branch's failure must ride along as suppressed, not vanish")
    assert(e.getSuppressed.length == 1, "surviving branches add nothing")
  }
}
