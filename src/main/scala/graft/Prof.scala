package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Profiling aid for the optimization rounds (guide §1: measure first).
  * Runs ONE query under the exact Bench session config and prints a
  * per-job breakdown — job id, wall seconds, task count, and the
  * call-site of the job's final stage — for the SECOND run (run 1 pays
  * codegen/first-read, same methodology as Bench). Reading the list
  * top-down shows which operator phase owns the wall.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.Prof <queryName>"
  */
object Prof {
  private final case class JobRec(id: Int, start: Long, var end: Long = 0L,
    var tasks: Int = 0, var site: String = "")

  private final class JobTally extends SparkListener {
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val rec = JobRec(e.jobId, e.time)
      rec.tasks = e.stageInfos.map(_.numTasks).sum
      rec.site = e.stageInfos.lastOption
        .flatMap(_.details.linesIterator.nextOption()).getOrElse("")
      jobs(e.jobId) = rec
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    def reset(): Unit = synchronized(jobs.clear())
    def report(): Unit = synchronized {
      val done = jobs.values.filter(_.end > 0).toSeq
      val total = done.map(j => j.end - j.start).sum
      println(f"[prof] jobs=${done.size} sum=${total / 1e3}%.3f s")
      done.foreach { j =>
        println(f"[prof] job=${j.id}%4d ${(j.end - j.start) / 1e3}%8.3f s tasks=${j.tasks}%4d  ${j.site}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Prof <queryName>"))
    System.setProperty("graft.bench.nosort", "1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)
    (1 to 2).foreach { run =>
      tally.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      graft.util.CacheScope.drain()
      spark.catalog.clearCache()
      println(f"[prof] run=$run $name elapsed=$el%.3f s")
      if (run == 2) { Thread.sleep(200); tally.report() }
    }
    spark.stop()
  }
}
