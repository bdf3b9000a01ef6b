package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.util.Tables

/** Gate for the events.ts encoding class of regressions (VERDICT r7 item 2).
  *
  * The driver has shipped `events.ts` as parquet TIMESTAMP(NANOS) (read as
  * Long under nanosAsLong) and as TIMESTAMP(µs, isAdjustedToUTC=false) (read
  * as TIMESTAMP_NTZ). `Tables.events` must normalize every encoding to
  * TimestampType with identical values, so that `unix_micros(ts)` operators
  * never fail analysis again when the testdata is re-encoded.
  */
class TablesEncodingSpec extends SparkSpecBase {

  private def writeEventsAs(castTo: String): String = {
    val dir = Files.createTempDirectory("graft_events_enc").toString
    Tables.events(spark, SfDir)
      .withColumn("ts", col("ts").cast(castTo))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.events normalizes a TIMESTAMP_NTZ parquet to TimestampType") {
    val dir = writeEventsAs("timestamp_ntz")
    // confirm the fixture actually exercises the NTZ path
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType.typeName == "timestamp_ntz",
      s"fixture should read back as TIMESTAMP_NTZ, got ${raw.schema("ts").dataType}")

    val fixed = Tables.events(spark, dir)
    assert(fixed.schema("ts").dataType == TimestampType)

    // values must match the canonical load exactly (UTC session => naive µs
    // and instant µs coincide)
    val want = Tables.events(spark, SfDir)
      .agg(sum(unix_micros(col("ts"))), count(lit(1))).head()
    val got = fixed.agg(sum(unix_micros(col("ts"))), count(lit(1))).head()
    assert(got == want, s"NTZ round-trip changed values: $got vs $want")
  }

  test("a unix_micros-based operator runs against an NTZ-encoded events table") {
    val dir = writeEventsAs("timestamp_ntz")
    // asof_join was in the r7 breakage set; it must analyze and run
    val out = SparkEntry.queries("asof_join")(spark, dir)
    assert(out.count() > 0)
  }

  test("Tables.events still handles the plain TimestampType encoding") {
    val dir = writeEventsAs("timestamp")
    val fixed = Tables.events(spark, dir)
    assert(fixed.schema("ts").dataType == TimestampType)
    assert(fixed.count() == Tables.events(spark, SfDir).count())
  }
}
