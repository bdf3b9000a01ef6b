package org.apache.spark.sql.execution.datasources

import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.util.{DateFormatter, TimeFormatter, TimestampFormatter}

/** Bridge into `private[datasources]` partition-value inference — the
  * exact functions `spark.read.parquet` runs over a partitioned
  * directory (PartitioningUtils.inferPartitionColumnValue +
  * castPartValueToDesiredType, with the same formatters the file index
  * constructs), so a footer-based stats harvest can reproduce the
  * read-back's partition values bit-for-bit.
  */
object GraftPartitionBridge {
  /** Parse one slot-relative hive fragment (`a=1/b=x%3Dy`). Values stay
    * ESCAPED into the Spark calls — both functions unescape internally
    * exactly where the real parse does. Returns (name, inferredType,
    * typedValue) per level; the null-partition marker surfaces as a
    * NullType literal so the caller can fall back, and joint inference
    * over mixed-type dirs is the caller's bail condition too (it must
    * see identical per-value types, else the read-back's conflict
    * resolution applies and a raw per-file parse would diverge).
    */
  def inferPartitionFragment(fragment: String, typeInference: Boolean,
      tz: String): Seq[(String, org.apache.spark.sql.types.DataType, Any)] = {
    val zoneId = java.time.ZoneId.of(tz)
    val dateF = DateFormatter()
    val tsF = TimestampFormatter(
      PartitioningUtils.timestampPartitionPattern, zoneId, isParsing = true)
    val timeF = TimeFormatter(isParsing = true)
    fragment.split("/").toSeq.filter(_.nonEmpty).map { piece =>
      val i = piece.indexOf('=')
      require(i > 0, s"not a partition fragment: $piece")
      val name = ExternalCatalogUtils.unescapePathName(piece.take(i))
      val raw = piece.drop(i + 1)
      val dt = PartitioningUtils.inferPartitionColumnValue(
        raw, typeInference, zoneId, dateF, tsF, timeF)
      (name, dt, PartitioningUtils.castPartValueToDesiredType(dt, raw, zoneId))
    }
  }
}
