package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact fixed-point base-2 logarithm shared by every log-bearing
  * operator (pipeline_dsir's importance weights, text_entropy): a
  * floating `ln()` would make scores engine-dependent, so log2 is
  * computed in pure int64 with `f` fractional bits — the integer part
  * via the length(bin(q))−1 device, the fractional bits by the classic
  * SQUARING method (square the [1,2) fixed-point mantissa; ≥2 ⇒ emit a
  * bit and halve — each of the f steps one integer multiply/shift).
  * Identical integers on both engines by construction; the SQL twin
  * below emits the same chain as DuckDB CTEs.
  *
  * Interpretation: for an input column q holding value·2^f, the output
  * is log2(value) in 2^−f units (so an INTEGER x is passed as x·2^f
  * and comes back as 2^f·log2(x), exact whenever x is a power of two).
  * Exact-headroom bound: q < 2^51 (the mantissa squaring peaks at
  * m² < 2^(2f+4); f=12 keeps every intermediate far inside int64).
  */
object FixedLog2 {

  /** Appends `outCol` = 2^f·log2(q/2^f) to `df`. `qCol` must be ≥ 1. */
  def log2Fp(df: DataFrame, qCol: String, outCol: String, f: Int): DataFrame = {
    val half = 1L << (f + 1)
    var w = df
      .withColumn("_ilog", length(bin(col(qCol))).cast("long") - 1L)
      .withColumn("_m", when(col("_ilog") >= f,
          expr(s"shiftright($qCol, cast(_ilog - $f as int))"))
        .otherwise(expr(s"shiftleft($qCol, cast($f - _ilog as int))")))
      .withColumn("_acc", lit(0L))
    (1 to f).foreach { i =>
      w = w.withColumn("_m2", expr(s"shiftright(_m * _m, $f)"))
        .withColumn("_acc", when(col("_m2") >= half,
          col("_acc") + lit(1L << (f - i))).otherwise(col("_acc")))
        .withColumn("_m", when(col("_m2") >= half,
          expr("shiftright(_m2, 1)")).otherwise(col("_m2")))
        .drop("_m2")
    }
    w.withColumn(outCol, (col("_ilog") - f) * (1L << f) + col("_acc"))
      .drop("_ilog", "_m", "_acc")
  }

  /** The same chain as DuckDB CTE text: given a CTE exposing columns
    * `keys` plus `q`, returns (chainCtes, finalCte) where `finalCte`
    * exposes `keys` plus `outCol`. CTE names are prefixed to keep two
    * chains in one statement collision-free.
    */
  def sqlCtes(srcCte: String, keys: Seq[String], outCol: String, f: Int,
      prefix: String = "lg"): (String, String) = {
    val half = 1L << (f + 1)
    val ks = keys.mkString(", ")
    val l0 =
      s"""${prefix}w AS (SELECT $ks, q, CAST(length(bin(q)) - 1 AS BIGINT) AS ilog FROM $srcCte),
         |${prefix}0 AS (SELECT $ks, ilog,
         |        CASE WHEN ilog >= $f THEN q >> CAST(ilog - $f AS INTEGER)
         |             ELSE q << CAST($f - ilog AS INTEGER) END AS m,
         |        CAST(0 AS BIGINT) AS acc
         |       FROM ${prefix}w)""".stripMargin
    val steps = (1 to f).map { i =>
      s"""${prefix}$i AS (SELECT $ks, ilog,
         |  CASE WHEN ((m*m) >> $f) >= $half THEN ((m*m) >> $f) >> 1
         |       ELSE (m*m) >> $f END AS m,
         |  acc + CASE WHEN ((m*m) >> $f) >= $half THEN ${1L << (f - i)}
         |             ELSE 0 END AS acc
         | FROM ${prefix}${i - 1})""".stripMargin
    }.mkString(",\n")
    val fin =
      s"""${prefix}fin AS (SELECT $ks, (ilog - $f) * ${1L << f} + acc AS $outCol
         | FROM ${prefix}$f)""".stripMargin
    (s"$l0,\n$steps,\n$fin", s"${prefix}fin")
  }
}
