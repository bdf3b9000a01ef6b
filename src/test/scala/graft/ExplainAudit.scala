package graft

/** Plan auditor: prints the formatted physical plan of selected queries
  * so pushdown / broadcast / codegen properties can be inspected.
  * Usage: sbt 'Test/runMain graft.ExplainAudit q2_filter_project ...'
  * (no args = a representative subset).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q2_filter_project", "q1_agg", "q3_join_agg", "q4_broadcast_join",
        "etl_star_revenue", "etl_fact_build", "q6_window_topn", "dedup_minhash")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
