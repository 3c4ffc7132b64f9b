package graft

/** Local iteration helper: print the executed plan of named queries at
  * sf0.001 (the PlanSpec pinning workflow — look first, then assert).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
