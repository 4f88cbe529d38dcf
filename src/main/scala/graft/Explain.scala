package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: print the executed plan of named SparkEntry
  * queries (the build loop's `.explain` feedback).
  *
  *   scripts/run.sh graft.Explain /root/testdata/sf0.01 q35_grouping_sets_join
  *
  * With no query names, explains every query. `SPARK_GRAFT_EXPLAIN_FULL=1`
  * prints the whole plan instead of the operator skeleton;
  * `SPARK_GRAFT_EXPLAIN_FORMATTED=<dir>` additionally writes each query's
  * `.explain("formatted")` output (post-execution, AQE-settled) to
  * `<dir>/<name>.txt` — the plans/r{N} evidence files.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val full = sys.env.get("SPARK_GRAFT_EXPLAIN_FULL").contains("1")
    val fmtDir = sys.env.get("SPARK_GRAFT_EXPLAIN_FORMATTED")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // materialize so AQE settles on the final plan
      val plan = df.queryExecution.executedPlan.toString
      fmtDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir, s"$n.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      if (full) println(plan)
      else println(plan.linesIterator
        .filter(l => Seq("Join", "Exchange", "Scan", "Expand", "Window",
          "Aggregate", "Sort", "Filter").exists(l.contains))
        .map(_.replaceAll("#\\d+L?", "").take(180)).mkString("\n"))
    }
    spark.stop()
  }
}
