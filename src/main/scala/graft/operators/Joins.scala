package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-shape helpers shared by the dedup/similarity operators. */
object Joins {

  /** Size-gated broadcast: hint only while the lookup side fits the
    * session broadcast threshold (per its optimized-plan statistics);
    * larger tables fall back to a plain equi-join — never an OOM'd
    * broadcast at scale.
    */
  def sizeGatedBroadcast(df: DataFrame): DataFrame = {
    val threshold = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && bytes <= threshold) broadcast(df) else df
  }
}
