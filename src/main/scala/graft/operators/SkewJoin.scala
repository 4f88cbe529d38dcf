package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the large (skewed) side, replicate the
  * small side once per salt, join on (key, salt).
  *
  * At 100 TB a single hot key (a viral document id, an empty-string join
  * key) turns one shuffle partition into a straggler; salting fans the hot
  * key's rows across `salt` partitions at the cost of replicating the
  * small side `salt` times. AQE's skew-join handles moderate skew
  * automatically; this is the explicit tool for the pathological cases.
  * Result is row-identical to a plain inner join (asserted in tests).
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salt: Int): DataFrame = {
    require(salt > 0)
    require(!large.columns.contains("_graft_salt") &&
      !small.columns.contains("_graft_salt"),
      "inputs must not contain a _graft_salt column")
    // Salt must be DETERMINISTIC under task retry (monotonically_
    // increasing_id / rand reshuffle rows on recomputation and would
    // lose/duplicate join rows after an executor failure): derive it from
    // full row content. Identical rows share a salt — they would hash to
    // the same reducer in a plain join anyway.
    val salted = large.withColumn("_graft_salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salt.toLong)))
    val replicated = small.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated, Seq(key, "_graft_salt"), "inner")
      .drop("_graft_salt")
  }
}
