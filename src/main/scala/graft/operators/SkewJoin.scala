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
    // deterministic pseudo-random salt per row (content-independent rows
    // of the hot key spread uniformly)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
