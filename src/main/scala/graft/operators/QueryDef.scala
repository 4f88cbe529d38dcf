package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator entry: the Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable across engines:
  *  - every computed column is aliased identically on both sides;
  *  - aggregate numerics are summed in DECIMAL (exact, order-independent)
  *    then cast to DOUBLE, counts stay BIGINT — no engine-dependent
  *    floating-point accumulation orders in the output;
  *  - every query ends in a total ORDER BY (NULLS FIRST spelled out in the
  *    oracle — DuckDB defaults to NULLS LAST, Spark to NULLS FIRST);
  *  - no raw timestamp columns in outputs (rendered via date_format /
  *    epoch integers instead).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
