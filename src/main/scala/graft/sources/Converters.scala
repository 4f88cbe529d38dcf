package graft.sources

import org.apache.spark.sql.SparkSession

/** Data-prep converters — the Spark-native equivalents of the reference's
  * Python utilities (scripts/generate_tpcds_orc.py:92-182 text->ORC,
  * scripts/convert_tpcds_to_orc.py:61-83 parquet->ORC).
  */
object Converters {

  def parquetToOrc(spark: SparkSession, in: String, out: String,
                   compression: String = "snappy"): Unit =
    OrcTables.write(spark.read.parquet(in), out, compression)

  /** Delimited text -> ORC with schema inference (the `.dat` path of
    * generate_tpcds_orc.py; TPC-DS dsdgen uses '|').
    */
  def csvToOrc(spark: SparkSession, in: String, out: String,
               delimiter: String = "|", header: Boolean = false,
               compression: String = "snappy"): Unit = {
    val df = spark.read
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .option("inferSchema", "true")
      .csv(in)
    OrcTables.write(df, out, compression)
  }
}
