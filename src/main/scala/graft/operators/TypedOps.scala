package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Row model for the typed-API demo. */
case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** `Dataset[T]` typed-API surface: case-class encoders, typed filter,
  * `groupByKey` + typed aggregation.
  *
  * Scale note: the typed lambda filter deserializes rows (breaks parquet
  * predicate pushdown and codegen), which is exactly the documented
  * trade-off of the typed API — use it where compile-time field safety
  * matters more than scan efficiency. The Column-based q-queries are the
  * hot-path idiom.
  */
object TypedOps {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q28_typed_dataset",
      (s, d) => {
        import s.implicits._
        val ds = Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag").as[Line]
        ds.filter((l: Line) => l.l_quantity > 10)
          .groupByKey((l: Line) => l.l_returnflag)
          .agg(
            count(lit(1)).as("n").as[Long],
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double")
              .as("sum_qty").as[Double])
          .toDF("l_returnflag", "n", "sum_qty")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_quantity > 10
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
