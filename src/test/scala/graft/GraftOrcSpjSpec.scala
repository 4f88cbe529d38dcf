package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two graft-orc tables hive-partitioned on
  * their join key report `KeyGroupedPartitioning`, and with
  * `spark.sql.sources.v2.bucketing.enabled` Spark groups each scan's
  * splits by partition key and plans the join with NO shuffle Exchange
  * on either side. At 100 TB this is the difference between a
  * fact-to-fact join that moves both tables over the network and one
  * that moves nothing.
  */
class GraftOrcSpjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withSpjConf[A](body: => A): A = {
    val keep = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled"
    ).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // the fixture tables are tiny; keep the join a real SMJ so the
      // exchange elision is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private lazy val dirs: (String, String) = {
    val cust = Files.createTempDirectory("graft-spj-cust").toString
    val supp = Files.createTempDirectory("graft-spj-supp").toString
    Tables.customer(spark, TestSpark.sf0001)
      .write.format("graft-orc").partitionBy("c_nationkey")
      .mode("append").save(cust)
    Tables.supplier(spark, TestSpark.sf0001)
      .write.format("graft-orc").partitionBy("s_nationkey")
      .mode("append").save(supp)
    (cust, supp)
  }

  test("co-partitioned join on the partition key plans with zero " +
    "shuffle exchanges") {
    withSpjConf {
      val (cust, supp) = dirs
      val c = spark.read.format("graft-orc")
        .option("graft.preserve_partitioning", "true").load(cust)
      val s = spark.read.format("graft-orc")
        .option("graft.preserve_partitioning", "true").load(supp)
      val joined = c.join(s, $"c_nationkey" === $"s_nationkey")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("pairs"))
        .orderBy($"c_nationkey")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"SPJ must elide both join-side shuffles:\n$plan")
      // correctness against the built-in join of the same parquet
      val expect = Tables.customer(spark, TestSpark.sf0001)
        .join(Tables.supplier(spark, TestSpark.sf0001),
          $"c_nationkey" === $"s_nationkey")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("pairs"))
        .orderBy($"c_nationkey").collect()
      assert(rows.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
    }
  }

  test("bucket(8, key) TRANSFORM tables join shuffle-free on the raw " +
    "key: the catalog-resolved bucket function matches both sides") {
    withSpjConf {
      val wh = Files.createTempDirectory("graft-spj-bucket-wh").toString
      spark.conf.set("spark.sql.catalog.spjcat",
        "graft.sources.v2.GraftOrcCatalog")
      spark.conf.set("spark.sql.catalog.spjcat.warehouse", wh)
      spark.sql("CREATE TABLE spjcat.cust (ck BIGINT, bal DOUBLE) " +
        "PARTITIONED BY (bucket(8, ck)) " +
        "TBLPROPERTIES('graft.preserve_partitioning'='true')")
      spark.sql("CREATE TABLE spjcat.ord (ck BIGINT, price DOUBLE) " +
        "PARTITIONED BY (bucket(8, ck)) " +
        "TBLPROPERTIES('graft.preserve_partitioning'='true')")
      Tables.customer(spark, TestSpark.sf0001)
        .selectExpr("cast(c_custkey as bigint) AS ck",
          "cast(c_acctbal as double) AS bal")
        .createOrReplaceTempView("spj_cust_src")
      Tables.orders(spark, TestSpark.sf0001)
        .selectExpr("cast(o_custkey as bigint) AS ck",
          "cast(o_totalprice as double) AS price")
        .createOrReplaceTempView("spj_ord_src")
      spark.sql("INSERT INTO spjcat.cust SELECT * FROM spj_cust_src")
      spark.sql("INSERT INTO spjcat.ord SELECT * FROM spj_ord_src")
      // high-cardinality key (1.5k customers at sf0.001; millions at
      // scale) — identity partitioning could never SPJ this; 8 bucket
      // groups can
      val joined = spark.sql(
        "SELECT c.ck, count(*) AS orders_n FROM spjcat.cust c " +
          "JOIN spjcat.ord o ON c.ck = o.ck GROUP BY c.ck ORDER BY c.ck")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket SPJ must elide both join-side shuffles:\n$plan")
      val expect = spark.sql(
        "SELECT c.ck, count(*) AS orders_n FROM spj_cust_src c " +
          "JOIN spj_ord_src o ON c.ck = o.ck GROUP BY c.ck ORDER BY c.ck")
        .collect()
      assert(rows.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
      spark.sql("DROP TABLE spjcat.cust")
      spark.sql("DROP TABLE spjcat.ord")
    }
  }

  test("mismatched partition sets: a side missing partitions still " +
    "joins shuffle-free (pushed partition values) and exactly") {
    withSpjConf {
      val (cust, _) = dirs
      // supplier subset: only 10 of the 25 nations exist on this side
      val supp10 = Files.createTempDirectory("graft-spj-supp10").toString
      Tables.supplier(spark, TestSpark.sf0001)
        .filter($"s_nationkey" < 10)
        .write.format("graft-orc").partitionBy("s_nationkey")
        .mode("append").save(supp10)
      val c = spark.read.format("graft-orc")
        .option("graft.preserve_partitioning", "true").load(cust)
      val s = spark.read.format("graft-orc")
        .option("graft.preserve_partitioning", "true").load(supp10)
      val joined = c.join(s, $"c_nationkey" === $"s_nationkey")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("pairs"))
        .orderBy($"c_nationkey")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"partition-value pushdown must keep the join shuffle-free:\n$plan")
      val expect = Tables.customer(spark, TestSpark.sf0001)
        .join(Tables.supplier(spark, TestSpark.sf0001)
            .filter($"s_nationkey" < 10),
          $"c_nationkey" === $"s_nationkey")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("pairs"))
        .orderBy($"c_nationkey").collect()
      assert(rows.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
    }
  }

  test("join keys a SUPERSET of the partition keys (partition by " +
    "bucket, join on (bucket, key)) stay shuffle-free with " +
    "requireAllClusterKeysForCoPartition=false") {
    withSpjConf {
      val prev = spark.conf
        .getOption("spark.sql.requireAllClusterKeysForCoPartition")
      spark.conf.set(
        "spark.sql.requireAllClusterKeysForCoPartition", "false")
      try {
        val d = Files.createTempDirectory("graft-spj-superset").toString
        val li = Tables.lineitem(spark, TestSpark.sf0001)
          .select($"l_orderkey", $"l_quantity")
        li.withColumn("ob", pmod($"l_orderkey", lit(8)))
          .write.format("graft-orc").partitionBy("ob")
          .mode("append").save(s"$d/a")
        li.groupBy($"l_orderkey").agg(sum($"l_quantity").as("qty"))
          .withColumn("ob", pmod($"l_orderkey", lit(8)))
          .write.format("graft-orc").partitionBy("ob")
          .mode("append").save(s"$d/b")
        def rd(p: String) = spark.read.format("graft-orc")
          .option("graft.preserve_partitioning", "true").load(p)
        val joined = rd(s"$d/a")
          .join(rd(s"$d/b").withColumnRenamed("ob", "ob2")
              .withColumnRenamed("l_orderkey", "ok2"),
            $"ob" === $"ob2" && $"l_orderkey" === $"ok2")
          .groupBy($"ob").agg(count(lit(1)).as("n"))
          .orderBy($"ob")
        val rows = joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        // join sides AND the per-bucket aggregate ride the key-grouped
        // clustering: no exchange anywhere
        assert(!plan.contains("Exchange hashpartitioning"),
          s"superset-key SPJ must be exchange-free:\n$plan")
        val expect = li
          .join(li.groupBy($"l_orderkey").agg(sum($"l_quantity").as("qty"))
              .withColumnRenamed("l_orderkey", "ok2"),
            $"l_orderkey" === $"ok2")
          .groupBy(pmod($"l_orderkey", lit(8)).as("ob"))
          .agg(count(lit(1)).as("n")).orderBy($"ob").collect()
        assert(rows.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
      } finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.requireAllClusterKeysForCoPartition", v)
        case None => spark.conf.unset(
          "spark.sql.requireAllClusterKeysForCoPartition")
      }
    }
  }

  test("without v2 bucketing the same join still answers correctly " +
    "(shuffled), so SPJ is purely an optimization") {
    val (cust, supp) = dirs
    val c = spark.read.format("graft-orc").load(cust)
    val s = spark.read.format("graft-orc").load(supp)
    val got = c.join(s, $"c_nationkey" === $"s_nationkey")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("pairs"))
      .orderBy($"c_nationkey").collect()
    val expect = Tables.customer(spark, TestSpark.sf0001)
      .join(Tables.supplier(spark, TestSpark.sf0001),
        $"c_nationkey" === $"s_nationkey")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("pairs"))
      .orderBy($"c_nationkey").collect()
    assert(got.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
  }
}
