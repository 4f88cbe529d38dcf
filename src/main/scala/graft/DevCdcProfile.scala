package graft

// TEMPORARY r22 profiling main (never committed): times each statement
// of the rl_cdc_feed_branch mutation loop to split "Spark DML jobs"
// from "feed computation" from "final union force" (guide §1.1).
object DevCdcProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val iters = 3
    (1 to iters).foreach { it =>
      var t0 = System.nanoTime()
      def lap(n: String): Unit = {
        val t1 = System.nanoTime()
        println(f"[cdc-prof i$it] $n%-18s ${(t1 - t0) / 1e9}%8.3f s")
        t0 = t1
      }
      val s = spark
      // mirror of the declared query body with laps
      val df = SparkEntry.queries // touch to load
      val cat = "gcat"
      // use the declared query via CatalogOps path? No — inline profile:
      // simplest: time the whole declared query coarsely via stages is
      // impossible; instead run the declared query AND rely on laps by
      // re-implementing. To avoid drift, keep to the exact statements:
      val t = "cdcprof" + it + System.nanoTime().toString.takeRight(6)
      s.conf.set("spark.sql.catalog.gcatp",
        "graft.sources.v2.GraftOrcCatalog")
      s.conf.set("spark.sql.catalog.gcatp.warehouse", "/tmp/graft-cdcprof")
      val qt = s"gcatp.default.$t"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS gcatp.default")
      val srcView = "cdcprofsrc" + it
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView(srcView)
      lap("setup")
      s.sql(s"CREATE TABLE $qt (c_custkey BIGINT, seg STRING, " +
        "bal DOUBLE) TBLPROPERTIES('graft.delete_mode'='mor'," +
        "'graft.update_mode'='mor'," +
        "'graft.manifest.retain'='10')")
      lap("create_table")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-feed-prof").toString + "/seq"
      s.sql(s"INSERT INTO $qt SELECT /*+ REPARTITION(4) */ * " +
        s"FROM $srcView")
      lap("insert")
      val dir = s"/tmp/graft-cdcprof/default/$t"
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val forkSeq = graft.sources.v2.GraftOrcManifest.readSnapshot(
        fs, new org.apache.hadoop.fs.Path(dir)).get.seq
      s.sql(s"CALL gcatp.system.create_branch('default.$t', " +
        "'stage')").collect()
      lap("create_branch")
      val bref = s"$qt.branch_stage"
      s.sql(s"DELETE FROM $bref WHERE bal < 2000")
      lap("delete_mor")
      val f1 = graft.sources.v2.GraftOrcChangelog.feed(
        s, dir, ckpt, pairKeys = Seq("c_custkey"),
        initialSeq = forkSeq, branch = Some("stage")).get
      f1.commit()
      lap("feed1_build")
      s.sql(s"UPDATE $bref SET seg = 'PRIME' WHERE bal > 7500")
      lap("update_mor")
      Tables.customer(s, d).filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          lit("NEW").as("seg"), lit(1.0).as("bal"))
        .write.format("graft-orc").option("graft.branch", "stage")
        .mode("append").save(dir)
      lap("append_branch")
      val f2 = graft.sources.v2.GraftOrcChangelog.feed(
        s, dir, ckpt, pairKeys = Seq("c_custkey"),
        branch = Some("stage")).get
      f2.commit()
      lap("feed2_build")
      val out = f1.df.unionByName(f2.df)
        .select(col("c_custkey"), col("seg"), col("bal"),
          col("_change_type"),
          (col("_change_seq") - lit(forkSeq)).as("step"))
        .orderBy(col("step"), col("_change_type"), col("c_custkey"))
      out.queryExecution.optimizedPlan
      lap("plan_optimize")
      out.write.format("noop").mode("overwrite").save()
      lap("force_union")
      s.catalog.dropTempView(srcView)
    }
    spark.stop()
  }
}
