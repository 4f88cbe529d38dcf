package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Joins}

/** Scale-stress harness: derives a k-times-larger events table (same user
  * population => k-times-hotter keys, the adversarial direction for
  * per-key sorts and band joins) and times the operators whose cost shape
  * is least obvious from the plan: AS-OF join, interval join, connected
  * components. Prints one JSON line per (operator, factor).
  *
  *   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 1 10
  */
object ScaleStress {

  private def num(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** Sum of `graftFilesRead` over every graft BatchScan in an executed
    * frame's plan (AQE stages, command results and subqueries included)
    * — the streaming-ingest receipts' load-bearing metric: how many of
    * the MERGE target's history files the scan actually read.
    */
  private def scanFilesRead(spark: SparkSession,
                            df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    org.apache.spark.GraftSparkBridge
      .waitUntilListenerBusEmpty(spark.sparkContext)
    def scans(pl: SparkPlan): Seq[BatchScanExec] = pl match {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        scans(c.commandPhysicalPlan)
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .flatMap(_.metrics.collectFirst {
        case (key, m) if key == "graftFilesRead" => m.value })
      .sum
  }

  /** Result of [[concurrentCommitters]] — the real-thread concurrency
    * receipt: every commit landed exactly once or threw, and the final
    * state equals the serial application of the SUCCESSFUL operations.
    */
  case class ConcurrencyResult(rounds: Int, attempted: Int,
                               succeeded: Int, conflicts: Int,
                               finalRows: Long, expectedRows: Long,
                               exactState: Boolean) {
    def ok: Boolean = exactState && finalRows == expectedRows
  }

  /** N REAL concurrent committers against one manifest table, per round:
    * `appenders` append threads (disjoint key ranges), one blind-upsert
    * thread (GraftOrcEqDelete — equality sidecar + data, the
    * commit-time sequence-validation path), and one compactor
    * (purge-first stripe merge — the rewrite that must not resurrect
    * anything). Every thread either commits exactly once or throws
    * ConcurrentModificationException after its internal retries; the
    * final table must equal the serial oracle built from the successes.
    * This is the optimistic-concurrency contract Iceberg's commit loop
    * provides, exercised with actual interleavings rather than the
    * single-threaded spec simulations.
    */
  def concurrentCommitters(spark: SparkSession, dir: String,
                           appenders: Int = 4,
                           rounds: Int = 4): ConcurrencyResult = {
    import spark.implicits._
    import graft.sources.v2.{GraftOrcCompact, GraftOrcEqDelete, GraftOrcManifest}
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // Committer key spaces MUST stay disjoint or the serial oracle is
    // confounded: base 0..999 (+ upsert 0..199, deletes 300+), appenders
    // 1000000 + r*100000 + i*1000 + j (grows with rounds), wap
    // 50000000 + r*1000, branchdml 60000000 + r*1000. Round 20 burned
    // this: at rounds >= 10 the old wap base (2000000) collided with
    // appender round-10 keys and the 12-round soak read as inexact
    // state with nothing actually wrong.
    require(1000000L + rounds.toLong * 100000L <= 50000000L,
      s"concurrentCommitters: $rounds rounds would push appender keys " +
        "into the wap key space — raise the wap/branchdml bases first")
    require(appenders <= 100,
      s"concurrentCommitters: $appenders appenders overflow one round's " +
        "100000-wide appender key block into the next round's " +
        "(i*1000 + j needs i < 100) — widen the per-round stride first")
    val baseKeys = 0 until 1000
    baseKeys.map(k => (k, "base")).toDF("k", "v").repartition(4)
      .write.format("graft-orc").option("graft.manifest", "true")
      .option("graft.manifest.retain", "3").mode("overwrite").save(dir)

    // a registered MoR table name so a DELETE committer can race too
    // (position sidecars + expectPresent validation under interleaving)
    val tname = "g_conc_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    spark.sql(s"DROP TABLE IF EXISTS $tname")
    spark.sql(s"CREATE TABLE $tname USING `graft-orc` LOCATION '$dir' " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    // a graft CATALOG handle over the same location, so a branch-DML
    // committer can race `DELETE FROM t.branch_<n>` (round 13): branch
    // handles resolve through GraftOrcCatalog, not the session catalog
    val cname = "gconc" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(6)
    spark.conf.set(s"spark.sql.catalog.$cname",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse",
      java.nio.file.Files.createTempDirectory("graft-conc-wh").toString)
    spark.sql(s"CREATE TABLE $cname.t (k INT, v STRING) " +
      s"LOCATION '$dir'")

    val attempted = new java.util.concurrent.atomic.AtomicInteger()
    val succeeded = new java.util.concurrent.atomic.AtomicInteger()
    val conflicts = new java.util.concurrent.atomic.AtomicInteger()
    // serial oracle inputs, recorded only for operations that COMMITTED
    val appendedBatches =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Int, Int)]()) // (round, appender)
    val upsertRounds =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[Int]())
    val deletedRanges =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Int, Int)]()) // [lo, hi)
    val wapRounds =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[Int]())

    (0 until rounds).foreach { r =>
      val errs = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Throwable]())
      // Loud, state-free failures a committer may legitimately hit:
      // a same-seq/validation conflict, or the RETENTION race — its
      // planned snapshot's files were replaced by rivals and physically
      // expired (retain=3 here, 6 commits/round: the adversarial
      // setting) before its scan finished. Both throw BEFORE the
      // commit, so nothing becomes visible — the contract is "exactly
      // once or loudly never", not "never fails".
      def retentionRace(t: Throwable): Boolean = {
        var c = t
        while (c != null) {
          if (c.isInstanceOf[java.io.FileNotFoundException]) return true
          c = c.getCause
        }
        false
      }
      def committer(name: String)(body: => Unit)(onOk: => Unit): Thread = {
        val t = new Thread(() => {
          attempted.incrementAndGet()
          try { body; succeeded.incrementAndGet(); onOk }
          catch {
            case _: java.util.ConcurrentModificationException =>
              conflicts.incrementAndGet() // loud, exactly-zero-times
            case e: Throwable if retentionRace(e) =>
              conflicts.incrementAndGet()
            case e: Throwable => errs.add(e)
          }
        }, s"graft-conc-$name-r$r")
        t.start(); t
      }
      val threads =
        (0 until appenders).map { i =>
          committer(s"append$i") {
            ((0 until 100).map(j =>
              (1000000 + r * 100000 + i * 1000 + j, s"app-$r-$i")))
              .toDF("k", "v").coalesce(1)
              .write.format("graft-orc").mode("append").save(dir)
          } { appendedBatches.add((r, i)) }
        } ++ Seq(
          committer("upsert") {
            GraftOrcEqDelete.upsert(spark, dir,
              (0 until 200).map(k => (k, s"ups-$r")).toDF("k", "v"),
              Seq("k"))
          } { upsertRounds.add(r) },
          committer("delete") {
            // per-round disjoint slice of the base keys, away from the
            // upsert's 0..199 — a real SQL MoR DELETE racing everyone
            val lo = 300 + r * 50
            spark.sql(s"DELETE FROM $tname WHERE k >= $lo AND k < ${lo + 25}")
          } { deletedRanges.add((300 + r * 50, 300 + r * 50 + 25)) },
          committer("compact") {
            GraftOrcCompact.compact(spark, dir,
              targetBytes = 64L << 20, smallFileBytes = 32L << 20)
          } { () },
          // deletion-vector consolidation racing the MoR delete + purge
          // + compact committers (round 14): content-preserving like
          // compact, so the serial oracle is untouched — what's under
          // test is the expectDeletes serialization (a consolidation
          // planned against a sidecar set a rival changed must retry or
          // fail loudly, never drop or duplicate a position)
          committer("consolidate") {
            graft.sources.v2.GraftOrcMor.consolidate(spark, dir)
          } { () },
          // the WAP loop racing everyone: fork -> staged append on the
          // branch -> audit read -> divergence-tolerant cherry-pick.
          // Exercises per-lineage commit locking and the cross-lineage
          // expiry/vacuum protection under real interleavings (main
          // commits 6x/round at retain=3 while the branch lives).
          committer("wap") {
            val pth = new org.apache.hadoop.fs.Path(dir)
            val bname = s"wap-$r"
            // pinned per-branch retention: the slow branch must keep its
            // own depth while main churns at retain=3 around it
            GraftOrcManifest.createBranch(fs, pth, bname,
              retain = Some(6))
            try {
              (0 until 80).map(j => (50000000 + r * 1000 + j, s"wap-$r"))
                .toDF("k", "v").coalesce(1)
                .write.format("graft-orc").option("graft.branch", bname)
                .mode("append").save(dir)
              val staged = spark.read.format("graft-orc")
                .option("graft.branch", bname).load(dir)
                .filter(col("k") >= 50000000 + r * 1000).count()
              require(staged == 80, s"branch audit read saw $staged/80")
              GraftOrcManifest.cherryPick(
                spark.sparkContext.hadoopConfiguration, dir, bname)
            } catch { case t: Throwable =>
              GraftOrcManifest.dropBranch(fs, pth, bname); throw t
            }
          } { wapRounds.add(r) },
          // branch DML racing everyone (round 13): fork -> staged
          // append -> branch-scoped CoW DELETE of part of the stage
          // (scans the branch, swaps against the branch lineage under
          // its own commit lock) -> audit -> drop (failed-gate path; a
          // DML branch is fast_forward-only and main races ahead here,
          // so publish is structurally off). Main state must be
          // bit-identical to a world where this committer never ran.
          committer("branchdml") {
            val pth = new org.apache.hadoop.fs.Path(dir)
            val bname = s"bdml$r"
            val lo = 60000000 + r * 1000
            GraftOrcManifest.createBranch(fs, pth, bname)
            try {
              (0 until 60).map(j => (lo + j, s"bdml-$r")).toDF("k", "v")
                .coalesce(1).write.format("graft-orc")
                .option("graft.branch", bname).mode("append").save(dir)
              spark.sql(s"DELETE FROM $cname.t.branch_$bname " +
                s"WHERE k >= $lo AND k < ${lo + 20}")
              val staged = spark.read.format("graft-orc")
                .option("graft.branch", bname).load(dir)
                .filter(col("k") >= lo).count()
              require(staged == 40,
                s"branch DML audit read saw $staged/40")
            } finally GraftOrcManifest.dropBranch(fs, pth, bname)
          } { () })
      threads.foreach(_.join(300000))
      if (!errs.isEmpty)
        throw new IllegalStateException(
          s"concurrent committer failed non-loudly: ${errs.get(0)}",
          errs.get(0))
    }

    // serial oracle: base ∪ successful appends, upserted keys at their
    // LAST successful round's value (rounds are join-separated, so
    // "newest wins" has a defined order)
    import scala.jdk.CollectionConverters._
    val lastUps = upsertRounds.asScala.toSeq.sorted.lastOption
    val deleted: Set[Int] = deletedRanges.asScala
      .flatMap { case (lo, hi) => lo until hi }.toSet
    val expected: Map[Int, String] =
      baseKeys.filterNot(deleted).map(k => k -> lastUps.map(r =>
        if (k < 200) s"ups-$r" else "base").getOrElse("base")).toMap ++
      appendedBatches.asScala.flatMap { case (r, i) =>
        (0 until 100).map(j =>
          (1000000 + r * 100000 + i * 1000 + j) -> s"app-$r-$i")
      } ++
      wapRounds.asScala.flatMap { r =>
        (0 until 80).map(j => (50000000 + r * 1000 + j) -> s"wap-$r")
      }
    val actual = spark.read.format("graft-orc").load(dir)
      .as[(Int, String)].collect().toMap
    val actualRows = spark.read.format("graft-orc").load(dir).count()
    spark.sql(s"DROP TABLE IF EXISTS $tname")
    spark.sql(s"DROP TABLE IF EXISTS $cname.t")
    if (actual != expected || actualRows != expected.size) {
      val missing = expected.keySet -- actual.keySet
      val extra = actual.keySet -- expected.keySet
      val changed = expected.keySet.intersect(actual.keySet)
        .filter(k => expected(k) != actual(k))
      System.err.println(s"[conc-debug] missing=${missing.size} " +
        s"(${missing.take(5)} -> ${missing.take(5).map(expected)}) " +
        s"extra=${extra.size} (${extra.take(5)}) " +
        s"changed=${changed.take(5).map(k =>
          s"$k:${expected(k)}!=${actual(k)}")} " +
        s"rows=$actualRows vs ${expected.size}")
    }
    // seq history sanity: one live snapshot, readable
    GraftOrcManifest.readSnapshot(fs,
      fs.makeQualified(new org.apache.hadoop.fs.Path(dir))).get
    ConcurrencyResult(rounds, attempted.get(), succeeded.get(),
      conflicts.get(), actualRows, expected.size.toLong,
      exactState = actual == expected && actualRows == expected.size)
  }

  /** CROSS-DRIVER auto-compaction receipt: one JVM per role, launched by
    * scripts/xdriver_receipt.sh —
    *   ScaleStress <sfDir> xdriver <workDir> prep
    *   ScaleStress <sfDir> xdriver <workDir> <driverId> <commits>   (x2, concurrent)
    *   ScaleStress <sfDir> xdriver <workDir> check <commits>
    * Two drivers append small-file batches to ONE shared path table with
    * `spark.graft.compact_after` set, under -Dgraft.commit.lock=file.
    * The claim: with the `compact.intent` marker, neither driver ever
    * burns a merge it then loses to the other (per-driver lost_race = 0;
    * rivals' windows show up as skipped_cross_driver instead), and the
    * final state is exact. The wrapper's second pass disables the marker
    * (-Dgraft.compact.intent_cooldown_ms=0) to show the waste it
    * removes. Writer roles print one JSON line of their auto counters;
    * check verifies row-exactness or throws.
    */
  private def xdriverMain(args: Array[String]): Unit = {
    val workDir = args(2)
    val role = args(3)
    val commits = args.lift(4).map(_.toInt).getOrElse(12)
    val rowsPerCommit = 20000L
    val spark = SparkSession.builder().master("local[12]")
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 4 tiny files/commit x 2 drivers: the threshold trips constantly
      // once the table warms up, so maintenance windows overlap if
      // nothing coordinates them
      .config("spark.graft.compact_after", "24")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"$workDir/xdriver-table"
    role match {
      case "prep" =>
        spark.range(0).selectExpr("id", "id AS v")
          .write.format("graft-orc").option("graft.manifest", "true")
          .mode("overwrite").save(dir)
        println(s"""{"op":"xdriver","phase":"prep","dir":"$dir"}""")
      case "check" =>
        val df = spark.read.format("graft-orc").load(dir)
        val rows = df.count()
        val distinct = df.select("id").distinct().count()
        val expected = 2L * commits * rowsPerCommit
        val files = {
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          graft.sources.v2.GraftOrcManifest
            .readSnapshot(fs, fs.makeQualified(p))
            .map(_.entries.size).getOrElse(-1)
        }
        val exact = rows == expected && distinct == expected
        println(s"""{"op":"xdriver","phase":"check","rows":$rows,""" +
          s""""expected":$expected,"distinct":$distinct,""" +
          s""""files":$files,"exact_state":$exact}""")
        require(exact, s"xdriver: expected $expected rows, got $rows " +
          s"($distinct distinct) — a maintenance run lost data")
      case id =>
        val driverId = id.toInt
        graft.sources.v2.GraftOrcCompact.resetAutoCompactStats()
        (0 until commits).foreach { i =>
          // driver-disjoint ascending ids; 4 small files per commit
          val base = driverId.toLong * 1000000000L + i.toLong * 1000000L
          spark.range(rowsPerCommit)
            .selectExpr(s"id + ${base}L AS id", "id * 2 AS v")
            .repartition(4)
            .write.format("graft-orc").option("graft.manifest", "true")
            .mode("append").save(dir)
        }
        val ac = graft.sources.v2.GraftOrcCompact.autoCompactStats
        println(s"""{"op":"xdriver","driver":$driverId,""" +
          s""""commits":$commits,""" +
          s""""auto_attempted":${ac("attempted")},""" +
          s""""auto_landed":${ac("landed")},""" +
          s""""auto_lost_race":${ac("lost_race")},""" +
          s""""auto_skipped_in_flight":${ac("skipped_in_flight")},""" +
          s""""auto_skipped_cross_driver":${ac("skipped_cross_driver")}}""")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.lift(1).contains("xdriver")) { xdriverMain(args); return }
    val embedMode = args.lift(1).contains("embed")
    val incremMode = args.lift(1).contains("increm")
    val tpcdsMode = args.lift(1).contains("tpcds")
    val bigramSkewMode = args.lift(1).contains("bigramskew")
    val bigramMode = !bigramSkewMode && args.lift(1).contains("bigram")
    val compactMode = args.lift(1).contains("compact")
    val manifestMode = args.lift(1).contains("manifest")
    val semdedupMode = args.lift(1).contains("semdedup")
    val perplexityMode = args.lift(1).contains("perplexity")
    val spjMode = args.lift(1).contains("spj")
    val morMode = args.lift(1).contains("mor")
    val morDenseMode = args.lift(1).contains("mordense")
    val consolidateMode = args.lift(1).contains("consolidate")
    val branchConsMode = args.lift(1).contains("branchcons")
    val manifestScaleMode = args.lift(1).contains("manifestscale")
    val streamIngestMode = args.lift(1).contains("streamingest")
    val neardupAutoMode = args.lift(1).contains("neardupauto")
    val neardupReplayMode = args.lift(1).contains("neardupreplay")
    val neardupMode = args.lift(1).contains("neardup")
    val ntileGateMode = args.lift(1).contains("ntilegate")
    val specEvoMode = args.lift(1).contains("specevo")
    val evoMode = !specEvoMode && args.lift(1).contains("evo")
    val upsertMode = args.lift(1).contains("upsert")
    val concurrentMode = args.lift(1).contains("concurrent")
    val wapMode = args.lift(1).contains("wap")
    val hiddenMode = args.lift(1).contains("hidden")
    val hasMode = incremMode || embedMode || tpcdsMode || bigramMode || bigramSkewMode ||
      compactMode || semdedupMode || perplexityMode || manifestMode ||
      spjMode || morMode || evoMode || upsertMode || concurrentMode ||
      wapMode || hiddenMode || specEvoMode || morDenseMode ||
      consolidateMode || branchConsMode || manifestScaleMode ||
      streamIngestMode || neardupMode || neardupAutoMode ||
      neardupReplayMode || ntileGateMode
    val factors = {
      // non-numeric trailing args must be KNOWN mode flags (e.g.
      // neardupauto's `nomaint`) — anything else is a typo'd factor or
      // mode and silently running a different stress with default
      // factors would produce a wrong receipt with no signal
      val trailing = args.drop(if (hasMode) 2 else 1)
      val knownFlags = Set("nomaint")
      val (nums, rest) = trailing.partition(a =>
        a.nonEmpty && a.forall(_.isDigit))
      val unknown = rest.filterNot(knownFlags)
      require(unknown.isEmpty,
        s"graft ScaleStress: unrecognized argument(s) " +
          s"${unknown.mkString(", ")} - not a factor (digits) and not " +
          s"one of ${knownFlags.mkString(", ")}")
      if (nums.nonEmpty) nums.map(_.toInt).toSeq else Seq(1, 10)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scaled(k: Int): DataFrame = {
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      // k shifted copies: same users (hotter keys), jittered timestamps,
      // disjoint event ids
      (0 until k).map { i =>
        e.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
          col("user_id"), col("event_type"),
          (col("ts_us") + lit(i.toLong * 7919L)).as("ts_us"))
      }.reduce(_ union _)
    }

    def time(name: String, k: Int)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count() // full materialization
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"op":"$name","factor":$k,"rows":$rows,"sec":${num(sec)}}""")
    }

    // Embedding near-dup crossover: brute-force n^2 cosine vs multi-table
    // hyperplane LSH at k-times the vector count (near-dup copies via
    // Dedup.expandVectors). Planes-per-table scales with log2(n) so the
    // bucket count tracks the corpus (a fixed bucket count makes LSH
    // candidates quadratic too — BASELINE.md lesson 2).
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 embed 10 30
    if (embedMode) {
      import graft.functions.VectorFunctions
      factors.foreach { k =>
        val e = Dedup.expandVectors(Tables.embeddings(spark, sfDir), k)
          .localCheckpoint(true) // materialize: time the search, not the prep
        val n = e.count()
        val planes = math.max(6, (math.log(n.toDouble) / math.log(2)).toInt - 4)
        time(s"embed_brute(n=$n)", k) {
          val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
          val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
          a.crossJoin(b).filter(col("a_id") < col("b_id"))
            .filter(VectorFunctions.cosine(col("a_v"), col("b_v")) >= 0.8)
            .select(col("a_id"), col("b_id"))
        }
        time(s"embed_lsh(n=$n,planes=$planes)", k) {
          Dedup.embedLshNearDups(e, 0.8, tables = 8, planesPerTable = planes)
        }
      }
      spark.stop()
      return
    }

    // Storage-partitioned-join receipt: the SAME co-partitioned
    // fact-to-fact join (two k-scaled lineitem derivatives, hive-
    // partitioned on an order bucket, joined on (bucket, orderkey))
    // measured with SPJ reporting ON vs OFF, recording wall time AND the
    // total shuffle bytes the job wrote. The claim under test is not
    // "faster at sf0.1" (local disk shuffles are cheap) but "the join
    // sides move ZERO bytes" — the quantity that dominates at 100 TB.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 spj 1 4
    if (spjMode) {
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit =
            shuffleBytes.addAndGet(
              sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        })
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // join keys (ob, l_orderkey) are a SUPERSET of the partition keys
      // (ob) — the standard lake shape (partition by day, join on
      // (day, id)); the strict default refuses co-partitioning unless
      // every join key is a partition key, so relax it for this shape
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      factors.foreach { k =>
        val li0 = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"))
        val li = (0 until k).map { i =>
          li0.select(
            (col("l_orderkey") + lit(i.toLong * 1000000000L))
              .as("l_orderkey"),
            col("l_quantity"), col("l_extendedprice"))
        }.reduce(_ union _)
        val base = java.nio.file.Files
          .createTempDirectory(s"graft-spj-stress-$k").toString
        val a = s"$base/a"; val b = s"$base/b"
        li.withColumn("ob", pmod(col("l_orderkey"), lit(64)))
          .write.format("graft-orc").partitionBy("ob")
          .mode("append").save(a)
        li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .withColumn("ob", pmod(col("l_orderkey"), lit(64)))
          .write.format("graft-orc").partitionBy("ob")
          .mode("append").save(b)
        def read(p: String, spj: Boolean) = {
          val r = spark.read.format("graft-orc")
          (if (spj) r.option("graft.preserve_partitioning", "true") else r)
            .load(p)
        }
        def joined(spj: Boolean) =
          read(a, spj).join(read(b, spj).withColumnRenamed("ob", "ob2")
              .withColumnRenamed("l_orderkey", "ok2"),
            col("ob") === col("ob2") && col("l_orderkey") === col("ok2"))
            .groupBy(col("ob"))
            .agg(count(lit(1)).as("n"),
              sum(col("l_extendedprice") * col("qty")).as("v"))
        Seq(true, false).foreach { spj =>
          // settle the listener, then isolate this run's shuffle bytes
          Thread.sleep(1500)
          val before = shuffleBytes.get()
          val t0 = System.nanoTime()
          val rows = joined(spj).count()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1500) // stageCompleted events drain async
          val bytes = shuffleBytes.get() - before
          println(s"""{"op":"spj_join","spj":$spj,"factor":$k,""" +
            s""""rows":$rows,"sec":${num(sec)},"shuffle_bytes":$bytes}""")
        }
      }
      spark.stop()
      return
    }

    // Dense-delete deletion-vector receipt: a clustered ~30% DELETE —
    // every 64k-position chunk holds far more than 4096 deletions, so
    // the roaring-style containers go DENSE (fixed 8KB bitmap per 64k
    // rows ≈ 1 bit/row) — priced against the row-ORC sidecar encoding
    // of the same positions. The round-13 receipt priced the bitmap's
    // WORST case (scattered 0.1%, array containers, only 24% smaller
    // than ORC); this is the advertised case. Bytes-per-deleted-row is
    // the headline column.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 mordense 1
    if (morDenseMode) {
      def sidecarBytes(dir: String): Long = {
        val out = collection.mutable.ArrayBuffer.empty[Long]
        def walk(f: java.io.File): Unit =
          if (f.isFile) {
            if (f.getPath.contains(graft.sources.v2.GraftOrcMor.DeletesDir))
              out += f.length()
          } else if (f.isDirectory) f.listFiles().foreach(walk)
        walk(new java.io.File(dir))
        out.sum
      }
      factors.foreach { k =>
        val li0 = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"))
        val li = (0 until k).map { i =>
          li0.select(
            (col("l_orderkey") + lit(i.toLong * 1000000000L))
              .as("l_orderkey"),
            col("l_quantity"), col("l_extendedprice"))
        }.reduce(_ union _)
        Seq("mor-orc", "mor-bitmap").foreach { tag =>
          val sideFmt = if (tag == "mor-bitmap") "bitmap" else "orc"
          val dir = java.nio.file.Files
            .createTempDirectory(s"graft-mordense-$tag-$k").toString
          // 4 large files: a 64k-position chunk then holds ~100%-filled
          // row ranges, the container-fill best case the bitmap's dense
          // form is designed for (16 small files leave every chunk
          // mostly empty and charge the full 8KB anyway)
          li.repartition(4).write.format("graft-orc")
            .option("graft.manifest", "true").mode("append").save(dir)
          val t = s"g_dense_${tag.replace('-', '_')}_$k"
          spark.sql(s"DROP TABLE IF EXISTS $t")
          spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
            "TBLPROPERTIES('graft.delete_mode'='mor', " +
            s"'graft.delete_sidecar_format'='$sideFmt')")
          val total = spark.table(t).count()
          val t0 = System.nanoTime()
          // ~30% of the price distribution — hash-spread rows mean
          // every file deletes ~30% of its positions: dense chunks
          spark.sql(s"DELETE FROM $t WHERE l_extendedprice < 30000")
          val delSec = (System.nanoTime() - t0) / 1e9
          val deleted = total - spark.table(t).count()
          val bytes = sidecarBytes(dir)
          val t1 = System.nanoTime()
          spark.read.format("graft-orc").load(dir)
            .agg(sum(col("l_quantity"))).collect()
          val readSec = (System.nanoTime() - t1) / 1e9
          println(s"""{"op":"mor_delete_dense","mode":"$tag",""" +
            s""""factor":$k,"table_rows":$total,"deleted_rows":$deleted,""" +
            s""""sidecar_bytes":$bytes,""" +
            s""""bytes_per_deleted_row":${num(bytes.toDouble /
              math.max(1L, deleted))},""" +
            s""""bits_per_table_row":${num(bytes * 8.0 /
              math.max(1L, total))},""" +
            s""""delete_sec":${num(delSec)},"read_sec":${num(readSec)}}""")
          spark.sql(s"DROP TABLE IF EXISTS $t")
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(dir))
        }
      }
      spark.stop()
      return
    }

    // Deletion-vector consolidation receipt: k small MoR DELETE commits
    // accumulate k+ sidecars — every scan task's header walk and
    // bitmapFor probe then pays per live sidecar — and ONE consolidate
    // (pure metadata + sidecar bytes, no data rewritten) restores a
    // single vector. The claim under test: read cost grows with live
    // sidecar count and snaps back flat after consolidation, at a
    // consolidation price unrelated to table bytes.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 consolidate 5 20
    if (consolidateMode) {
      val checkpoints = factors.sorted
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft-consolidate").toString
      li.repartition(16).write.format("graft-orc")
        .option("graft.manifest", "true").mode("append").save(dir)
      val t = "g_consolidate"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
        "TBLPROPERTIES('graft.delete_mode'='mor', " +
        "'graft.delete_sidecar_format'='bitmap')")
      def readSec(): Double = {
        val samples = (0 until 3).map { _ =>
          val t0 = System.nanoTime()
          spark.read.format("graft-orc").load(dir)
            .agg(sum(col("l_quantity"))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        samples.min
      }
      def sidecars(): Int = {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.sources.v2.GraftOrcManifest.readSnapshot(fs, p)
          .get.deletes.size
      }
      readSec() // JIT/codegen warm-up outside every measurement
      // ONE growing table: each narrow price band deletes in its own
      // commit (hash-spread rows -> every file partial, one dv per
      // commit); read cost is sampled at each checkpoint
      var done = 0
      checkpoints.foreach { k =>
        (done until k).foreach { i =>
          val lo = 40000 + i * 100
          spark.sql(s"DELETE FROM $t WHERE l_extendedprice >= $lo " +
            s"AND l_extendedprice < ${lo + 50}")
        }
        done = k
        println(s"""{"op":"consolidate_probe","commits":$k,""" +
          s""""live_sidecars":${sidecars()},""" +
          s""""read_sec":${num(readSec())}}""")
      }
      val t1 = System.nanoTime()
      val (retired, written) =
        graft.sources.v2.GraftOrcMor.consolidate(spark, dir)
      val consSec = (System.nanoTime() - t1) / 1e9
      println(s"""{"op":"consolidate","commits":$done,""" +
        s""""retired":$retired,"written":$written,""" +
        s""""consolidate_sec":${num(consSec)},""" +
        s""""live_sidecars":${sidecars()},""" +
        s""""read_sec":${num(readSec())}}""")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
      spark.stop()
      return
    }

    // Manifest-scale receipt (round 15): every commit round-trips the
    // snapshot file (parse newest -> serialize seq+1) and consolidate/
    // scan planning walk snap.entries driver-side — at 100k+ entries
    // the parse/serialize cost is the next plausible scale cliff. The
    // claim under test: read and commit-round-trip latency stay
    // near-LINEAR in entry count and the 100k-entry round trip stays
    // O(100ms) — i.e. negligible against the data write it piggybacks
    // on. Entries carry realistic per-column stats payloads (~200 B)
    // so the parse cost is honest.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 manifestscale 1000 10000 100000
    if (manifestScaleMode) {
      import graft.sources.v2.{GraftOrcManifest, OrcFileEntry}
      val counts =
        if (args.length > 2) factors else Seq(1000, 10000, 100000)
      counts.foreach { n =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-mscale-$n").toString
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val qt = fs.makeQualified(p)
        def b64(i: Int) = java.util.Base64.getEncoder
          .encodeToString(s"v$i".getBytes("UTF-8"))
        val entries = (0 until n).map { i =>
          OrcFileEntry(
            path = s"$qt/w-${i / 512}/part-$i-0-${i % 512}.snappy.orc",
            length = 64L * 1024 * 1024 + i,
            partitionValues = Map.empty,
            mtime = 1786692091502L + i,
            stats = Some(s"r=${100000 + i}" +
              (1 to 4).map(c => s"c=Y28kYyR7Yz0k|v=${i % 7}|h=0|k=d|" +
                s"a=${b64(i)}|z=${b64(i + c)}").mkString("")),
            schemaV = 1L)
        }
        val t0 = System.nanoTime()
        GraftOrcManifest.writeSnapshot(fs, qt, 1L, entries, op = "append")
        val writeSec = (System.nanoTime() - t0) / 1e9
        // first read parses the fresh segments cold; repeats hit the
        // write-once segment cache — report both prices
        val reads = (0 until 3).map { _ =>
          val t = System.nanoTime()
          val s = GraftOrcManifest.readSnapshot(fs, qt).get
          require(s.entries.size == n)
          (System.nanoTime() - t) / 1e9
        }
        // the real per-commit price (the commitSwap shape): parse
        // newest, append one entry, carry untouched segments by ref
        val t2 = System.nanoTime()
        val cur = GraftOrcManifest.readSnapshot(fs, qt).get
        GraftOrcManifest.writeSnapshot(fs, qt, cur.seq + 1,
          cur.entries :+ entries.head.copy(
            path = s"$qt/w-extra/part-extra.snappy.orc"),
          op = "append", carryFrom = Some(cur))
        val commitSec = (System.nanoTime() - t2) / 1e9
        val mdir = new org.apache.hadoop.fs.Path(qt, "_graft_manifest")
        val bytes = fs.listStatus(mdir)
          .filter(_.getPath.getName.startsWith("snap-"))
          .map(_.getLen).max
        val nSegs = fs.listStatus(mdir)
          .count(_.getPath.getName.startsWith("seg-"))
        println(s"""{"op":"manifest_scale","entries":$n,""" +
          s""""first_write_sec":${num(writeSec)},""" +
          s""""read_cold_sec":${num(reads.head)},""" +
          s""""read_cached_sec":${num(reads.min)},""" +
          s""""commit_roundtrip_sec":${num(commitSec)},""" +
          s""""snapshot_bytes":$bytes,"segments":$nSegs}""")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(dir))
      }
      spark.stop()
      return
    }

    // Branch-lineage sidecar bound receipt (round 15): K MoR DELETE
    // commits stage on a BRANCH — branch commits deliberately skip
    // auto-consolidation, so the branch head accumulates ~K sidecars —
    // then ONE fast_forward publishes the head to main, where the
    // property-gated consolidation fires on the merged state. The claim
    // under test: main's live position-sidecar count after publish is
    // bounded by the consolidation output (ceil(K/64), typically 1),
    // NOT by K — a long DML-heavy WAP stage cannot park an unbounded
    // per-scan sidecar probe cost on main.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 branchcons 1 20
    if (branchConsMode) {
      val k = factors.max
      val cname = "gbcons" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(6)
      val wh = java.nio.file.Files
        .createTempDirectory("graft-branchcons-wh").toString
      spark.conf.set(s"spark.sql.catalog.$cname",
        "graft.sources.v2.GraftOrcCatalog")
      spark.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
      spark.sql(s"CREATE TABLE $cname.t (l_orderkey BIGINT, " +
        "l_quantity DOUBLE, l_extendedprice DOUBLE) " +
        "TBLPROPERTIES('graft.delete_mode'='mor', " +
        "'graft.delete_sidecar_format'='bitmap', " +
        "'graft.consolidate_after'='8', 'graft.manifest.retain'='3')")
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"))
        .repartition(16)
        .writeTo(s"$cname.t").append()
      val dir = new org.apache.hadoop.fs.Path(s"$wh/t")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def sidecars(branch: Option[String]): Int =
        graft.sources.v2.GraftOrcManifest
          .readSnapshot(fs, fs.makeQualified(dir), branch)
          .map(_.deletes.size).getOrElse(0)
      spark.sql(s"CALL $cname.system.create_branch('t', 'stage')")
        .collect()
      (0 until k).foreach { i =>
        val lo = 40000 + i * 100
        spark.sql(s"DELETE FROM $cname.t.branch_stage " +
          s"WHERE l_extendedprice >= $lo AND l_extendedprice < ${lo + 50}")
      }
      println(s"""{"op":"branchcons_staged","branch_commits":$k,""" +
        s""""branch_sidecars":${sidecars(Some("stage"))},""" +
        s""""main_sidecars":${sidecars(None)}}""")
      val t0 = System.nanoTime()
      spark.sql(s"CALL $cname.system.fast_forward('t', 'stage')")
        .collect()
      val ffSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = spark.table(s"$cname.t").agg(sum(col("l_quantity")))
        .collect()(0).getDouble(0)
      val readSec = (System.nanoTime() - t1) / 1e9
      println(s"""{"op":"branchcons_published",""" +
        s""""main_sidecars":${sidecars(None)},""" +
        s""""fast_forward_sec":${num(ffSec)},""" +
        s""""read_sec":${num(readSec)},"sum_qty":${num(n)}}""")
      spark.sql(s"DROP TABLE IF EXISTS $cname.t")
      spark.stop()
      return
    }

    // Merge-on-read vs copy-on-write DELETE receipt: the SAME sparse
    // DELETE (~0.1% of rows, hash-spread so it intersects EVERY file) on
    // two identical k-scaled manifest tables, one per delete mode. The
    // claim under test: CoW write amplification is ~the whole table
    // (every file is partial), MoR's is ~the rows deleted (KB sidecars)
    // — the quantity that decides the strategy at 100 TB — priced
    // against MoR's read tax (row-wise scan until purge) and the purge
    // that retires it.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 mor 1 4
    if (morMode) {
      def orcBytes(dir: String): Map[String, Long] = {
        val out = Map.newBuilder[String, Long]
        def walk(f: java.io.File): Unit =
          if (f.isFile) {
            if (f.getName.endsWith(".orc") || f.getName.endsWith(".bin"))
              out += f.getPath -> f.length()
          } else if (f.isDirectory) f.listFiles().foreach(walk)
        walk(new java.io.File(dir))
        out.result()
      }
      factors.foreach { k =>
        val li0 = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"))
        val li = (0 until k).map { i =>
          li0.select(
            (col("l_orderkey") + lit(i.toLong * 1000000000L))
              .as("l_orderkey"),
            col("l_quantity"), col("l_extendedprice"))
        }.reduce(_ union _)
        // mor runs once per sidecar ENCODING: the row-ORC form vs the
        // round-13 deletion vectors (GraftOrcDeleteVector) — the receipt
        // the bitmap work is judged on is sidecar bytes + read tax
        Seq("cow", "mor-orc", "mor-bitmap").foreach { tag =>
          val mode = if (tag == "cow") "cow" else "mor"
          val sideFmt = if (tag == "mor-bitmap") "bitmap" else "orc"
          val dir = java.nio.file.Files
            .createTempDirectory(s"graft-mor-stress-$tag-$k").toString
          li.repartition(16).write.format("graft-orc")
            .option("graft.manifest", "true").mode("append").save(dir)
          val t = s"g_stress_${tag.replace('-', '_')}_$k"
          spark.sql(s"DROP TABLE IF EXISTS $t")
          spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
            s"TBLPROPERTIES('graft.delete_mode'='$mode', " +
            s"'graft.delete_sidecar_format'='$sideFmt')")
          val before = orcBytes(dir)
          val t0 = System.nanoTime()
          // rows are hash-spread by the repartition, so this narrow price
          // band (~0.1% of rows) intersects every file's sidecar range:
          // no file full-drops, every file classifies partial
          spark.sql(s"DELETE FROM $t WHERE l_extendedprice >= 50000 " +
            "AND l_extendedprice < 50100")
          val delSec = (System.nanoTime() - t0) / 1e9
          val after = orcBytes(dir)
          val fresh = after.view.filterKeys(p => !before.contains(p)).toMap
          val sidecarBytes = fresh.view.filterKeys(
            _.contains(graft.sources.v2.GraftOrcMor.DeletesDir)).values.sum
          val t1 = System.nanoTime()
          val rows = spark.read.format("graft-orc").load(dir)
            .agg(sum(col("l_quantity"))).collect()
          val readSec = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val purged =
            if (mode == "mor") graft.sources.v2.GraftOrcMor.purge(spark, dir)
            else 0
          val purgeSec = (System.nanoTime() - t2) / 1e9
          println(s"""{"op":"mor_delete","mode":"$tag","factor":$k,""" +
            s""""table_bytes":${before.values.sum},""" +
            s""""bytes_written":${fresh.values.sum},""" +
            s""""sidecar_bytes":$sidecarBytes,""" +
            s""""files_written":${fresh.size},""" +
            s""""delete_sec":${num(delSec)},"read_sec":${num(readSec)},""" +
            s""""purged_files":$purged,"purge_sec":${num(purgeSec)}}""")
          spark.sql(s"DROP TABLE IF EXISTS $t")
          // reclaim the temp tables (factor-k lineitem copies add up)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(dir))
        }
      }
      spark.stop()
      return
    }

    // Incremental-dedup receipt: the daily-crawl posture (dd_incremental)
    // against a MAINTAINED fingerprint table — the state a production
    // pipeline keeps — vs re-deduping the whole corpus every batch. The
    // history grows k-fold; the crawl is FIXED. Incremental cost = hash
    // the crawl + anti-join the 8-byte fp column read back from a
    // graft-orc table (columnar single-column scan) + append the new
    // fps; full cost = fingerprint and window-dedup history+crawl from
    // scratch. The claim: incremental stays ~crawl-bounded while full
    // re-dedup grows with the corpus.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 increm 1 10
    if (incremMode) {
      import graft.functions.TextHashFunctions.md5Key60
      val docs0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val crawl = docs0.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), md5Key60(col("text")).as("fp"))
      factors.foreach { k =>
        val history = (0 until k).map { i =>
          docs0.filter(col("doc_id") % 2 === 0).select(
            (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
            col("text"))
        }.reduce(_ union _)
        // maintained state: the history's distinct fingerprints live in
        // a graft-orc table (its build cost is history ingest, amortized
        // across every past batch — not this batch's bill)
        val fpDir = java.nio.file.Files
          .createTempDirectory(s"graft-increm-fp-$k").toString
        history.select(md5Key60(col("text")).as("fp")).distinct()
          .repartition(8).write.format("graft-orc")
          .option("graft.manifest", "true").mode("append").save(fpDir)
        val t0 = System.nanoTime()
        val fresh = crawl.join(
          spark.read.format("graft-orc").load(fpDir),
          Seq("fp"), "left_anti")
        val freshN = fresh.count()
        // append this batch's new fps — part of the production loop
        fresh.select(col("fp")).distinct()
          .write.format("graft-orc").mode("append").save(fpDir)
        val incrSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val full = history.select(col("doc_id"),
            md5Key60(col("text")).as("fp"))
          .unionByName(crawl)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("doc_id"))
        val survivors = full.withColumn("rn",
            org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") === 1).count()
        val fullSec = (System.nanoTime() - t1) / 1e9
        println(s"""{"op":"incremental_dedup","factor":$k,""" +
          s""""history_rows":${history.count()},""" +
          s""""crawl_rows":${crawl.count()},"fresh_rows":$freshN,""" +
          s""""full_survivors":$survivors,""" +
          s""""incremental_sec":${num(incrSec)},""" +
          s""""full_sec":${num(fullSec)}}""")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(fpDir))
      }
      spark.stop()
      return
    }

    // Streaming-ingest receipt: one FIXED crawl batch (confined to 4 of
    // the clean table's 16 fp-buckets) keep-min-MERGEd
    // (graft.streaming.IngestDedup) into a history that grew k-fold in
    // BOTH rows and files (k append waves — the shape a maintained ingest
    // table actually has). Two claims, separately measured:
    //  (1) bucket pruning: the MERGE's target scan reads only the files
    //      of the batch's bucket set (~4/16 of history), never all of it
    //      — merge_files_read / history_files stays ~0.25 at every k;
    //  (2) maintenance bounds the per-bucket file count: after one
    //      fp-sorted compaction, a second identical-shape batch reads
    //      |bucket set| files FLAT (4) while history bytes carry the
    //      full k-fold corpus — the 100 TB steady state (continuous
    //      ingest + periodic compaction) reads O(batch buckets) files
    //      per batch regardless of history size.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 streamingest 1 10 50
    if (streamIngestMode) {
      import graft.functions.TextHashFunctions.md5Key60
      import graft.streaming.IngestDedup
      val wh = java.nio.file.Files
        .createTempDirectory("graft-si-wh").toString
      spark.conf.set("spark.sql.catalog.gsi",
        "graft.sources.v2.GraftOrcCatalog")
      spark.conf.set("spark.sql.catalog.gsi.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gsi.default")
      val docs0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("n_chars"))
      factors.foreach { k =>
        val t = s"gsi.default.clean_$k"
        spark.sql(s"CREATE TABLE $t (fp BIGINT, doc_id BIGINT, " +
          "src STRING, n_chars BIGINT, fpb INT) PARTITIONED BY (fpb) " +
          "TBLPROPERTIES('graft.merge_mode'='mor', " +
          "'graft.distribution_mode'='hash')")
        // a batch "confined to buckets {0..3}" — the steady-state shape
        // where a micro-batch touches a subset of the table's buckets
        def confined(df: org.apache.spark.sql.DataFrame) =
          df.filter(pmod(hash(md5Key60(col("text"))), lit(16)) < 4)
        // seed: k WAVES of text-perturbed copies of the even half — the
        // history a maintained ingest table actually has (files grow
        // with k, not just bytes); build cost amortized over past
        // batches, not this batch's bill
        (0 until k).foreach { i =>
          docs0.filter(col("doc_id") % 2 === 0).select(
              (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
              concat(col("text"), lit(s" v$i")).as("text"),
              col("n_chars"))
            .select(md5Key60(col("text")).as("fp"), col("doc_id"),
              lit("hist").as("src"), col("n_chars"))
            .withColumn("fpb", IngestDedup.fpBucket(16))
            .repartition(4).writeTo(t).append()
        }
        // fixed crawl commit 1: fresh odd-half docs + a recrawl
        // re-delivery of a history slice under LARGER ids (matched,
        // keep-min no-op) — both confined to buckets {0..3}
        val crawlDir = java.nio.file.Files
          .createTempDirectory(s"graft-si-crawl-$k").toString
        def deliver(df: org.apache.spark.sql.DataFrame): Unit =
          confined(df)
            .select(col("doc_id"), col("text"), col("n_chars"), col("src"))
            .repartition(4).write.format("graft-orc")
            .option("graft.manifest", "true").mode("append").save(crawlDir)
        deliver(docs0.filter(col("doc_id") % 2 === 1)
          .withColumn("src", lit("crawl"))
          .unionByName(docs0.filter(col("doc_id") % 6 === 0).select(
            (col("doc_id") + lit(5000000000L)).as("doc_id"),
            concat(col("text"), lit(" v0")).as("text"), col("n_chars"))
            .withColumn("src", lit("recrawl"))))
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft-si-ck-$k").toString + "/c"
        val histRows = spark.table(t).count()
        def tableFiles(): Long =
          spark.sql(s"SELECT count(*) FROM $t.files")
            .collect()(0).getLong(0)
        val histFiles = tableFiles()
        // the receipt's load-bearing number: how many of the history's
        // files the MERGE's target scan actually READ — bounded by the
        // batch's bucket set (explicit fpb partition predicate), not by
        // how much history has accumulated
        var mergeFilesRead = 0L
        def scanFilesRead(df: org.apache.spark.sql.DataFrame): Long =
          ScaleStress.scanFilesRead(spark, df)
        val t0 = System.nanoTime()
        IngestDedup.ingest(spark, crawlDir, t, ckpt,
          buckets = Some(16),
          onMerge = df => mergeFilesRead += scanFilesRead(df))
        val sec = (System.nanoTime() - t0) / 1e9
        val rawRead = mergeFilesRead
        // steady state: one fp-sorted compaction (the maintenance a
        // continuously-ingesting table runs anyway), then a SECOND
        // same-shape batch — its target scan must read |bucket set|
        // files FLAT regardless of k
        spark.sql(s"CALL gsi.system.compact(table => 'default.clean_$k'" +
          ", zorder_by => 'fp')")
        val compactedFiles = tableFiles()
        deliver(docs0.filter(col("doc_id") % 2 === 1).select(
            (col("doc_id") + lit(9000000000L)).as("doc_id"),
            col("text"), col("n_chars"))
          .withColumn("src", lit("recrawl2")))
        mergeFilesRead = 0L
        val t1 = System.nanoTime()
        IngestDedup.ingest(spark, crawlDir, t, ckpt,
          buckets = Some(16),
          onMerge = df => mergeFilesRead += scanFilesRead(df))
        val secCompacted = (System.nanoTime() - t1) / 1e9
        val compactedRead = mergeFilesRead
        val cleanRows = spark.table(t).count()
        println(s"""{"op":"streaming_ingest","factor":$k,""" +
          s""""history_rows":$histRows,"history_files":$histFiles,""" +
          s""""merge_files_read":$rawRead,""" +
          s""""compacted_files":$compactedFiles,""" +
          s""""merge_files_read_compacted":$compactedRead,""" +
          s""""clean_rows":$cleanRows,"ingest_sec":${num(sec)},""" +
          s""""ingest_sec_compacted":${num(secCompacted)}}""")
        spark.sql(s"DROP TABLE $t")
      }
      spark.stop()
      return
    }

    // AUTONOMOUS steady-state receipt: both ingest tables carry
    // graft.compact_after (the signature table z-ordered on `key`) and
    // the ingest MERGE commits run ALL maintenance THEMSELVES — zero
    // manual compactions across >= `batches` ascending probe batches on
    // a `histK`-wave history. Two claims, printed one JSON line per
    // batch: per-batch ingest_sec stays bounded (a maintenance-bearing
    // batch visibly pays its compaction, the next returns to baseline —
    // a sawtooth, not a monotone climb) and the live signature file
    // count stays bounded the same way. auto_* counters price the
    // contention side: attempted ~= landed, lost_race ~= 0 on a single
    // driver.
    // A 5th arg `nomaint` runs the UNMAINTAINED control: same batches,
    // no compact_after — the file counts then climb monotonically, the
    // contrast the autonomy claim rests on.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 neardupauto 10 12 [nomaint]
    if (neardupAutoMode) {
      import graft.streaming.NearDupIngest
      import graft.sources.v2.GraftOrcCompact
      val histK = args.lift(2).map(_.toInt).getOrElse(10)
      val batches = args.lift(3).map(_.toInt).getOrElse(12)
      // freshness comes from a per-batch alphabet rotation with period
      // 25 — batch 25 would repeat batch 0's rotation and its "fresh"
      // docs would silently near-dup batch 0's, poisoning the receipt
      require(batches <= 25,
        s"neardupauto supports at most 25 batches (the per-batch " +
          s"alphabet rotation cycles after 25), got $batches")
      val maintain = !args.lift(4).contains("nomaint")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-nda-wh").toString
      spark.conf.set("spark.sql.catalog.gnda",
        "graft.sources.v2.GraftOrcCatalog")
      spark.conf.set("spark.sql.catalog.gnda.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gnda.default")
      val docs0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("n_chars"))
      val ct = "gnda.default.ndclean"
      val st = "gnda.default.ndsig"
      // distribution_mode=hash: MERGE/append writes CLUSTER by the
      // partition column first — one writer per partition dir per
      // commit (~16 files/batch) instead of every task fanning out to
      // every dir (32 tasks x 16 dirs = 512 files/batch), the
      // write-amplification that made maintenance work this hard
      spark.sql(s"CREATE TABLE $ct (doc_id BIGINT, n_chars BIGINT, " +
        "db INT) PARTITIONED BY (db) " +
        "TBLPROPERTIES('graft.merge_mode'='mor', " +
        "'graft.distribution_mode'='hash')")
      spark.sql(s"CREATE TABLE $st (band INT, key BIGINT, " +
        "doc_id BIGINT, kb INT) PARTITIONED BY (kb) " +
        "TBLPROPERTIES('graft.merge_mode'='mor', " +
        "'graft.distribution_mode'='hash')")
      // seed: histK waves, direct appends (data prep — maintenance off
      // so the receipt isolates the steady state, not the catch-up)
      (0 until histK).foreach { i =>
        val w = docs0.select(
          (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
          concat(col("text"), lit(s" v$i")).as("text"), col("n_chars"))
        Dedup.detBandKeys(w.select(col("doc_id"), col("text")))
          .withColumn("kb", NearDupIngest.keyBucket(16))
          .repartition(4).writeTo(st).append()
        w.select(col("doc_id"), col("n_chars"))
          .withColumn("db", NearDupIngest.docBucket(16))
          .repartition(4).writeTo(ct).append()
      }
      def files(t: String): Long =
        spark.sql(s"SELECT count(*) FROM $t.files").head().getLong(0)
      val seedSigFiles = files(st)
      // hand the tables their own maintenance and measure from here on
      if (maintain) {
        spark.sql(s"ALTER TABLE $st SET TBLPROPERTIES(" +
          "'graft.compact_after'='96', 'graft.compact_zorder'='key')")
        spark.sql(s"ALTER TABLE $ct SET TBLPROPERTIES(" +
          "'graft.compact_after'='96')")
      }
      GraftOrcCompact.resetAutoCompactStats()
      val crawlDir = java.nio.file.Files
        .createTempDirectory("graft-nda-crawl").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-nda-ck").toString + "/c"
      println(s"""{"op":"neardup_auto","phase":"seed",""" +
        s""""hist_waves":$histK,"sig_files_seeded":$seedSigFiles,""" +
        s""""sig_rows":${spark.table(st).count()}}""")
      var prevStats = GraftOrcCompact.autoCompactStats
      (0 until batches).foreach { b =>
        // ascending ids (the crawl contract, now runtime-enforced):
        // an eighth genuinely fresh — a PER-BATCH alphabet rotation of
        // the source text, so every batch's fresh shingle sets are
        // disjoint from every other batch's AND from the seeded waves
        // (a mere suffix tweak leaves the shingles near-identical and
        // batch b's "fresh" docs would near-dup batch 0's) — plus an
        // eighth re-crawling wave-0 texts (history colliders, dropped)
        val base = (histK + 1 + b).toLong * 1000000000L
        val az = "abcdefghijklmnopqrstuvwxyz"
        val shift = (b % 25) + 1
        val probe = docs0.filter(col("doc_id") % 8 === 0).select(
            (col("doc_id") + lit(base)).as("doc_id"),
            translate(col("text"), az, az.drop(shift) + az.take(shift))
              .as("text"),
            col("n_chars"))
          .unionByName(docs0.filter(col("doc_id") % 8 === 1).select(
            (col("doc_id") + lit(base)).as("doc_id"),
            concat(col("text"), lit(" v0")).as("text"), col("n_chars")))
        probe.select(col("doc_id"), col("text"), col("n_chars"))
          .repartition(4).write.format("graft-orc")
          .option("graft.manifest", "true").mode("append").save(crawlDir)
        val t0 = System.nanoTime()
        NearDupIngest.ingest(spark, crawlDir, ct, st, ckpt)
        val sec = (System.nanoTime() - t0) / 1e9
        val ac = GraftOrcCompact.autoCompactStats
        val d = ac.map { case (k2, v) => k2 -> (v - prevStats(k2)) }
        prevStats = ac
        println(s"""{"op":"neardup_auto","batch":$b,""" +
          s""""ingest_sec":${num(sec)},"sig_files":${files(st)},""" +
          s""""clean_files":${files(ct)},""" +
          s""""auto_attempted":${d("attempted")},""" +
          s""""auto_landed":${d("landed")},""" +
          s""""auto_lost_race":${d("lost_race")},""" +
          s""""auto_skipped":${d("skipped_in_flight")}}""")
      }
      val tot = GraftOrcCompact.autoCompactStats
      println(s"""{"op":"neardup_auto","phase":"final",""" +
        s""""clean_rows":${spark.table(ct).count()},""" +
        s""""sig_files":${files(st)},"clean_files":${files(ct)},""" +
        s""""auto_attempted_total":${tot("attempted")},""" +
        s""""auto_landed_total":${tot("landed")},""" +
        s""""auto_lost_race_total":${tot("lost_race")}}""")
      spark.sql(s"DROP TABLE $ct")
      spark.sql(s"DROP TABLE $st")
      spark.stop()
      return
    }

    // Streaming NEAR-dup ingestion stress: k waves of text-perturbed
    // corpus copies seed the SIGNATURE history (8 band keys per doc —
    // the table the decision join and the sig MERGE face every batch),
    // then a FIXED probe batch (half fresh, half re-crawls of wave-0
    // texts, so both decision outcomes are exercised) is ingested and
    // its per-phase cost plus the two MERGEs' target files-read are
    // measured; then the signature table is key-sorted-compacted (the
    // maintenance a continuously-ingesting table runs anyway) and a
    // second same-shape probe prices the steady state. The stressed
    // body IS graft.streaming.NearDupIngest.ingest, so the measured
    // plan cannot drift from the oracle-checked query.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 neardup 1 10 50
    // FULL-CRAWL REPLAY receipt: the membership probe's cost and the
    // state invariance when a LOST CHECKPOINT forces re-delivery of the
    // whole crawl — the operational event the at-or-below guard exists
    // for. k waves are ingested forward through NearDupIngest (one
    // checkpoint, one commit per wave, the mark advancing each time),
    // the signature table is compacted z-ordered on `key` (the
    // ADVERSARIAL layout for the probe's doc_id-range lookups — key
    // order scrambles id locality), then a FRESH checkpoint replays
    // every wave: each replay batch sits fully at-or-below the mark, so
    // EVERY batch pays the probe's two membership lookups. Claims: the
    // replay is a state no-op, and per-batch replay cost stays flat as
    // k grows at the receipt's scales. Honest bound: the lookups are
    // id-range-pushed, but on the key-zordered layout min/max stats
    // prune doc_id weakly, so an extreme-history replay's per-batch
    // decode is layout-dependent — replay is the disaster-recovery
    // path, priced here, not optimized for. One JSON line per k.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 neardupreplay 3 10
    if (neardupReplayMode) {
      import graft.streaming.NearDupIngest
      val wh = java.nio.file.Files
        .createTempDirectory("graft-ndr-wh").toString
      spark.conf.set("spark.sql.catalog.gndr",
        "graft.sources.v2.GraftOrcCatalog")
      spark.conf.set("spark.sql.catalog.gndr.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gndr.default")
      val docs0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("n_chars"))
      factors.foreach { k =>
        // wave freshness comes from a 25-period alphabet rotation (the
        // neardupauto constraint), and k=0 would divide by zero below
        require(k >= 1 && k <= 25,
          s"neardupreplay supports 1..25 waves, got $k")
        val ct = s"gndr.default.ndrclean_$k"
        val st = s"gndr.default.ndrsig_$k"
        spark.sql(s"CREATE TABLE $ct (doc_id BIGINT, n_chars BIGINT, " +
          "db INT) PARTITIONED BY (db) " +
          "TBLPROPERTIES('graft.merge_mode'='mor', " +
          "'graft.distribution_mode'='hash')")
        spark.sql(s"CREATE TABLE $st (band INT, key BIGINT, " +
          "doc_id BIGINT, kb INT) PARTITIONED BY (kb) " +
          "TBLPROPERTIES('graft.merge_mode'='mor', " +
          "'graft.distribution_mode'='hash')")
        val crawlDir = java.nio.file.Files
          .createTempDirectory(s"graft-ndr-crawl-$k").toString
        // retain ALL k wave snapshots: the default retention (3) folds
        // the first k-2 waves into the fresh stream's FIRST snapshot,
        // which would make replay batch 1 an (k-2)-wave giant and the
        // per-batch comparison meaningless
        // sortWithinPartitions: the guard's documented delivery contract
        // (NearDupIngest GRANULARITY note) — id-sorted files within each
        // wave. The replay's batch==wave alignment additionally relies on
        // the stream source listing commit files in COMMIT order (it
        // reads the manifest's snapshot log, which is append-ordered).
        // HONEST LIMIT: if that ordering ever changed, a 4-file replay
        // batch could mix two waves and nothing here would trip — every
        // replay id is at-or-below the mark regardless of grouping, so
        // the straddle check, the membership probe (fired==batches,
        // refused==0) and the state no-op all still pass; only the
        // per-WAVE attribution of replay_band_sec would silently blur.
        // The receipt's flatness claim therefore assumes the source's
        // commit-order listing, which the forward/replay row counts
        // below do not independently prove.
        def deliver(df: DataFrame): Unit =
          df.select(col("doc_id"), col("text"), col("n_chars"))
            .repartition(4).sortWithinPartitions(col("doc_id"))
            .write.format("graft-orc")
            .option("graft.manifest", "true")
            .option("graft.manifest.retain", (k + 1).toString)
            .mode("append").save(crawlDir)
        val az = "abcdefghijklmnopqrstuvwxyz"
        def wave(i: Int): DataFrame = {
          val shift = (i % 25) + 1 // disjoint fresh shingles per wave
          docs0.select(
            (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
            translate(col("text"), az, az.drop(shift) + az.take(shift))
              .as("text"),
            col("n_chars"))
        }
        val ckpt1 = java.nio.file.Files
          .createTempDirectory(s"graft-ndr-ck1-$k").toString + "/c"
        val fwd = (0 until k).map { i =>
          deliver(wave(i))
          val t0 = System.nanoTime()
          NearDupIngest.ingest(spark, crawlDir, ct, st, ckpt1)
          (System.nanoTime() - t0) / 1e9
        }
        val rowsBefore = spark.table(ct).count()
        spark.sql(s"CALL gndr.system.compact(" +
          s"table => 'default.ndrsig_$k', zorder_by => 'key')")
        spark.sql(s"CALL gndr.system.compact(table => 'default.ndrclean_$k')")
        val sigFiles = spark.sql(s"SELECT count(*) FROM $st.files")
          .head().getLong(0)
        // lost checkpoint: a fresh one re-delivers the crawl. Without a
        // trigger cap the backfill arrives as ONE giant batch (one
        // probe); maxFilesPerTrigger=4 = exactly one 4-file wave per
        // batch (whole waves — id ranges complete, so the granularity
        // contract holds), making the probe fire PER WAVE: the per-batch
        // band phase then shows whether probe cost grows with history.
        val ckpt2 = java.nio.file.Files
          .createTempDirectory(s"graft-ndr-ck2-$k").toString + "/c"
        val bands = scala.collection.mutable.ArrayBuffer[Double]()
        // counter window: forward ingest must NOT have fired the probe
        // (ascending waves), every replay batch MUST (at-or-below mark)
        val fwdProbes = NearDupIngest.hwmProbeStats
        require(fwdProbes("fired") == 0L,
          s"neardupreplay: forward ingest fired the membership probe " +
            s"${fwdProbes("fired")}x — the healthy ascending path must " +
            "never pay it")
        NearDupIngest.resetHwmProbeStats()
        val t0 = System.nanoTime()
        NearDupIngest.ingest(spark, crawlDir, ct, st, ckpt2,
          maxFilesPerTrigger = Some(4),
          onPhase = (p, secs) => if (p == "band") bands += secs)
        val replaySec = (System.nanoTime() - t0) / 1e9
        val rowsAfter = spark.table(ct).count()
        val probes = NearDupIngest.hwmProbeStats
        println(s"""{"op":"neardup_replay","factor":$k,""" +
          s""""hist_rows":${spark.table(st).count()},""" +
          s""""sig_files_compacted":$sigFiles,""" +
          s""""fwd_sec_per_wave":${num(fwd.sum / k)},""" +
          s""""replay_sec":${num(replaySec)},""" +
          s""""replay_batches":${bands.size},""" +
          s""""replay_band_sec":[${bands.map(num).mkString(",")}],""" +
          s""""hwm_probes_fired":${probes("fired")},""" +
          s""""hwm_probes_refused":${probes("refused")},""" +
          s""""rows_before":$rowsBefore,"rows_after":$rowsAfter,""" +
          s""""state_noop":${rowsBefore == rowsAfter}}""")
        require(rowsBefore == rowsAfter,
          "neardupreplay: a full-crawl replay must be a state no-op")
        require(probes("fired") == bands.size.toLong &&
          probes("refused") == 0L,
          s"neardupreplay: expected the probe on every replay batch " +
            s"(${bands.size}) with zero refusals, got $probes")
        NearDupIngest.resetHwmProbeStats()
        spark.sql(s"DROP TABLE $ct")
        spark.sql(s"DROP TABLE $st")
      }
      spark.stop()
      return
    }

    if (neardupMode) {
      import graft.streaming.NearDupIngest
      val wh = java.nio.file.Files
        .createTempDirectory("graft-nd-wh").toString
      spark.conf.set("spark.sql.catalog.gnd",
        "graft.sources.v2.GraftOrcCatalog")
      spark.conf.set("spark.sql.catalog.gnd.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gnd.default")
      val docs0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("n_chars"))
      factors.foreach { k =>
        val ct = s"gnd.default.ndclean_$k"
        val st = s"gnd.default.ndsig_$k"
        spark.sql(s"CREATE TABLE $ct (doc_id BIGINT, n_chars BIGINT, " +
          "db INT) PARTITIONED BY (db) " +
          "TBLPROPERTIES('graft.merge_mode'='mor', " +
          "'graft.distribution_mode'='hash')")
        spark.sql(s"CREATE TABLE $st (band INT, key BIGINT, " +
          "doc_id BIGINT, kb INT) PARTITIONED BY (kb) " +
          "TBLPROPERTIES('graft.merge_mode'='mor', " +
          "'graft.distribution_mode'='hash')")
        // seed: k waves of text-perturbed corpus copies — history rows
        // and files grow with k. Seeding is data PREP (amortized over
        // past batches), so keys/survivors are appended directly.
        (0 until k).foreach { i =>
          val w = docs0.select(
            (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
            concat(col("text"), lit(s" v$i")).as("text"), col("n_chars"))
          Dedup.detBandKeys(w.select(col("doc_id"), col("text")))
            .withColumn("kb", NearDupIngest.keyBucket(16))
            .repartition(4).writeTo(st).append()
          w.select(col("doc_id"), col("n_chars"))
            .withColumn("db", NearDupIngest.docBucket(16))
            .repartition(4).writeTo(ct).append()
        }
        val histRows = spark.table(st).count()
        def sigFiles(): Long =
          spark.sql(s"SELECT count(*) FROM $st.files")
            .collect()(0).getLong(0)
        val histFiles = sigFiles()
        val crawlDir = java.nio.file.Files
          .createTempDirectory(s"graft-nd-crawl-$k").toString
        // fixed probe batch (independent of k), ids above every wave's:
        // an eighth of the corpus genuinely fresh (kept; reversed text
        // shares no shingles with any wave) + an eighth re-crawling
        // wave-0 texts (dropped via history band colliders)
        val base = (k.toLong + 1L) * 1000000000L
        def probe(tag: Int): DataFrame = {
          val fresh =
            if (tag == 0) reverse(col("text")) else upper(reverse(col("text")))
          docs0.filter(col("doc_id") % 8 === 0).select(
              (col("doc_id") + lit(base + tag * 500000000L)).as("doc_id"),
              fresh.as("text"), col("n_chars"))
            .unionByName(docs0.filter(col("doc_id") % 8 === 1).select(
              (col("doc_id") + lit(base + tag * 500000000L)).as("doc_id"),
              concat(col("text"), lit(" v0")).as("text"), col("n_chars")))
        }
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft-nd-ck-$k").toString + "/c"
        val phases = scala.collection.mutable.Map.empty[String, Double]
        val filesRead = scala.collection.mutable.Map.empty[String, Long]
        def run(tag: Int): Double = {
          deliverTo(crawlDir, probe(tag))
          phases.clear(); filesRead.clear()
          val t0 = System.nanoTime()
          NearDupIngest.ingest(spark, crawlDir, ct, st, ckpt,
            onPhase = (p, secs) =>
              phases(p) = phases.getOrElse(p, 0.0) + secs,
            onMerge = (which, df) => {
              if (sys.env.get("GRAFT_ND_DEBUG").contains(which))
                println(df.queryExecution.executedPlan.toString)
              filesRead(which) =
                filesRead.getOrElse(which, 0L) + scanFilesRead(spark, df)
            })
          (System.nanoTime() - t0) / 1e9
        }
        def deliverTo(dir: String, df: DataFrame): Unit =
          df.select(col("doc_id"), col("text"), col("n_chars"))
            .repartition(4).write.format("graft-orc")
            .option("graft.manifest", "true").mode("append").save(dir)
        def phJson(m: Map[String, Double], reads: Map[String, Long],
                   suffix: String): String =
          Seq("band", "decide", "merge_clean", "merge_sig").map(p =>
            s""""$p$suffix":${num(m.getOrElse(p, 0.0))}""").mkString(",") +
            s""","sig_merge_files$suffix":${reads.getOrElse("sig", 0L)}""" +
            s""","clean_merge_files$suffix":${reads.getOrElse("clean", 0L)}"""
        val sec = run(0)
        val raw = phJson(phases.toMap, filesRead.toMap, "")
        // steady state: one key-sorted compaction of the signature table
        spark.sql(s"CALL gnd.system.compact(table => 'default.ndsig_$k'" +
          ", zorder_by => 'key')")
        val compactedFiles = sigFiles()
        val sec2 = run(1)
        val cmp = phJson(phases.toMap, filesRead.toMap, "_compacted")
        val cleanRows = spark.table(ct).count()
        // ascending probe batches: the HWM membership probe must never
        // fire on this healthy path — its zero-cost claim, receipted
        val probes = NearDupIngest.hwmProbeStats
        println(s"""{"op":"neardup_ingest","factor":$k,""" +
          s""""sig_rows":$histRows,"sig_files":$histFiles,""" +
          s""""sig_files_compacted":$compactedFiles,""" +
          s""""clean_rows":$cleanRows,""" +
          s""""hwm_probes_fired":${probes("fired")},""" +
          s""""ingest_sec":${num(sec)},$raw,""" +
          s""""ingest_sec_compacted":${num(sec2)},$cmp}""")
        require(probes("fired") == 0L,
          s"neardup: the membership probe fired ${probes("fired")}x on " +
            "an ascending stream — it must stay off the healthy path")
        spark.sql(s"DROP TABLE $ct")
        spark.sql(s"DROP TABLE $st")
      }
      spark.stop()
      return
    }

    // NTILE gate crossover sweep: GlobalRank.ntile's size gate routes
    // frames at or below DefaultWindowBelowRows (256k as of round 20,
    // set BY this receipt) to the plain single-partition window and
    // larger ones to the distributed offsets path. The constant was
    // asserted, not receipted — this mode times BOTH paths on
    // same-shape frames at 16k..16M rows (3 warm iterations, min), so
    // the measured crossover pins it and catches JVM/Spark version
    // drift. Forcing: windowBelowRows = size forces the gated window
    // path; windowBelowRows = 1 forces the distributed path THROUGH
    // the gate (pin + count + distributed — the cost a default-gated
    // fact frame actually pays; 0 would skip the count job and flatter
    // the distributed side).
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 ntilegate
    if (ntileGateMode) {
      import graft.operators.GlobalRank
      val sizes =
        Seq(16384L, 65536L, 262144L, 1048576L, 4194304L, 16777216L)
      // blocking: block cleanup from the previous run must not overlap
      // the next TIMED iteration (this sweep sits between measurements)
      def sweepBlocks(): Unit = spark.sparkContext.getPersistentRDDs
        .values.foreach(_.unpersist(true))
      def run(size: Long, threshold: Long): Double = {
        val frame = spark.range(size)
          .select(col("id"), (col("id") * 2654435761L % size).as("v"))
        val t0 = System.nanoTime()
        GlobalRank.ntile(frame, 4, Seq(col("v"), col("id")), "b",
          windowBelowRows = threshold).count()
        val sec = (System.nanoTime() - t0) / 1e9
        sweepBlocks() // each call leaves one checkpoint block set
        sec
      }
      run(sizes.head, sizes.head); run(sizes.head, 1L) // JIT warm, untimed
      sizes.foreach { size =>
        val win = (1 to 3).map(_ => run(size, size)).min
        val dist = (1 to 3).map(_ => run(size, 1L)).min
        println(s"""{"op":"ntile_gate","rows":$size,""" +
          s""""window_sec":${num(win)},"dist_sec":${num(dist)},""" +
          s""""window_wins":${win <= dist}}""")
      }
      spark.stop()
      return
    }

    // Bigram-LM stress: k copies of documents with disjoint doc_ids but
    // the SAME texts — every bigram key gets k-times hotter (the
    // adversarial direction for the corpus-count shuffle) while the doc
    // side grows linearly. The stressed body IS TextAnalysis.bigramLm, so
    // the measured arithmetic cannot drift from the oracle-checked query.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 bigram 1 10
    if (bigramMode) {
      import graft.operators.TextAnalysis
      factors.foreach { k =>
        val d0 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val docs = (0 until k).map { i =>
          d0.select((col("doc_id") + lit(i.toLong * 1000000000L))
            .as("doc_id"), col("text"))
        }.reduce(_ union _).localCheckpoint(true)
        val n = docs.count()
        time(s"bigram_lm(n=$n)", k) { TextAnalysis.bigramLm(docs) }
      }
      spark.stop()
      return
    }

    // SemDeDup stress: k-times the vectors (near-dup twins via
    // expandVectors) with the CLUSTER COUNT scaled to the corpus —
    // k_clusters = n/256 (capped by the 512-vector fit sample) — so
    // per-cluster pairwise work stays bounded. A fixed cluster count
    // would go quadratic, the same failure mode as fixed LSH buckets.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 semdedup 1 10
    if (semdedupMode) {
      import graft.operators.Dedup
      factors.foreach { k =>
        val e = Dedup.expandVectors(Tables.embeddings(spark, sfDir), k)
          .localCheckpoint(true)
        val n = e.count()
        val kc = math.max(16, math.min(512, (n / 256).toInt))
        time(s"semdedup(n=$n,k=$kc)", k) {
          Dedup.semDedupSummary(e, 0.9, kc)
        }
      }
      spark.stop()
      return
    }

    // Perplexity stress: k disjoint-id copies of documents with the SAME
    // texts — the model counts stay constant-size while the scoring side
    // grows linearly, so the run should scale sub-linearly in k.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 perplexity 1 10
    if (perplexityMode) {
      import graft.operators.TextAnalysis
      factors.foreach { k =>
        val d0 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val docs = (0 until k).map { i =>
          d0.select((col("doc_id") + lit(i.toLong * 1000000000L))
            .as("doc_id"), col("text"))
        }.reduce(_ union _).localCheckpoint(true)
        val n = docs.count()
        time(s"perplexity(n=$n)", k) { TextAnalysis.perplexity(docs) }
      }
      spark.stop()
      return
    }

    // Manifest listing receipt: metadata cost of planning a scan over a
    // fragmented (streaming-ingested, hive-partitioned) table, directory
    // BFS vs one manifest-snapshot read. On a real object store every
    // BFS wave is a LIST round-trip and each file a metadata RPC; the
    // manifest replaces all of it with ONE ranged read, and makes
    // commits atomic on stores where rename is a copy.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 manifest
    // Blind-upsert receipt (GraftOrcEqDelete): apply the SAME small CDC
    // batch (~0.17% of keys) to a 600k-row manifest table three ways.
    // The cost shapes to compare:
    //  - eq_upsert: target NEVER read — commit = batch files + one key
    //    sidecar. This is the line that stays flat as the table grows.
    //  - merge_cow / merge_mor: MERGE INTO must SCAN the target to find
    //    matches (CoW additionally rewrites the matched files) — cost
    //    carries a term ∝ table size, the term that kills per-batch CDC
    //    at 100 TB.
    // Then the read-side ledger: the row-wise tax while the sidecar is
    // live, and the purge that materializes it and restores vectorized
    // reads.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 upsert
    // Concurrent-writer receipt: N real threads (appends + blind upsert
    // + compact) race one table per round; every commit lands exactly
    // once or throws, final state must equal the serial oracle.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 concurrent [appenders rounds]
    if (concurrentMode) {
      val apps = args.lift(2).map(_.toInt).getOrElse(4)
      val rnds = args.lift(3).map(_.toInt).getOrElse(6)
      graft.sources.v2.GraftOrcCompact.resetAutoCompactStats()
      val t0 = System.nanoTime()
      val res = concurrentCommitters(spark, "/tmp/graft-conc-stress",
        appenders = apps, rounds = rnds)
      val sec = (System.nanoTime() - t0) / 1e9
      // auto-compaction contention accounting (all zero unless
      // -Dspark.graft.compact_after is set): `lost_race` is full merge
      // work thrown away at the swap — the wasted-cluster-work class
      val ac = graft.sources.v2.GraftOrcCompact.autoCompactStats
      println(s"""{"op":"concurrent_committers","rounds":${res.rounds},""" +
        s""""appenders":$apps,"attempted":${res.attempted},""" +
        s""""succeeded":${res.succeeded},"conflicts":${res.conflicts},""" +
        s""""final_rows":${res.finalRows},""" +
        s""""expected_rows":${res.expectedRows},""" +
        s""""auto_attempted":${ac("attempted")},""" +
        s""""auto_landed":${ac("landed")},""" +
        s""""auto_lost_race":${ac("lost_race")},""" +
        s""""auto_skipped_in_flight":${ac("skipped_in_flight")},""" +
        s""""exact_state":${res.ok},"sec":${num(sec)}}""")
      require(res.ok, "concurrent committers diverged from the serial " +
        "oracle — see the JSON line above")
      spark.stop()
      return
    }

    if (upsertMode) {
      import graft.sources.v2.{GraftOrcEqDelete, GraftOrcMor}
      val base1 = Tables.lineitem(spark, sfDir)
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k"),
          col("l_extendedprice").as("price"),
          col("l_shipdate").as("d"))
      // FIXED batch (~750 keys of the factor-1 key space), one source
      // row per key (synthetic lineitem does not guarantee (orderkey,
      // linenumber) uniqueness; MERGE rejects dup source matches)
      val batch = base1.filter(col("k") % 599 === 0)
        .select(col("k"), (col("price") * 2).as("price"), col("d"))
        .dropDuplicates("k")
        .localCheckpoint(true)
      val nBatch = batch.count()
      batch.createOrReplaceTempView("g_ups_batch")
      factors.foreach { kf =>
        // k-times the table, SAME batch: the apply cost of each strategy
        // exposes its table-size term (the blind upsert must stay flat)
        val base = (0 until kf).map(i =>
          base1.select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
            col("price"), col("d"))).reduce(_ union _)
        val nBase = base1.count() * kf
        def freshTable(tag: String): String = {
          val dir = s"/tmp/graft-upsert-stress-$tag"
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
          base.repartition(16 * kf).write.format("graft-orc")
            .option("graft.manifest", "true").mode("overwrite").save(dir)
          dir
        }
        def timed(name: String)(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          val sec = (System.nanoTime() - t0) / 1e9
          println(s"""{"op":"$name","factor":$kf,"table_rows":$nBase,""" +
            s""""batch_rows":$nBatch,"sec":${num(sec)}}""")
          sec
        }
        // 1. blind upsert: zero target reads
        val upDir = freshTable("eq")
        timed("upsert_eq_blind") {
          GraftOrcEqDelete.upsert(spark, upDir, batch, Seq("k"))
        }
        // 2. MERGE INTO, copy-on-write
        val cowDir = freshTable("cow")
        spark.sql(s"CREATE TABLE g_ups_cow USING `graft-orc` " +
          s"LOCATION '$cowDir'")
        timed("upsert_merge_cow") {
          spark.sql("""MERGE INTO g_ups_cow t USING g_ups_batch s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET price = s.price
            WHEN NOT MATCHED THEN INSERT *""")
        }
        spark.sql("DROP TABLE g_ups_cow")
        // 3. MERGE INTO, merge-on-read delta
        val morDir = freshTable("mor")
        spark.sql(s"CREATE TABLE g_ups_mor USING `graft-orc` " +
          s"LOCATION '$morDir' " +
          "TBLPROPERTIES('graft.merge_mode'='mor')")
        timed("upsert_merge_mor") {
          spark.sql("""MERGE INTO g_ups_mor t USING g_ups_batch s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET price = s.price
            WHEN NOT MATCHED THEN INSERT *""")
        }
        spark.sql("DROP TABLE g_ups_mor")
        // read-side ledger on the upsert table: row-wise tax, then purge
        timed("read_with_live_sidecar") {
          spark.read.format("graft-orc").load(upDir).count()
        }
        var purgedFiles = 0
        timed("purge_materialize") {
          purgedFiles = GraftOrcMor.purge(spark, upDir) }
        timed("read_after_purge") {
          spark.read.format("graft-orc").load(upDir).count()
        }
        // purge key-range pruning receipt: on a RANGE-LAID table (the
        // layout a sorted/z-ordered ingest produces) a TIGHT CDC batch
        // affects only the files whose key range it intersects — purge
        // rewrites those, not the table. The scattered batch above is
        // the honest contrast (uniform keys intersect everything).
        locally {
          import graft.sources.v2.GraftOrcManifest
          val dir = "/tmp/graft-upsert-stress-sorted"
          val fsP = new org.apache.hadoop.fs.Path(dir)
          val fsys = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fsys.delete(fsP, true)
          base.repartitionByRange(16 * kf, col("k"))
            .sortWithinPartitions("k")
            .write.format("graft-orc").option("graft.manifest", "true")
            .mode("overwrite").save(dir)
          val total = GraftOrcManifest.readSnapshot(fsys,
            fsys.makeQualified(fsP)).get.entries.size
          val tight = base1.filter(col("k").between(100000, 110000))
            .select(col("k"), (col("price") * 3).as("price"), col("d"))
            .dropDuplicates("k")
          val nTight = tight.count()
          GraftOrcEqDelete.upsert(spark, dir, tight, Seq("k"))
          var rewritten = 0
          val t0 = System.nanoTime()
          rewritten = GraftOrcMor.purge(spark, dir)
          val sec = (System.nanoTime() - t0) / 1e9
          println(s"""{"op":"purge_prune_receipt","factor":$kf,""" +
            s""""files_total":$total,"files_rewritten":$rewritten,""" +
            s""""batch_rows":$nTight,"scattered_rewrote":$purgedFiles,""" +
            s""""sec":${num(sec)}}""")
          fsys.delete(fsP, true)
        }
        // hidden-partition variant (round 13): the same blind apply
        // into a bucket(16, k) transform layout — the staging derives
        // writer-exact bucket directories, cost must stay flat with
        // table size like the identity form, and a point lookup after
        // the upsert proves bucket pruning still engages (planned
        // files << total)
        locally {
          import graft.sources.v2.GraftOrcManifest
          val dir = "/tmp/graft-upsert-stress-hidden"
          val fsP = new org.apache.hadoop.fs.Path(dir)
          val fsys = fsP.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          fsys.delete(fsP, true)
          base.repartition(16 * kf).write.format("graft-orc")
            .option("graft.manifest", "true")
            .option("graft.partition_spec", "bucket(16, k)")
            .mode("overwrite").save(dir)
          val t0 = System.nanoTime()
          GraftOrcEqDelete.upsert(spark, dir, batch, Seq("k"))
          val sec = (System.nanoTime() - t0) / 1e9
          val total = GraftOrcManifest.readSnapshot(fsys,
            fsys.makeQualified(fsP)).get.entries.size
          val probe = spark.read.format("graft-orc").load(dir)
            .filter(col("k") === 599L)
          val planned = probe.queryExecution.executedPlan
            .collectLeaves().head.asInstanceOf[
              org.apache.spark.sql.execution.datasources.v2
                .BatchScanExec].inputRDD.getNumPartitions
          val price = probe.select("price").collect()
            .map(_.getDouble(0)).toSeq
          require(price.nonEmpty && price.forall(_ > 0),
            "hidden upsert point lookup lost the upserted row")
          println(s"""{"op":"upsert_hidden_bucket","factor":$kf,""" +
            s""""table_rows":$nBase,"batch_rows":$nBatch,""" +
            s""""files_total":$total,"planned_point_lookup":$planned,""" +
            s""""sec":${num(sec)}}""")
          fsys.delete(fsP, true)
        }
        Seq("eq", "cow", "mor").foreach { tag =>
          val d = new org.apache.hadoop.fs.Path(
            s"/tmp/graft-upsert-stress-$tag")
          d.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(d, true)
        }
      }
      spark.stop()
      return
    }

    // Schema-evolution receipt (GraftOrcSchema): a DDL on an N-file,
    // multi-GB table is ONE snapshot write — metadata bytes proportional
    // to the live-file count, ZERO data bytes touched — and the
    // post-DDL read pays nothing extra: plan-time row counts + CBO
    // stats on the RENAMED column come from per-file-version translated
    // stat sidecars (the footer-read hook must stay at zero), and the
    // full read still returns every row under the new name. This is the
    // 100 TB contract: renaming a column on a petabyte table costs the
    // same one-file commit as on a megabyte table.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 evo
    if (evoMode) {
      import graft.sources.v2.{GraftOrcDataSource, GraftOrcFileIndex,
        GraftOrcSchema}
      val dir = "/tmp/graft-evo-stress"
      val hconf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      Tables.lineitem(spark, sfDir).repartition(64)
        .write.format("graft-orc").option("graft.manifest", "true")
        .mode("append").save(dir)
      val entries = new GraftOrcFileIndex(hconf, Seq(dir), 32).entries
      val dataMb = entries.map(_.length).sum / 1e6
      val t0 = System.nanoTime()
      GraftOrcSchema.alter(hconf, dir)(
        GraftOrcSchema.renameColumn(_, "l_quantity", "qty"))
      val ddlSec = (System.nanoTime() - t0) / 1e9
      val snapBytes = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir, "_graft_manifest"))
        .map(_.getLen).max
      println(s"""{"op":"evo_rename_ddl","files":${entries.size},""" +
        s""""data_mb":${num(dataMb)},"sec":${num(ddlSec)},""" +
        s""""snapshot_bytes":$snapBytes,"data_bytes_touched":0}""")
      GraftOrcDataSource.planFooterReads.clear()
      GraftOrcDataSource.recordPlanFooterReads = true
      try {
        val t1 = System.nanoTime()
        val rows = spark.read.format("graft-orc").load(dir)
          .select(sum(col("qty"))).collect()(0)
        val readSec = (System.nanoTime() - t1) / 1e9
        import scala.jdk.CollectionConverters._
        val footerReads = GraftOrcDataSource.planFooterReads.asScala
          .count(_.contains("graft-evo-stress"))
        println(s"""{"op":"evo_read_renamed","sum_qty":"$rows",""" +
          s""""sec":${num(readSec)},"plan_footer_reads":$footerReads}""")
      } finally GraftOrcDataSource.recordPlanFooterReads = false
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.stop()
      return
    }

    // Write-audit-publish cost vs table size: fork (createBranch), a
    // fixed-size staged append on the branch, and fastForward publish,
    // at 1x and 10x the table. The claim a 100 TB deployment cares
    // about: fork and publish are SNAPSHOT COPIES — their cost tracks
    // the file COUNT in the manifest (metadata), never the data bytes,
    // and the staged append costs what any append costs.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 wap 1 10
    // Hidden partitioning at scale: events x k laid out by
    // days(ts) + bucket(8, user_id); the receipt shows (a) the planned
    // file count for a source-column 7-day filter and for day+user,
    // pruning a CONSTANT fraction as the table grows — the planned set
    // scales with the selected data, not the table — and (b) the pruned
    // scan's wall clock tracking the planned set.
    if (hiddenMode) {
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      import org.apache.spark.sql.sources._
      import graft.sources.v2.{GraftOrcManifest, GraftOrcScan, GraftOrcScanBuilder}
      val hconf = spark.sparkContext.hadoopConfiguration
      factors.foreach { k =>
        val dir = s"/tmp/graft-hidden-stress-$k"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(hconf)
        fs.delete(p, true)
        scaled(k)
          .select(org.apache.spark.sql.functions
            .timestamp_micros(col("ts_us")).as("ts"),
            col("user_id"), col("event_type"),
            (col("event_id") % 100).cast("double").as("value"))
          .repartition(8 * k)
          .write.format("graft-orc")
          .option("graft.manifest", "true")
          .option("graft.partition_spec", "days(ts), bucket(8, user_id)")
          .mode("append").save(dir)
        val files = GraftOrcManifest.readSnapshot(fs,
          fs.makeQualified(p)).get.entries.size
        def planned(filters: Filter*): Int =
          PlanProbe.plannedPartitions(dir,
            Map("graft.pack_small_files" -> "false"), filters: _*)
        val day = Seq[Filter](
          GreaterThanOrEqual("ts",
            java.time.Instant.parse("2024-01-10T00:00:00Z")),
          LessThan("ts", java.time.Instant.parse("2024-01-17T00:00:00Z")))
        val pDay = planned(day: _*)
        val pDayUser = planned(day :+ EqualTo("user_id", 42L): _*)
        val t0 = System.nanoTime()
        val full = spark.read.format("graft-orc").load(dir).count()
        val secFull = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val sel = spark.read.format("graft-orc").load(dir)
          .filter(col("ts") >= lit("2024-01-10") &&
            col("ts") < lit("2024-01-17") && col("user_id") === 42L)
          .count()
        val secSel = (System.nanoTime() - t1) / 1e9
        println(s"""{"op":"hidden_prune","factor":$k,"files":$files,""" +
          s""""planned_day":$pDay,"planned_day_bucket":$pDayUser,""" +
          s""""rows_full":$full,"rows_selected":$sel,""" +
          s""""sec_full":${num(secFull)},"sec_selected":${num(secSel)}}""")
        fs.delete(p, true)
      }
      spark.stop()
      return
    }

    // Partition-spec EVOLUTION at scale: half the k-scaled events land
    // under days(ts)+bucket(4, user_id); ONE set_partition_spec commit
    // re-specs to days(ts)+bucket(16, user_id); the other half lands
    // under the new layout. The receipt's two claims for 100 TB:
    // (a) the re-spec commit cost tracks the MANIFEST (file count /
    // metadata bytes), never the data bytes — re-bucketing a grown
    // table is one commit, not a rewrite job; (b) a raw source-column
    // filter keeps pruning BOTH generations, each under its own layout
    // (planned files stay a constant fraction as k grows).
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 specevo 1 10
    if (specEvoMode) {
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      import org.apache.spark.sql.sources._
      import graft.sources.v2.{GraftOrcManifest, GraftOrcScan, GraftOrcScanBuilder, GraftOrcSchema}
      val hconf = spark.sparkContext.hadoopConfiguration
      factors.foreach { k =>
        val dir = s"/tmp/graft-specevo-stress-$k"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(hconf)
        fs.delete(p, true)
        val all = scaled(k)
          .select(org.apache.spark.sql.functions
            .timestamp_micros(col("ts_us")).as("ts"),
            col("user_id"), col("event_type"),
            (col("event_id") % 100).cast("double").as("value"),
            col("event_id"))
        // transform writes auto-sort by their source columns (day runs
        // emit contiguously), so the active writer set stays
        // ~bucket-count regardless of how many days the table spans
        all.filter(col("event_id") % 2 === 0).drop("event_id")
          .repartition(8 * k)
          .write.format("graft-orc")
          .option("graft.manifest", "true")
          .option("graft.partition_spec", "days(ts), bucket(4, user_id)")
          .mode("append").save(dir)
        val snapOld = GraftOrcManifest.readSnapshot(fs,
          fs.makeQualified(p)).get
        val filesOld = snapOld.entries.size
        val dataMb = snapOld.entries.map(_.length).sum / 1e6
        val t0 = System.nanoTime()
        GraftOrcSchema.setPartitionSpec(hconf, dir,
          "days(ts), bucket(16, user_id)")
        val respecSec = (System.nanoTime() - t0) / 1e9
        all.filter(col("event_id") % 2 === 1).drop("event_id")
          .repartition(8 * k)
          .write.format("graft-orc").mode("append").save(dir)
        val filesAll = GraftOrcManifest.readSnapshot(fs,
          fs.makeQualified(p)).get.entries.size
        def planned(filters: Filter*): Int =
          PlanProbe.plannedPartitions(dir,
            Map("graft.pack_small_files" -> "false"), filters: _*)
        val day = Seq[Filter](
          GreaterThanOrEqual("ts",
            java.time.Instant.parse("2024-01-10T00:00:00Z")),
          LessThan("ts", java.time.Instant.parse("2024-01-17T00:00:00Z")))
        val pDay = planned(day: _*)
        val pDayUser = planned(day :+ EqualTo("user_id", 42L): _*)
        val t1 = System.nanoTime()
        val sel = spark.read.format("graft-orc").load(dir)
          .filter(col("ts") >= lit("2024-01-10") &&
            col("ts") < lit("2024-01-17") && col("user_id") === 42L)
          .count()
        val secSel = (System.nanoTime() - t1) / 1e9
        println(s"""{"op":"specevo","factor":$k,"files_old":$filesOld,""" +
          s""""files_total":$filesAll,"data_mb":${num(dataMb)},""" +
          s""""respec_sec":${num(respecSec)},"planned_day":$pDay,""" +
          s""""planned_day_bucket":$pDayUser,"rows_selected":$sel,""" +
          s""""sec_selected":${num(secSel)}}""")
        fs.delete(p, true)
      }
      spark.stop()
      return
    }

    if (wapMode) {
      import graft.sources.v2.GraftOrcManifest
      val hconf = spark.sparkContext.hadoopConfiguration
      factors.foreach { k =>
        val dir = s"/tmp/graft-wap-stress-$k"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(hconf)
        fs.delete(p, true)
        val li = Tables.lineitem(spark, sfDir)
        (0 until k).map(i => li.select((col("l_orderkey") +
            lit(i.toLong * 1000000000L)).as("l_orderkey"),
            col("l_quantity"), col("l_extendedprice")))
          .reduce(_ union _)
          .repartition(16 * k)
          .write.format("graft-orc").option("graft.manifest", "true")
          .mode("append").save(dir)
        val files = GraftOrcManifest.readSnapshot(fs,
          fs.makeQualified(p)).get.entries
        val dataMb = files.map(_.length).sum / 1e6
        val t0 = System.nanoTime()
        GraftOrcManifest.createBranch(fs, p, "stage")
        val forkSec = (System.nanoTime() - t0) / 1e9
        // fixed-size staged batch regardless of k
        li.limit(50000).select(
          (col("l_orderkey") + 900000000000L).as("l_orderkey"),
          col("l_quantity"), col("l_extendedprice"))
          .repartition(4)
          .write.format("graft-orc").option("graft.branch", "stage")
          .mode("append").save(dir)
        val audited = spark.read.format("graft-orc")
          .option("graft.branch", "stage").load(dir)
          .filter(col("l_orderkey") >= 900000000000L).count()
        val t1 = System.nanoTime()
        GraftOrcManifest.fastForward(hconf, dir, "stage")
        val pubSec = (System.nanoTime() - t1) / 1e9
        println(s"""{"op":"wap","factor":$k,"files":${files.size},""" +
          s""""data_mb":${num(dataMb)},"staged_rows":$audited,""" +
          s""""fork_sec":${num(forkSec)},"publish_sec":${num(pubSec)},""" +
          s""""data_bytes_moved":0}""")
        fs.delete(p, true)
      }
      spark.stop()
      return
    }

    if (manifestMode) {
      import graft.sources.v2.GraftOrcFileIndex
      val dir = "/tmp/graft-manifest-stress"
      val hconf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val li = Tables.lineitem(spark, sfDir)
        .withColumn("l_part", (col("l_orderkey") % 8).cast("int"))
      (1 to 3).foreach { _ =>
        li.repartition(32).write.format("graft-orc")
          .partitionBy("l_part").mode("append").save(dir)
      }
      def listOnce() = new GraftOrcFileIndex(hconf, Seq(dir), 32).entries
      // metadata ROUND-TRIPS, the number that matters on an object store
      // (each directory is one LIST call; local-fs wall time hides the
      // 10-100 ms/RPC a real store charges): BFS lists every directory
      // under the root; a manifest listing is one dir LIST + one read.
      def bfsRpcs(): Int = {
        val root = new org.apache.hadoop.fs.Path(dir).toUri.getPath
        listOnce().map(_.path).flatMap { p =>
          Iterator.iterate(new org.apache.hadoop.fs.Path(p).getParent)(
            _.getParent).takeWhile(d => d != null &&
            d.toUri.getPath.startsWith(root)).map(_.toString).toSeq
        }.distinct.size
      }
      def timeMeta(name: String, rpcs: Int)(body: => Int): Unit = {
        val reps = 20
        val t0 = System.nanoTime()
        var n = 0
        (1 to reps).foreach(_ => n = body)
        println(s"""{"op":"$name","files":$n,"list_round_trips":$rpcs,""" +
          s""""sec_per_listing":${num((System.nanoTime() - t0) / 1e9 / reps)}}""")
      }
      timeMeta(s"list_bfs(files=${listOnce().size})", bfsRpcs())(
        listOnce().size)
      // adopt a manifest (the establishing append bootstraps the old
      // files through one last BFS), then re-time the same listing call
      li.repartition(32).write.format("graft-orc")
        .option("graft.manifest", "true")
        .partitionBy("l_part").mode("append").save(dir)
      timeMeta(s"list_manifest(files=${listOnce().size})", 2)(
        listOnce().size)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.stop()
      return
    }

    // Small-file compaction receipt: a streaming-sink-shaped table (many
    // per-epoch files) scanned before and after GraftOrcCompact. The
    // delta isolates per-file overhead (open + footer read + task
    // schedule) — the cost class that grows unboundedly under continuous
    // ingest and that stripe-copy compaction removes.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 compact
    if (compactMode) {
      import graft.sources.v2.GraftOrcCompact
      val dir = "/tmp/graft-compact-stress"
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val li = Tables.lineitem(spark, sfDir)
      (1 to 8).foreach { _ =>
        li.repartition(64).write.format("graft-orc").mode("append").save(dir)
      }
      def scan() = spark.read.format("graft-orc").load(dir)
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
      def files() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .count(_.getPath.getName.endsWith(".orc")) +
        fs.globStatus(new org.apache.hadoop.fs.Path(dir, "w-*/*.orc")).length
      scan().collect() // JIT/codegen warm
      time(s"scan_fragmented(files=${files()})", 1) { scan() }
      val t0 = System.nanoTime()
      val stats = GraftOrcCompact.compact(spark, dir)
      println(s"""{"op":"compact","bins":${stats.bins},""" +
        s""""files_compacted":${stats.filesCompacted},""" +
        s""""sec":${num((System.nanoTime() - t0) / 1e9)}}""")
      time(s"scan_compacted(files=${files()})", 1) { scan() }
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.stop()
      return
    }

    // Hot-KEY bigram stress: a Zipf-adversarial corpus where ~30% of docs
    // carry one dominant bigram (repeated, so that single join key holds
    // several percent of ALL bigram occurrences — far past a balanced
    // partition share). The exposure is bigramLm's bi⋈counts shuffle: one
    // hash partition would hold the whole hot key. The receipt pins that
    // AQE's skew-join split keeps the stage balanced. Configs emulate the
    // 100 TB shape: counts too big to broadcast (threshold -1 — at scale
    // the distinct-bigram table dwarfs any broadcast budget), advisory/
    // skew thresholds scaled down so local data crosses the same ratios a
    // full-size run would.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 bigramskew 1 10
    if (bigramSkewMode) {
      import graft.operators.TextAnalysis
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
      val hotPhrase = Seq.fill(60)("zzhot zzkey").mkString(" ")
      factors.foreach { k =>
        def expand(src: DataFrame): DataFrame = (0 until k).map { i =>
          src.select((col("doc_id") + lit(i.toLong * 1000000000L))
            .as("doc_id"), col("text"))
        }.reduce(_ union _).localCheckpoint(true)
        val d0 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val flat = expand(d0)
        val zipf = expand(d0.withColumn("text",
          when(col("doc_id") % 10 < 3,
            concat_ws(" ", col("text"), lit(hotPhrase)))
            .otherwise(col("text"))))
        // the hot/cold split's own adversary: ONE bigram carried once by
        // EVERY doc. The per-doc pre-agg cannot deamplify it (one
        // occurrence per doc already), so without the heavy-hitter
        // broadcast the count join-back would put all n docs' rows for
        // that key on a single hash partition.
        val allhot = expand(d0.withColumn("text",
          concat_ws(" ", col("text"), lit("zzhot zzkey"))))
        val n = flat.count(); zipf.count(); allhot.count()
        time(s"bigram_lm_flat(n=$n)", k) { TextAnalysis.bigramLm(flat) }
        val t0 = System.nanoTime()
        val df = TextAnalysis.bigramLm(zipf)
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val skewSplit =
          df.queryExecution.executedPlan.toString.contains("skew=true")
        println(s"""{"op":"bigram_lm_zipf(hot30pct,n=$n)","factor":$k,""" +
          s""""rows":$rows,"sec":${num(sec)},"skew_split":$skewSplit}""")
        time(s"bigram_lm_allhot(n=$n)", k) { TextAnalysis.bigramLm(allhot) }
        time(s"perplexity_allhot(n=$n)", k) {
          TextAnalysis.perplexity(allhot)
        }
      }
      spark.stop()
      return
    }

    // TPC-DS fact-fact shape stress: k shifted lineitem copies with the
    // SAME part/supplier/line-number population — per-part groups and the
    // line-identity join keys get k-times hotter, the adversarial
    // direction for q53's left join and q57's aggregate-join-back. The
    // stressed bodies ARE TpcdsShapes.netOfReturns / smallQtyRevenue with
    // the scaled frame injected, so the measured arithmetic can never
    // drift from the oracle-checked queries.
    //   scripts/run.sh graft.ScaleStress /root/testdata/sf0.1 tpcds 1 10
    if (tpcdsMode) {
      import graft.operators.TpcdsShapes
      factors.foreach { k =>
        val li0 = Tables.lineitem(spark, sfDir)
        val li = (0 until k).map { i =>
          li0.withColumn("l_orderkey",
            col("l_orderkey") + lit(i.toLong * 100000000L))
        }.reduce(_ union _).localCheckpoint(true)
        val n = li.count()
        time(s"net_of_returns(n=$n)", k) { TpcdsShapes.netOfReturns(li) }
        time(s"small_qty_revenue(n=$n)", k) { TpcdsShapes.smallQtyRevenue(li) }
        // same join shape with plain double arithmetic — isolates how much
        // of the cost is the oracle-exact decimal algebra vs the join
        time(s"small_qty_revenue_double(n=$n)", k) {
          val perPart = li.groupBy(col("l_partkey").as("pk"))
            .agg(avg(col("l_quantity")).as("avg_qty"))
          li.join(Joins.sizeGatedBroadcast(perPart),
              col("l_partkey") === col("pk"))
            .filter(col("l_quantity") < col("avg_qty") * 0.2)
            .agg(count(lit(1)).as("n_small"))
        }
      }
      spark.stop()
      return
    }

    factors.foreach { k =>
      val e = scaled(k).cache()
      e.count()
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts_us").as("p_ts_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts_us"), col("event_id"))
        .groupBy(col("user_id"), col("c_ts_us"))
        .agg(max(col("event_id")).as("click_id"))
      time("asof_join", k) {
        Joins.asOfJoin(purchases, clicks, "user_id", "p_ts_us", "c_ts_us")
      }

      val W = 21600000000L
      val cB = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"),
          col("ts_us").as("c_ts"))
        .withColumn("bucket", explode(array((col("c_ts") / W).cast("long"),
          (col("c_ts") / W).cast("long") + 1)))
      val eB = e.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"),
          col("ts_us").as("e_ts"))
        .withColumn("bucket", (col("e_ts") / W).cast("long"))
      time("interval_join", k) {
        cB.join(eB, Seq("user_id", "bucket"))
          .filter(col("e_ts") >= col("c_ts") && col("e_ts") <= col("c_ts") + W)
          .select(col("c_id"), col("e_id"))
      }

      // connected components over a synthetic chain-heavy pair graph
      // (worst case: long chains need diameter iterations)
      val n = 20000L * k
      val nodes = spark.range(n).select(col("id").as("doc_id"))
      val pairs = spark.range(n - 1)
        .filter(col("id") % 100 =!= 99) // chains of length 100
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      time("connected_components", k) {
        Dedup.connectedComponents(nodes, pairs, maxIters = 120)
      }
      e.unpersist()
    }
    spark.stop()
  }
}
