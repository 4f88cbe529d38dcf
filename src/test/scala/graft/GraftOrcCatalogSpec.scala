package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftOrcManifest

/** The graft-orc `TableCatalog` ([[graft.sources.v2.GraftOrcCatalog]]):
  * SQL DDL + DML + time travel against named tables, all resolving to
  * the same atomic manifest commits as the path API. One catalog per
  * spec run, warehoused in a temp dir.
  */
class GraftOrcCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-catalog-wh").toString
    spark.conf.set("spark.sql.catalog.gcat",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    dir
  }

  private def sql(s: String) = spark.sql(s)

  test("create / insert / select / drop round trip, and SHOW TABLES") {
    wh
    sql("CREATE NAMESPACE gcat.db1")
    sql("CREATE TABLE gcat.db1.t1 (a INT, b STRING)")
    sql("INSERT INTO gcat.db1.t1 VALUES (1, 'x'), (2, 'y')")
    assert(sql("SELECT a, b FROM gcat.db1.t1 ORDER BY a")
      .as[(Int, String)].collect().toSeq == Seq((1, "x"), (2, "y")))
    assert(sql("SHOW TABLES IN gcat.db1").select("tableName")
      .as[String].collect().toSeq == Seq("t1"))
    // the manifest IS the metastore: the directory carries a snapshot
    // with the persisted schema
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val snap = GraftOrcManifest.readSnapshot(fs,
      new Path(s"$wh/db1/t1")).get
    assert(snap.meta.exists(_.schema.fieldNames.toSeq == Seq("a", "b")))
    sql("DROP TABLE gcat.db1.t1")
    assert(sql("SHOW TABLES IN gcat.db1").count() == 0)
  }

  test("partitioned create + insert lays out hive directories; a " +
    "partition filter prunes files") {
    wh
    sql("CREATE TABLE gcat.pt (v INT, p INT) PARTITIONED BY (p)")
    sql("INSERT INTO gcat.pt VALUES (1, 10), (2, 10), (3, 20)")
    assert(sql("SELECT v FROM gcat.pt WHERE p = 20").as[Int]
      .collect().toSeq == Seq(3))
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$wh/pt/p=10")) &&
      fs.exists(new Path(s"$wh/pt/p=20")))
    val plan = sql("SELECT v FROM gcat.pt WHERE p = 20")
    plan.collect()
    val leaf = plan.queryExecution.executedPlan.collectLeaves().head
    val filesRead = leaf.metrics.find(_._1 == "graftFilesRead").map(_._2.value)
    assert(filesRead.contains(1L), s"partition pruning: got $filesRead")
  }

  test("the full ALTER TABLE DDL surface: ADD, RENAME, DROP, widen TYPE, " +
    "comment, properties — with old files resolving per version") {
    wh
    sql("CREATE TABLE gcat.ev (a INT, b INT)")
    sql("INSERT INTO gcat.ev VALUES (1, 100), (2, 200)")
    sql("ALTER TABLE gcat.ev RENAME COLUMN b TO metric")
    sql("ALTER TABLE gcat.ev ADD COLUMN note STRING")
    sql("ALTER TABLE gcat.ev ALTER COLUMN a TYPE BIGINT")
    sql("INSERT INTO gcat.ev VALUES (3, 300, 'new')")
    val rows = sql(
      "SELECT a, metric, note FROM gcat.ev ORDER BY a")
      .as[(Long, Int, Option[String])].collect().toSeq
    assert(rows == Seq((1L, 100, None), (2L, 200, None),
      (3L, 300, Some("new"))))
    sql("ALTER TABLE gcat.ev DROP COLUMN note")
    assert(sql("SELECT * FROM gcat.ev").schema.fieldNames.toSeq ==
      Seq("a", "metric"))
    sql("ALTER TABLE gcat.ev SET TBLPROPERTIES ('owner.team'='graft')")
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val meta = GraftOrcManifest.readSnapshot(fs,
      new Path(s"$wh/ev")).get.meta.get
    assert(meta.props.get("owner.team").contains("graft"))
    // ... and the property is visible through the SQL surface too
    val shown = sql("SHOW TBLPROPERTIES gcat.ev")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("owner.team").contains("graft"))
    // illegal evolutions fail loudly
    assertThrows[Exception] {
      sql("ALTER TABLE gcat.ev ALTER COLUMN a TYPE INT") // narrowing
    }
  }

  test("catalog DML: DELETE / UPDATE / MERGE resolve through the " +
    "catalog; MoR via TBLPROPERTIES") {
    wh
    sql("CREATE TABLE gcat.dml (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete_mode'='mor')")
    // one file, so the k=2 delete is PARTIAL (a multi-file VALUES insert
    // would let the classifier full-drop a single-row file as metadata —
    // correct, but then there is no sidecar to assert on)
    sql("INSERT INTO gcat.dml SELECT /*+ REPARTITION(1) */ * FROM VALUES " +
      "(1,'a'), (2,'b'), (3,'c'), (4,'d')")
    sql("DELETE FROM gcat.dml WHERE k = 2")
    assert(sql("SELECT k FROM gcat.dml ORDER BY k").as[Int]
      .collect().toSeq == Seq(1, 3, 4))
    // MoR: the delete produced a position sidecar, not a rewrite
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(GraftOrcManifest.readSnapshot(fs, new Path(s"$wh/dml")).get
      .deletes.nonEmpty)
    sql("UPDATE gcat.dml SET v = 'updated' WHERE k = 3")
    assert(sql("SELECT v FROM gcat.dml WHERE k = 3").as[String]
      .collect().toSeq == Seq("updated"))
    sql("CREATE TABLE gcat.dml_src (k INT, v STRING)")
    sql("INSERT INTO gcat.dml_src VALUES (4, 'merged'), (9, 'fresh')")
    sql("""MERGE INTO gcat.dml t USING gcat.dml_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(sql("SELECT k, v FROM gcat.dml ORDER BY k")
      .as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (3, "updated"), (4, "merged"), (9, "fresh")))
  }

  test("time travel through the catalog: VERSION AS OF and " +
    "TIMESTAMP AS OF") {
    wh
    sql("CREATE TABLE gcat.tt (x INT)")                  // snap 1
    sql("INSERT INTO gcat.tt VALUES (1)")                // snap 2
    val tsBetween = java.time.Instant.now()
    Thread.sleep(15)
    sql("INSERT INTO gcat.tt VALUES (2)")                // snap 3
    assert(sql("SELECT x FROM gcat.tt VERSION AS OF 2").as[Int]
      .collect().toSeq == Seq(1))
    assert(sql("SELECT x FROM gcat.tt ORDER BY x").as[Int]
      .collect().toSeq == Seq(1, 2))
    val asOf = sql(
      s"SELECT x FROM gcat.tt TIMESTAMP AS OF '$tsBetween'")
      .as[Int].collect().toSeq
    assert(asOf == Seq(1), s"TIMESTAMP AS OF read $asOf")
  }

  test("time travel reads an old snapshot under its OLD schema after " +
    "a rename (catalog surface of the evolution contract)") {
    wh
    sql("CREATE TABLE gcat.ttevo (a INT, b INT)")        // snap 1
    sql("INSERT INTO gcat.ttevo VALUES (1, 10)")         // snap 2
    sql("ALTER TABLE gcat.ttevo RENAME COLUMN b TO m")   // snap 3
    assert(sql("SELECT a, m FROM gcat.ttevo").as[(Int, Int)]
      .collect().toSeq == Seq((1, 10)))
    val old = sql("SELECT * FROM gcat.ttevo VERSION AS OF 2")
    assert(old.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(old.as[(Int, Int)].collect().toSeq == Seq((1, 10)))
  }

  test("ALTER TABLE RENAME TO moves the directory; external LOCATION " +
    "tables create where told") {
    wh
    sql("CREATE TABLE gcat.rn_src (x INT)")
    sql("INSERT INTO gcat.rn_src VALUES (7)")
    sql("ALTER TABLE gcat.rn_src RENAME TO rn_dst")
    assert(sql("SELECT x FROM gcat.rn_dst").as[Int].collect().toSeq ==
      Seq(7))
    assert(!spark.catalog.tableExists("gcat.rn_src"))
    val ext = Files.createTempDirectory("graft-cat-ext").toString
    sql(s"CREATE TABLE gcat.ext_t (y INT) LOCATION '$ext'")
    sql("INSERT INTO gcat.ext_t VALUES (42)")
    val fs = new Path(ext).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(GraftOrcManifest.exists(fs, new Path(ext)))
    assert(sql("SELECT y FROM gcat.ext_t").as[Int].collect().toSeq ==
      Seq(42))
  }

  test("CREATE TABLE ... LOCATION over an existing manifest table " +
    "REGISTERS it — adopting its current snapshot instead of racing a " +
    "stray seq-1 commit; mismatched declarations are refused") {
    wh
    val ext = Files.createTempDirectory("graft-cat-adopt").toString
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(ext)
    val fs = new Path(ext).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val preSnap = GraftOrcManifest.readSnapshot(fs, new Path(ext)).get
    // matching column list: registration, not re-creation
    sql(s"CREATE TABLE gcat.adopted (k INT, v STRING) LOCATION '$ext'")
    assert(sql("SELECT k, v FROM gcat.adopted ORDER BY k")
      .as[(Int, String)].collect().toSeq == Seq((1, "a"), (2, "b")))
    // the existing snapshot was ADOPTED: same seq, no rival commit
    val postSnap = GraftOrcManifest.readSnapshot(fs, new Path(ext)).get
    assert(postSnap.seq == preSnap.seq,
      s"registration must not commit: ${preSnap.seq} -> ${postSnap.seq}")
    // drop-then-re-register (the external contract: DROP keeps the
    // data); a WRONG column list on re-register is refused
    val ext2 = Files.createTempDirectory("graft-cat-adopt2").toString
    sql(s"CREATE TABLE gcat.adopted2 (k INT, v STRING) LOCATION '$ext2'")
    sql("INSERT INTO gcat.adopted2 VALUES (7, 'z')")
    sql("DROP TABLE gcat.adopted2")
    assert(GraftOrcManifest.exists(fs, new Path(ext2)),
      "DROP of an external table must keep its data")
    val err = intercept[Exception] {
      sql(s"CREATE TABLE gcat.adopted3 (wrong INT) LOCATION '$ext2'")
    }
    assert(err.getMessage.contains("existing table"))
    assert(!spark.catalog.tableExists("gcat.adopted3"))
    // matching re-register sees the data again
    sql(s"CREATE TABLE gcat.adopted4 (k INT, v STRING) LOCATION '$ext2'")
    assert(sql("SELECT k, v FROM gcat.adopted4").as[(Int, String)]
      .collect().toSeq == Seq((7, "z")))
  }

  test("catalog functions (FunctionCatalog): the native kernels resolve " +
    "in pure SQL, agree with the codegen expressions, and unknown names " +
    "raise typed errors") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
    val cos = sql("SELECT gcat.default.graft_cosine(" +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)))")
      .as[Double].collect().head
    assert(math.abs(cos - 1.0 / math.sqrt(2.0)) < 1e-12, cos)
    assert(sql("SELECT gcat.default.graft_dot(" +
      "array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))")
      .as[Double].collect().head == 6.0)
    // simhash64 through SQL == the native expression
    val viaSql = sql("SELECT gcat.default.graft_simhash64('a b c a')")
      .as[Long].collect().head
    val viaExpr = Seq("a b c a").toDF("t")
      .select(graft.functions.TextHashFunctions.simhash64($"t"))
      .as[Long].collect().head
    assert(viaSql == viaExpr)
    // NULL input -> NULL out; wrong arity/type and unknown names fail
    assert(sql("SELECT gcat.default.graft_simhash64(CAST(NULL AS STRING))")
      .collect().head.isNullAt(0))
    intercept[Exception] {
      sql("SELECT gcat.default.graft_cosine(array(CAST(1.0 AS FLOAT)))")
        .collect()
    }
    intercept[Exception] {
      sql("SELECT gcat.default.no_such_fn(1)").collect()
    }
    // SHOW FUNCTIONS surfaces them
    val listed = sql("SHOW FUNCTIONS IN gcat.default")
      .as[String].collect().toSeq
    assert(listed.exists(_.endsWith("graft_cosine")), listed)
  }

  test("TRUNCATE TABLE through the catalog empties the table in one " +
    "metadata commit; the pre-truncate snapshot stays time-travelable") {
    wh
    sql("CREATE TABLE gcat.trunc_t (a INT)")
    sql("INSERT INTO gcat.trunc_t VALUES (1), (2), (3)")
    sql("TRUNCATE TABLE gcat.trunc_t")
    assert(sql("SELECT * FROM gcat.trunc_t").count() == 0)
    assert(sql("SELECT a FROM gcat.trunc_t VERSION AS OF 2")
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // and the table still accepts inserts after
    sql("INSERT INTO gcat.trunc_t VALUES (9)")
    assert(sql("SELECT a FROM gcat.trunc_t").as[Int].collect().toSeq ==
      Seq(9))
  }

  test("ADD COLUMN FIRST positions as metadata (round 13); plain ADD " +
    "still appends at the end") {
    wh
    sql("CREATE TABLE gcat.pos_t (a INT, b INT)")
    sql("ALTER TABLE gcat.pos_t ADD COLUMN c INT FIRST")
    assert(sql("SELECT * FROM gcat.pos_t").schema.fieldNames.toSeq ==
      Seq("c", "a", "b"))
    sql("ALTER TABLE gcat.pos_t ADD COLUMN d INT")
    assert(sql("SELECT * FROM gcat.pos_t").schema.fieldNames.toSeq ==
      Seq("c", "a", "b", "d"))
  }

  test("CTAS is atomic (StagingTableCatalog): the table appears only at " +
    "commit, a mid-write failure leaves NOTHING — no empty table, no " +
    "stage leftovers") {
    wh
    sql("CREATE TABLE gcat.ctas1 AS SELECT id AS a, id * 2 AS b " +
      "FROM range(5)")
    assert(sql("SELECT a, b FROM gcat.ctas1 ORDER BY a")
      .as[(Long, Long)].collect().toSeq ==
      (0L until 5L).map(i => (i, i * 2)))
    // staged history: seq 1 = establishment, seq 2 = the CTAS data
    assert(sql("SELECT a FROM gcat.ctas1 VERSION AS OF 1").count() == 0)
    // a CTAS whose SELECT fails mid-write must leave no trace
    intercept[Exception] {
      sql("CREATE TABLE gcat.ctas_fail AS " +
        "SELECT raise_error('boom') AS x FROM range(10)")
    }
    assert(!spark.catalog.tableExists("gcat.ctas_fail"))
    val whFs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val leftovers = whFs.listStatus(new Path(wh)).map(_.getPath.getName)
      .filter(_.startsWith(".stage-"))
    assert(leftovers.isEmpty, s"stage leftovers: ${leftovers.toSeq}")
    // ...and SHOW TABLES never saw it
    assert(!sql("SHOW TABLES IN gcat").select("tableName")
      .as[String].collect().contains("ctas_fail"))
  }

  test("partitioned CTAS lays out hive directories under the staged " +
    "table and prunes after publish; REPLACE TABLE AS SELECT swaps " +
    "contents + schema in one snapshot with the old state retained") {
    wh
    sql("CREATE TABLE gcat.ctasp PARTITIONED BY (p) AS " +
      "SELECT id AS v, CAST(id % 2 AS INT) AS p FROM range(6)")
    val whFs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(whFs.exists(new Path(s"$wh/ctasp/p=0")) &&
      whFs.exists(new Path(s"$wh/ctasp/p=1")))
    assert(sql("SELECT v FROM gcat.ctasp WHERE p = 1").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 5L))
    // RTAS: entirely new contents AND schema, one atomic snapshot
    sql("REPLACE TABLE gcat.ctasp AS " +
      "SELECT concat('r', id) AS name FROM range(3)")
    assert(sql("SELECT name FROM gcat.ctasp ORDER BY name")
      .as[String].collect().toSeq == Seq("r0", "r1", "r2"))
    assert(sql("SELECT * FROM gcat.ctasp").schema.fieldNames.toSeq ==
      Seq("name"))
    // the pre-replace state stays time-travelable (seq 2 = CTAS data)
    assert(sql("SELECT v FROM gcat.ctasp VERSION AS OF 2").count() == 6)
    // CREATE OR REPLACE on a missing table creates it
    sql("CREATE OR REPLACE TABLE gcat.ctas_cor AS SELECT 1 AS one")
    assert(sql("SELECT one FROM gcat.ctas_cor").as[Int]
      .collect().toSeq == Seq(1))
    // REPLACE of a missing table is a typed error
    intercept[Exception] {
      sql("REPLACE TABLE gcat.no_such_t AS SELECT 1 AS one")
    }
  }

  test("external CTAS with LOCATION publishes at the location and " +
    "registers the pointer only at commit") {
    wh
    val ext = Files.createTempDirectory("graft-cat-ctas-ext").toString + "/t"
    sql(s"CREATE TABLE gcat.ctas_ext LOCATION '$ext' AS " +
      "SELECT id AS k FROM range(4)")
    assert(sql("SELECT k FROM gcat.ctas_ext").count() == 4)
    val fs = new Path(ext).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(GraftOrcManifest.exists(fs, fs.makeQualified(new Path(ext))))
    // path readers see the same table
    assert(spark.read.format("graft-orc").load(ext).count() == 4)
  }

  test("INSERT OVERWRITE replaces contents atomically; CREATE of an " +
    "existing table and reads of a missing one raise typed errors") {
    wh
    sql("CREATE TABLE gcat.ow (x INT)")
    sql("INSERT INTO gcat.ow VALUES (1), (2)")
    sql("INSERT OVERWRITE gcat.ow VALUES (9)")
    assert(sql("SELECT x FROM gcat.ow").as[Int].collect().toSeq == Seq(9))
    assertThrows[org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException] {
      sql("CREATE TABLE gcat.ow (z INT)")
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      sql("SELECT * FROM gcat.no_such_table").collect()
    }
  }

  test("ADD COLUMN FIRST/AFTER is honored as metadata: the persisted " +
    "order serves SELECT *, old files still resolve (null-fill), new " +
    "inserts carry values; AFTER a missing column fails typed") {
    wh
    sql("CREATE TABLE gcat.pos (a INT, b STRING)")
    sql("INSERT INTO gcat.pos VALUES (1, 'x'), (2, 'y')")
    sql("ALTER TABLE gcat.pos ADD COLUMN z DOUBLE FIRST")
    sql("ALTER TABLE gcat.pos ADD COLUMN w INT AFTER a")
    assert(sql("SELECT * FROM gcat.pos").schema.fieldNames.toSeq ==
      Seq("z", "a", "w", "b"))
    // pre-DDL files null-fill the positioned adds, values intact
    val old = sql("SELECT * FROM gcat.pos ORDER BY a").collect()
    assert(old.length == 2 && old.forall(r =>
      r.isNullAt(0) && r.isNullAt(2)))
    assert(old.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(old.map(_.getString(3)).toSeq == Seq("x", "y"))
    // inserts follow the new positional order
    sql("INSERT INTO gcat.pos VALUES (9.5, 3, 30, 'z')")
    val row = sql("SELECT z, a, w, b FROM gcat.pos WHERE a = 3")
      .collect()(0)
    assert(row.getDouble(0) == 9.5 && row.getInt(2) == 30 &&
      row.getString(3) == "z")
    // rename on a pre-position column still follows the data
    sql("ALTER TABLE gcat.pos RENAME COLUMN b TO label")
    assert(sql("SELECT label FROM gcat.pos WHERE a = 1").collect()(0)
      .getString(0) == "x")
    val err = intercept[Exception] {
      sql("ALTER TABLE gcat.pos ADD COLUMN q INT AFTER no_such")
    }
    // Spark's analyzer validates the AFTER anchor itself
    // (FIELD_NOT_FOUND) before the catalog sees the change; either
    // layer's typed error is fine — silent append is what must not occur
    assert(err.getMessage.contains("no_such") ||
      err.getMessage.contains("FIELD_NOT_FOUND"), err.getMessage)
    assert(sql("SELECT * FROM gcat.pos").schema.fieldNames.toSeq ==
      Seq("z", "a", "w", "label"), "refused ADD must not mutate")
  }

  test("MERGE INTO ... WITH SCHEMA EVOLUTION: a source with a new " +
    "column evolves the target through alterTable (one metadata " +
    "commit), matched rows update it, unmatched insert it, old rows " +
    "null-fill") {
    wh
    sql("CREATE TABLE gcat.mse (k INT, v STRING)")
    sql("INSERT INTO gcat.mse VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("CREATE TABLE gcat.mse_src (k INT, v STRING, score DOUBLE)")
    sql("INSERT INTO gcat.mse_src VALUES (2, 'b2', 0.5), (9, 'new', 0.9)")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO gcat.mse t
          USING gcat.mse_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    val rows = sql("SELECT k, v, score FROM gcat.mse ORDER BY k")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 9))
    assert(rows(0).isNullAt(2) && rows(2).isNullAt(2),
      "untouched rows must null-fill the evolved column")
    assert(rows(1).getString(1) == "b2" && rows(1).getDouble(2) == 0.5)
    assert(rows(3).getString(1) == "new" && rows(3).getDouble(2) == 0.9)
    // the evolution persisted as schema metadata with a field ID
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val meta = GraftOrcManifest.readSnapshot(fs,
      new Path(s"$wh/mse")).get.meta.get
    assert(meta.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(graft.sources.v2.GraftOrcSchema
      .fieldId(meta.schema("score")).nonEmpty)
  }

  test("NESTED-field DDL evolution is refused loudly (documented " +
    "posture: top-level evolution only; nested changes never silently " +
    "no-op or corrupt field-ID resolution)") {
    assume(wh.nonEmpty)
    spark.sql("CREATE TABLE gcat.nest (k BIGINT, " +
      "s STRUCT<a: BIGINT, b: STRING>)")
    try {
      spark.sql("INSERT INTO gcat.nest VALUES (1, named_struct(" +
        "'a', 10L, 'b', 'x'))")
      def refused(sql: String, what: String): Unit = {
        val ex = intercept[Exception] { spark.sql(sql) }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains(s"nested $what")),
          s"$sql -> ${msgs(ex).mkString(" | ")}")
      }
      refused("ALTER TABLE gcat.nest ADD COLUMN s.c BIGINT",
        "ADD COLUMN")
      refused("ALTER TABLE gcat.nest RENAME COLUMN s.a TO a2",
        "RENAME COLUMN")
      refused("ALTER TABLE gcat.nest DROP COLUMN s.a", "DROP COLUMN")
      // the refusal never committed anything: table intact + readable
      val rows = spark.sql(
        "SELECT k, s.a, s.b FROM gcat.nest").collect()
      assert(rows.length == 1 && rows(0).getLong(1) == 10L)
    } finally spark.sql("DROP TABLE IF EXISTS gcat.nest")
  }
}
