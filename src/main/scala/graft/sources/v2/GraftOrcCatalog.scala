package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real `TableCatalog` over graft-orc manifest tables — the missing
  * piece between path-based reads and a lakehouse surface: named tables,
  * SQL DDL, and catalog-resolved DML, all backed by the SAME atomic
  * manifest commits the path API uses.
  *
  * Register:
  * {{{
  *   spark.conf.set("spark.sql.catalog.gorc",
  *     "graft.sources.v2.GraftOrcCatalog")
  *   spark.conf.set("spark.sql.catalog.gorc.warehouse", "/data/warehouse")
  * }}}
  *
  * Then the full SQL surface works against `gorc.<ns...>.<table>`:
  *  - `CREATE TABLE gorc.db.t (a INT, b STRING) PARTITIONED BY (p INT)
  *    TBLPROPERTIES('graft.delete_mode'='mor')` — creates the directory
  *    and commits snapshot 1 with the PERSISTED schema (field IDs
  *    assigned, [[GraftOrcSchema]]); `LOCATION` makes it external.
  *  - `ALTER TABLE ... ADD COLUMN / RENAME COLUMN ... TO / DROP COLUMN /
  *    ALTER COLUMN ... TYPE / SET TBLPROPERTIES` — metadata-only
  *    snapshot commits with exact per-file resolution afterwards.
  *  - `INSERT INTO / INSERT OVERWRITE`, `DELETE/UPDATE/MERGE` — the
  *    existing row-level machinery, resolved by name.
  *  - `SELECT ... FROM gorc.db.t VERSION AS OF 3` /
  *    `TIMESTAMP AS OF '...'` — time travel through the catalog
  *    ([[loadTable]] overloads map to the snapshot selectors).
  *
  * Layout: `<warehouse>/<ns...>/<table>`; a directory is a TABLE when it
  * has a `_graft_manifest`, a NAMESPACE otherwise — one listing
  * distinguishes them, no extra metastore state to keep consistent (the
  * manifest IS the metastore, per table). Concurrency: all mutations are
  * manifest commits, so the same-seq race detection serializes
  * concurrent DDL/DML exactly like concurrent writes.
  */
class GraftOrcCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog with FunctionCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  private def conf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  private def fs: FileSystem = warehouse.getFileSystem(conf)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"graft-orc catalog '$name' requires spark.sql.catalog.$name" +
        ".warehouse")
    warehouse = new Path(w)
  }

  override def name(): String = catalogName

  // CREATE TABLE (c INT DEFAULT 5) / ALTER TABLE ... DEFAULT route
  // through Spark's default-column framework only when the catalog
  // advertises it; the defaults land in the schema's
  // CURRENT_DEFAULT/EXISTS_DEFAULT field metadata (GraftOrcSchema)
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT)

  private def dirOf(ident: Identifier): Path =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)((p, seg) => new Path(p, seg))

  private def dirOf(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)((p, seg) => new Path(p, seg))

  /** External tables live at their LOCATION; the managed warehouse dir
    * then holds only a pointer file naming it (one line, UTF-8). The
    * manifest at the location is the table; the pointer is how the
    * catalog finds it.
    */
  private val LocationPointer = "_graft_location"

  private def pointerTarget(dir: Path): Option[Path] = {
    val pf = new Path(dir, LocationPointer)
    try {
      val in = fs.open(pf)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (txt.nonEmpty) Some(new Path(txt)) else None
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** The directory the table's data+manifest actually live in. */
  private def resolveDir(ident: Identifier): Path = {
    val dir = dirOf(ident)
    pointerTarget(dir).getOrElse(dir)
  }

  private def isTableDir(p: Path): Boolean =
    pointerTarget(p).map(t => GraftOrcManifest.exists(fs, fs.makeQualified(t)))
      .getOrElse(GraftOrcManifest.exists(fs, fs.makeQualified(p)))

  /** The table path: LOCATION property (external tables) or the managed
    * warehouse directory.
    */
  private def locationOf(ident: Identifier,
                         props: Map[String, String]): Path =
    props.get("location").map(new Path(_)).getOrElse(dirOf(ident))

  // ---- tables ----------------------------------------------------------

  override def loadTable(ident: Identifier): Table =
    loadTableWith(ident, Nil)

  /** `VERSION AS OF <seq-or-ref>` through the catalog: a numeric
    * version addresses a snapshot seq, anything else a named ref — a
    * TAG first, else a BRANCH head (the Iceberg convention for named
    * refs in VERSION AS OF; tags win a name collision, matching the
    * read-option precedence).
    */
  override def loadTable(ident: Identifier, version: String): Table =
    loadTableWith(ident,
      if (version.nonEmpty && version.forall(_.isDigit))
        Seq("graft.snapshot_id" -> version)
      else {
        val dir = resolveDir(ident)
        // branchExists validates the ref charset; an arbitrary string
        // must fall through to the tag path's typed error instead
        val isBranch = version.forall(c =>
            c.isLetterOrDigit || c == '-' || c == '_' || c == '.') &&
          GraftOrcManifest.listTags(fs, dir).forall(_._1 != version) &&
          GraftOrcManifest.branchExists(fs, dir, version)
        if (isBranch) Seq("graft.branch" -> version)
        else Seq("graft.tag" -> version)
      })

  /** `TIMESTAMP AS OF <ts>` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadTableWith(ident,
      Seq("graft.as_of_timestamp" -> (timestamp / 1000L).toString))

  private def loadTableWith(ident: Identifier,
                            extra: Seq[(String, String)]): Table = {
    val dir = resolveDir(ident)
    val snap =
      try GraftOrcManifest.readSnapshot(fs, dir)
      catch { case _: java.io.FileNotFoundException => None }
    val meta = snap.flatMap(_.meta)
    if (snap.isEmpty) {
      // metadata tables (Iceberg multipart-identifier shape):
      // `db.t.snapshots|files|partitions` — the trailing name selects
      // the view, the prefix must be a real manifest table
      if (ident.namespace().nonEmpty &&
          GraftOrcMetadataTable.Kinds(
            ident.name().toLowerCase(java.util.Locale.ROOT))) {
        val parent = Identifier.of(ident.namespace().dropRight(1),
          ident.namespace().last)
        val pdir = resolveDir(parent)
        if (GraftOrcManifest.exists(fs, fs.makeQualified(pdir)))
          return new GraftOrcMetadataTable(
            ident.name().toLowerCase(java.util.Locale.ROOT),
            pdir.toString)
      }
      // ref reads by identifier (the Iceberg `t.branch_<name>` /
      // `t.tag_<name>` convention): the trailing name addresses a
      // branch head or a tagged snapshot of the parent table — branch
      // reads in pure SQL with no VERSION AS OF support needed
      if (ident.namespace().nonEmpty &&
          (ident.name().startsWith("branch_") ||
            ident.name().startsWith("tag_"))) {
        val parent = Identifier.of(ident.namespace().dropRight(1),
          ident.namespace().last)
        val pdir = resolveDir(parent)
        if (GraftOrcManifest.exists(fs, fs.makeQualified(pdir))) {
          val opt =
            if (ident.name().startsWith("branch_"))
              "graft.branch" -> ident.name().stripPrefix("branch_")
            else "graft.tag" -> ident.name().stripPrefix("tag_")
          return loadTableWith(parent, Seq(opt))
        }
      }
      throw new NoSuchTableException(ident)
    }
    val tableDir = meta.flatMap(_.props.get("location"))
      .getOrElse(dir.toString)
    val options = new java.util.HashMap[String, String]()
    options.put("path", tableDir)
    extra.foreach { case (k, v) => options.put(k, v) }
    val cism = new CaseInsensitiveStringMap(options)
    // time travel resolves the ADDRESSED snapshot's schema; the latest
    // snapshot's meta schema otherwise; inference for pre-meta tables
    val schema = new GraftOrcDataSource().inferSchema(cism)
    val partCols: Seq[String] = meta.map(_.parts).getOrElse(Nil)
    // canonical forms → real transforms (DESCRIBE shows bucket(16, id),
    // not an opaque string; writes re-derive the same spec from them)
    val transforms: Array[Transform] = GraftOrcPartitionSpec
      .parseCanonical(partCols).map(GraftOrcPartitionSpec.toTransform)
      .toArray
    val props = meta.map(_.props).getOrElse(Map.empty) ++
      extra.toMap + ("path" -> tableDir)
    new GraftOrcTable(schema, props, transforms)
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(dirOf(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace)
    val listing =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException =>
        // the ROOT namespace always exists (a fresh warehouse directory
        // is created by the first CREATE) — report it empty, not missing
        if (namespace.isEmpty) return Array.empty
        throw new NoSuchNamespaceException(namespace) }
    if (namespace.nonEmpty && isTableDir(dir))
      throw new NoSuchNamespaceException(namespace)
    listing.filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") && isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  private def validatedPartCols(schema: StructType,
                                partitions: Array[Transform]): Seq[String] = {
    // PARTITIONED BY (c, days(ts), bucket(16, id), truncate(4, name)):
    // identity AND hidden-transform fields ([[GraftOrcPartitionSpec]])
    val spec = partitions.toSeq.map(GraftOrcPartitionSpec.fromTransform)
    GraftOrcPartitionSpec.validate(schema, spec)
    spec.map(_.canonical)
  }

  /** Drop the engine-managed properties Spark passes along; keep user
    * TBLPROPERTIES (and `location` for external tables).
    */
  private def userProps(properties: util.Map[String, String])
      : Map[String, String] =
    properties.asScala.toMap.filterNot { case (k, _) =>
      Set("provider", "owner", "external", "option.path",
        "path")(k.toLowerCase) }

  /** CREATE-time CHECK constraints: `CREATE TABLE t (..., CONSTRAINT ck
    * CHECK (...))` arrives through this TableInfo overload, whose
    * DEFAULT implementation forwards only columns/partitions/properties
    * — the declared constraint would VANISH silently (created table,
    * no gate, nothing reported by `t.constraints()`). Persist each as
    * the same `graft.constraint.<name>` property the ALTER path writes,
    * so create-time and ALTER-added constraints are indistinguishable
    * downstream. No rows exist at CREATE, so there is nothing to
    * validate; enforcement of every later write is unconditional.
    */
  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val props = new util.HashMap[String, String](info.properties())
    constraintProps(info.constraints()).foreach {
      case (k, v) => props.put(k, v) }
    createTable(ident, info.schema(), info.partitions(), props)
  }

  private def constraintProps(
      cs: Array[org.apache.spark.sql.connector.catalog.constraints
        .Constraint]): Map[String, String] =
    cs.map { c =>
      require(c.isInstanceOf[
          org.apache.spark.sql.connector.catalog.constraints.Check],
        s"graft-orc: only CHECK constraints are supported, got ${c.toDDL}")
      val chk = c.asInstanceOf[
        org.apache.spark.sql.connector.catalog.constraints.Check]
      val sql = Option(chk.predicateSql()).getOrElse(
        throw new IllegalArgumentException(
          "graft-orc: CHECK constraint needs a predicate SQL text"))
      (GraftOrcDataSource.ConstraintPropPrefix + chk.name()) -> sql
    }.toMap

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (isTableDir(dir)) throw new TableAlreadyExistsException(ident)
    val partCols = validatedPartCols(schema, partitions)
    val keep = userProps(properties)
    val target = locationOf(ident, keep)
    val tfs = target.getFileSystem(conf)
    // External-table REGISTRATION: `CREATE TABLE ... LOCATION p` over a
    // directory that already holds a manifest table ADOPTS its current
    // snapshot/meta (the standard external contract — Iceberg's
    // register_table) instead of racing a stray seq-1 snapshot under it.
    // The declared columns, if any, must agree with the existing schema;
    // a managed dir with a manifest was already rejected above.
    val existing =
      if (keep.contains("location"))
        GraftOrcManifest.readSnapshot(tfs, tfs.makeQualified(target))
      else None
    existing match {
      case Some(s) =>
        // declared columns/partitioning, if any, must agree with the
        // persisted meta; a pre-meta manifest table (no persisted
        // schema) registers as-is — its schema is inferred at read
        s.meta.foreach { m =>
          val declared = schema.fieldNames.map(_.toLowerCase).toSet
          val actual = m.schema.fieldNames.map(_.toLowerCase).toSet
          require(schema.isEmpty || declared == actual,
            s"graft-orc: CREATE TABLE ... LOCATION $target declares " +
              s"columns ${schema.fieldNames.mkString(", ")} but the " +
              s"existing table there has ${m.schema.fieldNames
                .mkString(", ")} — omit the column list (or match it) " +
              "to register an existing table")
          require(partCols.isEmpty ||
              partCols.map(_.toLowerCase) == m.parts.map(_.toLowerCase),
            s"graft-orc: CREATE TABLE ... LOCATION $target declares " +
              s"partitioning (${partCols.mkString(", ")}) different " +
              s"from the existing table's (${m.parts.mkString(", ")})")
        }
      case None =>
        tfs.mkdirs(target)
        val meta = GraftOrcManifest.TableMeta(1L,
          GraftOrcSchema.assignIds(schema), partCols, keep)
        // seq 1, empty listing — atomic establishment; a racing CREATE of
        // the same table loses the seq race and fails loudly
        GraftOrcManifest.writeSnapshot(tfs, target, 1L, Nil,
          deletes = Nil, op = "create", meta = Some(meta))
    }
    // external tables: the managed dir carries a pointer to the LOCATION
    if (keep.contains("location")) {
      fs.mkdirs(dir)
      val out = fs.create(new Path(dir, LocationPointer), true)
      try out.write(target.toString.getBytes("UTF-8")) finally out.close()
    }
    loadTable(ident)
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog) ------------------------
  //
  // Without staging, `CREATE TABLE ... AS SELECT` runs as create-then-
  // insert: a failure between the two leaves an EMPTY committed table
  // visible (and "successfully created") to every reader. Staged commits
  // close that window the Iceberg way: the whole table — establishing
  // snapshot, meta, data files, data snapshot — is built under an
  // invisible `.stage-*` sibling directory, and only
  // `commitStagedChanges` makes it the table:
  //  - CTAS: ONE directory rename (the stage dir is a sibling of the
  //    final dir, so the rename never crosses file systems). A crash
  //    anywhere before it leaves only the invisible stage dir.
  //  - RTAS over an existing table: the staged data files are moved in
  //    (unmanifested = invisible) and ONE truncate commitSwap publishes
  //    new contents + new schema atomically; the pre-replace snapshot
  //    stays time-travelable until expiry.

  private class GraftOrcStagedTable(schema: StructType,
                                    props: Map[String, String],
                                    transforms: Array[Transform],
                                    commitFn: () => Unit,
                                    abortFn: () => Unit)
      extends GraftOrcTable(schema, props, transforms) with StagedTable {
    override def commitStagedChanges(): Unit = commitFn()
    override def abortStagedChanges(): Unit = abortFn()
  }

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, replace = false, orCreate = false)

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, replace = true, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier,
                                    info: TableInfo): StagedTable =
    stage(ident, info, replace = true, orCreate = true)

  private def stage(ident: Identifier, info: TableInfo,
                    replace: Boolean, orCreate: Boolean): StagedTable = {
    val schema = info.schema()
    val dir = dirOf(ident)
    val exists = isTableDir(dir)
    if (!replace && exists) throw new TableAlreadyExistsException(ident)
    if (replace && !orCreate && !exists) throw new NoSuchTableException(ident)
    val partCols = validatedPartCols(schema, info.partitions())
    // REPLACE TABLE (... CONSTRAINT ...) routes here: the replaced
    // table starts from the staged rows only, all of which the write
    // gate validates — same no-retro-scan-needed argument as CREATE
    val keep = userProps(info.properties()) ++
      constraintProps(info.constraints())
    val target = locationOf(ident, keep)
    val tfs = target.getFileSystem(conf)
    if (!exists && keep.contains("location") &&
        GraftOrcManifest.exists(tfs, tfs.makeQualified(target)))
      throw new TableAlreadyExistsException(ident)
    // stage the whole table as a SIBLING of its final directory (same
    // volume => the publishing rename is a move, never a copy)
    val stageDir = new Path(target.getParent,
      s".stage-${target.getName}-${java.util.UUID.randomUUID()}")
    tfs.mkdirs(stageDir)
    val meta = GraftOrcManifest.TableMeta(1L,
      GraftOrcSchema.assignIds(schema), partCols, keep)
    GraftOrcManifest.writeSnapshot(tfs, stageDir, 1L, Nil,
      deletes = Nil, op = "create", meta = Some(meta))

    def abort(): Unit = tfs.delete(stageDir, true)

    def commit(): Unit = {
      val qTarget = tfs.makeQualified(target)
      if (GraftOrcManifest.exists(tfs, qTarget)) {
        // REPLACE an existing table: move the staged data files in
        // (unmanifested files are invisible to readers), then publish
        // contents + schema in one truncate snapshot
        val qStage = tfs.makeQualified(stageDir)
        val stSnap = GraftOrcManifest.readSnapshot(tfs, qStage)
          .getOrElse(GraftOrcManifest.Snapshot(0L, Nil))
        val cur = GraftOrcManifest.readSnapshot(tfs, qTarget)
          .getOrElse(GraftOrcManifest.Snapshot(0L, Nil))
        GraftOrcWrite.bumpPublishStamp(
          (cur.entries ++ cur.deletes ++ stSnap.entries)
            .map(_.mtime).foldLeft(0L)(math.max))
        val moved = stSnap.entries.map { e =>
          val rel = GraftOrcManifest.relativize(qStage, e.path)
          val dest = new Path(qTarget, rel)
          tfs.mkdirs(dest.getParent)
          val stamp = GraftOrcWrite.nextPublishStamp()
          tfs.setTimes(new Path(e.path), stamp, -1)
          if (!tfs.rename(new Path(e.path), dest))
            throw new java.io.IOException(
              s"graft-orc: failed to move staged file ${e.path} into " +
                s"$dest")
          e.copy(path = tfs.makeQualified(dest).toString, mtime = stamp)
        }
        GraftOrcManifest.commitSwap(tfs, qTarget, remove = Set.empty,
          add = moved, truncate = true, op = "replace",
          meta = stSnap.meta)
        tfs.delete(stageDir, true)
      } else {
        // CREATE: the stage dir IS the table — one rename publishes it
        tfs.mkdirs(target.getParent)
        if (tfs.exists(target))
          throw new java.util.ConcurrentModificationException(
            s"graft-orc: $target appeared while the staged create of " +
              s"${ident.name()} was writing — a concurrent writer won; " +
              "the staged table was not published")
        if (!tfs.rename(stageDir, target))
          throw new java.io.IOException(
            s"graft-orc: failed to publish staged table $stageDir " +
              s"as $target")
      }
      // external tables: the managed dir carries a pointer to LOCATION
      if (keep.contains("location")) {
        fs.mkdirs(dir)
        val out = fs.create(new Path(dir, LocationPointer), true)
        try out.write(target.toString.getBytes("UTF-8"))
        finally out.close()
      }
    }

    // writes land in the stage dir through the ordinary path machinery
    // (the establishing manifest makes them snapshot commits there);
    // `location` is dropped so nothing resolves to the final dir early
    new GraftOrcStagedTable(meta.schema,
      keep - "location" + ("path" -> stageDir.toString),
      info.partitions(), () => commit(), () => abort())
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    import TableChange._
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    GraftOrcSchema.alter(conf, dir.toString) { meta0 =>
      changes.foldLeft(meta0) { (m, ch) =>
        ch match {
          case a: AddColumn =>
            require(a.fieldNames().length == 1,
              "graft-orc: nested ADD COLUMN is not supported")
            // FIRST/AFTER honored as metadata: field IDs make column
            // order presentational (per-file resolution is by name/ID,
            // never position), so the requested order persists in the
            // manifest schema and projection serves it
            val at = a.position() match {
              case null => None
              case _: TableChange.First => Some(0)
              case af: TableChange.After =>
                val i = m.schema.fields.indexWhere(
                  _.name.equalsIgnoreCase(af.column()))
                require(i >= 0, s"graft-orc: ADD COLUMN ... AFTER " +
                  s"${af.column()}: no such column")
                Some(i + 1)
              case other => throw new UnsupportedOperationException(
                s"graft-orc: unsupported column position $other")
            }
            GraftOrcSchema.addColumn(m, a.fieldNames()(0), a.dataType(),
              Option(a.comment()), at,
              // ADD COLUMN ... DEFAULT <lit>: the folded SQL text becomes
              // both the CURRENT default (INSERT fill, applied by Spark)
              // and the EXISTS default (pre-add files read it, applied
              // by the scan)
              default = Option(a.defaultValue()).map(_.getSql))
          case r: RenameColumn =>
            require(r.fieldNames().length == 1,
              "graft-orc: nested RENAME COLUMN is not supported")
            GraftOrcSchema.renameColumn(m, r.fieldNames()(0), r.newName())
          case d: DeleteColumn =>
            require(d.fieldNames().length == 1,
              "graft-orc: nested DROP COLUMN is not supported")
            GraftOrcSchema.dropColumn(m, d.fieldNames()(0))
          case t: UpdateColumnType =>
            require(t.fieldNames().length == 1,
              "graft-orc: nested ALTER COLUMN is not supported")
            GraftOrcSchema.widenColumn(m, t.fieldNames()(0), t.newDataType())
          case n: UpdateColumnNullability =>
            require(n.nullable(),
              "graft-orc: cannot add NOT NULL to an existing column " +
                "(already-written files are not re-validated)")
            m // all columns are nullable already
          case u: TableChange.UpdateColumnDefaultValue =>
            require(u.fieldNames().length == 1,
              "graft-orc: nested ALTER COLUMN is not supported")
            val i = m.schema.fieldIndex(u.fieldNames()(0))
            val f = m.schema.fields(i)
            val nb = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
            // SET DEFAULT changes what FUTURE inserts get; the initial
            // (EXISTS) default stays frozen at ADD COLUMN time — rows
            // already on disk keep reading what the add declared
            val sqlOpt = Option(u.newCurrentDefault()).map(_.getSql)
              .orElse(Option(u.newDefaultValue()).filter(_.nonEmpty))
            sqlOpt match {
              case Some(sql) =>
                val e = org.apache.spark.sql.catalyst.parser
                  .CatalystSqlParser.parseExpression(sql)
                require(e.foldable, "graft-orc: DEFAULT for column " +
                  s"${f.name} must be a constant expression, got: $sql")
                nb.putString(GraftOrcSchema.CurrentDefaultKey, sql)
              case None =>
                nb.remove(GraftOrcSchema.CurrentDefaultKey)
            }
            m.copy(schemaV = m.schemaV + 1, schema = StructType(
              m.schema.fields.updated(i, f.copy(metadata = nb.build()))))
          case c: UpdateColumnComment =>
            val i = m.schema.fieldIndex(c.fieldNames()(0))
            m.copy(schemaV = m.schemaV + 1, schema = StructType(
              m.schema.fields.updated(i,
                m.schema.fields(i).withComment(c.newComment()))))
          case a: TableChange.AddConstraint =>
            val c = a.constraint()
            require(c.isInstanceOf[
                org.apache.spark.sql.connector.catalog.constraints.Check],
              s"graft-orc: only CHECK constraints are supported, got " +
                c.toDDL)
            val chk = c.asInstanceOf[
              org.apache.spark.sql.connector.catalog.constraints.Check]
            val key = GraftOrcDataSource.ConstraintPropPrefix + chk.name()
            require(!m.props.keys.exists(_.equalsIgnoreCase(key)),
              s"graft-orc: constraint ${chk.name()} already exists")
            val sql = Option(chk.predicateSql()).getOrElse(
              throw new IllegalArgumentException(
                "graft-orc: CHECK constraint needs a predicate SQL text"))
            // existing-data validation is Spark's side of the contract:
            // the SQL `ADD CONSTRAINT ... CHECK` analysis scans the table
            // and fails with NEW_CHECK_CONSTRAINT_VIOLATION before this
            // alterTable is ever called — re-scanning here would double
            // the DDL's one-full-scan price at 100 TB. A programmatic
            // catalog.alterTable bypasses that scan by design (the same
            // trust level as any direct metadata edit); enforcement of
            // every LATER write is unconditional either way.
            m.copy(schemaV = m.schemaV + 1,
              props = m.props + (key -> sql))
          case d: TableChange.DropConstraint =>
            val key = GraftOrcDataSource.ConstraintPropPrefix + d.name()
            val existing = m.props.keys.find(_.equalsIgnoreCase(key))
            require(existing.nonEmpty || d.ifExists(),
              s"graft-orc: no constraint ${d.name()} on this table")
            existing match {
              case Some(k) => m.copy(schemaV = m.schemaV + 1,
                props = m.props - k)
              case None => m
            }
          case p: SetProperty =>
            // graft.parts.* is ENGINE STATE (partition-spec evolution
            // bookkeeping), not a user knob: a hand-set value would
            // silently re-spec history for every file on disk
            require(!p.property().toLowerCase
                .startsWith("graft.parts."),
              s"graft-orc: ${p.property()} is reserved partition-spec " +
                "evolution state — use CALL <cat>.system." +
                "set_partition_spec to change the partition spec")
            require(!p.property().toLowerCase
                .startsWith(GraftOrcDataSource.ConstraintPropPrefix),
              s"graft-orc: ${p.property()} is constraint state — use " +
                "ALTER TABLE ... ADD CONSTRAINT (it validates existing " +
                "rows; a hand-set property would not)")
            // props-only change: schemaV STAYS — fields resolve by their
            // own metadata (added_v/renames), so a bump would only (a)
            // push every later file into a fresh version group that
            // compaction's same-version binning can never merge (a
            // per-batch property stamp — e.g. the near-dup ingest
            // high-water mark — would make the table permanently
            // uncompactable) and (b) force the evolution-aware read
            // path on tables whose schema never changed
            m.copy(props = m.props + (p.property() -> p.value()))
          case p: RemoveProperty =>
            require(!p.property().toLowerCase
                .startsWith("graft.parts."),
              s"graft-orc: ${p.property()} is reserved partition-spec " +
                "evolution state and cannot be unset")
            m.copy(props = m.props - p.property())
          case other => throw new UnsupportedOperationException(
            s"graft-orc: unsupported table change $other")
        }
      }
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) return false
    // external tables: drop the pointer, never the external data (the
    // standard EXTERNAL contract)
    fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val src = dirOf(oldIdent)
    val dst = dirOf(newIdent)
    if (!isTableDir(src)) throw new NoSuchTableException(oldIdent)
    if (fs.exists(dst)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"graft-orc: failed to rename table $src to $dst")
  }

  // ---- catalog functions (FunctionCatalog) -----------------------------
  // The native kernels as SQL-resolvable functions:
  //   SELECT gcat.<ns>.graft_cosine(a.embedding, b.embedding)
  // Names resolve in EVERY namespace of this catalog (they are
  // catalog-global, like Iceberg's system functions).

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    GraftOrcFunctions.All.keys.toArray.sorted
      .map(n => Identifier.of(namespace, n))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftOrcFunctions.All.getOrElse(
      ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))

  // ---- maintenance procedures (ProcedureCatalog) -----------------------
  // `CALL gcat.system.compact(table => 'db.t')` etc. — the SQL face of
  // the housekeeping machinery; bodies in [[GraftOrcProcedures]]. The
  // `table` argument resolves through THIS catalog (multipart name) or,
  // containing '/', as a raw path — path tables get the same surface.

  private def resolveTableArg(s: String): String = {
    if (s.contains("/")) return s
    val parts = s.split("\\.").toSeq.filter(_.nonEmpty)
    require(parts.nonEmpty, "graft-orc: empty table argument")
    val ident = Identifier.of(parts.dropRight(1).toArray, parts.last)
    val dir = resolveDir(ident)
    if (!GraftOrcManifest.exists(fs, fs.makeQualified(dir)))
      throw new NoSuchTableException(ident)
    dir.toString
  }

  private lazy val procedures = GraftOrcProcedures.all(resolveTableArg)

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    procedures.getOrElse(
      ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new RuntimeException(
        s"graft-orc: procedure ${ident.name()} not found (available: " +
          procedures.keys.toSeq.sorted.mkString(", ") + ")"))

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] = {
    // catalog-global like the functions; advertise under `system`
    val ns = if (namespace.isEmpty) Array("system") else namespace
    procedures.keys.toArray.sorted.map(n => Identifier.of(ns, n))
  }

  // ---- namespaces ------------------------------------------------------

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val dir = dirOf(namespace)
    val listing =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException =>
        throw new NoSuchNamespaceException(namespace) }
    listing.filter(st => st.isDirectory && !isTableDir(st.getPath) &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val dir = dirOf(namespace)
      try fs.getFileStatus(dir).isDirectory && !isTableDir(dir)
      catch { case _: java.io.FileNotFoundException => false }
    }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val dir = dirOf(namespace)
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(dir)
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-orc: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = dirOf(namespace)
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"graft-orc: namespace ${namespace.mkString(".")} is not empty " +
          "(use CASCADE)")
    fs.delete(dir, true)
  }
}
