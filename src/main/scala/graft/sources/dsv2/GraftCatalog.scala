package graft.sources.dsv2

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` over a directory tree of `graft-jsonl`
  * tables — the named-table face of the connector, so the full SQL
  * surface works against the warehouse:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.dsv2.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse
  *
  *   CREATE TABLE graft.corpus.docs (doc_id BIGINT, lang STRING, ...)
  *     PARTITIONED BY (lang)
  *   INSERT INTO graft.corpus.docs SELECT ...
  *   SELECT ... FROM graft.corpus.docs
  *   DELETE FROM graft.corpus.docs WHERE lang = 'en'   -- dir drop
  *   DROP TABLE graft.corpus.docs
  * }}}
  *
  * Layout: `root/<namespace dirs>/<table>/` holding hive-partitioned
  * JSONL shards plus a `_graft_table.json` metadata file (schema JSON +
  * partition columns), written atomically (temp + rename) so a reader
  * never sees a torn definition. Namespaces are directories; a
  * directory is a table iff the metadata file exists, so tables and
  * sub-namespaces can't be confused. The design mirrors the
  * reference's dataset/table hierarchy (BigQuery datasets —
  * reference: dags/utils/common/data_helper.py:48-106) re-expressed as
  * a filesystem catalog over the connector.
  *
  * Scale note: metadata operations are O(listing) on the namespace
  * dir; data operations inherit the connector's pruning/pushdown/SPJ
  * surface — the catalog adds naming, not a new execution path.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: Path = _
  private var conf: JsonlHadoopConf = _

  private def fs = root.getFileSystem(conf.value)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"catalog $name requires spark.sql.catalog.$name.root=<dir>")
    root = new Path(r)
    conf = JsonlHadoopConf.fromSession()
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(root)(new Path(_, _))
  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace), ident.name)
  private def metaFile(dir: Path): Path = new Path(dir, MetaName)

  private val MetaName = "_graft_table.json"

  // --------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(d).filter(_.isDirectory)
      .filter(st => fs.exists(metaFile(st.getPath)))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(metaFile(tableDir(ident)))

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val mf = metaFile(dir)
    if (!fs.exists(mf)) throw new NoSuchTableException(ident)
    val (schema, partCols, props) = readMeta(mf)
    new JsonlTable(schema, dir.toString, partCols, props)
  }

  /** SQL time travel — `SELECT ... FROM t VERSION AS OF <id|'tag'>`:
    * a read-only [[JsonlTable]] planned from the snapshot manifest
    * (pinned shard set + embedded position deletes + the schema as of
    * the snapshot). See [[JsonlSnapshots]]. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val mf = metaFile(dir)
    if (!fs.exists(mf)) throw new NoSuchTableException(ident)
    val (schema, partCols, props) = readMeta(mf)
    new JsonlTable(schema, dir.toString, partCols, props,
      JsonlSnapshots.load(fs, dir, version))
  }

  /** `TIMESTAMP AS OF`: the latest snapshot at or before the instant
    * (Spark hands microseconds). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    val mf = metaFile(dir)
    if (!fs.exists(mf)) throw new NoSuchTableException(ident)
    val (schema, partCols, props) = readMeta(mf)
    new JsonlTable(schema, dir.toString, partCols, props,
      JsonlSnapshots.loadAt(fs, dir, timestamp))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references()(0).fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft catalog supports identity partitioning only, got $other")
    }.toSeq
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in schema"))
    val dir = tableDir(ident)
    fs.mkdirs(dir)
    // persist only the graft.* table options (row-level mode, future
    // knobs); Spark-internal bookkeeping props (provider, owner,
    // location) are derivable and stay out of the spec
    val props = properties.asScala.toMap
      .filter { case (k, _) => k.startsWith("graft.") }
    props.get(JsonlTable.RowLevelModeProp).foreach(v =>
      require(v == "copy-on-write" || v == "merge-on-read",
        s"${JsonlTable.RowLevelModeProp} must be copy-on-write or " +
          s"merge-on-read, got '$v'"))
    props.get(JsonlTable.FormatProp).foreach(v =>
      require(JsonlTable.formatOf(props) == "jsonl" ||
        JsonlTable.formatOf(props) == "parquet",
        s"${JsonlTable.FormatProp} must be jsonl or parquet, got '$v'"))
    JsonlTable.validateParquetCompression(props)
    validateUpsertKeys(schema, props)
    writeMeta(metaFile(dir), schema, partCols, props)
    new JsonlTable(schema, dir.toString, partCols, props)
  }

  /** `graft.upsert.keys` contract ([[JsonlEqDeletes]]): key columns
    * exist with BIGINT/INT/STRING types (the canonical key rendering
    * must agree between writer rows and reader JSON). Composes with
    * auto-snapshot: manifests embed the pending key files, so every
    * wave pins a version that serves the upserted state. */
  private def validateUpsertKeys(schema: StructType,
                                 props: Map[String, String]): Unit = {
    val keys = JsonlTable.upsertKeysOf(props)
    if (keys.isEmpty) return
    keys.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(throw
        new IllegalArgumentException(
          s"${JsonlTable.UpsertKeysProp}: no column $c in the table"))
      import org.apache.spark.sql.types.{DateType, StringType,
        TimestampNTZType, TimestampType}
      require(f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == StringType || f.dataType == DateType ||
        f.dataType == TimestampType || f.dataType == TimestampNTZType,
        s"${JsonlTable.UpsertKeysProp}: $c must be " +
          "BIGINT/INT/STRING/DATE/TIMESTAMP, got " +
          f.dataType.simpleString)
    }
  }

  /** Schema evolution, limited to what the JSONL layout makes SAFE
    * without rewriting a byte of data:
    *
    *   - `ADD COLUMN` (top-level, nullable): schema-on-read — every
    *     existing shard simply yields null for the new field, new
    *     writes carry it. `FIRST`/`AFTER` positions are honored
    *     (column order is metadata; rows are keyed by name).
    *   - comment / relax-to-nullable changes: pure metadata.
    *
    * Everything else — type changes (coerce-on-write posture: the
    * stored JSON scalars are typed by the SCHEMA, so a type change
    * silently reinterprets old data), tighten-to-required (old shards
    * have nulls by construction), drops/renames of columns the layout
    * may key partitions on — is refused loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val mf = metaFile(dir)
    if (!fs.exists(mf)) throw new NoSuchTableException(ident)
    // whole RMW under the spec lock — same serialization contract as
    // updateTableProps (a props publish racing this ALTER would
    // otherwise clobber whichever committed first)
    withMetaLock(dir) {
    var (schema, partCols, props) = readMeta(mf)
    def single(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"graft catalog: nested $what is unsupported")
      fieldNames(0)
    }
    changes.foreach {
      case add: TableChange.AddColumn =>
        val name = single(add.fieldNames, "ADD COLUMN")
        if (schema.fieldNames.contains(name))
          throw new IllegalArgumentException(s"column $name already exists")
        // directory-segment namespace guard: `name=v` dirs of a RENAMED
        // partition column would resolve as the new column's values
        require(!JsonlTable.partAliasNames(schema).contains(name),
          s"graft catalog: cannot add column $name — it is the former " +
            "name of a renamed partition column whose directories still " +
            "use it; rewrite + CALL evolve_partitioning to unify first")
        if (!add.isNullable) throw new UnsupportedOperationException(
          "graft catalog: new columns must be nullable — existing shards " +
            "hold no values for them")
        var f = org.apache.spark.sql.types.StructField(
          name, add.dataType, nullable = true)
        if (add.comment != null) f = f.withComment(add.comment)
        // the new column's STORAGE key must not collide with any key
        // old or new shards already carry for some OTHER meaning: a
        // tombstoned key (re-ADD of a DROPPED name), an existing
        // field's physical key (e.g. ADD COLUMN a__2 after a
        // dropped-and-re-added `a` was bound to a__2 — two schema
        // columns would alias one JSON key and writes collide), or a
        // rename alias another field still reads through. In every
        // such case bind the new column to a FRESH physical key.
        val tombstoned = JsonlTable.tombstonedKeysOf(props)
        val occupied = tombstoned ++
          schema.fields.map(JsonlTable.physicalKeyOf) ++
          schema.fields.flatMap(JsonlTable.aliasesOf)
        if (occupied.contains(name)) {
          val fresh = Iterator.from(2).map(n => s"${name}__$n")
            .find(k => !occupied.contains(k)).get
          f = f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putString(JsonlTable.PhysicalKeyMeta, fresh).build())
        }
        schema = add.position() match {
          case null => StructType(schema.fields :+ f)
          case _: TableChange.First => StructType(f +: schema.fields)
          case a: TableChange.After =>
            val i = schema.fieldIndex(a.column())
            val (l, r) = schema.fields.splitAt(i + 1)
            StructType((l :+ f) ++ r)
          case other => throw new UnsupportedOperationException(
            s"unsupported column position $other")
        }
      case c: TableChange.UpdateColumnComment =>
        val name = single(c.fieldNames, "COMMENT change")
        schema = StructType(schema.fields.map(fl =>
          if (fl.name == name) fl.withComment(c.newComment) else fl))
      case n: TableChange.UpdateColumnNullability =>
        val name = single(n.fieldNames, "nullability change")
        if (!n.nullable) throw new UnsupportedOperationException(
          "graft catalog: cannot tighten to NOT NULL — existing shards may " +
            "hold nulls for the column")
        schema = StructType(schema.fields.map(fl =>
          if (fl.name == name) fl.copy(nullable = true) else fl))
      case t: TableChange.UpdateColumnType =>
        // WIDENING is metadata-safe in a schema-on-read JSON layout:
        // the stored scalars are typed by the SCHEMA at parse time, so
        // INT-era values read correctly through BIGINT (same JSON
        // number). Anything else — narrowing, cross-family,
        // scale-changing — silently reinterprets old data and stays
        // refused (coerce-on-write posture).
        val name = single(t.fieldNames, "type change")
        val fl = schema.fields.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"no column $name to re-type"))
        def widens(a: DataType, b: DataType): Boolean = (a, b) match {
          case (ByteType, ShortType | IntegerType | LongType) => true
          case (ShortType, IntegerType | LongType) => true
          case (IntegerType, LongType) => true
          case (FloatType, DoubleType) => true
          case (da: DecimalType, db: DecimalType) =>
            db.scale == da.scale && db.precision > da.precision
          case _ => false
        }
        if (!widens(fl.dataType, t.newDataType()))
          throw new UnsupportedOperationException(
            s"graft catalog: only WIDENING type changes are supported " +
              s"(TINYINT→SMALLINT→INT→BIGINT, FLOAT→DOUBLE, " +
              s"DECIMAL(p,s)→DECIMAL(p+k,s)) — ${fl.dataType.simpleString} " +
              s"→ ${t.newDataType().simpleString} on $name would " +
              "reinterpret stored values")
        schema = StructType(schema.fields.map(f0 =>
          if (f0.name == name) f0.copy(dataType = t.newDataType()) else f0))
        // bloom sketches hash by TYPE (xxhash64 of an int != of the
        // same value as long): drop this column's blooms; its min/max
        // entries re-decode through the widened type on the next read
        JsonlSkipIndex.dropBlooms(fs, dir, JsonlTable.physicalKeyOf(fl))
      case r: TableChange.RenameColumn =>
        // metadata-only rename: no data rewrite — the field records its
        // former JSON keys (newest first) and readers fall back through
        // them for pre-rename shards ([[JsonlTable.AliasesKey]]). A
        // field with a PHYSICAL key keeps it (its data key never
        // changes, so no alias is needed); an unkeyed field renamed
        // ONTO a tombstoned name additionally binds a fresh physical
        // key so new writes never revive the dead key.
        val name = single(r.fieldNames, "RENAME COLUMN")
        val newName = r.newName
        require(schema.fieldNames.contains(name),
          s"no column $name to rename")
        require(!schema.fieldNames.contains(newName),
          s"column $newName already exists")
        // the directory-segment namespace must stay unambiguous: a new
        // display name equal to ANOTHER column's pre-rename partition
        // alias would make `newName=v` dirs unresolvable (they hold the
        // other column's values). Re-taking one of this field's OWN
        // former names is fine — the old dirs hold its own values.
        locally {
          val foreign = schema.fields.filterNot(_.name == name)
            .flatMap(JsonlTable.partAliasesOf).toSet
          require(!foreign.contains(newName),
            s"graft catalog: cannot rename to $newName — it is the former " +
              "name of a renamed partition column whose directories still " +
              "use it; rewrite + CALL evolve_partitioning to unify first")
        }
        // a graft.upsert.keys column may be renamed — the property is
        // rewritten below so future waves keep working — but NOT while
        // published key files still name the old column: readers
        // resolve key-file cols against the live schema
        // (fieldIndex), so a pending wave would throw on every scan
        // and its deletes could silently stop applying
        if (JsonlTable.upsertKeysOf(props).contains(name))
          require(!JsonlEqDeletes.hasPending(fs, dir),
            s"graft catalog: cannot rename upsert key column $name while " +
              s"pending equality deletes exist (${JsonlEqDeletes.DirName}/)" +
              " — CALL compact to reconcile them first")
        val tombstonedNow = JsonlTable.tombstonedKeysOf(props)
        // storage keys the new display name must not silently alias:
        // tombstoned keys, plus OTHER fields' physical keys and rename
        // aliases (the renamed field's OWN former keys are fine — they
        // hold its own values). An unkeyed field renamed onto one of
        // these binds a fresh physical key so its reads/writes never
        // touch the foreign key.
        val occupiedNow = tombstonedNow ++
          schema.fields.filterNot(_.name == name).flatMap(o =>
            JsonlTable.physicalKeyOf(o) +: JsonlTable.aliasesOf(o))
        schema = StructType(schema.fields.map { fl =>
          if (fl.name != name) fl
          else if (fl.metadata.contains(JsonlTable.PhysicalKeyMeta))
            fl.copy(name = newName) // data key pinned by graft.key
          else {
            val prior = JsonlTable.aliasesOf(fl)
            val b = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(fl.metadata)
              .putStringArray(JsonlTable.AliasesKey,
                (name +: prior).distinct.toArray)
            if (occupiedNow.contains(newName)) {
              val taken = occupiedNow ++
                schema.fields.map(JsonlTable.physicalKeyOf)
              val fresh = Iterator.from(2).map(n => s"${newName}__$n")
                .find(k => !taken.contains(k)).get
              b.putString(JsonlTable.PhysicalKeyMeta, fresh)
            }
            fl.copy(name = newName, metadata = b.build())
          }
        })
        // PARTITION column rename is metadata-only too: the k=v dirs
        // written so far keep the old segment name, and every segment
        // parse canonicalizes through [[JsonlTable.PartAliasesKey]]
        // (pruning, value injection, SPJ, partition-predicate deletes,
        // dynamic overwrite's alias-variant sweep all fold it). New
        // writes land under the new name; a full rewrite + CALL
        // evolve_partitioning retires the alias.
        // a LEGACY-generation partition column (evolved out of the
        // current spec, old dirs still keyed by it) needs the same
        // alias — its values live only in those dir names
        val dirKeyed = partCols.contains(name) ||
          JsonlTable.legacySpecsOf(props)
            .exists(_.split(",").contains(name))
        if (dirKeyed) {
          schema = StructType(schema.fields.map { fl =>
            if (fl.name != newName) fl
            else {
              val prior = JsonlTable.partAliasesOf(fl)
              val upd = (name +: prior).distinct.filterNot(_ == newName)
              val b = new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(fl.metadata)
              if (upd.isEmpty) b.remove(JsonlTable.PartAliasesKey)
              else b.putStringArray(JsonlTable.PartAliasesKey, upd.toArray)
              fl.copy(metadata = b.build())
            }
          })
          partCols = partCols.map(c => if (c == name) newName else c)
          // legacy partition specs name columns too — follow the rename
          // so multi-generation bookkeeping keeps matching the layout
          props = props.map {
            case (k, v) if k == JsonlTable.LegacySpecsProp =>
              k -> v.split(";").map(_.split(",").map(c =>
                if (c == name) newName else c).mkString(",")).mkString(";")
            case kv => kv
          }
        }
        // column-list properties keyed on the old name keep working
        // under the new one (dotted skip entries rooted at the renamed
        // field follow it too); graft.upsert.keys follows the rename in
        // the same metadata write, so there is no window where writers'
        // upsertIdx filter silently drops the key (which would degrade
        // waves to plain appends)
        props = props.map {
          case (k, v) if k == JsonlTable.UpsertKeysProp =>
            k -> v.split(",").map(_.trim)
              .map(c => if (c == name) newName else c).mkString(",")
          case (k, v) if k == JsonlSkipIndex.ColumnsProperty ||
              k == JsonlTable.WriteOrderProp =>
            k -> v.split(",").map(_.trim).map { c =>
              if (c == name) newName
              else if (c.startsWith(name + "."))
                newName + c.substring(name.length)
              else c
            }.mkString(",")
          case kv => kv
        }
      case d: TableChange.DeleteColumn =>
        // DROP COLUMN: metadata-only — the field leaves the schema and
        // its JSON key (plus every rename alias, which old shards may
        // still carry) is TOMBSTONED in the table properties, so a
        // later ADD COLUMN of the same name binds to a fresh key and
        // can never resurrect the dropped values.
        val name = single(d.fieldNames, "DROP COLUMN")
        val fl = schema.fields.find(_.name == name).getOrElse {
          if (d.ifExists()) null
          else throw new IllegalArgumentException(s"no column $name to drop")
        }
        if (fl != null) {
          require(!partCols.contains(name),
            s"graft catalog: cannot drop partition column $name — the " +
              "k=v directory layout pins it; rewrite the table instead")
          // a field whose (former) names still key live dirs can't go
          // either: dropping it discards the alias map, and a later
          // ADD COLUMN under one of those names would resurrect the
          // dir-path values as the new column's
          require(JsonlTable.partAliasesOf(fl).isEmpty &&
            !JsonlTable.legacySpecsOf(props)
              .exists(_.split(",").contains(name)),
            s"graft catalog: cannot drop column $name — old partition " +
              "directories are still keyed by it (or a former name of " +
              "it); rewrite + CALL evolve_partitioning to unify first")
          // mirroring the partition guard: dropping an upsert key
          // column would leave graft.upsert.keys naming a vanished
          // field — writers would silently publish empty key sets
          // (waves degrade to appends) and any published key file
          // would crash every scan on fieldIndex
          require(!JsonlTable.upsertKeysOf(props).contains(name),
            s"graft catalog: cannot drop upsert key column $name — " +
              s"unset ${JsonlTable.UpsertKeysProp} first (after " +
              "CALL compact if waves are pending)")
          require(schema.fields.length > 1,
            s"graft catalog: cannot drop the only column $name")
          schema = StructType(schema.fields.filterNot(_.name == name))
          val dead = (JsonlTable.physicalKeyOf(fl) +: JsonlTable.aliasesOf(fl))
            .distinct
          val all = (JsonlTable.tombstonedKeysOf(props) ++ dead).toSeq.sorted
          props = props + (JsonlTable.TombstonedKeysProp -> all.mkString(","))
          // column-list properties drop the dead name (and any dotted
          // skip entries rooted at it)
          props = props.map {
            case (k, v) if k == JsonlSkipIndex.ColumnsProperty ||
                k == JsonlTable.WriteOrderProp =>
              k -> v.split(",").map(_.trim)
                .filter(c => c.nonEmpty && c != name &&
                  !c.startsWith(name + ".")).mkString(",")
            case kv => kv
          }.filter { case (k, v) =>
            v.nonEmpty || (k != JsonlSkipIndex.ColumnsProperty &&
              k != JsonlTable.WriteOrderProp)
          }
        }
      case sp: TableChange.SetProperty =>
        require(sp.property.startsWith("graft."),
          s"graft catalog: only graft.* table properties are stored, " +
            s"got ${sp.property}")
        if (sp.property == JsonlTable.RowLevelModeProp)
          require(sp.value == "copy-on-write" || sp.value == "merge-on-read",
            s"${JsonlTable.RowLevelModeProp} must be copy-on-write or " +
              s"merge-on-read, got '${sp.value}'")
        // format CHANGE is allowed (readers dispatch per file; a full
        // rewrite finishes the conversion) — only the value is checked
        if (sp.property == JsonlTable.FormatProp) {
          val v = sp.value.trim.toLowerCase(java.util.Locale.ROOT)
          require(v == "jsonl" || v == "parquet",
            s"${JsonlTable.FormatProp} must be jsonl or parquet, " +
              s"got '${sp.value}'")
        }
        if (sp.property == JsonlTable.WriteOrderProp)
          sp.value.split(",").map(_.trim).filter(_.nonEmpty).foreach(c =>
            require(schema.fieldNames.contains(c),
              s"${JsonlTable.WriteOrderProp}: no column $c in the table"))
        val wasAuto = JsonlTable.autoSnapshotOf(props)
        if (sp.property == JsonlTable.ParquetCompressionProp ||
            sp.property == JsonlTable.ParquetCompressionLevelProp)
          JsonlTable.validateParquetCompression(
            props + (sp.property -> sp.value))
        props = props + (sp.property -> sp.value)
        if (sp.property == JsonlTable.UpsertKeysProp ||
            sp.property == JsonlTable.AutoSnapshotProp)
          validateUpsertKeys(schema, props)
        // enabling auto-snapshot starts a DELTA-PIN chain: every later
        // commit rebases the previous manifest over its own changes.
        // Commits made while auto was OFF are in no manifest — pin a
        // full-listing BASE now so the chain starts complete (else a
        // rollback to a post-enable version would discard those live
        // shards as "not pinned")
        if (sp.property == JsonlTable.AutoSnapshotProp && !wasAuto &&
            JsonlTable.autoSnapshotOf(props)) {
          writeMeta(mf, schema, partCols, props) // pin sees the new props
          JsonlSnapshots.create(fs, dir, None, schema)
        }
      case rp: TableChange.RemoveProperty =>
        props = props - rp.property
      case other =>
        throw new UnsupportedOperationException(
          s"graft catalog: unsupported table change $other")
    }
    writeMeta(mf, schema, partCols, props)
    new JsonlTable(schema, dir.toString, partCols, props)
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!fs.exists(metaFile(dir))) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val destNs = nsDir(newIdent.namespace)
    if (!fs.exists(destNs)) throw new NoSuchNamespaceException(newIdent.namespace)
    if (!fs.rename(tableDir(oldIdent), tableDir(newIdent)))
      throw new java.io.IOException(s"rename $oldIdent -> $newIdent failed")
  }

  // ---------------------------------------------------------- views
  //
  // SQL views (`CREATE VIEW wh.ns.v AS SELECT ...`): a view is ONE
  // JSON file `<ns>/<name>.graftview.json` holding the query text +
  // the resolution context Spark captured (current catalog/namespace,
  // schema, column names/aliases/comments, properties). Files don't
  // collide with tables (dirs) or sub-namespaces (dirs), and
  // discovery never looks at files, so views are invisible to every
  // other listing. Published atomically like table specs.

  private def viewFile(ident: Identifier): Path =
    new Path(nsDir(ident.namespace), s"${ident.name}.graftview.json")

  import org.apache.spark.sql.connector.catalog.{View, ViewChange, ViewInfo}
  import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}

  private final case class GraftView(viewName: String, sql: String,
      cat: String, ns: Array[String], viewSchema: StructType,
      queryCols: Array[String], aliases: Array[String],
      comments: Array[String], props: java.util.Map[String, String])
      extends View {
    override def name(): String = viewName
    override def query(): String = sql
    override def currentCatalog(): String = cat
    override def currentNamespace(): Array[String] = ns
    override def schema(): StructType = viewSchema
    override def queryColumnNames(): Array[String] = queryCols
    override def columnAliases(): Array[String] = aliases
    override def columnComments(): Array[String] = comments
    override def properties(): java.util.Map[String, String] = props
  }

  private def writeView(ident: Identifier, v: GraftView): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("sql", v.sql)
    node.put("currentCatalog", v.cat)
    val nsArr = node.putArray("currentNamespace"); v.ns.foreach(nsArr.add)
    node.put("schema", v.viewSchema.json)
    val qc = node.putArray("queryColumnNames"); v.queryCols.foreach(qc.add)
    val al = node.putArray("columnAliases"); v.aliases.foreach(al.add)
    val cm = node.putArray("columnComments")
    v.comments.foreach(c => if (c == null) cm.addNull() else cm.add(c))
    val pr = node.putObject("properties")
    v.props.forEach((k, pv) => pr.put(k, pv))
    val mf = viewFile(ident)
    val tmp = new Path(mf.getParent, s".${mf.getName}.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    out.close()
    publishOverwrite(tmp, mf)
  }

  private def readView(ident: Identifier): GraftView = {
    val mf = viewFile(ident)
    if (!fs.exists(mf)) throw new NoSuchViewException(ident)
    val in = fs.open(mf)
    val bytes = try in.readAllBytes() finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, StandardCharsets.UTF_8))
    def arr(field: String): Array[String] = {
      val a = node.get(field)
      (0 until a.size).map(i =>
        if (a.get(i).isNull) null else a.get(i).asText).toArray
    }
    val props = new java.util.HashMap[String, String]()
    node.get("properties").properties().forEach(e =>
      props.put(e.getKey, e.getValue.asText))
    GraftView(ident.name, node.get("sql").asText,
      node.get("currentCatalog").asText, arr("currentNamespace"),
      DataType.fromJson(node.get("schema").asText).asInstanceOf[StructType],
      arr("queryColumnNames"), arr("columnAliases"), arr("columnComments"),
      props)
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    val d = nsDir(ns)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(d)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".graftview.json"))
      .map(st => Identifier.of(ns,
        st.getPath.getName.stripSuffix(".graftview.json")))
  }

  override def viewExists(ident: Identifier): Boolean =
    fs.exists(viewFile(ident))

  override def loadView(ident: Identifier): View = readView(ident)

  override def createView(info: ViewInfo): View = {
    val ident = info.ident
    if (viewExists(ident)) throw new ViewAlreadyExistsException(ident)
    if (!fs.exists(nsDir(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    val v = GraftView(ident.name, info.sql, info.currentCatalog,
      info.currentNamespace, info.schema, info.queryColumnNames,
      info.columnAliases, info.columnComments, info.properties)
    writeView(ident, v)
    v
  }

  /** Atomic replace — one staged-file + rename publish, never
    * drop-then-create (the interface default), so a crash mid-replace
    * can never lose the view: readers see either the old or the new
    * definition. */
  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident
    if (!orCreate && !viewExists(ident)) throw new NoSuchViewException(ident)
    if (!fs.exists(nsDir(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    val v = GraftView(ident.name, info.sql, info.currentCatalog,
      info.currentNamespace, info.schema, info.queryColumnNames,
      info.columnAliases, info.columnComments, info.properties)
    writeView(ident, v)
    v
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val v = readView(ident)
    val props = new java.util.HashMap[String, String](v.props)
    changes.foreach {
      case s: ViewChange.SetProperty => props.put(s.property, s.value)
      case r: ViewChange.RemoveProperty => props.remove(r.property)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported view change $other")
    }
    val nv = v.copy(props = props)
    writeView(ident, nv)
    nv
  }

  override def dropView(ident: Identifier): Boolean = {
    val mf = viewFile(ident)
    fs.exists(mf) && fs.delete(mf, false)
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent)) throw new NoSuchViewException(oldIdent)
    if (viewExists(newIdent)) throw new ViewAlreadyExistsException(newIdent)
    if (!fs.exists(nsDir(newIdent.namespace)))
      throw new NoSuchNamespaceException(newIdent.namespace)
    if (!fs.rename(viewFile(oldIdent), viewFile(newIdent)))
      throw new java.io.IOException(s"view rename $oldIdent -> $newIdent failed")
  }

  // ----------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .filterNot(st => fs.exists(metaFile(st.getPath)))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = nsDir(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(d).filter(_.isDirectory)
      .filterNot(st => fs.exists(metaFile(st.getPath)))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsDir(namespace)) && !fs.exists(metaFile(nsDir(namespace))))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsDir(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    fs.mkdirs(nsDir(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!fs.exists(d)) false
    else if (!cascade && fs.listStatus(d).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} not empty")
    else fs.delete(d, true)
  }

  // ------------------------------------------------------- functions

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftSqlFunctions.names.map(Identifier.of(Array("system"), _)).toArray
    else if (namespace.isEmpty || fs.exists(nsDir(namespace))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace.sameElements(Array("system")) &&
      GraftSqlFunctions.names.contains(ident.name))
      GraftSqlFunctions.load(ident.name)
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  // ------------------------------------------------------ procedures

  private val procedureNames =
    Seq("table_stats", "compact", "expire_staging", "build_skip_index",
      "cluster_table", "snapshot", "snapshots", "expire_snapshots",
      "table_changes", "rollback_to_snapshot", "evolve_partitioning",
      "maintenance_stats", "analyze_table", "convert_table")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      procedureNames.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")) &&
      procedureNames.contains(ident.name),
      s"unknown procedure $ident (have: system.{${procedureNames.mkString(",")}})")
    GraftProcedures.unbound(ident.name, this)
  }

  /** `namespace.table` (relative to this catalog) → (fs, table dir);
    * procedures resolve their `table` argument through this. */
  private[dsv2] def resolveTableDir(qualified: String)
      : (org.apache.hadoop.fs.FileSystem, Path) = {
    val parts = qualified.split("\\.")
    require(parts.length >= 2, s"expected namespace.table, got $qualified")
    val ident = Identifier.of(parts.init, parts.last)
    require(tableExists(ident), s"no such table $qualified in catalog $name")
    (fs, tableDir(ident))
  }

  /** Iceberg-style partition-spec EVOLUTION: future writes land under
    * `newCols`; existing dirs stay readable and prunable (readers
    * resolve partition values per SHARD — path segments first, JSON
    * body fallback — so a mixed layout answers correctly). The other
    * specs still PRESENT in the live layout are recorded in
    * [[JsonlTable.LegacySpecsProp]]; deriving them from the layout
    * (not from history) means a full rewrite followed by a re-CALL
    * yields an empty legacy set and restores single-generation
    * behaviors (keyed partitioning report, dynamic overwrite).
    * Returns the legacy specs recorded. Caller holds the table
    * `_rlo_lock`. */
  private[dsv2] def evolvePartitioning(qualified: String,
                                       newCols: Seq[String]): Seq[String] = {
    val (tfs, dir) = resolveTableDir(qualified)
    val mf = metaFile(dir)
    val (schema0, _, props0) = readMeta(mf)
    newCols.foreach(c => require(schema0.fieldNames.contains(c),
      s"evolve_partitioning: no top-level column $c in the table"))
    // the specs ACTUALLY present, from each live shard's dir segments
    // (order-significant, canonicalized through partition-rename
    // aliases — a pre-rename dir is the SAME spec under its old name);
    // root shards contribute the empty spec. Snapshot-pinned rels
    // count as present too: `rollback_to_snapshot` can restore any
    // manifest-referenced dir into the live tree, so a spec (or an
    // alias) it uses must survive this derivation until
    // `expire_snapshots` releases the manifests — otherwise a rollback
    // would resurrect dirs the metadata can no longer resolve
    // (alias gone: the column reads null; legacy spec gone: dynamic
    // overwrite stops refusing on a layout that is multi-generation
    // again).
    val segAliases = JsonlTable.segmentAliasesOf(schema0)
    val qUri = tfs.makeQualified(dir).toUri
    val rawSegNames = scala.collection.mutable.HashSet.empty[String]
    def specOf(rel: String): String =
      rel.split("/").init.filter(_.contains("="))
        .map { seg =>
          val k = seg.split("=", 2)(0)
          rawSegNames += k
          segAliases.getOrElse(k, k)
        }.mkString(",")
    val present =
      JsonlLayout.discoverFull(tfs, dir).map { case (p, _, _, _) =>
        specOf(qUri.relativize(tfs.makeQualified(p).toUri).getPath)
      }.toSet ++
        JsonlSnapshots.referencedRels(tfs, dir).map(specOf)
    // partition-rename aliases no live dir still uses are dead
    // metadata: prune them so the old display names leave the
    // ADD/RENAME reserved namespace (this is the documented
    // full-rewrite + re-CALL unification path)
    val schema = StructType(schema0.fields.map { f =>
      val live = JsonlTable.partAliasesOf(f).filter(rawSegNames.contains)
      if (live == JsonlTable.partAliasesOf(f)) f
      else {
        val b = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        if (live.isEmpty) b.remove(JsonlTable.PartAliasesKey)
        else b.putStringArray(JsonlTable.PartAliasesKey, live.toArray)
        f.copy(metadata = b.build())
      }
    })
    val legacy = (present - newCols.mkString(",")).toSeq.sorted
    val props =
      if (legacy.isEmpty) props0 - JsonlTable.LegacySpecsProp
      else props0 + (JsonlTable.LegacySpecsProp -> legacy.mkString(";"))
    writeMeta(mf, schema, newCols, props)
    legacy
  }

  // ------------------------------------------------------- metadata

  private def writeMeta(mf: Path, schema: StructType, partCols: Seq[String],
                        props: Map[String, String] = Map.empty): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("schema", schema.json)
    val arr = node.putArray("partitionCols")
    partCols.foreach(arr.add)
    if (props.nonEmpty) {
      val pn = node.putObject("tableProperties")
      props.toSeq.sortBy(_._1).foreach { case (k, v) => pn.put(k, v) }
    }
    val tmp = new Path(mf.getParent, s".${mf.getName}.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    out.close()
    publishOverwrite(tmp, mf)
  }

  /** Atomically replace `mf` with `tmp`. FileContext's OVERWRITE
    * rename closes the crash window a delete-then-rename would leave
    * (a table with NO spec file — invisible to the catalog); file
    * systems without FileContext support (e.g. object stores) fall
    * back to that window, with the tmp file as the recovery copy. */
  private def publishOverwrite(tmp: Path, mf: Path): Unit = {
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, conf.value)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(mf),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(mf)) fs.delete(mf, false)
        if (!fs.rename(tmp, mf))
          // the live spec is already gone — the tmp file is now the
          // ONLY copy of the metadata, so it must survive the failure;
          // name it in the error so an operator can restore by hand
          throw new java.io.IOException(
            s"metadata publish failed for $mf; recover from $tmp")
    }
  }

  /** Procedure-facing spec access (`analyze_table`, `convert_table`):
    * read the current (schema, partCols, props) and atomically publish
    * a props update. */
  private[dsv2] def readTableMeta(qualified: String)
      : (StructType, Seq[String], Map[String, String]) =
    readMeta(metaFile(resolveTableDir(qualified)._2))

  private[dsv2] def updateTableProps(qualified: String)(
      f: Map[String, String] => Map[String, String]): Unit = {
    val dir = resolveTableDir(qualified)._2
    val mf = metaFile(dir)
    // the read-modify-write runs under the spec lock: a concurrent
    // ALTER / convert_table committed between the read and the publish
    // would otherwise be silently overwritten with its pre-image
    // (e.g. a format flip lost while converted shards are already
    // parquet). The prior long work (analyze_table's distributed scan)
    // happens OUTSIDE — only the millisecond-scale RMW holds the lock.
    withMetaLock(dir) {
      val (schema, partCols, props) = readMeta(mf)
      writeMeta(mf, schema, partCols, f(props))
    }
  }

  /** Spec-file RMW exclusion (see [[RowLevelLock.acquireMeta]]): every
    * read→modify→write of the table meta file takes it, so ALTERs and
    * procedure props publishes serialize instead of last-write-wins. */
  private def withMetaLock[T](dir: Path)(body: => T): T = {
    val lease = RowLevelLock.acquireMeta(fs, conf.value, dir,
      java.util.UUID.randomUUID().toString)
    try body finally RowLevelLock.release(fs, lease)
  }

  private def readMeta(mf: Path): (StructType, Seq[String], Map[String, String]) = {
    val in = fs.open(mf)
    val bytes = try in.readAllBytes() finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, StandardCharsets.UTF_8))
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      node.get("schema").asText).asInstanceOf[StructType]
    val partCols = node.get("partitionCols").elements().asScala
      .map(_.asText).toSeq
    // pre-r9 specs have no tableProperties node: empty map (back-compat)
    val props = Option(node.get("tableProperties")).map { pn =>
      pn.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    (schema, partCols, props)
  }
}
