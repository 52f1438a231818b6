package graft.sources

import graft.operators.VersionedTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** `spark.read.format("graftvt")` — the idiomatic Spark read surface
  * over [[VersionedTable]] (round-12 verdict item 6: time travel and
  * snapshot reads were library calls only; SQL users and BI tools speak
  * named formats). Options:
  *
  *  - `path` (required): the table root
  *  - `versionAsOf`: resolve a specific retained version
  *    ([[VersionedTable.snapshotAt]]); loud error when vacuumed
  *  - `timestampAsOf`: epoch millis, or `yyyy-mm-dd hh:mm:ss[.f…]` —
  *    newest snapshot committed at or before it
  *    ([[VersionedTable.snapshotAsOf]])
  *  - `extra`: read a named side table of the snapshot instead of the
  *    partitioned rows ([[VersionedTable.readExtra]] — e.g. the BM25
  *    corpus stats); requires an explicit reader schema
  *
  * Also reachable from SQL: `CREATE TEMPORARY VIEW v USING graftvt
  * OPTIONS (path '…', versionAsOf '2')`.
  *
  * Implemented as a V1 relation, deliberately: the snapshot resolve,
  * literal-path partition selection and zone-map pruning ALL live in
  * [[VersionedTable]], and a V1 `buildScan` can hand Spark the engine's
  * own resolved DataFrame as an `RDD[Row]` — one definition of the read
  * path for library callers and format callers. A native DSv2 `Batch`
  * would have to re-own file listing and parquet reading (or tunnel
  * through the same V1 relation via `V1Scan`) for no added capability
  * at this surface. The Row hand-off exits whole-stage codegen at the
  * relation boundary, so the HOT serving paths (index probes) keep
  * their direct library reads; this surface is for ad-hoc SQL access,
  * time travel, and interop — answer-invariance over the q138 artifact
  * is driver-checked (q148) and the snapshot laws are spec-pinned
  * (`GraftVtSourceSpec`).
  *
  * Pushdown: filters on the PARTITION column become literal dir
  * selection (EqualTo/In/EqualNullSafe), numeric and string range
  * filters become zone-map dir pruning ([[VersionedTable.readFor]],
  * string stats recorded when short pure-ASCII) — and every filter
  * is also re-applied by Spark at row level (`unhandledFilters` keeps
  * the default all-unhandled contract, so pruning can only ever skip
  * whole dirs the manifest PROVES empty for the predicate).
  */
final class GraftVt extends RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graftvt"

  // ------------------------------------------------ streaming (CDC)
  /** Resolve the change-feed options shared by [[sourceSchema]] and
    * [[createSource]]. The streaming surface is the CHANGE FEED only
    * (`readChangeFeed=true` required) — snapshots are the batch
    * surface. Row schema comes from the user's `.schema(…)` or the
    * current manifest's field record. */
  private def cdcParams(ctx: SQLContext,
      schema: Option[StructType], parameters: Map[String, String])
      : (String, StructType, String, Long) = {
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = opts.getOrElse("path", throw new IllegalArgumentException(
      "graftvt requires a path (the versioned table root)"))
    require(opts.get("readchangefeed").exists(_.equalsIgnoreCase("true")),
      "graftvt streaming serves the CHANGE FEED only — pass " +
        ".option(\"readChangeFeed\",\"true\") (snapshots are the batch " +
        "surface: spark.read.format(\"graftvt\"))")
    val keyCol = opts.getOrElse("keycol",
      throw new IllegalArgumentException("graftvt change feed requires " +
        "a keyCol option naming the row-identity column"))
    val startingVersion = opts.get("startingversion")
      .map(v => scala.util.Try(v.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion must be a version number, got '$v'")))
      .getOrElse(1L)
    val rowSchema = schema.getOrElse {
      val snap = VersionedTable.currentSnapshot(ctx.sparkSession, root)
        .getOrElse(throw new IllegalStateException(
          s"no committed snapshot at $root — an unborn table has no " +
            "schema record; pass an explicit .schema(…) to start the " +
            "stream before the first publish"))
      if (snap.schemaFields.isEmpty) throw new IllegalArgumentException(
        s"manifest v${snap.version} at $root predates the schema " +
          "record — pass an explicit .schema(…)")
      StructType(snap.schemaFields.toSeq.sortBy(_._1).map {
        case (n, t) => StructField(n, DataType.fromDDL(t))
      })
    }
    require(rowSchema.fieldNames.contains(keyCol),
      s"keyCol '$keyCol' is not a column of the feed schema: " +
        rowSchema.fieldNames.mkString(", "))
    (root, rowSchema, keyCol, startingVersion)
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val (_, rowSchema, _, _) = cdcParams(ctx, schema, parameters)
    (shortName(), GraftVtCdcSource.feedSchema(rowSchema))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val (root, rowSchema, keyCol, startingVersion) =
      cdcParams(ctx, schema, parameters)
    new GraftVtCdcSource(ctx, root, rowSchema, keyCol, startingVersion)
  }

  /** `df.write.format("graftvt").option("partCol", …)` — an atomic
    * versioned PUBLISH, never a file write: `Overwrite` commits a full
    * rewrite as the next version (history retained — this is a commit,
    * not a truncate), `ErrorIfExists` only bootstraps an unborn table.
    * `Append` and `Ignore` are REJECTED by design: this format's
    * incremental write is a copy-on-write DELTA with an explicit
    * replaced-partition contract ([[VersionedTable.publishDelta]] /
    * `retryingPublish`) — a blind row append would silently duplicate
    * keys, and hiding the replaced-set contract behind `Append` would
    * invite exactly that. Zone maps and the schema record are stamped
    * by the publish path like any library commit. */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = opts.getOrElse("path", throw new IllegalArgumentException(
      "graftvt requires a path (the versioned table root)"))
    val partCol = opts.getOrElse("partcol",
      throw new IllegalArgumentException("graftvt writes require a " +
        "partCol option naming the partition column"))
    require(data.schema.fieldNames.contains(partCol),
      s"partCol '$partCol' is not a column of the frame: " +
        data.schema.fieldNames.mkString(", "))
    val spark = ctx.sparkSession
    mode match {
      case SaveMode.Overwrite =>
        VersionedTable.publishFull(spark, root, partCol, data)
      case SaveMode.ErrorIfExists =>
        VersionedTable.currentSnapshot(spark, root).foreach(s =>
          throw new IllegalStateException(s"table at $root already " +
            s"exists (v${s.version}) — mode Overwrite commits the next " +
            "version"))
        VersionedTable.publishFull(spark, root, partCol, data)
      case other =>
        throw new IllegalArgumentException(s"graftvt does not support " +
          s"SaveMode.$other: incremental writes are copy-on-write deltas " +
          "with an explicit replaced-partition contract — use " +
          "VersionedTable.publishDelta/retryingPublish")
    }
    createRelation(ctx, Map("path" -> root))
  }

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    createRelation(ctx, parameters, null)

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation = {
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = opts.getOrElse("path", throw new IllegalArgumentException(
      "graftvt requires a path (the versioned table root): " +
        ".load(root) or OPTIONS (path '…')"))
    val spark = ctx.sparkSession
    val vAsOf = opts.get("versionasof")
    val tsAsOf = opts.get("timestampasof")
    require(vAsOf.isEmpty || tsAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val snap = (vAsOf, tsAsOf) match {
      case (Some(v), _) =>
        val version = scala.util.Try(v.trim.toLong).getOrElse(
          throw new IllegalArgumentException(s"versionAsOf must be a " +
            s"version number, got '$v'"))
        VersionedTable.snapshotAt(spark, root, version).getOrElse(
          throw new IllegalStateException(s"version $version at $root is " +
            "not retained (vacuumed or never committed) — see history()"))
      case (_, Some(ts)) =>
        val millis = scala.util.Try(ts.trim.toLong).getOrElse(
          scala.util.Try(java.sql.Timestamp.valueOf(ts.trim).getTime)
            .getOrElse(throw new IllegalArgumentException(
              s"timestampAsOf must be epoch millis or " +
                s"'yyyy-mm-dd hh:mm:ss', got '$ts'")))
        VersionedTable.snapshotAsOf(spark, root, millis).getOrElse(
          throw new IllegalStateException(s"no snapshot at $root was " +
            s"committed at or before $ts — the asked-for state is " +
            "vacuumed or never existed"))
      case _ =>
        VersionedTable.currentSnapshot(spark, root).getOrElse(
          throw new IllegalStateException(s"no committed snapshot at $root"))
    }
    opts.get("extra") match {
      case Some(name) =>
        require(schema != null, s"reading extra '$name' requires an " +
          "explicit schema (.schema(…)) — extras are unpartitioned side " +
          "tables with no manifest field record")
        new GraftVtExtraRelation(ctx, root, snap, name, schema)
      case None =>
        val sch =
          if (schema != null) schema
          else if (snap.schemaFields.nonEmpty)
            // name-sorted (the manifest map's one deterministic order);
            // SQL access is by name, and fingerprints are
            // order-insensitive by design
            StructType(snap.schemaFields.toSeq.sortBy(_._1).map {
              case (n, t) => StructField(n, DataType.fromDDL(t))
            })
          else throw new IllegalArgumentException(
            s"manifest v${snap.version} at $root predates the schema " +
              "record — pass an explicit .schema(…) to read it")
        new GraftVtRelation(ctx, root, snap, sch)
    }
  }
}

/** One resolved snapshot served as a V1 relation — every scan of this
  * relation reads the SAME snapshot (resolve-at-create), so a query
  * that references the view twice cannot mix versions published
  * mid-query (the library read path's same isolation rule). */
final class GraftVtRelation(ctx: SQLContext, root: String,
    snap: VersionedTable.Snapshot, override val schema: StructType)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx

  /** Resolved snapshot version (spec observability). */
  private[graft] def version: Long = snap.version

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = ctx.sparkSession
    // partition-value selection: EqualTo/In/EqualNullSafe on the
    // partition column → literal dirs. Multiple such filters AND
    // together (intersection); a non-matchable combination reads empty.
    val partSets = filters.collect {
      case EqualTo(c, v) if c == snap.partCol => Seq(v)
      case EqualNullSafe(c, v) if c == snap.partCol => Seq(v)
      case In(c, vs) if c == snap.partCol => vs.toSeq
    }
    val wanted: Option[Seq[Any]] =
      if (partSets.isEmpty) None
      else Some(partSets.map(_.toSet).reduce(_ intersect _).toSeq)
    // numeric AND string range predicates → zone-map bounds (strict
    // inequalities relax to inclusive bounds — sound for dir skipping,
    // the row-level re-apply keeps them strict). String bounds ride to
    // pruneParts, whose comparisons against the all-ASCII recorded
    // stats are Spark-order-faithful; `lang = 'de'` on a lang-
    // clustered corpus skips whole dirs from the manifest alone.
    def boundable(v: Any): Option[Any] = v match {
      case n: java.lang.Number => Some(n)
      case s: String => Some(s)
      case _ => None
    }
    // Which of two same-column bounds is tighter. Mixed-type pairs
    // (filter values of one column always share a type in practice)
    // return 0 — EITHER choice is sound: pruneParts keeps every dir
    // that can hold a row satisfying ALL pushed predicates, and any
    // one predicate's bound is an upper bound on that requirement.
    def cmp(x: Any, y: Any): Int = (x, y) match {
      case (a: String, b: String) => a.compareTo(b)
      case (a: java.lang.Number, b: java.lang.Number) =>
        VersionedTable.toBound(a).compare(VersionedTable.toBound(b))
      case _ => 0
    }
    val bounds = scala.collection.mutable.Map[String,
      (Option[Any], Option[Any])]()
    def tighten(c: String, lo: Option[Any], hi: Option[Any]): Unit = {
      val (clo, chi) = bounds.getOrElse(c, (None, None))
      def max2(a: Option[Any], b: Option[Any]) = (a, b) match {
        case (Some(x), Some(y)) => if (cmp(x, y) >= 0) a else b
        case _ => a.orElse(b)
      }
      def min2(a: Option[Any], b: Option[Any]) = (a, b) match {
        case (Some(x), Some(y)) => if (cmp(x, y) <= 0) a else b
        case _ => a.orElse(b)
      }
      bounds(c) = (max2(clo, lo), min2(chi, hi))
    }
    filters.foreach {
      case EqualTo(c, v) if c != snap.partCol =>
        boundable(v).foreach(n => tighten(c, Some(n), Some(n)))
      case GreaterThan(c, v) =>
        boundable(v).foreach(n => tighten(c, Some(n), None))
      case GreaterThanOrEqual(c, v) =>
        boundable(v).foreach(n => tighten(c, Some(n), None))
      case LessThan(c, v) =>
        boundable(v).foreach(n => tighten(c, None, Some(n)))
      case LessThanOrEqual(c, v) =>
        boundable(v).foreach(n => tighten(c, None, Some(n)))
      case In(c, vs) if c != snap.partCol && vs.nonEmpty &&
          (vs.forall(_.isInstanceOf[java.lang.Number]) ||
            vs.forall(_.isInstanceOf[String])) =>
        val sorted = vs.toSeq.sortWith(cmp(_, _) < 0)
        tighten(c, Some(sorted.head), Some(sorted.last))
      case _ => () // unsupported shapes prune nothing; rows re-filter
    }
    val df = VersionedTable.readFor(ctx.sparkSession, snap, root, schema,
      wanted, bounds.toMap)
    df.select(requiredColumns.toIndexedSeq
      .map(org.apache.spark.sql.functions.col): _*).rdd
  }
}

/** A snapshot's named EXTRA (side table) as a V1 relation. */
final class GraftVtExtraRelation(ctx: SQLContext, root: String,
    snap: VersionedTable.Snapshot, name: String,
    override val schema: StructType)
    extends BaseRelation with PrunedScan {
  override def sqlContext: SQLContext = ctx
  override def buildScan(requiredColumns: Array[String]): RDD[Row] =
    VersionedTable.readExtra(ctx.sparkSession, snap, root, name, schema)
      .select(requiredColumns.toIndexedSeq
        .map(org.apache.spark.sql.functions.col): _*).rdd
}
