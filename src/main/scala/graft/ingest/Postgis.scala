package graft.ingest

import java.util.Properties

import graft.functions.SpatialExpressions
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, hex, lit}
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** PostGIS-typed relational sink (reference O13, `app.py:181` `to_postgis`;
  * DDL hook `app.py:58-61`): the geometry column lands as a real
  * `geometry(<Type>, <srid>)` PostGIS column — not an untyped `bytea` —
  * with the SRID taken from the GeoParquet CRS metadata the scan attached.
  *
  * Mechanics (each piece chosen for how Spark's JDBC writer actually works):
  *
  *  - **DDL via pre-action, not `createTableColumnTypes`.** Spark parses the
  *    `createTableColumnTypes` option with its own SQL type parser, which
  *    rejects `geometry(Geometry, 4326)` — it is not a Spark type. So the
  *    typed `CREATE TABLE` runs as driver-side DDL (the same O11 pre-action
  *    channel the reference uses for `CREATE EXTENSION postgis`), and the
  *    distributed write APPENDs into the pre-created table.
  *  - **Wire format: hex EWKB string.** PostGIS's `geometry` input function
  *    accepts hex-encoded (E)WKB — the exact representation GeoPandas'
  *    `to_postgis` ships. The geometry column is rewritten to
  *    `hex(st_set_srid(wkb, srid))` (SRID flag + 4-byte SRID embedded, see
  *    [[SpatialExpressions.setSrid]]) so every row carries its SRID.
  *  - **`stringtype=unspecified`.** The PostgreSQL JDBC driver sends
  *    `setString` parameters as `varchar` by default, which the server
  *    refuses to coerce into `geometry`; with this connection property the
  *    parameter is sent untyped and the server resolves it through the
  *    geometry input function. (Standard pgjdbc knob, documented in the
  *    driver manual.)
  *
  * Everything except the live socket is unit-tested (`JdbcSinkSpec`):
  * generated DDL, save-mode action sequences, EWKB wire bytes, connection
  * properties. No PostgreSQL exists in this environment — the reference's
  * own test story for this path is identical (mock/skip).
  */
object Postgis {

  /** Everything `ingest` needs to execute the write: driver-side DDL (in
    * order), the wire-format frame, and patched connection properties. The
    * write itself always APPENDs — create/replace semantics live in the
    * actions. */
  final case class Plan(
      preActions: Seq[String],
      frame: DataFrame,
      properties: Properties)

  /** `EPSG:4326` → 4326; unparseable/non-EPSG authorities keep the
    * reference's default (`app.py:163-164` assigns EPSG:4326). */
  def sridOfCrs(crs: String): Int = crs match {
    case s if s != null && s.toUpperCase.startsWith("EPSG:") =>
      scala.util.Try(s.drop(5).trim.toInt).getOrElse(4326)
    case _ => 4326
  }

  private val pgDialect = JdbcDialects.get("jdbc:postgresql://")

  /** Postgres column type for a non-geometry field: dialect mapping first,
    * then the standard JDBC fallbacks Spark itself would emit. */
  private def pgType(dt: DataType): String =
    pgDialect.getJDBCType(dt).map(_.databaseTypeDefinition).getOrElse(dt match {
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case ShortType => "SMALLINT"
      case BooleanType => "BOOLEAN"
      case StringType => "TEXT"
      case BinaryType => "BYTEA"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
      case other => throw new IllegalArgumentException(
        s"no PostgreSQL mapping for Spark type $other")
    })

  /** Typed `CREATE TABLE`: geometry column as `geometry(<Type>, <srid>)`,
    * everything else through the Postgres dialect. */
  def createTableDdl(
      schema: StructType,
      geometryColumn: String,
      srid: Int,
      table: String,
      geometryType: String = "Geometry",
      ifNotExists: Boolean = false): String = {
    require(schema.fieldNames.contains(geometryColumn),
      s"geometry column '$geometryColumn' not in schema ${schema.fieldNames.mkString(",")}")
    val cols = schema.fields.map { f =>
      val typ =
        if (f.name == geometryColumn) s"geometry($geometryType,$srid)"
        else pgType(f.dataType)
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"${pgDialect.quoteIdentifier(f.name)} $typ$notNull"
    }
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine$table (${cols.mkString(", ")})"
  }

  /** Build the full write plan for a spatial frame against a
    * [[ParquetIngest.PostgisSink]] under the reference's
    * fail/replace/append semantics (O14, `app.py:21`). */
  def plan(
      df: DataFrame,
      sink: ParquetIngest.PostgisSink,
      mode: SaveMode): Plan = {
    val spatial = ParquetIngest.spatialOf(df).getOrElse(
      throw new IllegalArgumentException(
        "PostGIS sink requires a spatial frame: no geometry column with CRS " +
          "metadata found (read the source via ParquetIngest.read)"))
    val srid = sink.srid.getOrElse(sridOfCrs(spatial.crs))
    val ddl = (ine: Boolean) => createTableDdl(
      df.schema, spatial.geometryColumn, srid, sink.table,
      sink.geometryType, ifNotExists = ine)
    val tableActions = mode match {
      case SaveMode.Overwrite =>
        Seq(s"DROP TABLE IF EXISTS ${sink.table}", ddl(false))
      case SaveMode.Append => Seq(ddl(true))
      case _ => Seq(ddl(false)) // ErrorIfExists: CREATE fails if present
    }
    // O11 parity: the reference issues CREATE EXTENSION before every write
    val preActions =
      Seq("CREATE EXTENSION IF NOT EXISTS postgis") ++ tableActions
    val frame = df.withColumn(spatial.geometryColumn,
      hex(SpatialExpressions.stSetSrid(col(spatial.geometryColumn), lit(srid))))
    val props = new Properties()
    props.putAll(sink.properties)
    props.setProperty("stringtype", "unspecified")
    Plan(preActions, frame, props)
  }
}
