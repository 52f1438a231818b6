package graft.ingest

import graft.functions.SpatialExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** The reference's fixture generator, Spark-first (SURVEY.md §2.1 O17–O21;
  * `generate_data.py:7-21`): integer range, seeded random normal, cyclic
  * categorical, random WKB points with EPSG:4326 CRS metadata.
  *
  * Deterministic for a fixed seed ON ANY MACHINE: `randn`/`rand` seed per
  * partition, so the range is generated with a FIXED slice count rather
  * than defaultParallelism. Distributed (`spark.range` scales to any n — no driver-side
  * row building).
  */
object Generator {

  def fixture(spark: SparkSession, n: Long = 10L, seed: Long = 42L): DataFrame = {
    val crsMd = new MetadataBuilder()
      .putString("crs", ParquetIngest.DefaultCrs)
      .putString("encoding", "WKB")
      .build()
    // FIXED slice count, not defaultParallelism: randn/rand seed PER
    // PARTITION, so the same seed on local[4] vs local[8] used to emit
    // different values, breaking the documented seed determinism across
    // machines (round-9 review). 32 preserves the values every fixture
    // generated at the driver config (local[32]) already has.
    spark.range(0, n, 1, numPartitions = 32) // O17: 'id': range(n)  (generate_data.py:8)
      .select(
        col("id"),
        // O18: np.random.randn  (generate_data.py:9)
        randn(seed).as("value"),
        // O19: ['A','B'] cyclic  (generate_data.py:10)
        when(pmod(col("id"), lit(2)) === 0, "A").otherwise("B").as("category"),
        // O20: Point(uniform, uniform)  (generate_data.py:15-16), as WKB
        SpatialExpressions.stPoint(rand(seed + 1), rand(seed + 2))
          .as("geometry", crsMd))
  }

  /** O21: parquet sink for the fixture (`generate_data.py:21`). Emits true
    * GeoParquet: the `geo` footer key is stamped like the reference's
    * `gdf.to_parquet`, so write→probe detects the geometry column from the
    * footer (O3), not the name fallback (O10). */
  def writeFixture(spark: SparkSession, path: String, n: Long = 10L,
      seed: Long = 42L): Unit =
    ParquetIngest.writeSpatial(fixture(spark, n, seed), path)
}
