package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: write both sides of a recurring equi-join
  * bucketed (and sorted) by the join key so the join compiles to a
  * sort-merge with ZERO Exchange — the layout a 100 TB pipeline pre-pays
  * once at ingest and then amortizes over every downstream join of the two
  * tables. At scale, the shuffle this removes is the single largest cost of
  * a fact-fact join (both sides re-hashed over the network); with matching
  * bucket counts on the join key, each task reads bucket i of both sides
  * locally.
  *
  * `saveAsTable` is required: bucket metadata lives in the session catalog,
  * and a plain `parquet(path)` write silently drops it (the files land
  * hashed, but no reader can prove it, so Spark re-shuffles anyway).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    // the default catalog is in-memory: a previous JVM's table is gone from
    // the catalog but its warehouse directory survives, and saveAsTable
    // then fails with LOCATION_ALREADY_EXISTS — clear both first
    drop(df.sparkSession, table)
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Drop the table AND its (possibly orphaned) default-database warehouse
    * location.
    */
  def drop(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
