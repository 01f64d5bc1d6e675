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
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
