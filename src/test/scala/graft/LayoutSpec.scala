package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order clustering: bit-interleave correctness and the locality property
  * that justifies it — a z-clustered layout confines each key of EVERY
  * participating dimension to few partitions, where a single-column sort
  * only serves its own column.
  */
class LayoutSpec extends SparkTestBase {

  test("zValue interleaves bits (bit j of column i at position j*k+i)") {
    val sp = spark
    import sp.implicits._
    // x = 0b11, y = 0b01, bits = 2: z = x0 | y0<<1 | x1<<2 | y1<<3 = 0b0111
    val rows = Seq((3L, 1L), (0L, 0L), (2L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(7L, 0L, 14L)) // (2,3): x1<<2 | y0<<1 | y1<<3 = 4+2+8
    // SQL twin produces the identical values
    Seq((3L, 1L), (0L, 0L), (2L, 3L)).toDF("x", "y")
      .createOrReplaceTempView("zspec_t")
    val sqlZ = sp.sql(
      s"SELECT ${Layout.zValueSql(Seq("x", "y"), 2)} AS z FROM zspec_t")
      .collect().map(_.getLong(0)).toSeq
    assert(sqlZ == rows)
  }

  test("z-clustered layout localizes BOTH dimensions; single-column sorts only one") {
    val sp = spark
    import sp.implicits._
    // full 64x64 grid, one row per (user, t)
    val grid = sp.range(0, 64 * 64).toDF("i")
      .select((col("i") / 64).cast("long").as("user"),
        (col("i") % 64).cast("long").as("t"))
    def maxPartsPer(df: org.apache.spark.sql.DataFrame, key: String): Long =
      df.withColumn("__p", spark_partition_id())
        .groupBy(key).agg(countDistinct(col("__p")).as("n"))
        .agg(max("n")).head().getLong(0)
    val zed = Layout.zorderBy(grid, Seq(col("user"), col("t")), bits = 6,
      partitions = 16)
    // 16 partitions over a 64x64 z-curve = 16x16 tiles: each user row of
    // the grid crosses 4 tiles
    assert(maxPartsPer(zed, "user") <= 8, maxPartsPer(zed, "user").toString)
    assert(maxPartsPer(zed, "t") <= 8, maxPartsPer(zed, "t").toString)
    // a t-sorted layout spreads every user over ~all partitions
    val tSorted = grid.repartitionByRange(16, col("t"))
    assert(maxPartsPer(tSorted, "user") >= 14)
    assert(maxPartsPer(zed, "user") < maxPartsPer(tSorted, "user"))
    // and a user-sorted layout spreads every t over ~all partitions
    val uSorted = grid.repartitionByRange(16, col("user"))
    assert(maxPartsPer(uSorted, "t") >= 14)
    assert(maxPartsPer(zed, "t") < maxPartsPer(uSorted, "t"))
  }
}
