package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-directory manifests for partitioned index tables (one bucket id
  * per line, sorted; the leading underscore keeps the file invisible to
  * parquet reads). With a manifest, a bucket-pruned maintenance read lists
  * ONLY the wanted bucket directories (explicit paths + `basePath`) — on an
  * object store the recursive listing of a many-thousand-bucket table is
  * otherwise paid on EVERY pruned read and grows with corpus size, while
  * the manifest keeps it ∝ touched buckets. Measured on the graph tier's
  * insert ladder: the 50× rung halved (SCALING.md).
  *
  * Written once per mutation (build / append / delete / compact) from one
  * single-level `listStatus` of the table root — the authoritative
  * directory truth, immune to empty-bucket bookkeeping drift. Shared by
  * [[GraphAnn]] (edges/assign) and [[AnnIndex]] (the IVF store).
  */
private[graft] object IndexManifests {

  private[graft] val FileName = "_graft_buckets"

  def write(spark: SparkSession, table: String, partCol: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(root).iterator
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(partCol + "="))
      .map(_.substring(partCol.length + 1).toLong).toSeq.sorted
    val out = fs.create(new org.apache.hadoop.fs.Path(root, FileName), true)
    try out.write((buckets.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, table: String): Option[Seq[Long]] = {
    val p = new org.apache.hadoop.fs.Path(table, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSeq)
    }
  }

  /** Bucket-pruned read of a partitioned index table. With a manifest the
    * read passes the wanted bucket directories as EXPLICIT paths (plus
    * `basePath`, so the partition column still materializes) — listing
    * cost ∝ wanted buckets. Without one (legacy artifact) it falls back to
    * an `isin` partition filter whose literals MUST match the column's
    * inferred type (small ids infer int, large infer long): a mismatched
    * isin wraps the partition column in a cast, which defeats partition
    * pruning — the read silently degrades to a corpus scan (measured: the
    * graph_insert ScaleSmoke rung's shuffle grew with the corpus until
    * this fix).
    */
  def readBuckets(spark: SparkSession, table: String, partCol: String,
      wanted: Seq[Long]): DataFrame =
    read(spark, table) match {
      case Some(all) =>
        val have = all.toSet
        val hit = wanted.filter(have)
        if (hit.isEmpty)
          // none of the wanted buckets exist yet (an all-fresh batch) —
          // empty frame of the table's schema; only this rare shape pays
          // a full-table listing
          spark.read.parquet(table).where(lit(false))
        else
          spark.read.option("basePath", table)
            .parquet(hit.map(b => s"$table/$partCol=$b"): _*)
      case None =>
        val df = spark.read.parquet(table)
        val vals: Seq[Any] = df.schema(partCol).dataType match {
          case org.apache.spark.sql.types.IntegerType => wanted.map(_.toInt)
          case _ => wanted
        }
        df.where(col(partCol).isin(vals: _*))
    }
}
