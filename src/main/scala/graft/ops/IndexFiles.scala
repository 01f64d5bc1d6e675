package graft.ops

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for the materialized index stores (spec markers,
  * tombstone sidecars, compaction listings and swaps), resolved through the
  * store path's HADOOP FileSystem — the same resolution Spark's own
  * readers/writers use — so every maintenance operation runs on any store
  * Spark can write (HDFS, S3A, local) instead of silently requiring
  * `java.nio.file` local paths. Before this module the data-plane writes
  * were already Hadoop-FS (`IndexManifests.write`, the bucket deletes) while
  * the maintenance plane (`compactCodes`/`compactTable` listings, marker
  * files) resolved locally: on an object store compaction could not list
  * and spec markers could not be read, even though every query worked —
  * the one place the 100 TB posture was false in code.
  *
  * Marker writes go through write-to-temp + rename, never an in-place
  * overwrite: a crash mid-write must not leave a truncated-but-parsable
  * marker (the [[IndexManifests.write]] rationale, shared here).
  */
private[graft] object IndexFiles {

  def fs(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new HPath(path))

  def isDirectory(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val p = new HPath(path)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  /** Read a small marker file fully; throws (with the path) when absent. */
  def readString(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new HPath(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def readStringOpt(spark: SparkSession, path: String): Option[String] = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (f.exists(p)) {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    } else None
  }

  /** Write a small marker file via temp + rename (atomic on HDFS/local; on
    * copy+delete stores the crash window is a MISSING marker — which every
    * reader treats as its explicit absent case — never a torn one).
    */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val f = fs(spark, path)
    val dst = new HPath(path)
    val tmp = new HPath(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"marker rename failed: $tmp -> $dst")
  }

  /** Immediate children of `dir` that are parquet part files. */
  def listParquet(spark: SparkSession, dir: String): Seq[FileStatus] =
    fs(spark, dir).listStatus(new HPath(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Immediate child DIRECTORIES of `dir` whose names start with `prefix`
    * (e.g. partition directories `__centroid=`).
    */
  def listSubdirs(spark: SparkSession, dir: String,
      prefix: String): Seq[FileStatus] =
    fs(spark, dir).listStatus(new HPath(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))

  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(new HPath(path), true)
    ()
  }
}
