package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Shared comparison helpers for the partitioning-invariance specs
  * ([[MultiPartitionSpec]], [[StreamedPartitionSpec]]): canonical row sets
  * compared with the driver gate's own float tolerance
  * (tools/oracle_check.py `close`).
  */
private[graft] object PartitionInvariance {
  private def relClose(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) ||
      math.abs(x - y) <= math.max(1e-12, 1e-9 * math.max(math.abs(x), math.abs(y)))

  def cellOk(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Double, y: Double) => relClose(x, y)
    case (x: Float, y: Float) => relClose(x.toDouble, y.toDouble)
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Seq[_], y: Seq[_]) =>
      x.size == y.size && x.lazyZip(y).forall(cellOk)
    case (x: Row, y: Row) => cellOk(x.toSeq, y.toSeq)
    case _ => a == b
  }

  /** Sort key with floats rounded to 6 significant digits so epsilon-level
    * jitter cannot reorder rows between the two runs.
    */
  def key(cell: Any): String = cell match {
    case null => "\u0000"
    case d: Double =>
      if (d.isNaN) "NaN"
      else String.format(java.util.Locale.ROOT, "%.6e", Double.box(d))
    case f: Float => key(f.toDouble)
    case s: Seq[_] => s.map(key).mkString("[", ",", "]")
    case r: Row => key(r.toSeq)
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case x => x.toString
  }

  def canon(df: DataFrame): Array[Row] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .sortBy(r => key(r.toSeq))
  }

  def assertSame(single: Array[Row], multi: Array[Row]): Unit = {
    assert(single.length == multi.length,
      s"row count differs: ${single.length} vs ${multi.length}")
    single.lazyZip(multi).zipWithIndex.foreach { case ((s, m), i) =>
      assert(cellOk(s.toSeq, m.toSeq),
        s"row $i differs:\n  single: $s\n  multi:  $m")
    }
  }

  /** An 8-file round-robin mirror of every table in `srcDir`. */
  def multiMirror(spark: org.apache.spark.sql.SparkSession,
      srcDir: String): String = {
    val d = graft.util.TempDirs.create("graft_multipart_sf")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val src = s"$srcDir/$t.parquet"
      if (new java.io.File(src).exists()) {
        spark.read.parquet(src).repartition(8)
          .write.mode("overwrite").parquet(s"$d/$t.parquet")
      }
    }
    d
  }
}

/** Partitioning-invariance rung. The shipped fixtures are ONE row group per
  * table, so every gate has only ever been driver-gated through 1-partition
  * scans — a latent single-partition assumption (order-sensitive merge,
  * first()-as-min, partition-order-dependent sampling) would be invisible
  * to the oracle gate and surface only on a real cluster where a 100 TB
  * table is tens of thousands of splits. This spec re-runs a cross-family
  * slice of the catalog against a MULTI-FILE mirror of sf0.01 (each table
  * round-robin rewritten to 8 parquet part files, so scans really produce
  * ≥8 row-bearing partitions in a different row order) and asserts results
  * identical to the single-file run: exact for non-floats, 1e-9 relative
  * for floats (the driver gate's own comparison contract,
  * tools/oracle_check.py `close`).
  */
class MultiPartitionSpec extends SparkTestBase {

  private val srcDir = "/root/testdata/sf0.01"

  private lazy val multiDir: String =
    PartitionInvariance.multiMirror(spark, srcDir)

  /** Cross-family slice: shuffles/joins/top-k/windows, the dedup +
    * fixpoint family, similarity/ANN tiers across all three index kinds,
    * text/DSIR scoring, and a float-moment aggregate as the
    * accumulation-order probe.
    */
  private val gates = Seq(
    "q1_agg", "join_revenue", "topk_orders", "window_top_orders",
    "lineitem_moments", "events_sessions",
    "dedup_exact", "minhash_lsh_pairs", "near_dedup_survivors",
    "dedup_components", "pagerank_centrality", "central_rep_docs",
    "incremental_components", "substring_dedup_clean", "winnow_pairs",
    "semantic_dedup", "embed_dedup_components", "sim_join_cosine",
    "diversity_keep", "ann_ivf_topk", "ann_pq_topk", "ann_graph_topk",
    "search_topk", "token_stats", "dsir_weights", "decontaminate_docs",
    "media_onnx_features")

  gates.foreach { name =>
    test(s"$name is partitioning-invariant (1 file vs 8-file mirror)") {
      val fn = SparkEntry.queries(name)
      val single = PartitionInvariance.canon(fn(spark, srcDir))
      val multi = PartitionInvariance.canon(fn(spark, multiDir))
      PartitionInvariance.assertSame(single, multi)
      spark.catalog.clearCache()
    }
  }
}
