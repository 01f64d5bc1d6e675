package graft.tools

import org.apache.spark.sql.functions._

/** Scratch verify driver (deleted after use): plan shape + minDocs=3 branch
  * of the round-12 segmentDedup window rewrite.
  */
object R12SegCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    val clean = graft.ops.Dedup.segmentDedup(docs, "doc_id", "text", 3)
    val plan = clean.queryExecution.executedPlan.toString
    val nExch = "Exchange".r.findAllIn(plan).size
    println(s"[minDocs=2] exchanges=$nExch join=${plan.contains("Join")} " +
      s"window=${plan.contains("Window")} inmem=${plan.contains("InMemory")}")
    clean.write.format("noop").mode("overwrite").save()

    val g3 = graft.ops.Dedup.segmentDedup(docs, "doc_id", "text", 3, minDocs = 3)
      .agg(sum("n_dropped"), sum("n_segments"), count(lit(1))).collect()(0)
    println(s"[minDocs=3] dropped=${g3.get(0)} segs=${g3.get(1)} docs=${g3.get(2)}")
    spark.stop()
  }
}
