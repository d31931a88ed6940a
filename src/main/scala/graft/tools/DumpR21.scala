package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round plan snapshots: writes `.explain("formatted")`
  * for the named keys to `plans/r21/<key>_<tag>.txt` — the committed
  * before/after evidence the round deliverable requires. Bench-shaped
  * session (same cpu/shuffle-partition wiring), so the dumped plans
  * are the plans the bench times. Run:
  * `sbt "runMain graft.tools.DumpR21 <key>[,<key>...] <tag>"`
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench defaults). */
object DumpR21 {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    // the bench's untimed prebuilds, for keys that read shared indexes
    try { graft.queries.HarnessLLM.ivfIndexFor(spark, sfDir) } catch { case _: Throwable => () }
    try { graft.queries.HarnessLLM.pqIndexFor(spark, sfDir) } catch { case _: Throwable => () }
    try { graft.queries.HarnessLLM.ivfPqIndexFor(spark, sfDir) } catch { case _: Throwable => () }
    try { graft.queries.HarnessLLM.opqModelsFor(spark, sfDir) } catch { case _: Throwable => () }
    try { graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir) } catch { case _: Throwable => () }
    try { graft.queries.HarnessIO.bucketedTablesFor(spark, sfDir) } catch { case _: Throwable => () }
    Files.createDirectories(Paths.get("plans/r21"))
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.write(Paths.get(s"plans/r21/${key}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"[dumpr21] wrote plans/r21/${key}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
