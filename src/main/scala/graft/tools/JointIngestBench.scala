package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot measurement for the joint dedup-store maintainer (round
  * 13, VERDICT r12 #5): ingest the documents table into (a) a solo
  * minhash store, (b) a solo jaccard store, (c) both via
  * [[graft.streaming.DedupIngest.maintainDedupStores]], and print the
  * three walls — the number SURVEY §9 cites for the shared-featurize
  * saving. Not part of the bench suite: the suite's two stream keys
  * stay solo so their per-key attribution is untouched. */
object JointIngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def freshDir(n: String): String = {
      val d = s"/tmp/graft_stage/joint_bench/$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      d
    }
    def stream() = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[joint-bench] $label%-14s $s%.2f s")
      s
    }
    // two interleaved rounds after an untimed warmup, per-mode MIN:
    // a fixed solo-solo-joint order would hand the joint run the most
    // JIT/page-cache warmth and overstate the saving
    def soloMinhash(tag: String) = timed(s"solo minhash $tag") {
      graft.streaming.DedupIngest.maintainMinhash(
        stream(), "doc_id", "text", freshDir(s"mh_solo_$tag")).awaitTermination()
    }
    def soloJaccard(tag: String) = timed(s"solo jaccard $tag") {
      graft.streaming.DedupIngest.maintainJaccardStore(
        stream(), "doc_id", "text", freshDir(s"jc_solo_$tag")).awaitTermination()
    }
    def jointRun(tag: String) = timed(s"joint $tag") {
      graft.streaming.DedupIngest.maintainDedupStores(
        stream(), "doc_id", "text",
        freshDir(s"mh_joint_$tag"), freshDir(s"jc_joint_$tag"))
        .awaitTermination()
    }
    timed("warmup") {
      graft.streaming.DedupIngest.maintainMinhash(
        stream(), "doc_id", "text", freshDir("warm")).awaitTermination()
    }
    val j1 = jointRun("r1"); val m1 = soloMinhash("r1"); val c1 = soloJaccard("r1")
    val j2 = jointRun("r2"); val m2 = soloMinhash("r2"); val c2 = soloJaccard("r2")
    val joint = math.min(j1, j2)
    val soloM = math.min(m1, m2)
    val soloJ = math.min(c1, c2)
    println(f"[joint-bench] solo sum ${soloM + soloJ}%.2f s vs joint $joint%.2f s " +
      f"= ${(1 - joint / (soloM + soloJ)) * 100}%.0f%% saved (per-mode min of 2)")
    spark.stop()
  }
}
