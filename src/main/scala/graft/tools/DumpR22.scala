package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round-22 plan snapshots: writes `.explain("formatted")`
  * for the named keys to `plans/r22/<key>_<tag>.txt` — the committed
  * before/after evidence the round deliverable requires. Bench-shaped
  * session (same cpu/shuffle-partition wiring), so the dumped plans are
  * the plans the bench times.
  *
  * `before` plans come from the SAME binary with the round's A/B kill
  * switches thrown (`graft.dedup.clamp=floor`,
  * `graft.minhash.kernel=exploded`) — each switch restores the r21
  * operator shape exactly (session-floored repartition counts; the
  * exploded md5 pipeline), so the dumped before-plan is the r21 plan
  * without needing a second checkout.
  *
  * The dedup keys' outputs arrive eagerly checkpointed (their lazy key
  * plans end at Scan ExistingRDD — the r21-documented caveat), so this
  * tool ALSO dumps the LAZY internal stages the round changed:
  * `minhash_bands` (the band-signature relation) and `jaccard_rescore`
  * (the string-rescore stage over a literal candidate pair).
  *
  * Prebuild failures print loudly and only NonFatal is swallowed
  * (r21 ADVICE: a silently-degraded plan snapshot misleads the audit).
  *
  * Run: `sbt "runMain graft.tools.DumpR22 <key>[,<key>...] <tag>"`
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench defaults). */
object DumpR22 {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val tag = args(1)
    if (tag == "before") {
      sys.props("graft.dedup.clamp") = "floor"
      sys.props("graft.minhash.kernel") = "exploded"
    } else {
      sys.props.remove("graft.dedup.clamp")
      sys.props.remove("graft.minhash.kernel")
    }
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
    def prebuild(name: String)(f: => Any): Unit =
      try { f; () } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[dumpr22] WARNING: prebuild $name failed " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); dependent " +
            "key plans may reflect a missing shared index")
      }
    prebuild("ivf")(graft.queries.HarnessLLM.ivfIndexFor(spark, sfDir))
    prebuild("pq")(graft.queries.HarnessLLM.pqIndexFor(spark, sfDir))
    prebuild("ivfpq")(graft.queries.HarnessLLM.ivfPqIndexFor(spark, sfDir))
    prebuild("opq")(graft.queries.HarnessLLM.opqModelsFor(spark, sfDir))
    prebuild("shingles")(graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir))
    prebuild("bucketed")(graft.queries.HarnessIO.bucketedTablesFor(spark, sfDir))
    Files.createDirectories(Paths.get("plans/r22"))
    def dump(name: String, txt: String): Unit = {
      Files.write(Paths.get(s"plans/r22/${name}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"[dumpr22] wrote plans/r22/${name}_$tag.txt (${txt.length} chars)")
    }
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      dump(key, df.queryExecution.explainString(FormattedMode))
    }
    // the LAZY internal stages the round changed (checkpoints hide them
    // from the key plans above)
    locally {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val sh = graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir)
      dump("minhash_bands",
        graft.ops.Dedup.portableBandSignatures(sh, "doc_id", "__sh")
          .queryExecution.explainString(FormattedMode))
      val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
      dump("jaccard_rescore",
        graft.ops.Dedup.rescoreJaccardTwoSided(
            cand, sh, sh, "doc_id", "__sh", 0.5, candRows = 1L)
          .queryExecution.explainString(FormattedMode))
      // the codec decode chain in its UN-STAGED form (the pre-r22 key
      // body: per-run ImageIO encode feeding the decode) — the staged
      // keys' own plans end at Scan ExistingRDD, so this is the
      // before-shape evidence for multimodal_{jpeg,png}_decode
      if (tag == "before")
        dump("codec_decode_unstaged",
          graft.ops.Multimodal.decodeImagePartitions(
              graft.queries.HarnessLLM.codecImageMedia(spark, sfDir, "jpg"))(spark)
            .toDF().queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
