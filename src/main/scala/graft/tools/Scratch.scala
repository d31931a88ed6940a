package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round bisection scratchpad (round 21) — times isolated
  * pieces of hot paths with the noop sink. Not part of any query path;
  * deleted or ignored at round close. */
object Scratch {
  private def stealJiffies(): Long =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      l.trim.split("\\s+")(8).toLong
    } catch { case _: Throwable => -1L }

  def time(label: String)(f: => Unit): Unit = {
    val s0 = stealJiffies()
    val t0 = System.nanoTime()
    f
    val el = (System.nanoTime() - t0) / 1e9
    val ds = stealJiffies() - s0
    println(f"[scratch] $label%-55s $el%8.3f s  steal=${ds}%d jiffies (${ds / (el * 100.0 * 32) * 100}%.2f%%)")
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
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
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    noop(emb) // warm

    if (args.contains("avro")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag",
          $"l_shipdate",
          struct($"l_extendedprice".as("price"), $"l_discount".as("disc"),
            struct($"l_tax".as("tax")).as("inner")).as("pricing"),
          map(lit("rf"), $"l_returnflag", lit("ls"), $"l_linestatus").as("tags"))
      noop(li)
      (1 to 3).foreach { r =>
        for (mode <- Seq("generic", "direct")) {
          if (mode == "generic") sys.props("graft.avro.writer") = "generic"
          else sys.props.remove("graft.avro.writer")
          val out = s"/tmp/graft_stage/avro_ab_$mode"
          time(s"avro write snappy writer=$mode run=$r")(
            graft.io.Avro.write(li, out, codec = "snappy"))
          time(s"avro read  snappy writer=$mode run=$r")(noop(
            spark.read.format("graft_avro").option("splitBytes", 256 * 1024).load(out)))
          val sz = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
            .map(_.length()).sum
          println(s"[scratch]   writer=$mode bytes=$sz")
        }
      }
      sys.props.remove("graft.avro.writer")
      // read-back equality across writer paths
      val a = spark.read.format("graft_avro").load("/tmp/graft_stage/avro_ab_generic")
      val b = spark.read.format("graft_avro").load("/tmp/graft_stage/avro_ab_direct")
      println(s"[scratch] generic-vs-direct diff rows: ${a.exceptAll(b).count()} / ${b.exceptAll(a).count()}")
      spark.stop(); return
    }

    if (args.contains("jacparts")) {
      // r22: separate partition-count overhead from 32-core contention —
      // same JVM, same master, interleaved shuffle.partitions A/B over
      // the two anti-scaling keys (driver scaling ratios 0.34/0.36)
      try { graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir) }
      catch { case _: Throwable => () }
      val keys = Seq("dedup_ngram_jaccard", "dedup_jaccard_probe")
      keys.foreach(k => graft.SparkEntry.queries(k)(spark, sfDir).count()) // warm
      for (r <- 1 to 3; parts <- Seq("32", "8", "4")) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        keys.foreach { k =>
          time(s"$k parts=$parts run=$r")(
            graft.SparkEntry.queries(k)(spark, sfDir).count())
        }
      }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      spark.stop(); return
    }

    if (args.contains("jacest")) {
      // r22: print the collision-volume estimates the jaccard tiers
      // derive partition counts from, so the clamp targets are
      // calibrated from data instead of guessed
      val sh = graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir)
      val ex = graft.ops.Dedup.hashedShingles(sh, "doc_id", "__sh")
      val dfreq = ex.groupBy($"__h").agg(count(lit(1)).as("__df"))
      val docOrd = graft.ops.Dedup.orderedByDf(ex, dfreq, "doc_id").persist()
      val post = graft.ops.Dedup.prefixPostings(docOrd, "doc_id", 0.5)
      val selfEst = post.groupBy($"__h").agg(count(lit(1)).as("__c"))
        .agg(sum($"__c".cast("double") * $"__c")).head().getDouble(0)
      println(s"[scratch] self-join collision est = $selfEst -> parts(target=2M) = ${selfEst / 2e6}")
      println(s"[scratch] docOrd rows = ${docOrd.count()}, postings rows = ${post.count()}")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val probes = docs.filter($"doc_id" < 10)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text")
      val pSh = probes.select($"doc_id", graft.ops.Dedup.shingles($"text").as("__sh"))
        .filter(size($"__sh") > 0)
      val pOrd = graft.ops.Dedup.orderedByDf(
        graft.ops.Dedup.hashedShingles(pSh, "doc_id", "__sh"), dfreq, "doc_id").persist()
      val pPost = graft.ops.Dedup.prefixPostings(pOrd, "doc_id", 0.5)
      val pc = pPost.groupBy($"__h").agg(count(lit(1)).as("__pc"))
      val probeEst = post.groupBy($"__h").agg(count(lit(1)).as("__cc"))
        .join(pc, "__h").agg(sum($"__pc".cast("double") * $"__cc")).head().getDouble(0)
      println(s"[scratch] probe collision est = $probeEst")
      spark.stop(); return
    }

    if (args.contains("dedupab")) {
      // r22: interleaved old/new A/B of the volume clamp + native
      // min-hash kernel over the touched keys, one JVM (contention-
      // robust, the r21 discipline)
      try { graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir) }
      catch { case _: Throwable => () }
      val keys = sys.env.get("SCRATCH_KEYS")
        .map(_.split(",").toSeq)
        .getOrElse(Seq("dedup_ngram_jaccard", "dedup_jaccard_probe",
          "dedup_minhash", "dedup_minhash_probe", "dedup_cluster",
          "stream_minhash_ingest", "stream_jaccard_probe"))
      val cycles = sys.env.get("SCRATCH_CYCLES").map(_.toInt).getOrElse(3)
      keys.foreach(k => graft.SparkEntry.queries(k)(spark, sfDir).count()) // warm
      for (r <- 1 to cycles; mode <- Seq("old", "new")) {
        if (mode == "old") {
          sys.props("graft.dedup.clamp") = "floor"
          sys.props("graft.minhash.kernel") = "exploded"
        } else {
          sys.props.remove("graft.dedup.clamp")
          sys.props.remove("graft.minhash.kernel")
        }
        keys.foreach { k =>
          time(s"$k mode=$mode run=$r")(
            graft.SparkEntry.queries(k)(spark, sfDir).count())
        }
      }
      spark.stop(); return
    }

    if (args.contains("fanab")) {
      // r22: does Par.fanOut still pay for the minhash family now that
      // the kernel is ~10x cheaper? Interleaved off/on, one JVM.
      try { graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir) }
      catch { case _: Throwable => () }
      val keys = sys.env.get("SCRATCH_KEYS").map(_.split(",").toSeq)
        .getOrElse(Seq("dedup_minhash", "stream_minhash_ingest"))
      val cycles = sys.env.get("SCRATCH_CYCLES").map(_.toInt).getOrElse(3)
      keys.foreach(k => graft.SparkEntry.queries(k)(spark, sfDir).count()) // warm
      for (r <- 1 to cycles; fan <- Seq("off", "on")) {
        if (fan == "off") sys.props("graft.par.fanout") = "off"
        else sys.props.remove("graft.par.fanout")
        keys.foreach { k =>
          time(s"$k fan=$fan run=$r")(
            graft.SparkEntry.queries(k)(spark, sfDir).count())
        }
      }
      sys.props.remove("graft.par.fanout")
      spark.stop(); return
    }

    if (args.contains("jingest")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(docs)
      for (r <- 1 to 3; fan <- Seq("off", "on")) {
        sys.props("graft.par.fanout") = fan
        val store = s"/tmp/graft_stage/scratch_jac_$fan"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
        time(s"maintainJaccardStore fan=$fan run=$r") {
          val stream = spark.readStream.schema(docs.schema)
            .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          graft.streaming.DedupIngest.maintainJaccardStore(
            stream, "doc_id", "text", store).awaitTermination()
        }
        val mstore = s"/tmp/graft_stage/scratch_min_$fan"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(mstore))
        time(s"maintainMinhash fan=$fan run=$r") {
          val stream = spark.readStream.schema(docs.schema)
            .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          graft.streaming.DedupIngest.maintainMinhash(
            stream, "doc_id", "text", mstore).awaitTermination()
        }
      }
      sys.props.remove("graft.par.fanout")
      spark.stop(); return
    }

    val ivf = graft.queries.HarnessLLM.ivfIndexFor(spark, sfDir)
    val opq = graft.queries.HarnessLLM.opqModelsFor(spark, sfDir)._1
    val boot0 = graft.streaming.VectorIngest.bootstrapFrom(ivf, dim = 64)
    val boot = boot0.copy(opq = Some(opq))

    (1 to 3).foreach { r =>
      println(s"--- round $r")
      time("read only")(noop(emb))
      time("srp sig") {
        noop(emb.select($"vec_id",
          graft.ops.Vectors.srpSignatureCol($"embedding", 64, boot.bits, boot.bands, boot.seed).as("__sig")))
      }
      time("normalized") {
        noop(emb.select($"vec_id",
          graft.ops.Vectors.normalized($"embedding").as("__na")))
      }
      time("sig+norm+assign") {
        val assign = graft.ops.Vectors.cellAssigner(spark, boot.centroids)
        noop(emb.select($"vec_id",
          graft.ops.Vectors.srpSignatureCol($"embedding", 64, boot.bits, boot.bands, boot.seed).as("__sig"),
          graft.ops.Vectors.normalized($"embedding").as("__na"))
          .withColumn("__a", assign($"__na")))
      }
      time("full indexColumns (opq)") {
        noop(graft.streaming.VectorIngest.indexColumns(emb, "vec_id", "embedding", boot))
      }
    }
    spark.stop()
  }
}
