package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round bisection scratchpad (round 21) — times isolated
  * pieces of hot paths with the noop sink. Not part of any query path;
  * deleted or ignored at round close. */
object Scratch {
  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[scratch] $label%-55s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
      (1 to 2).foreach { _ =>
        for (c <- Seq("deflate", "snappy", "null")) {
          val out = s"/tmp/graft_stage/avro_ab_$c"
          time(s"avro write codec=$c")(graft.io.Avro.write(li, out, codec = c))
          time(s"avro read  codec=$c")(noop(
            spark.read.format("graft_avro").option("splitBytes", 256 * 1024).load(out)))
          val sz = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
            .map(_.length()).sum
          println(s"[scratch]   codec=$c bytes=$sz")
        }
      }
      // read-back equality across codecs
      val a = spark.read.format("graft_avro").load("/tmp/graft_stage/avro_ab_deflate")
      val b = spark.read.format("graft_avro").load("/tmp/graft_stage/avro_ab_snappy")
      println(s"[scratch] deflate-vs-snappy diff rows: ${a.exceptAll(b).count()} / ${b.exceptAll(a).count()}")
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
