package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the graft_pg read path's text-vs-binary split (round 15 —
  * the extended-query binary cycle exists to remove the per-row text
  * parse that was the wire read's floor; this records the actual
  * saving instead of asserting it). Loads `lineitem` into the
  * engine-managed local server once, then reads the full table back
  * through each result format, interleaved A/B with min-of-N per mode
  * (the JointIngestBench warmth discipline: a fixed order biases the
  * later mode). Run:
  * `sbt "runMain graft.tools.PgFormatBench /root/testdata/sf0.1 3"` */
object PgFormatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conn = graft.io.Postgres.ensureLocalServer("/tmp/graft_stage/pgserver")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate", "l_returnflag")
    // write-format A/B (interleaved, min-of-reps like the reads)
    var wbest = Map("text" -> Double.MaxValue, "binary" -> Double.MaxValue)
    for (_ <- 1 to reps; wfmt <- Seq("binary", "text")) {
      val w0 = System.nanoTime()
      graft.io.Postgres.overwriteTable(li, conn, "graft_li_fmt", copyFormat = wfmt)
      val sec = (System.nanoTime() - w0) / 1e9
      wbest += wfmt -> math.min(wbest(wfmt), sec)
      println(f"[pgfmt] write-$wfmt%-6s $sec%.3f s  (" + graft.Metrics.snapshot
        .filter(_._1.startsWith("pg_write")).map { case (k, v) => s"$k=$v" }
        .mkString(" ") + ")")
      graft.Metrics.clear()
    }
    println(f"""[pgfmt] write best: binary ${wbest("binary")}%.3f s, text ${wbest("text")}%.3f s, speedup ${wbest("text") / wbest("binary")}%.2f""")
    def readOnce(fmt: String): (Double, String) = {
      val t0 = System.nanoTime()
      val n = spark.read.format("graft_pg")
        .option("port", conn.port.toString).option("dbtable", "graft_li_fmt")
        .option("partitionColumn", "l_orderkey")
        .option("lowerBound", "1").option("upperBound", "6000000")
        .option("numPartitions", "8")
        .option("readformat", fmt)
        // aggregate over every column so nothing prunes away: the
        // DECODE cost is what differs between the formats
        .load().selectExpr("sum(l_orderkey + l_linenumber)",
          "sum(l_quantity + l_extendedprice)", "max(l_shipdate)",
          "max(l_returnflag)").collect()
      require(n.length == 1)
      // the WHOLE aggregate row is the cross-format check — a decode
      // bug in any of the four column families must diverge here
      ((System.nanoTime() - t0) / 1e9, n(0).toSeq.map(String.valueOf).mkString("|"))
    }
    var best = Map("text" -> Double.MaxValue, "binary" -> Double.MaxValue)
    var check = Set.empty[String]
    for (_ <- 1 to reps; fmt <- Seq("binary", "text")) {
      val (sec, chk) = readOnce(fmt)
      best += fmt -> math.min(best(fmt), sec)
      check += chk
      println(f"[pgfmt] $fmt%-6s $sec%.3f s")
    }
    require(check.size == 1, s"formats disagree on values: $check")
    println(f"""{"binary_best_sec":${best("binary")}%.3f,"text_best_sec":${best("text")}%.3f,"speedup":${best("text") / best("binary")}%.2f}""")
    spark.stop()
  }
}
