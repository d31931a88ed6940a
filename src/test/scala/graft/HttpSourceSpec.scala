package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{HttpLines, RangeFileServer}

/** [[graft.io.HttpCsvSource]] against a loopback Range-capable server:
  * split-boundary row identity, fallback paths, pruning pushdown. */
class HttpSourceSpec extends AnyFunSuite with SparkTestBase {

  private lazy val stageDir = {
    val d = Paths.get("/tmp/graft_stage/http_spec")
    Files.createDirectories(d)
    d
  }

  private lazy val server = {
    val s = new RangeFileServer(stageDir)
    Runtime.getRuntime.addShutdownHook(new Thread(() => s.stop()))
    s
  }

  private val schema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_acctbal", DoubleType)))

  /** Stage customer as a single CSV file; return (fileName, expected). */
  private lazy val staged = {
    import spark.implicits._
    val df = spark.read.parquet(sf("customer"))
      .select($"c_custkey", $"c_name", $"c_acctbal")
    val rows = df.orderBy($"c_custkey").collect()
    val csv = "c_custkey,c_name,c_acctbal\n" + rows.map { r =>
      s"${r.getLong(0)},${r.getString(1)},${r.getDouble(2)}"
    }.mkString("\n") + "\n"
    Files.write(stageDir.resolve("customer.csv"), csv.getBytes("UTF-8"))
    ("customer.csv", rows)
  }

  private def readHttp(splits: Int, extra: Map[String, String] = Map.empty) = {
    val (file, _) = staged
    spark.read.format("graft_http")
      .schema(schema)
      .option("url", server.url(file))
      .option("splits", splits.toString)
      .options(extra)
      .load()
  }

  test("round-trip equality, row identity across split counts 1/3/7") {
    val (_, expected) = staged
    for (splits <- Seq(1, 3, 7)) {
      val got = readHttp(splits).orderBy(col("c_custkey")).collect()
      assert(got.length === expected.length, s"splits=$splits")
      got.zip(expected).foreach { case (g, e) =>
        assert(g.getLong(0) === e.getLong(0))
        assert(g.getString(1) === e.getString(1))
        assert(g.getDouble(2) === e.getDouble(2))
      }
    }
  }

  test("ranged scan plans one input partition per byte chunk") {
    assert(readHttp(5).rdd.getNumPartitions === 5)
  }

  test("range-ignoring server falls back to a single partition, same rows") {
    val (file, expected) = staged
    val dumb = new RangeFileServer(stageDir, noRanges = true)
    try {
      val df = spark.read.format("graft_http").schema(schema)
        .option("url", dumb.url(file)).option("splits", 4).load()
      assert(df.rdd.getNumPartitions === 1)
      assert(df.count() === expected.length)
    } finally dumb.stop()
  }

  test("multiple URLs union: one partition set per URL") {
    val (file, expected) = staged
    val df = spark.read.format("graft_http").schema(schema)
      .option("url", s"${server.url(file)},${server.url(file)}")
      .option("splits", 3).load()
    assert(df.rdd.getNumPartitions === 6)
    assert(df.count() === 2L * expected.length)
  }

  test("column pruning reaches the scan (BatchScan readSchema = projection)") {
    val df = readHttp(3).select(col("c_name"))
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("c_name"))
    assert(df.count() === staged._2.length)
  }

  test("quoted fields: embedded delimiter and escaped quote") {
    val csv = "k,v\n1,\"a,b\"\n2,\"say \"\"hi\"\"\"\n"
    Files.write(stageDir.resolve("quoted.csv"), csv.getBytes("UTF-8"))
    val df = spark.read.format("graft_http")
      .schema(StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))))
      .option("url", server.url("quoted.csv")).load()
    val rows = df.orderBy("k").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a,b", "say \"hi\""))
  }

  test("schema inference falls back to header names, all strings") {
    val df = spark.read.format("graft_http")
      .option("url", server.url(staged._1)).load()
    assert(df.schema.fieldNames.toSeq === Seq("c_custkey", "c_name", "c_acctbal"))
    assert(df.schema.fields.forall(_.dataType == StringType))
  }

  test("filter pushdown: accepted filters reach the scan and results stay exact") {
    val (_, expected) = staged
    val df = readHttp(3).filter(col("c_acctbal") > 0.0).filter(col("c_name").isNotNull)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("GreaterThan(c_acctbal,0.0)"), desc)
    assert(desc.contains("IsNotNull(c_name)"), desc)
    val want = expected.filter(r => r.getDouble(2) > 0.0 && r.getString(1) != null)
    assert(df.count() === want.length)
  }

  test("HttpFilterEval: compiled predicates drop rows at the reader, null-safe") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.sources._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.io.HttpFilterEval
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def row(k: Any, v: String) = new GenericInternalRow(
      Array[Any](k, if (v == null) null else UTF8String.fromString(v)))
    val gt = HttpFilterEval.compile(GreaterThan("k", 5L), sch).get
    assert(gt(row(6L, "x")) && !gt(row(5L, "x")) && !gt(row(null, "x")))
    val in = HttpFilterEval.compile(In("v", Array("a", "b")), sch).get
    assert(in(row(1L, "a")) && !in(row(1L, "c")) && !in(row(1L, null)))
    val nn = HttpFilterEval.compile(IsNotNull("v"), sch).get
    assert(nn(row(1L, "a")) && !nn(row(1L, null)))
    // unsupported shape stays residual-only
    assert(HttpFilterEval.compile(StringContains("v", "a"), sch).isEmpty)
    assert(!HttpFilterEval.supported(StringContains("v", "a")))
  }

  test("HttpFilterEval floats match Spark's ordering: -0.0 equals 0.0, NaN greatest (round 16)") {
    // java.lang.Double.compareTo orders -0.0 BELOW 0.0 while Spark's
    // nanSafeCompareDoubles treats them EQUAL — before the
    // normalization, EqualTo(col, 0.0) against a CSV cell "-0.0"
    // dropped at the reader a row the residual would have kept (an
    // UNDER-return, the one unrecoverable direction for a reader-side
    // drop). NaN needs no fix-up and must stay Spark-consistent:
    // greatest, and equal to itself.
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.sources._
    import graft.io.HttpFilterEval
    val sch = StructType(Seq(StructField("d", DoubleType), StructField("f", FloatType)))
    def row(d: Double, f: Float) = new GenericInternalRow(Array[Any](d, f))
    val eq0 = HttpFilterEval.compile(EqualTo("d", 0.0), sch).get
    assert(eq0(row(-0.0, 0f)), "cell -0.0 must satisfy = 0.0 like Spark")
    val eqNeg0 = HttpFilterEval.compile(EqualTo("d", -0.0), sch).get
    assert(eqNeg0(row(0.0, 0f)), "literal -0.0 must match cell 0.0")
    val le = HttpFilterEval.compile(LessThanOrEqual("d", -0.0), sch).get
    assert(le(row(0.0, 0f)), "0.0 <= -0.0 is true under Spark's ordering")
    val in = HttpFilterEval.compile(In("d", Array[Any](0.0)), sch).get
    assert(in(row(-0.0, 0f)), "In-set membership must normalize -0.0 too")
    val feq = HttpFilterEval.compile(EqualTo("f", 0.0f), sch).get
    assert(feq(row(1.0, -0.0f)), "float -0.0 cell must satisfy = 0.0f")
    // NaN: greatest and self-equal (Double.compareTo already agrees
    // with nanSafeCompareDoubles here — pin it stays that way)
    val gtNan = HttpFilterEval.compile(GreaterThan("d", 100.0), sch).get
    assert(gtNan(row(Double.NaN, 0f)), "NaN > any finite value, like Spark")
    val eqNan = HttpFilterEval.compile(EqualTo("d", Double.NaN), sch).get
    assert(eqNan(row(Double.NaN, 0f)), "NaN = NaN is true in Spark's ordering")
    val inNan = HttpFilterEval.compile(In("d", Array[Any](Double.NaN)), sch).get
    assert(inNan(row(Double.NaN, 0f)))
  }

  test("HttpFilterEval differential fuzz: every compiled predicate agrees with Spark's filter") {
    // the round-16 float fix was found pointwise; this pins the whole
    // class — for ANY pushable (filter, literal) over adversarial cells
    // (NaN, ±0.0, ±Inf, numeric extremes, supplementary-plane strings,
    // nulls), the reader-side evaluator must keep exactly the rows
    // Spark's own Catalyst filter keeps on identical data. Seeded: a
    // failure reproduces.
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.{Column, Row}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.io.HttpFilterEval

    val sch = StructType(Seq(
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("k", LongType)))
    val doubles: Seq[java.lang.Double] = Seq(
      null, Double.NaN, 0.0, -0.0, 1.5, -1.5, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue)
      .map(v => if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double]))
    val floats: Seq[java.lang.Float] = Seq[Any](
      null, Float.NaN, 0.0f, -0.0f, 2.5f, -2.5f, Float.PositiveInfinity, Float.MinValue)
      .map(v => if (v == null) null else java.lang.Float.valueOf(v.asInstanceOf[Float]))
    val strings: Seq[String] = Seq(
      null, "", "a", "b", "￿", "😀" /* U+1F600, > ￿ by code point */,
      "a b", "Ａ" /* fullwidth */)
    val longs: Seq[java.lang.Long] = Seq[Any](
      null, 0L, 1L, -1L, Long.MaxValue, Long.MinValue)
      .map(v => if (v == null) null else java.lang.Long.valueOf(v.asInstanceOf[Long]))

    val rng = new scala.util.Random(20260815L)
    def pick[T](xs: Seq[T]): T = xs(rng.nextInt(xs.length))
    val rows: Seq[(java.lang.Double, java.lang.Float, String, java.lang.Long)] =
      (1 to 48).map(_ => (pick(doubles), pick(floats), pick(strings), pick(longs)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map { case ((d, f, s, k), i) =>
        Row(d, f, s, k, i.toLong) }, 2),
      sch.add(StructField("rowid", LongType, nullable = false))).cache()
    def internal(r: (java.lang.Double, java.lang.Float, String, java.lang.Long)) =
      new GenericInternalRow(Array[Any](
        r._1, r._2, if (r._3 == null) null else UTF8String.fromString(r._3), r._4))

    // (source Filter, equivalent Column) generators per column
    def litsFor(c: String): Seq[Any] = c match {
      case "d" => doubles.filter(_ != null).map(_.doubleValue())
      case "f" => floats.filter(_ != null).map(_.floatValue())
      case "s" => strings.filter(_ != null)
      case "k" => longs.filter(_ != null).map(_.longValue())
    }
    def gen(): (Filter, Column) = {
      val c = pick(Seq("d", "f", "s", "k"))
      rng.nextInt(8) match {
        case 0 => val v = pick(litsFor(c)); (EqualTo(c, v), col(c) === lit(v))
        case 1 => val v = pick(litsFor(c)); (GreaterThan(c, v), col(c) > lit(v))
        case 2 => val v = pick(litsFor(c)); (GreaterThanOrEqual(c, v), col(c) >= lit(v))
        case 3 => val v = pick(litsFor(c)); (LessThan(c, v), col(c) < lit(v))
        case 4 => val v = pick(litsFor(c)); (LessThanOrEqual(c, v), col(c) <= lit(v))
        case 5 =>
          val vs = (1 to 1 + rng.nextInt(3)).map(_ => pick(litsFor(c)))
          (In(c, vs.toArray), col(c).isin(vs: _*))
        case 6 => (IsNull(c), col(c).isNull)
        case _ => (IsNotNull(c), col(c).isNotNull)
      }
    }
    for (trial <- 1 to 60) {
      val (filter, column) = gen()
      val pred = HttpFilterEval.compile(filter, sch)
      assert(pred.nonEmpty, s"trial $trial: $filter must compile (shape is supported)")
      val got = rows.zipWithIndex.collect {
        case (r, i) if pred.get(internal(r)) => i.toLong }.toSet
      val want = df.filter(column).select("rowid").collect().map(_.getLong(0)).toSet
      assert(got === want,
        s"trial $trial: $filter diverges from Spark — evaluator kept ${got.diff(want)} " +
          s"extra and dropped ${want.diff(got)} (an under-return is unrecoverable)")
    }
    df.unpersist()
  }

  test("splitCsv round-trips arbitrary fields through RFC-4180 quoting") {
    val rng = new scala.util.Random(42)
    val alphabet = "ab,\"x\n\r\t ;|"
    def field() = (0 until rng.nextInt(8)).map(_ => alphabet(rng.nextInt(alphabet.length)))
      .mkString.replace("\n", "").replace("\r", "") // quotes may not span lines
    def quote(f: String) =
      if (f.exists(c => c == ',' || c == '"')) "\"" + f.replace("\"", "\"\"") + "\""
      else f
    for (_ <- 1 to 500) {
      val fields = (0 to rng.nextInt(6)).map(_ => field())
      val line = fields.map(quote).mkString(",")
      assert(HttpLines.splitCsv(line, ',').toSeq === fields, s"line=<$line>")
    }
  }

  test("timestamp forms: offset, zone-less, and space-separated WITH offset all parse") {
    // the Postgres-dump form '2025-01-01 00:00:00+00' used to escape
    // both parse branches (space broke OffsetDateTime, offset broke
    // LocalDateTime) — the ' '->'T' normalization must come first
    val csv = "id,ts\n" +
      "1,2025-01-01T00:00:00+00:00\n" +
      "2,2025-01-01T01:00:00\n" +
      "3,2025-01-01 02:00:00\n" +
      "4,2025-01-01 03:00:00+00\n" +
      "5,2025-01-01T04:00:00Z\n"
    Files.write(stageDir.resolve("ts_forms.csv"), csv.getBytes("UTF-8"))
    val got = spark.read.format("graft_http")
      .schema(StructType(Seq(
        StructField("id", LongType),
        StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .option("url", server.url("ts_forms.csv")).load()
      .orderBy(col("id")).collect()
    assert(got.length === 5)
    val hours = got.map(r => r.getTimestamp(1).toInstant
      .atZone(java.time.ZoneOffset.UTC).getHour)
    assert(hours.toSeq === Seq(0, 1, 2, 3, 4),
      "every form parses to its UTC wall-clock hour")
  }

  test("probe: 206 Content-Range yields total; no-range server yields None") {
    val (file, _) = staged
    val total = Files.size(stageDir.resolve(file))
    assert(HttpLines.probe(server.url(file)) === Some(total))
    val dumb = new RangeFileServer(stageDir, noRanges = true)
    try assert(HttpLines.probe(dumb.url(file)) === None)
    finally dumb.stop()
  }
}
