package graft.io

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** FOREIGN-file interop for the graft_avro reader: files written
  * directly through the Avro API with shapes [[Avro.write]] never
  * produces — [T, null] unions (null-second), non-null defaults,
  * enum/fixed fields, timestamp-millis, nested maps, multi-branch
  * unions — plus the loud failure contracts (truncated container). A
  * real
  * Avro lake is written by other tools; the reader's contract is the
  * FORMAT, not our writer's conventions. */
class AvroInteropSpec extends AnyFunSuite with SparkTestBase {

  private def writeForeign(path: String, schema: ASchema)
                          (rows: ASchema => Seq[GenericRecord]): Unit = {
    val dir = new File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir, "part-00000.avro"))
    try rows(schema).foreach(w.append) finally w.close()
  }

  test("foreign file: [T, null] unions, non-null defaults, enum, fixed, timestamp-millis") {
    val schema = SchemaBuilder.record("ext_row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      // null-SECOND union with a non-null default — the shape our
      // writer never emits but other tools do
      .name("v").`type`(ASchema.createUnion(
        ASchema.create(ASchema.Type.INT), ASchema.create(ASchema.Type.NULL)))
      .withDefault(7)
      .name("color").`type`().enumeration("color_e").symbols("RED", "BLUE")
      .noDefault()
      .name("tag").`type`().fixed("tag_f").size(3).noDefault()
      .name("ts").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(ASchema.create(ASchema.Type.LONG))).noDefault()
      .name("attrs").`type`().map().values().stringType().noDefault()
      .endRecord()
    val out = "/tmp/graft_test/avro_foreign"
    writeForeign(out, schema) { s =>
      val enumS = s.getField("color").schema()
      val fixedS = s.getField("tag").schema()
      Seq(
        { val r = new GenericData.Record(s)
          r.put("k", 1L); r.put("v", 42)
          r.put("color", new GenericData.EnumSymbol(enumS, "RED"))
          r.put("tag", new GenericData.Fixed(fixedS, Array[Byte](1, 2, 3)))
          r.put("ts", 86400000L) // 1970-01-02T00:00:00Z in millis
          r.put("attrs", Map("a" -> "x", "b" -> "y").asJava); r },
        { val r = new GenericData.Record(s)
          r.put("k", 2L); r.put("v", null)
          r.put("color", new GenericData.EnumSymbol(enumS, "BLUE"))
          r.put("tag", new GenericData.Fixed(fixedS, Array[Byte](9, 9, 9)))
          r.put("ts", 1L)
          r.put("attrs", Map.empty[String, String].asJava); r })
    }
    val df = spark.read.format("graft_avro").load(out)
    import org.apache.spark.sql.functions._
    val got = df.select(col("k"), col("v"), col("color"), hex(col("tag")),
        col("ts").cast("long").as("ts_s"), // seconds via Spark cast
        expr("attrs['a']"))
      .collect().map(_.toString).toSet
    // millis upcast x1000 to micros internally -> cast to long gives
    // SECONDS: 86400000 ms = 86400 s
    assert(got === Set("[1,42,RED,010203,86400,x]", "[2,null,BLUE,090909,0,null]"),
      got.toString)
    // pruning a [int, null]-union column still works (branch order
    // preserved in the reader schema, default validated)
    assert(df.select("v").collect().map(r =>
      if (r.isNullAt(0)) -1 else r.getInt(0)).toSet === Set(42, -1))
  }

  test("foreign file: nested map of records prunes inside the map value") {
    val schema = SchemaBuilder.record("doc").namespace("ext").fields()
      .name("id").`type`().longType().noDefault()
      .name("sections").`type`().map().values(
        SchemaBuilder.record("section").namespace("ext").fields()
          .name("title").`type`().stringType().noDefault()
          .name("wordcount").`type`().intType().noDefault()
          .endRecord()).noDefault()
      .endRecord()
    val out = "/tmp/graft_test/avro_foreign_map"
    writeForeign(out, schema) { s =>
      val secS = s.getField("sections").schema().getValueType
      Seq({ val r = new GenericData.Record(s)
        r.put("id", 1L)
        val sec = new GenericData.Record(secS)
        sec.put("title", "intro"); sec.put("wordcount", 120)
        r.put("sections", Map("s1" -> sec).asJava); r })
    }
    import org.apache.spark.sql.functions._
    val df = spark.read.format("graft_avro").load(out)
      .select(col("id"), expr("sections['s1'].wordcount").as("wc"))
    assert(df.collect().map(_.toString).toSet === Set("[1,120]"))
  }

  test("truncated container fails LOUDLY at any cut point, never as silent row loss") {
    // Avro's OWN DataFileReader treats truncation as a shorter file
    // (hasNext catches the mid-block EOF; probed on avro 1.12: a file
    // cut 10 bytes short silently yields 1209 of 2000 rows) — the
    // graft_avro tail-sync guard must surface it instead. A valid
    // container's last 16 bytes are its sync marker; every cut below
    // lands mid-block, so the guard trips.
    val schema = SchemaBuilder.record("r").fields()
      .name("k").`type`().longType().noDefault()
      .name("s").`type`().stringType().noDefault().endRecord()
    val out = "/tmp/graft_test/avro_corrupt"
    writeForeign(out, schema) { s =>
      (1L to 2000L).map { i =>
        val r = new GenericData.Record(s)
        r.put("k", i); r.put("s", "x" * 50); r
      }
    }
    val f = new File(out, "part-00000.avro")
    val full = java.nio.file.Files.readAllBytes(f.toPath)
    // intact file reads completely (the guard does not false-trip)
    assert(spark.read.format("graft_avro").load(out).count() === 2000L)
    for (cut <- Seq(full.length / 2, full.length - 10, full.length - 1)) {
      java.nio.file.Files.write(f.toPath, full.take(cut))
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft_avro").load(out).count()
      }
      assert(e.getMessage.contains("sync marker") ||
        String.valueOf(e.getCause).contains("sync marker"),
        s"cut=$cut must trip the tail-sync guard: $e")
    }
    // ...and under byte-range splitting too (only the tail split owns
    // the check; truncation must still fail the scan, and it must be
    // THIS guard that trips — a generic SparkException would also
    // pass if a regression un-marked the tail split and something
    // else failed)
    java.nio.file.Files.write(f.toPath, full.take(full.length / 2))
    val se = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft_avro").option("splitBytes", 4 * 1024)
        .load(out).count()
    }
    assert(se.getMessage.contains("sync marker") ||
      String.valueOf(se.getCause).contains("sync marker"),
      s"the tail split must run the guard under splitting: $se")
  }

  test("foreign file: multi-branch unions read as member-structs; numeric unions widen") {
    // round 14 — legal Avro real lakes contain: [null, int, string]
    // reads as nullable struct<member0 int, member1 string> (exactly
    // one member non-null per value, branch resolved per datum),
    // {int,long} widens to long, {float,double,null} to nullable
    // double. Record branches resolve by full name.
    val recA = SchemaBuilder.record("variant_a").namespace("ext").fields()
      .name("x").`type`().intType().noDefault()
      .name("y").`type`().stringType().noDefault().endRecord()
    val multi = SchemaBuilder.record("m").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("u").`type`(ASchema.createUnion(
        ASchema.create(ASchema.Type.NULL),
        ASchema.create(ASchema.Type.INT),
        ASchema.create(ASchema.Type.STRING))).withDefault(null)
      .name("n").`type`(ASchema.createUnion(
        ASchema.create(ASchema.Type.INT),
        ASchema.create(ASchema.Type.LONG))).noDefault()
      .name("d").`type`(ASchema.createUnion(
        ASchema.create(ASchema.Type.FLOAT),
        ASchema.create(ASchema.Type.DOUBLE),
        ASchema.create(ASchema.Type.NULL))).noDefault()
      .name("rv").`type`(ASchema.createUnion(
        recA, ASchema.create(ASchema.Type.STRING))).noDefault()
      .endRecord()
    val out = "/tmp/graft_test/avro_multiunion"
    writeForeign(out, multi) { s =>
      val aS = s.getField("rv").schema().getTypes.get(0)
      Seq(
        { val r = new GenericData.Record(s)
          r.put("k", 1L); r.put("u", 42); r.put("n", 7)
          r.put("d", 1.5f)
          val a = new GenericData.Record(aS); a.put("x", 10); a.put("y", "ten"); r.put("rv", a); r },
        { val r = new GenericData.Record(s)
          r.put("k", 2L); r.put("u", "hi"); r.put("n", 1L << 40)
          r.put("d", null); r.put("rv", "plain"); r },
        { val r = new GenericData.Record(s)
          r.put("k", 3L); r.put("u", null); r.put("n", 3)
          r.put("d", 2.5d)
          val a = new GenericData.Record(aS); a.put("x", -1); a.put("y", "neg"); r.put("rv", a); r })
    }
    val df = spark.read.format("graft_avro").load(out)
    import org.apache.spark.sql.functions._
    // float 1.5f widens exactly; (1<<40) exceeds int range, proving
    // the long branch flowed through the promotion
    val got = df.select(col("k"), col("u.member0"), col("u.member1"),
        col("n"), col("d"), col("rv.member0.x"), col("rv.member1"))
      .collect().map(_.toString).toSet
    assert(got === Set(
      s"[1,42,null,7,1.5,10,null]",
      s"[2,null,hi,${1L << 40},null,null,plain]",
      s"[3,null,null,3,2.5,-1,null]"), got.toString)
    // nested pruning THROUGH the member-struct: projecting one member
    // still decodes datums of the other branch (as null)
    assert(df.select(col("u.member1").as("m1")).collect()
      .map(r => if (r.isNullAt(0)) "-" else r.getString(0)).sorted.toSeq ===
      Seq("-", "-", "hi"))
    // field-subset pruning INSIDE a multi-branch record member: the
    // reader decodes the UNPRUNED branch (pruning stops at the union),
    // so the struct converter must resolve fields BY NAME — a
    // positional zip paired the pruned {y} against the full {x, y} and
    // silently returned x's values as y (round-14 review pin)
    assert(df.select(col("rv.member0.y").as("yy")).collect()
      .map(r => if (r.isNullAt(0)) "-" else r.getString(0)).sorted.toSeq ===
      Seq("-", "neg", "ten"))
  }

  test("multi-branch unions round-trip under a seeded foreign-file fuzz (branch choice per row)") {
    // random unions over distinct branch kinds, rows picking random
    // branches — the EXPECTED values come from the test's own model of
    // the documented spark-avro mapping (promotion pairs widen, other
    // multi-branch sets read as member-structs with exactly one member
    // set), independent of the reader's implementation
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.util.Random
    sealed trait Kind
    case object KInt extends Kind; case object KLong extends Kind
    case object KStr extends Kind; case object KBool extends Kind
    case object KDouble extends Kind; case object KFloat extends Kind
    case object KRec extends Kind; case object KNull extends Kind
    val allKinds = IndexedSeq(KInt, KLong, KStr, KBool, KDouble, KFloat, KRec, KNull)
    def avroOf(k: Kind, recName: String): ASchema = k match {
      case KInt => ASchema.create(ASchema.Type.INT)
      case KLong => ASchema.create(ASchema.Type.LONG)
      case KStr => ASchema.create(ASchema.Type.STRING)
      case KBool => ASchema.create(ASchema.Type.BOOLEAN)
      case KDouble => ASchema.create(ASchema.Type.DOUBLE)
      case KFloat => ASchema.create(ASchema.Type.FLOAT)
      case KRec => SchemaBuilder.record(recName).namespace("fz").fields()
        .name("x").`type`().intType().noDefault().endRecord()
      case KNull => ASchema.create(ASchema.Type.NULL)
    }
    def sparkOf(k: Kind): DataType = k match {
      case KInt => IntegerType; case KLong => LongType
      case KStr => StringType; case KBool => BooleanType
      case KDouble => DoubleType; case KFloat => FloatType
      case KRec => StructType(Seq(StructField("x", IntegerType, nullable = false)))
      case KNull => fail("null has no spark type")
    }
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      // 2-4 DISTINCT kinds, at least one non-null
      val kinds = rnd.shuffle(allKinds).take(2 + rnd.nextInt(3))
      val nonNull = kinds.filterNot(_ == KNull)
      if (nonNull.nonEmpty && kinds.size >= 2) {
        val branches = kinds.zipWithIndex.map { case (k, i) => avroOf(k, s"rec_${seed}_$i") }
        val schema = SchemaBuilder.record(s"row_$seed").namespace("fz").fields()
          .name("id").`type`().longType().noDefault()
          .name("u").`type`(ASchema.createUnion(branches.asJava)).noDefault()
          .endRecord()
        // the documented mapping, modeled here independently
        val expType: DataType = nonNull match {
          case Seq(k) => sparkOf(k)
          case s2 if s2.toSet == Set[Kind](KInt, KLong) => LongType
          case s2 if s2.toSet == Set[Kind](KFloat, KDouble) => DoubleType
          case many => StructType(many.zipWithIndex.map { case (k, i) =>
            StructField(s"member$i", sparkOf(k), nullable = true) })
        }
        def rawOf(k: Kind, rnd: Random, recSchema: ASchema): (AnyRef, Any) = k match {
          case KInt => val v = rnd.nextInt(); (Int.box(v), v)
          case KLong => val v = rnd.nextLong(); (Long.box(v), v)
          case KStr => val v = "s" + rnd.nextInt(100); (v, v)
          case KBool => val v = rnd.nextBoolean(); (Boolean.box(v), v)
          case KDouble => val v = rnd.nextLong() / 1e3; (Double.box(v), v)
          case KFloat => val v = (rnd.nextInt() / 1e2).toFloat; (Float.box(v), v)
          case KRec =>
            val x = rnd.nextInt()
            val r = new GenericData.Record(recSchema); r.put("x", x)
            (r, Row(x))
          case KNull => (null, null)
        }
        val picks = (1 to 3 + rnd.nextInt(6)).map { i =>
          val bi = rnd.nextInt(kinds.size)
          (i.toLong, bi, kinds(bi))
        }
        val out = s"/tmp/graft_test/avro_union_fuzz_$seed"
        var expected = Seq.empty[(Long, Any)]
        writeForeign(out, schema) { sch =>
          val uS = sch.getField("u").schema()
          picks.map { case (id, bi, k) =>
            val (raw, model) = rawOf(k, new Random(id * 31 + seed), uS.getTypes.get(bi))
            val exp: Any = (k, expType) match {
              case (KNull, _) => null
              case (_, LongType) if k == KInt => model.asInstanceOf[Int].toLong
              case (_, LongType) => model
              case (_, DoubleType) if k == KFloat =>
                model.asInstanceOf[Float].toDouble
              case (_, DoubleType) => model
              case (_, st: StructType) =>
                val ord = nonNull.indexOf(k)
                Row.fromSeq(st.fields.indices.map(j => if (j == ord) model else null))
              case _ => model
            }
            expected = expected :+ (id -> exp)
            val r = new GenericData.Record(sch)
            r.put("id", id); r.put("u", raw); r
          }
        }
        val df = spark.read.format("graft_avro").load(out)
        assert(df.schema("u").dataType === expType,
          s"seed $seed kinds $kinds: schema mismatch")
        val got = df.collect().map(r => r.getLong(0) -> r.get(1)).sortBy(_._1).toSeq
        // floats widen exactly; Rows/primitives compare structurally
        assert(got === expected.sortBy(_._1),
          s"seed $seed kinds $kinds: $got != $expected")
      }
    }
  }

  // ---- round 15: schema evolution across mixed-generation dirs ----

  private def writeGen(dir: String, fileName: String, schema: ASchema)
                      (rows: ASchema => Seq[GenericRecord]): Unit = {
    new File(dir).mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir, fileName))
    try rows(schema).foreach(w.append) finally w.close()
  }

  test("evolution: a field added WITH a default back-fills older generations (non-null and null defaults)") {
    val out = "/tmp/graft_test/avro_evo_add"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val genA = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("v").`type`().stringType().noDefault()
      .endRecord()
    val genB = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("v").`type`().stringType().noDefault()
      .name("score").`type`().intType().intDefault(7) // added, non-null default
      .name("note").`type`().unionOf().nullType().and().stringType()
      .endUnion().nullDefault() // added, null default
      .endRecord()
    writeGen(out, "gen-a.avro", genA) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 1L); r.put("v", "old1"); r },
      { val r = new GenericData.Record(s); r.put("k", 2L); r.put("v", "old2"); r }) }
    writeGen(out, "gen-b.avro", genB) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 3L); r.put("v", "new3")
        r.put("score", 30); r.put("note", "n3"); r }) }
    val df = spark.read.format("graft_avro").load(out)
    // the elected dataset schema is the SUPERSET generation
    assert(df.columns.toSeq === Seq("k", "v", "score", "note"))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.get(2), r.get(3))).sortBy(_._1).toSeq
    assert(got === Seq((1L, "old1", 7, null), (2L, "old2", 7, null),
      (3L, "new3", 30, "n3")),
      s"older generations must back-fill the declared defaults, got $got")
    // pruning a default-filled column alone still works per-file
    assert(df.select("score").collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(7, 7, 30))
  }

  test("evolution: a renamed field reads through reader ALIASES across generations") {
    val out = "/tmp/graft_test/avro_evo_alias"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val genA = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("old_name").`type`().doubleType().noDefault()
      .endRecord()
    // gen B renamed old_name -> new_name, declaring the alias
    val genB = {
      val f = new ASchema.Field("new_name",
        ASchema.create(ASchema.Type.DOUBLE), null, null.asInstanceOf[Object])
      f.addAlias("old_name")
      val kf = new ASchema.Field("k", ASchema.create(ASchema.Type.LONG),
        null, null.asInstanceOf[Object])
      ASchema.createRecord("row", null, "ext", false,
        java.util.List.of(kf, f))
    }
    writeGen(out, "gen-a.avro", genA) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 1L); r.put("old_name", 1.5); r }) }
    writeGen(out, "gen-b.avro", genB) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 2L); r.put("new_name", 2.5); r }) }
    val df = spark.read.format("graft_avro").load(out)
    // the aliased generation is the only one able to read BOTH
    assert(df.columns.toSeq === Seq("k", "new_name"))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 1.5), (2L, 2.5)),
      s"the old generation's old_name must read as new_name via the alias, got $got")
  }

  test("evolution: a DROPPED required field elects the surviving generation's schema") {
    val out = "/tmp/graft_test/avro_evo_drop"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val genA = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("junk").`type`().stringType().noDefault() // no default -> A cannot be read FROM B
      .endRecord()
    val genB = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", genA) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 1L); r.put("junk", "x"); r }) }
    writeGen(out, "gen-b.avro", genB) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 2L); r }) }
    val df = spark.read.format("graft_avro").load(out)
    // only gen B can read every generation (reading B with A's schema
    // would need a junk default); the dropped column disappears and
    // BOTH generations' rows survive
    assert(df.columns.toSeq === Seq("k"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("evolution: an INCOMPATIBLE generation mix fails loudly at schema time with the report") {
    val out = "/tmp/graft_test/avro_evo_bad"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val genA = SchemaBuilder.record("row").namespace("ext").fields()
      .name("x").`type`().intType().noDefault()
      .endRecord()
    val genB = SchemaBuilder.record("row").namespace("ext").fields()
      .name("x").`type`().stringType().noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", genA) { s => Seq(
      { val r = new GenericData.Record(s); r.put("x", 1); r }) }
    writeGen(out, "gen-b.avro", genB) { s => Seq(
      { val r = new GenericData.Record(s); r.put("x", "one"); r }) }
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft_avro").load(out).schema
    }
    assert(e.getMessage.contains("NO schema can read every") &&
      e.getMessage.contains("generation"), e.getMessage)
  }

  test("evolution: numeric promotion across generations decodes natively (int widens to long)") {
    // the review finding on the round-15 evolution work: the election
    // permits Avro's int->long promotion, so the reader leaf must
    // carry the PROMOTED physical type — keeping the writer's int
    // leaf hands the converter an Integer for a LongType slot and
    // crashes at row access
    val out = "/tmp/graft_test/avro_evo_promote"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val genA = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("n").`type`().intType().noDefault()
      .endRecord()
    val genB = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("n").`type`().longType().noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", genA) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 1L); r.put("n", 41); r }) }
    writeGen(out, "gen-b.avro", genB) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 2L)
        r.put("n", 9007199254740993L); r }) } // past double precision
    val df = spark.read.format("graft_avro").load(out)
    assert(df.schema("n").dataType === org.apache.spark.sql.types.LongType)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 41L), (2L, 9007199254740993L)),
      s"the int generation must decode PROMOTED to long, got $got")
  }

  test("evolution: mutually-readable generations MERGE instead of silently dropping a column") {
    // {k, x default} + {k, y default}: each generation reads the
    // other, so a single-schema election would pick one and silently
    // lose the other's column — the merge-first rule keeps both,
    // default-filling each generation's missing field
    val out = "/tmp/graft_test/avro_evo_merge"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val genA = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("x").`type`().intType().intDefault(0)
      .endRecord()
    val genB = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("y").`type`().intType().intDefault(-1)
      .endRecord()
    writeGen(out, "gen-a.avro", genA) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 1L); r.put("x", 10); r }) }
    writeGen(out, "gen-b.avro", genB) { s => Seq(
      { val r = new GenericData.Record(s); r.put("k", 2L); r.put("y", 20); r }) }
    val df = spark.read.format("graft_avro").load(out)
    assert(df.columns.sorted.toSeq === Seq("k", "x", "y"),
      "both generations' columns must survive the merge")
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 10, -1), (2L, 0, 20)),
      s"each generation must default-fill the field it lacks, got $got")
  }

  // ---- round 15 (late): evolution INSIDE nested records — the §9
  // nested-contract residue. The dataset subtree now rides the
  // pruning recursion, so added-with-default / renamed-via-alias
  // resolve at every record depth, not just the top level. ----

  test("evolution: a field added WITH a default inside a NESTED record back-fills older generations") {
    val out = "/tmp/graft_test/avro_evo_nested_add"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val infoA = SchemaBuilder.record("info").namespace("ext").fields()
      .name("a").`type`().stringType().noDefault().endRecord()
    val infoB = SchemaBuilder.record("info").namespace("ext").fields()
      .name("a").`type`().stringType().noDefault()
      .name("score").`type`().intType().intDefault(7)
      .endRecord()
    def gen(info: ASchema) = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("info").`type`(info).noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", gen(infoA)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoA); i.put("a", "a1")
      r.put("k", 1L); r.put("info", i); r }) }
    writeGen(out, "gen-b.avro", gen(infoB)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoB); i.put("a", "b2"); i.put("score", 30)
      r.put("k", 2L); r.put("info", i); r }) }
    val df = spark.read.format("graft_avro").load(out)
    // the merged election carries the newest nested definition
    assert(df.select("info.score").schema.head.dataType ===
      org.apache.spark.sql.types.IntegerType)
    val got = df.selectExpr("k", "info.a", "info.score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "a1", 7), (2L, "b2", 30)),
      s"the old generation's nested record must back-fill the default, got $got")
    // nested pruning to ONLY the default-filled subfield still
    // resolves per-file (the old generation's record has no such
    // field to prune TO — the dataset subtree supplies it)
    assert(df.select("info.score").collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(7, 30))
  }

  test("evolution: a nested field RENAMED via reader alias reads both generations") {
    val out = "/tmp/graft_test/avro_evo_nested_alias"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val infoA = SchemaBuilder.record("info").namespace("ext").fields()
      .name("old_n").`type`().doubleType().noDefault().endRecord()
    val infoB = {
      val f = new ASchema.Field("new_n",
        ASchema.create(ASchema.Type.DOUBLE), null, null.asInstanceOf[Object])
      f.addAlias("old_n")
      ASchema.createRecord("info", null, "ext", false, java.util.List.of(f))
    }
    def gen(info: ASchema) = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("info").`type`(info).noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", gen(infoA)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoA); i.put("old_n", 1.5)
      r.put("k", 1L); r.put("info", i); r }) }
    writeGen(out, "gen-b.avro", gen(infoB)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoB); i.put("new_n", 2.5)
      r.put("k", 2L); r.put("info", i); r }) }
    val df = spark.read.format("graft_avro").load(out)
    val got = df.selectExpr("k", "info.new_n")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 1.5), (2L, 2.5)),
      s"the old generation's nested old_n must read as new_n via the alias, got $got")
  }

  test("evolution: nested evolution reaches through ARRAY elements and nullable union wrappers") {
    val out = "/tmp/graft_test/avro_evo_nested_array"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val itemA = SchemaBuilder.record("item").namespace("ext").fields()
      .name("a").`type`().stringType().noDefault().endRecord()
    val itemB = SchemaBuilder.record("item").namespace("ext").fields()
      .name("a").`type`().stringType().noDefault()
      .name("n").`type`().intType().intDefault(1)
      .endRecord()
    // the array field itself is a NULLABLE union, exercising the
    // dataset-subtree unwrap at the union level of the recursion
    def gen(item: ASchema) = {
      val arr = ASchema.createUnion(ASchema.create(ASchema.Type.NULL),
        ASchema.createArray(item))
      SchemaBuilder.record("row").namespace("ext").fields()
        .name("k").`type`().longType().noDefault()
        .name("items").`type`(arr).withDefault(null)
        .endRecord()
    }
    writeGen(out, "gen-a.avro", gen(itemA)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(itemA); i.put("a", "x")
      r.put("k", 1L)
      r.put("items", java.util.List.of(i.asInstanceOf[AnyRef])); r }) }
    writeGen(out, "gen-b.avro", gen(itemB)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(itemB); i.put("a", "y"); i.put("n", 9)
      r.put("k", 2L)
      r.put("items", java.util.List.of(i.asInstanceOf[AnyRef])); r }) }
    val df = spark.read.format("graft_avro").load(out)
    val got = df.selectExpr("k", "items[0].a", "items[0].n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "x", 1), (2L, "y", 9)),
      s"array-element records must default-fill across generations, got $got")
  }

  test("evolution: generations adding DIFFERENT defaulted nested subfields merge losslessly") {
    // {info{a, x default}} + {info{a, y default}}: taking either
    // generation's nested definition wholesale would silently drop
    // the other's subfield — the recursive merge keeps both, each
    // generation default-filling the subfield it lacks
    val out = "/tmp/graft_test/avro_evo_nested_merge"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val infoA = SchemaBuilder.record("info").namespace("ext").fields()
      .name("a").`type`().stringType().noDefault()
      .name("x").`type`().intType().intDefault(0)
      .endRecord()
    val infoB = SchemaBuilder.record("info").namespace("ext").fields()
      .name("a").`type`().stringType().noDefault()
      .name("y").`type`().intType().intDefault(-1)
      .endRecord()
    def gen(info: ASchema) = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("info").`type`(info).noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", gen(infoA)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoA); i.put("a", "a1"); i.put("x", 10)
      r.put("k", 1L); r.put("info", i); r }) }
    writeGen(out, "gen-b.avro", gen(infoB)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoB); i.put("a", "b2"); i.put("y", 20)
      r.put("k", 2L); r.put("info", i); r }) }
    val df = spark.read.format("graft_avro").load(out)
    assert(df.select("info.*").columns.sorted.toSeq === Seq("a", "x", "y"),
      "both generations' nested subfields must survive the merge")
    val got = df.selectExpr("k", "info.a", "info.x", "info.y")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "a1", 10, -1), (2L, "b2", 0, 20)),
      s"each generation must default-fill the nested subfield it lacks, got $got")
  }

  test("evolution: a NESTED type conflict still fails loudly at schema time") {
    val out = "/tmp/graft_test/avro_evo_nested_bad"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val infoA = SchemaBuilder.record("info").namespace("ext").fields()
      .name("x").`type`().intType().noDefault().endRecord()
    val infoB = SchemaBuilder.record("info").namespace("ext").fields()
      .name("x").`type`().stringType().noDefault().endRecord()
    def gen(info: ASchema) = SchemaBuilder.record("row").namespace("ext").fields()
      .name("info").`type`(info).noDefault()
      .endRecord()
    writeGen(out, "gen-a.avro", gen(infoA)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoA); i.put("x", 1)
      r.put("info", i); r }) }
    writeGen(out, "gen-b.avro", gen(infoB)) { s => Seq({
      val r = new GenericData.Record(s)
      val i = new GenericData.Record(infoB); i.put("x", "one")
      r.put("info", i); r }) }
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft_avro").load(out).schema
    }
    assert(e.getMessage.contains("NO schema can read every") &&
      e.getMessage.contains("generation"), e.getMessage)
  }

  test("evolution: decimal generations elect the COVERING type; a narrowing read refuses loudly") {
    import org.apache.spark.sql.types.{DecimalType => SDec}
    val out = "/tmp/graft_test/avro_evo_decimal"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    def decGen(p: Int, s: Int) = {
      val dec = org.apache.avro.LogicalTypes.decimal(p, s)
        .addToSchema(ASchema.create(ASchema.Type.BYTES))
      SchemaBuilder.record("row").namespace("ext").fields()
        .name("k").`type`().longType().noDefault()
        .name("amt").`type`(dec).noDefault()
        .endRecord()
    }
    def put(s: ASchema, k: Long, unscaled: Long): GenericRecord = {
      val r = new GenericData.Record(s)
      r.put("k", k)
      r.put("amt", java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(unscaled).toByteArray))
      r
    }
    // gen A decimal(12,4), gen B decimal(10,2): newer-wins would
    // elect the NARROWER (10,2) — SchemaCompatibility ignores logical
    // types — and then reject A's 4-scale values at read time; the
    // covering merge elects (12,4): 8 integer digits + 4 scale
    writeGen(out, "gen-a.avro", decGen(12, 4)) { s =>
      Seq(put(s, 1L, 12345L)) } // 1.2345
    writeGen(out, "gen-b.avro", decGen(10, 2)) { s =>
      Seq(put(s, 2L, 250L)) }   // 2.50
    val df = spark.read.format("graft_avro").load(out)
    assert(df.schema("amt").dataType === SDec(12, 4),
      "the election must cover both decimal generations")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toPlainString)).sortBy(_._1).toSeq
    assert(got === Seq((1L, "1.2345"), (2L, "2.5000")), s"got $got")
    // the converter-level guard: a reader type too narrow for the
    // value refuses loudly instead of HALF_UP rounding
    val writerDec = org.apache.avro.LogicalTypes.decimal(12, 4)
      .addToSchema(ASchema.create(ASchema.Type.BYTES))
    val conv = AvroConversions.readConverter(SDec(10, 2), writerDec)
    val narrow = intercept[IllegalArgumentException] {
      conv(java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(12345L).toByteArray))
    }
    assert(narrow.getMessage.contains("without rounding"), narrow.getMessage)
    // widening the scale is fine (a covering read of the 2-scale gen)
    val wide = AvroConversions.readConverter(SDec(12, 4),
      org.apache.avro.LogicalTypes.decimal(10, 2)
        .addToSchema(ASchema.create(ASchema.Type.BYTES)))
    assert(wide(java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(250L).toByteArray))
      .asInstanceOf[org.apache.spark.sql.types.Decimal]
      .toJavaBigDecimal.toPlainString === "2.5000")
  }

  test("evolution: covering-decimal merge sees through MIXED nullability and FIXED pairs") {
    import org.apache.spark.sql.types.{DecimalType => SDec}
    // (1) mixed nullability: non-nullable decimal(12,4) + nullable
    // decimal(10,2) — the covering reader is NULLABLE decimal(12,4);
    // electing the narrower (what a bare newer-wins leaf rule did)
    // would loud-reject generation A's 4-scale values at read time
    val out = "/tmp/graft_test/avro_evo_decimal_mixed"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    val decA = org.apache.avro.LogicalTypes.decimal(12, 4)
      .addToSchema(ASchema.create(ASchema.Type.BYTES))
    val decB = ASchema.createUnion(ASchema.create(ASchema.Type.NULL),
      org.apache.avro.LogicalTypes.decimal(10, 2)
        .addToSchema(ASchema.create(ASchema.Type.BYTES)))
    def gen(dec: ASchema) = {
      val kf = new ASchema.Field("k", ASchema.create(ASchema.Type.LONG),
        null, null.asInstanceOf[Object])
      val af = new ASchema.Field("amt", dec, null,
        if (dec.getType == ASchema.Type.UNION) ASchema.Field.NULL_DEFAULT_VALUE
        else null.asInstanceOf[Object])
      ASchema.createRecord("row", null, "ext", false, java.util.List.of(kf, af))
    }
    def buf(unscaled: Long) = java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(unscaled).toByteArray)
    writeGen(out, "gen-a.avro", gen(decA)) { s => Seq({
      val r = new GenericData.Record(s)
      r.put("k", 1L); r.put("amt", buf(12345L)); r }) } // 1.2345
    writeGen(out, "gen-b.avro", gen(decB)) { s => Seq({
      val r = new GenericData.Record(s)
      r.put("k", 2L); r.put("amt", buf(250L)); r },     // 2.50
      { val r = new GenericData.Record(s)
        r.put("k", 3L); r.put("amt", null); r }) }
    val df = spark.read.format("graft_avro").load(out)
    assert(df.schema("amt").dataType === SDec(12, 4) && df.schema("amt").nullable,
      s"the covering reader must be nullable decimal(12,4), got ${df.schema("amt")}")
    val got = df.collect().map(r => (r.getLong(0),
      Option(r.getDecimal(1)).map(_.toPlainString).orNull)).sortBy(_._1).toSeq
    assert(got === Seq((1L, "1.2345"), (2L, "2.5000"), (3L, null)), s"got $got")

    // (2) same-name same-size FIXED decimals merge to the covering
    // type too — fixed-fixed resolution is COMPATIBLE, so newer-wins
    // would elect the narrow one exactly like the bytes case
    val out2 = "/tmp/graft_test/avro_evo_decimal_fixed"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out2))
    def fixedDec(p: Int, s: Int) = org.apache.avro.LogicalTypes.decimal(p, s)
      .addToSchema(ASchema.createFixed("amt_f", null, "ext", 8))
    def genF(dec: ASchema) = {
      val kf = new ASchema.Field("k", ASchema.create(ASchema.Type.LONG),
        null, null.asInstanceOf[Object])
      val af = new ASchema.Field("amt", dec, null, null.asInstanceOf[Object])
      ASchema.createRecord("row", null, "ext", false, java.util.List.of(kf, af))
    }
    def fix(s: ASchema, unscaled: Long): GenericData.Fixed = {
      val bytes = new Array[Byte](8)
      var v = unscaled
      for (i <- 7 to 0 by -1) { bytes(i) = (v & 0xff).toByte; v >>= 8 }
      new GenericData.Fixed(s, bytes)
    }
    writeGen(out2, "gen-a.avro", genF(fixedDec(12, 4))) { s => Seq({
      val r = new GenericData.Record(s)
      r.put("k", 1L); r.put("amt", fix(s.getField("amt").schema(), 12345L)); r }) }
    writeGen(out2, "gen-b.avro", genF(fixedDec(10, 2))) { s => Seq({
      val r = new GenericData.Record(s)
      r.put("k", 2L); r.put("amt", fix(s.getField("amt").schema(), 250L)); r }) }
    val df2 = spark.read.format("graft_avro").load(out2)
    assert(df2.schema("amt").dataType === SDec(12, 4),
      s"fixed generations must elect the covering decimal, got ${df2.schema("amt")}")
    val got2 = df2.collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toPlainString)).sortBy(_._1).toSeq
    assert(got2 === Seq((1L, "1.2345"), (2L, "2.5000")), s"got $got2")
  }

  test("evolution: seeded fuzz over add/rename/widen op combinations, top-level and nested") {
    // every subset of {add top-level defaulted, add nested defaulted,
    // rename nested via alias, widen top-level int->long} as a
    // two-generation directory; expectations computed independently
    // from the op set. Deterministic: seeds 0-15 enumerate the
    // subsets exactly once each.
    for (mask <- 0 until 16) {
      val (addTop, addNested, renameNested, widenTop) =
        ((mask & 1) != 0, (mask & 2) != 0, (mask & 4) != 0, (mask & 8) != 0)
      val out = s"/tmp/graft_test/avro_evo_fuzz_$mask"
      org.apache.commons.io.FileUtils.deleteQuietly(new File(out))

      def infoSchema(newGen: Boolean): ASchema = {
        val fs = scala.collection.mutable.ListBuffer.empty[ASchema.Field]
        fs += new ASchema.Field("g0", ASchema.create(ASchema.Type.INT),
          null, null.asInstanceOf[Object])
        if (newGen && renameNested) {
          val f = new ASchema.Field("g1r", ASchema.create(ASchema.Type.STRING),
            null, null.asInstanceOf[Object])
          f.addAlias("g1")
          fs += f
        } else fs += new ASchema.Field("g1",
          ASchema.create(ASchema.Type.STRING), null, null.asInstanceOf[Object])
        if (newGen && addNested)
          fs += new ASchema.Field("g2", ASchema.create(ASchema.Type.INT),
            null, Integer.valueOf(-5))
        ASchema.createRecord("info", null, "ext", false, fs.toList.asJava)
      }
      def genSchema(newGen: Boolean): ASchema = {
        val fs = scala.collection.mutable.ListBuffer.empty[ASchema.Field]
        fs += new ASchema.Field("k", ASchema.create(ASchema.Type.LONG),
          null, null.asInstanceOf[Object])
        fs += new ASchema.Field("f0",
          ASchema.create(if (newGen && widenTop) ASchema.Type.LONG
                         else ASchema.Type.INT),
          null, null.asInstanceOf[Object])
        fs += new ASchema.Field("info", infoSchema(newGen), null,
          null.asInstanceOf[Object])
        if (newGen && addTop)
          fs += new ASchema.Field("f2", ASchema.create(ASchema.Type.INT),
            null, Integer.valueOf(100))
        ASchema.createRecord("row", null, "ext", false, fs.toList.asJava)
      }
      val (sa, sb) = (genSchema(false), genSchema(true))
      writeGen(out, "gen-a.avro", sa) { s => Seq({
        val r = new GenericData.Record(s)
        val i = new GenericData.Record(s.getField("info").schema())
        i.put("g0", 1); i.put("g1", "x")
        r.put("k", 1L); r.put("f0", 10); r.put("info", i); r }) }
      writeGen(out, "gen-b.avro", sb) { s => Seq({
        val r = new GenericData.Record(s)
        val i = new GenericData.Record(s.getField("info").schema())
        i.put("g0", 2); i.put(if (renameNested) "g1r" else "g1", "y")
        if (addNested) i.put("g2", 7)
        r.put("k", 2L)
        r.put("f0", if (widenTop) java.lang.Long.valueOf(20L)
                    else Integer.valueOf(20))
        if (addTop) r.put("f2", 200)
        r.put("info", i); r }) }

      val df = spark.read.format("graft_avro").load(out)
      val g1name = if (renameNested) "g1r" else "g1"
      val expectTop = Seq("k", "f0", "info") ++ (if (addTop) Seq("f2") else Nil)
      assert(df.columns.sorted.toSeq === expectTop.sorted,
        s"mask $mask: top-level columns ${df.columns.toSeq}")
      val expectNested = Seq("g0", g1name) ++ (if (addNested) Seq("g2") else Nil)
      assert(df.select("info.*").columns.sorted.toSeq === expectNested.sorted,
        s"mask $mask: nested columns")
      val cols = Seq("k", "cast(f0 as long) f0", s"info.$g1name", "info.g0") ++
        (if (addTop) Seq("f2") else Nil) ++ (if (addNested) Seq("info.g2") else Nil)
      val got = df.selectExpr(cols: _*).collect()
        .map(_.toSeq.toList).sortBy(_.head.asInstanceOf[Long].longValue()).toList
      val expA = List(1L, 10L, "x", 1) ++ (if (addTop) List(100) else Nil) ++
        (if (addNested) List(-5) else Nil)
      val expB = List(2L, 20L, "y", 2) ++ (if (addTop) List(200) else Nil) ++
        (if (addNested) List(7) else Nil)
      assert(got === List(expA, expB), s"mask $mask: $got")
    }
  }

  test("write: an unsupported codec refuses BEFORE touching the existing dataset") {
    import spark.implicits._
    val out = "/tmp/graft_test/avro_codec_guard"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    Avro.write(Seq((1L, "keep")).toDF("k", "v"), out)
    val e = intercept[IllegalArgumentException] {
      Avro.write(Seq((2L, "boom")).toDF("k", "v"), out, codec = "zstd")
    }
    assert(e.getMessage.contains("unsupported codec"), e.getMessage)
    // the refusal must predate the destructive delete — the original
    // dataset still reads intact
    val back = spark.read.format("graft_avro").load(out).collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "keep")),
      "a codec typo must not destroy the existing dataset")
  }

  test("election: a corrupt file fails with the underlying error, not a pool ExecutionException") {
    import spark.implicits._
    val out = "/tmp/graft_test/avro_corrupt_election"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(out))
    Avro.write(Seq((1L, "ok")).toDF("k", "v"), out)
    val bad = new java.io.FileOutputStream(new File(out, "junk.avro"))
    try bad.write("this is not avro".getBytes) finally bad.close()
    val e = intercept[Throwable] {
      spark.read.format("graft_avro").load(out).schema
    }
    assert(!e.isInstanceOf[java.util.concurrent.ExecutionException],
      s"the pool wrapper must be unwrapped, got ${e.getClass}")
  }

  test("round-15 hardening: decimal logical type, loud codec/splitBytes, merge reparse guard, multi-path load") {
    import org.apache.spark.sql.types.{DecimalType => SDec}
    // (1) decimal logical type BOTH directions: engine write of a
    // DecimalType column produces bytes+decimal avro, reads back
    // value-exact; a FOREIGN fixed-backed decimal reads as a number,
    // never raw unscaled bytes
    val out = "/tmp/graft_test/avro_decimal"
    import spark.implicits._
    val df = Seq((1L, BigDecimal("12345.6789")), (2L, BigDecimal("-0.0001")),
      (3L, null.asInstanceOf[BigDecimal]))
      .toDF("k", "d").select($"k", $"d".cast(SDec(12, 4)).as("d"))
    Avro.write(df, out)
    val back = spark.read.format("graft_avro").load(out)
    assert(back.schema("d").dataType === SDec(12, 4))
    val got = back.collect().map(r => (r.getLong(0), Option(r.getDecimal(1))
      .map(_.toPlainString).orNull)).sortBy(_._1).toSeq
    assert(got === Seq((1L, "12345.6789"), (2L, "-0.0001"), (3L, null)), got.toString)
    val foreign = "/tmp/graft_test/avro_decimal_foreign"
    val fSchema = SchemaBuilder.record("row").namespace("ext").fields()
      .name("k").`type`().longType().noDefault()
      .name("price").`type`(org.apache.avro.LogicalTypes.decimal(10, 2)
        .addToSchema(ASchema.createFixed("price_f", null, "ext", 5))).noDefault()
      .endRecord()
    writeForeign(foreign, fSchema) { sch =>
      val fs = sch.getField("price").schema()
      Seq({ val r = new GenericData.Record(sch)
        r.put("k", 1L)
        // 98765.43 = unscaled 9876543, big-endian two's-complement in 5 bytes
        val unscaled = java.math.BigInteger.valueOf(9876543L).toByteArray
        val padded = new Array[Byte](5)
        System.arraycopy(unscaled, 0, padded, 5 - unscaled.length, unscaled.length)
        r.put("price", new GenericData.Fixed(fs, padded)); r })
    }
    val fr = spark.read.format("graft_avro").load(foreign).collect()(0)
    assert(fr.getDecimal(1).toPlainString === "98765.43",
      "foreign fixed-backed decimal must read as a NUMBER")
    // (2) unknown codec refuses loudly instead of substituting deflate
    val e1 = intercept[Exception] { Avro.write(df, out + "_z", codec = "zstd") }
    assert(String.valueOf(e1.getMessage).contains("codec") ||
      String.valueOf(e1.getCause).toString.contains("codec"), e1.toString)
    // (3) non-positive splitBytes is a loud option error, not an
    // empty scan
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft_avro").option("splitBytes", "-1").load(out).schema
    }
    assert(e2.getMessage.contains("splitBytes"), e2.getMessage)
    // (4) multi-path load reads the union of both directories
    val out2 = "/tmp/graft_test/avro_decimal_b"
    Avro.write(df.withColumn("k", $"k" + 10L), out2)
    assert(spark.read.format("graft_avro").load(out, out2).count() === 6L,
      "load(p1, p2) must read both datasets")
    // (5) merge reparse guard: two generations whose fields carry
    // DIFFERENT nested records under the SAME full name would merge
    // into an unparseable schema — the election must fall back to a
    // single readable generation instead of crashing every scan
    val collide = "/tmp/graft_test/avro_evo_collide"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(collide))
    def gen(field: String, sub: String) =
      SchemaBuilder.record("row").namespace("ext").fields()
        .name("k").`type`().longType().noDefault()
        .name(field).`type`().optional().`type`(
          SchemaBuilder.record("graft_rec_1").namespace("graft").fields()
            .name(sub).`type`().intType().noDefault().endRecord())
        .endRecord()
    writeGen(collide, "gen-a.avro", gen("a", "x")) { sch => Seq(
      { val r = new GenericData.Record(sch); r.put("k", 1L); r }) }
    writeGen(collide, "gen-b.avro", gen("b", "y")) { sch => Seq(
      { val r = new GenericData.Record(sch); r.put("k", 2L); r }) }
    val dfc = spark.read.format("graft_avro").load(collide)
    // a single generation won the fallback election; both rows'
    // shared column still reads (the un-merged column is the
    // documented stderr-warned drop)
    assert(dfc.select("k").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
