package graft

import java.nio.file.{Files, Paths}
import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Schemas, Sources}
import graft.queries.RefPipeline

/** End-to-end ingest test mirroring the reference's full flow
  * (E1 ingest -> E2 analytics, SURVEY.md §3): dirty CSVs staged to
  * disk -> schema-pinned CSV read -> overwrite sink -> re-read ->
  * prepData cleaning -> Q1. Exercises the same dirty-data branches as
  * the reference's real feed: null dates, '0023' years, quoted
  * strings, Corsican department codes. */
class IngestSpec extends AnyFunSuite with SparkTestBase {

  private val stage = "/tmp/graft_ingest_test"

  test("csvInferred round-trips types for the convenience path") {
    Files.createDirectories(Paths.get(stage))
    Files.writeString(Paths.get(s"$stage/infer.csv"),
      "id,score,name\n1,2.5,alpha\n2,3.0,beta\n")
    val df = Sources.csvInferred(spark, s"$stage/infer.csv")
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.count() == 2)
  }

  test("JDBC round-trip against embedded Derby: replace semantics + partitioned read") {
    import spark.implicits._
    val url = Sources.embeddedDerbyUrl(s"$stage/derby")
    val cust = spark.read.parquet(sf("customer"))
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
    // stale write then full replace: Overwrite must drop-and-recreate,
    // not append (the reference's to_sql(if_exists='replace'))
    Sources.overwriteJdbc(cust.limit(1), url, "graft_cust_test")
    Sources.overwriteJdbc(cust, url, "graft_cust_test")
    val whole = Sources.jdbcTable(spark, url, "graft_cust_test")
    assert(whole.count() == cust.count(), "replace must not append")
    // partitioned read: 4 range-split connections, lossless (rows
    // outside the bounds land in the open-ended edge partitions)
    val part = Sources.jdbcTable(spark, url, "graft_cust_test",
      partitionColumn = Some(("c_custkey", 1L, 200000L, 4)))
    assert(part.rdd.getNumPartitions == 4, "partitioned read must fan out")
    val back = part.orderBy($"c_custkey").collect().toSeq
    val orig = cust.orderBy($"c_custkey").collect().toSeq
    assert(back == orig, "JDBC round-trip must be lossless")
  }

  test("collectSortedMap returns the sorted small-dimension map") {
    import spark.implicits._
    val dim = Seq(("b", 2), ("a", 1), ("c", 3)).toDF("k", "v")
    val m = graft.ops.Relational.collectSortedMap(dim, "k", "v")
    assert(m == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("malformed rows: PERMISSIVE captures them, DROPMALFORMED drops them") {
    import org.apache.spark.sql.types._
    Files.createDirectories(Paths.get(stage))
    Files.writeString(Paths.get(s"$stage/dirty.csv"),
      """id_zone,surface_zone
        |1,100.5
        |not_a_number,oops
        |3,300.25
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id_zone", LongType),
      StructField("surface_zone", DoubleType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(s"$stage/dirty.csv").cache()
    assert(permissive.count() == 3)
    val corrupt = permissive.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() == 1, "the bad row is captured, not silently nulled")
    val dropped = spark.read.option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.fields.take(2))).csv(s"$stage/dirty.csv")
    // gotcha: count() prunes every column, so nothing parses and
    // nothing is dropped — malformed-row dropping only applies to the
    // columns a query actually reads
    assert(dropped.select("id_zone", "surface_zone").collect().length == 2)
    permissive.unpersist()
  }

  test("CSV ingest -> overwrite sink -> prepData -> Q1, end to end") {
    Files.createDirectories(Paths.get(stage))
    Files.writeString(Paths.get(s"$stage/zones.csv"),
      """id_zone,nom_zone,code_departement,nom_departement,surface_zone,type_zone
        |1,"Zone Ardèche Nord",07,"Ardèche",100.5,SUP
        |2,"Zone Ajaccio",2A,"Corse-du-Sud",200.0,SUP
        |3,"Zone sans arrêté",01,"Ain",300.0,SOU
        |""".stripMargin)
    Files.writeString(Paths.get(s"$stage/arretes.csv"),
      """id_zone,debut_validite_arrete,fin_validite_arrete,numero_niveau,nom_niveau,statut_arrete
        |1,2023-08-01,0023-08-20,3,"alerte renforcée",actif
        |1,2023-08-10,,2,alerte,actif
        |2,,2023-08-20,4,crise,actif
        |99,2023-08-01,2023-08-31,1,vigilance,actif
        |""".stripMargin)

    // E1: schema-pinned read (no inference pass), full-replace sink
    val zonesRaw = Sources.csvWithSchema(spark, s"$stage/zones.csv", Schemas.zones)
    val arretesRaw = Sources.csvWithSchema(spark, s"$stage/arretes.csv", Schemas.arretes)
    Sources.overwriteParquet(zonesRaw, s"$stage/zones.parquet")
    Sources.overwriteParquet(arretesRaw, s"$stage/arretes.parquet")

    // schema survived the sink round-trip: codes stayed strings
    val zones = spark.read.parquet(s"$stage/zones.parquet")
    assert(zones.schema("code_departement").dataType.typeName == "string")
    assert(zones.filter(col("code_departement") === "2A").count() == 1)

    // E2: clean + join + Q1 at a date inside every repaired interval
    val arretes = spark.read.parquet(s"$stage/arretes.parquet")
    val prepped = RefPipeline.prepData(zones, arretes)
    // '0023-08-20' repaired to 2023-08-20; null fin -> sentinel; orphan
    // id_zone=99 dropped by the inner join
    assert(prepped.count() == 3)
    val repaired = prepped
      .filter(col("id_zone") === 1 && col("numero_niveau") === 3)
      .select(col("fin_validite_arrete")).collect()(0).getDate(0)
    assert(repaired.toString == "2023-08-20")

    val q1 = RefPipeline.q1NbDepPerAlert(prepped, lit(Date.valueOf("2023-08-12")))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    // dept 07 -> max(3, 2) = 3; dept 2A -> 4
    assert(q1 == Seq((4, 1L), (3, 1L)))
  }
}
