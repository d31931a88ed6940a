package graft.io

import org.apache.spark.sql.types._

/** Pinned schemas for the reference-domain tables (SURVEY.md §1.2-1.3).
  *
  * The reference never declares schemas — `pd.read_csv` infers them
  * (tasks/scraper/src/utils/utils.py:18) and Postgres round-trips the
  * guess. At 100 TB inference costs an extra full pass and is sample-
  * dependent, so the engine pins them. Two deliberate choices:
  * `code_departement` is STRING (Corsica is "2A"/"2B"; an int cast
  * silently corrupts), and validity dates stay STRING at ingest — the
  * '0023' repair and sentinel fills (RefPipeline.prepData) must run
  * before the date cast. */
object Schemas {

  val zones: StructType = StructType(Seq(
    StructField("id_zone", LongType),
    StructField("nom_zone", StringType),
    StructField("code_departement", StringType),
    StructField("nom_departement", StringType),
    StructField("surface_zone", DoubleType),
    StructField("type_zone", StringType)))

  val arretes: StructType = StructType(Seq(
    StructField("id_zone", LongType),
    StructField("debut_validite_arrete", StringType),
    StructField("fin_validite_arrete", StringType),
    StructField("numero_niveau", IntegerType),
    StructField("nom_niveau", StringType),
    StructField("statut_arrete", StringType)))

  val departements: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("nom", StringType),
    StructField("geometry", StringType)))
}
