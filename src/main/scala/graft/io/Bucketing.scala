package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for shuffle-free co-located joins
  * (SURVEY.md §4.2, 100 TB posture).
  *
  * Writing both sides of a recurring big-x-big equi-join bucketed by
  * the join key (same bucket count) lets Spark plan a sort-merge join
  * with NO Exchange on either side: each task reads matching buckets —
  * the single biggest shuffle saving available for repeated joins over
  * a 100 TB fact table. Bucketed writes go through the session catalog
  * (`saveAsTable`; plain `.parquet()` paths cannot carry bucket
  * metadata). */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(s: SparkSession, table: String): DataFrame = s.table(table)
}
