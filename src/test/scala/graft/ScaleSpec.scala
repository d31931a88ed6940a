package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Bucketing
import graft.ops.Skew

/** Scale-mechanism tests: salting and bucketing produce the same
  * answers as the naive forms AND the plan shapes that make them worth
  * doing (uniform salted partials; no Exchange on bucketed joins). */
class ScaleSpec extends AnyFunSuite with SparkTestBase {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("saltedAggregate equals plain groupBy aggregation") {
    import spark.implicits._
    val li = spark.read.parquet(sf("lineitem"))
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").cast("decimal(28,2)").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(li,
      keys = Seq($"l_returnflag"), fineGrain = Seq($"l_orderkey", $"l_linenumber"),
      saltBuckets = 8,
      partials = Seq(sum($"l_quantity".cast("decimal(28,2)")).as("s"), count(lit(1)).as("n")),
      merges = Seq(sum($"s").cast("decimal(28,2)").as("s"), sum($"n").as("n")))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val c = spark.read.parquet(sf("customer"))
    val n = spark.read.parquet(sf("nation"))
    val plain = c.join(n, $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(c, n, $"c_nationkey", $"n_nationkey",
      factFineGrain = Seq($"c_custkey"), saltBuckets = 4)
      .select($"c_custkey", $"n_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("salt spreads a hot key over all buckets") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "id")
    val buckets = hot.withColumn("s", Skew.salt(Seq($"id"), 8))
      .groupBy($"s").count().collect().map(_.getLong(1))
    assert(buckets.length == 8, "all 8 salt buckets populated")
    assert(buckets.max < 1000 / 8 * 2, s"roughly uniform: ${buckets.toSeq}")
  }

  test("bucketed-by-join-key tables sort-merge join with zero Exchange") {
    import spark.implicits._
    val s = spark // warehouse.dir is static conf, set in SparkTestBase
    // the catalog is in-memory per JVM but the warehouse dir persists —
    // clear stale locations from previous runs
    Seq("graft_orders_b", "graft_lineitem_b").foreach { tbl =>
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$tbl")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val orders = s.read.parquet(sf("orders"))
    val lineitem = s.read.parquet(sf("lineitem"))
    Bucketing.writeBucketed(orders, "graft_orders_b", "o_orderkey", 4, Some("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "graft_lineitem_b", "l_orderkey", 4, Some("l_orderkey"))
    val joined =
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val df = Bucketing.readTable(s, "graft_orders_b")
          .join(Bucketing.readTable(s, "graft_lineitem_b"),
            $"o_orderkey" === $"l_orderkey")
          .select($"o_orderkey", $"l_linenumber", $"l_quantity")
        assert(!plan(df).contains("Exchange"), plan(df))
        df.count()
      }
    // and the join is still correct
    val expected = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
    assert(joined == expected)
  }

  test("TopKByValue aggregator equals the window top-k and partial-aggregates") {
    import spark.implicits._
    val orders = spark.read.parquet(sf("orders"))
    val topk = graft.functions.TopKByValue.topK(3)
    val viaUdaf = orders.groupBy($"o_orderpriority")
      .agg(topk($"o_totalprice", $"o_orderkey").as("tk"))
      .select($"o_orderpriority", posexplode($"tk").as(Seq("pos", "pair")))
      .select($"o_orderpriority", ($"pos" + 1).cast("long").as("rnk"), $"pair._2".as("id"))
    val viaWindow = graft.ops.Temporal.topKPerGroup(orders,
      Seq($"o_orderpriority"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
      .select($"o_orderpriority", $"rnk".cast("long"), $"o_orderkey".as("id"))
    val a = viaUdaf.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = viaWindow.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // the scale property: partial (map-side) + final aggregate stages
    val agged = orders.groupBy($"o_orderpriority")
      .agg(topk($"o_totalprice", $"o_orderkey").as("tk"))
    val p = plan(agged)
    assert("Aggregate".r.findAllIn(p).length >= 2, p)
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
