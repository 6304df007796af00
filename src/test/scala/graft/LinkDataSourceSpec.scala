package graft

import org.apache.spark.sql.functions._

class LinkDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def reader = spark.read.format("graft-links")
    .option("query", "test topic").option("maxArticles", "25")

  test("DSv2 source: schema, one partition per engine, maxArticles cap") {
    val df = reader.load()
    assert(df.columns.toSeq == Seq("engine", "se_link", "se_title",
      "se_description", "se_source"))
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 75)
    val per = df.groupBy($"engine").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("Google" -> 25L, "Bing" -> 25L, "Yahoo" -> 25L))
  }

  test("limit is pushed into the source (pagination stops early)") {
    val df = reader.load().limit(5)
    assert(df.count() == 5)
    val plan = reader.load().limit(5).queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=true"))
  }

  test("no limit -> source reports no pushdown") {
    val plan = reader.load().queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=false"))
  }
}
