package graft

import org.apache.spark.sql.functions._
import graft.core.{OpCompiler, OpSpec}
import graft.ops.Relational

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    (1, "alice", "NY", 30, 100.0),
    (2, "bob", "SF", 25, 200.0),
    (3, "carol", "NY", 35, 150.0),
    (4, "dan", "LA", 25, 50.0),
    (5, "alice", "NY", 30, 100.0)
  ).toDF("id", "name", "city", "age", "spend")

  test("filterColumn operators") {
    assert(Relational.filterColumn(people, "city", "in", Seq("NY", "LA")).count() == 4)
    assert(Relational.filterColumn(people, "city", "not_in", Seq("NY")).count() == 2)
    assert(Relational.filterColumn(people, "name", "contains", "aro").count() == 1)
    assert(Relational.filterColumn(people, "name", "starts_with", "a").count() == 2)
    assert(Relational.filterColumn(people, "name", "ends_with", "b").count() == 1)
    assert(Relational.filterColumn(people, "age", ">=", 30).count() == 3)
    // YAML path: SnakeYAML hands lists over as java.util.List
    val jlist = new java.util.ArrayList[String]()
    jlist.add("NY"); jlist.add("LA")
    assert(Relational.filterColumn(people, "city", "in", jlist).count() == 4)
  }

  test("percentile aggregate spellings: valid p-codes work, junk is rejected") {
    val agg = Relational.aggregate(people, Nil, Seq("spend" -> "p50"))
    assert(agg.columns.contains("spend_p50"))
    Seq("p", "p200").foreach { bad =>
      intercept[IllegalArgumentException] {
        Relational.aggregate(people, Nil, Seq("spend" -> bad))
      }
    }
  }

  test("dedup keep=last picks the highest-ordered row") {
    val d = Relational.deduplicate(people, subset = Seq("age"), orderBy = Seq("id"), keep = "last")
    val byAge25 = d.filter($"age" === 25).select("id").as[Int].collect()
    assert(byAge25.toSeq == Seq(4)) // ids 2 and 4 share age 25; keep last by id
  }

  test("clean standardize_nulls + trim + remove_empty_columns") {
    val dirty = Seq((1, " x ", "N/A", null: String), (2, "", "null", null: String))
      .toDF("id", "a", "b", "c")
    val cleaned = Relational.clean(dirty, Seq("trim_strings", "standardize_nulls", "remove_empty_columns"))
    assert(cleaned.columns.toSeq == Seq("id", "a")) // b all-null after standardize, c all-null
    assert(cleaned.filter($"id" === 1).select("a").as[String].head() == "x")
    assert(cleaned.filter($"id" === 2).select("a").as[String].head() == null)
  }

  test("fillNull ffill/bfill respect ordering") {
    val ts = Seq((1, Some(10.0)), (2, None), (3, None), (4, Some(40.0)))
      .toDF("t", "v")
    val ff = Relational.fillNull(ts, "v", "ffill", orderBy = Seq("t"))
      .orderBy("t").select("v").as[Option[Double]].collect().flatten
    assert(ff.toSeq == Seq(10.0, 10.0, 10.0, 40.0))
    val bf = Relational.fillNull(ts, "v", "bfill", orderBy = Seq("t"))
      .orderBy("t").select("v").as[Option[Double]].collect().flatten
    assert(bf.toSeq == Seq(10.0, 40.0, 40.0, 40.0))
  }

  test("melt/pivot round-trip preserves values") {
    val melted = Relational.melt(
      people.select($"id", $"age".cast("double").as("age"), $"spend"),
      Seq("id"), Seq("age", "spend"))
    assert(melted.count() == 10)
    val back = Relational.pivot(melted, Seq("id"), "variable", "value", "sum",
      pivotValues = Seq("age", "spend"))
    val row = back.filter($"id" === 3).select("age", "spend").as[(Double, Double)].head()
    assert(row == ((35.0, 150.0)))
  }

  test("op AST compiles to one chained plan with correct result") {
    val pipeline = OpCompiler.compile(Seq(
      OpSpec.FilterCondition("age >= 25"),
      OpSpec.Calculate("spend2", "spend * 2"),
      OpSpec.Aggregate(groupBy = Seq("city"), aggregations = Seq("spend2" -> "sum")),
      OpSpec.Sort(Seq("city"))))
    val out = pipeline(people).collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("LA", 100.0), ("NY", 700.0), ("SF", 400.0)))
  }

  test("op algebra: filter-then-select == select-then-filter when legal") {
    val a = OpCompiler.compile(Seq(
      OpSpec.FilterCondition("age > 24"), OpSpec.Select(Seq("id", "age"))))(people)
    val b = OpCompiler.compile(Seq(
      OpSpec.Select(Seq("id", "age")), OpSpec.FilterCondition("age > 24")))(people)
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
  }

  test("seeded sample is deterministic") {
    val s1 = people.sample(withReplacement = false, 0.5, 42L).select("id").as[Int].collect().toSeq
    val s2 = people.sample(withReplacement = false, 0.5, 42L).select("id").as[Int].collect().toSeq
    assert(s1 == s2)
  }

  test("unionWithLineage tags every row") {
    val u = Relational.unionWithLineage(Seq(
      "one" -> people.filter($"id" <= 2), "two" -> people.filter($"id" > 2)))
    assert(u.count() == 5)
    assert(u.filter($"_source_file" === "one").count() == 2)
  }

  test("theta join via condition string") {
    val left = Seq((1, 10), (2, 20)).toDF("k", "v")
    val right = Seq((1, 15), (2, 5)).toDF("k2", "w")
    val j = Relational.join(left, right, condition = "k = k2 AND v > w")
    assert(j.count() == 1)
    assert(j.select("k").as[Int].head() == 2)
  }
}
