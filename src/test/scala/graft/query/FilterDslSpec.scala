package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

case class Profile(city: String, zip: Int)
case class Rec(name: String, age: Option[Int], tags: Seq[String], profile: Profile)

/** Filter DSL behavior from tests/unittests/test_result_set.py +
  * test_results.py: operators, nested paths, null semantics. */
class FilterDslSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val df = Seq(
    Rec("Alice", Some(30), Seq("urgent", "a"), Profile("New York", 10001)),
    Rec("Bob", Some(41), Seq("b"), Profile("Boston", 2101)),
    Rec("carol", None, Seq(), Profile("new york", 10002))
  ).toDF()

  private def names(filters: (String, Any)*): Seq[String] =
    ResultSet.filterDf(df, filters: _*).select("name")
      .collect().map(_.getString(0)).toSeq.sorted

  test("exact match, default operator")(
    assert(names("name" -> "Alice") == Seq("Alice")))

  test("nested struct path a__b")(
    assert(names("profile__city" -> "New York") == Seq("Alice")))

  test("contains on array column")(
    assert(names("tags__contains" -> "urgent") == Seq("Alice")))

  test("contains on string column")(
    assert(names("profile__city__contains" -> "York") == Seq("Alice")))

  test("icontains is case-insensitive")(
    assert(names("profile__city__icontains" -> "new YORK") == Seq("Alice", "carol")))

  test("startswith / endswith")({
    assert(names("name__startswith" -> "A") == Seq("Alice"))
    assert(names("name__endswith" -> "ob") == Seq("Bob"))
  })

  test("comparisons gt/gte/lt/lte")({
    assert(names("age__gt" -> 30) == Seq("Bob"))
    assert(names("age__gte" -> 30) == Seq("Alice", "Bob"))
    assert(names("age__lt" -> 41) == Seq("Alice"))
    assert(names("age__lte" -> 41) == Seq("Alice", "Bob"))
  })

  test("in membership")(
    assert(names("name__in" -> Seq("Alice", "carol")) == Seq("Alice", "carol")))

  test("isnull") {
    assert(names("age__isnull" -> true) == Seq("carol"))
    assert(names("age__isnull" -> false) == Seq("Alice", "Bob"))
  }

  test("null fails every operator except isnull (reference None semantics)")(
    assert(names("age__gt" -> 0) == Seq("Alice", "Bob")))

  test("multiple filters AND together")(
    assert(names("age__gte" -> 30, "tags__contains" -> "urgent") == Seq("Alice")))

  test("missing path matches nothing")(
    assert(names("profile__country" -> "US").isEmpty))

  test("ResultSet driver-side ops: get/first/discard/add") {
    import graft.core.EventResult
    val r1 = EventResult(error = false, "E1", "t1", None)
    val r2 = EventResult(error = true, "E2", "t2", None)
    val rs = ResultSet(Seq(r1, r2))
    assert(rs.size == 2)
    assert(rs.first().contains(r1))
    assert(rs.get(_.meta.eventName == "E1") == r1)
    intercept[graft.core.MultiValueError](rs.get(_ => true))
    intercept[NoSuchElementException](rs.get(_.meta.eventName == "missing"))
    assert(rs.discard(r1.meta.id).size == 1)
    assert(rs.add(r1).size == 2) // id-merge, no dup
    assert(rs.filterByEvent("e2").size == 1) // case-insensitive
  }

  test("unionById: right wins on id collision; discardById removes by key") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2")).toDF("id", "v")
    val b = Seq((2, "b2"), (3, "b3")).toDF("id", "v")
    val u = ResultSet.unionById(a, b, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(u == Map(1 -> "a1", 2 -> "b2", 3 -> "b3")) // dict.update: b wins
    val d = ResultSet.discardById(ResultSet.unionById(a, b, Seq("id")),
        Seq(Tuple1(2)).toDF("id"), Seq("id"))
      .collect().map(_.getInt(0)).toSet
    assert(d == Set(1, 3))
  }
}
