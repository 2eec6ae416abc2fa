package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

case class PropRec(name: String, age: Option[Int], score: Double, tags: Seq[String])

/** Randomized differential test (seeded, deterministic): the filter DSL
  * compiled to Catalyst predicates agrees with a straightforward
  * in-memory Scala oracle over random data and random filter
  * combinations (SURVEY §5 test plan). */
class FilterDslPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val names = Seq("alpha", "Beta", "GAMMA", "delta", "", "ALpha")

  private def randRec(): PropRec = PropRec(
    names(rnd.nextInt(names.size)),
    if (rnd.nextBoolean()) Some(rnd.nextInt(100) - 5) else None,
    math.rint((rnd.nextDouble() * 20 - 10) * 100) / 100,
    Seq.fill(2)(Seq("x", "y", "z")(rnd.nextInt(3))))

  private def randFilter(): (String, Any, PropRec => Boolean) =
    rnd.nextInt(9) match {
      case 0 =>
        val v = Seq("alpha", "Beta", "nope")(rnd.nextInt(3))
        ("name", v, r => r.name == v)
      case 1 =>
        val v = rnd.nextInt(100) - 5
        ("age__gte", v, r => r.age.exists(_ >= v))
      case 2 =>
        val v = rnd.nextInt(100) - 5
        ("age__lt", v, r => r.age.exists(_ < v))
      case 3 =>
        val v = Seq("al", "A", "zz")(rnd.nextInt(3))
        ("name__icontains", v, r => r.name.toLowerCase.contains(v.toLowerCase))
      case 4 =>
        val v = Seq("al", "GA", "zz")(rnd.nextInt(3))
        ("name__startswith", v, r => r.name.startsWith(v))
      case 5 =>
        val v = Seq("x", "y", "w")(rnd.nextInt(3))
        ("tags__contains", v, r => r.tags.contains(v))
      case 6 =>
        val v = rnd.nextBoolean()
        ("age__isnull", v, r => r.age.isEmpty == v)
      case 7 =>
        ("name__in", Seq("alpha", "delta"),
          r => Seq("alpha", "delta").contains(r.name))
      case _ =>
        val v = math.rint((rnd.nextDouble() * 20 - 10) * 100) / 100
        ("score__gt", v, r => r.score > v)
    }

  test("filter DSL matches the in-memory oracle across 30 random rounds") {
    (1 to 30).foreach { round =>
      val recs = Seq.fill(40)(randRec())
      val filters = Seq.fill(1 + rnd.nextInt(2))(randFilter())
      val df = recs.toDF()
      val got = ResultSet
        .filterDf(df, filters.map(f => (f._1, f._2)): _*).count()
      val expected = recs.count(r => filters.forall(_._3(r)))
      assert(got == expected,
        s"round $round: filters=${filters.map(f => f._1 -> f._2)} " +
          s"got=$got want=$expected")
    }
  }
}
