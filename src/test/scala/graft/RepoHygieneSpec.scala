package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guards on the source tree itself. Born from a recurring
  * review finding: inserting a new method between an existing scaladoc
  * block and its definition orphans the doc (scaladoc attaches only to
  * the nearest following definition) — it happened three separate times
  * this round (globalRank, unigramSurprisal, winnowingPairs). A doc
  * block immediately followed by another doc block documents nothing.
  */
class RepoHygieneSpec extends AnyFunSuite {

  private def mainSources: Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .toSeq
  }

  test("no scaladoc block dangles above another doc comment") {
    val offenders = mainSources.flatMap { path =>
      import scala.jdk.CollectionConverters._
      val lines = java.nio.file.Files.readAllLines(path).asScala.toVector
      var inDoc = false
      val bad = Vector.newBuilder[String]
      for (i <- lines.indices) {
        val t = lines(i).trim
        // the next non-blank line after a closed SCALADOC block must be
        // code (a definition, annotation, or line comment attached to
        // it) — a new /** block means this one attaches to nothing
        def closes(): Unit = {
          val next = (i + 1 until lines.size).iterator
            .map(lines(_).trim).find(_.nonEmpty)
          if (next.exists(_.startsWith("/**"))) bad += s"$path:${i + 1}"
        }
        if (!inDoc && t.startsWith("/**") && t.endsWith("*/")) closes()
        else if (!inDoc && t.startsWith("/**")) inDoc = true
        else if (inDoc && t.endsWith("*/")) { inDoc = false; closes() }
      }
      bad.result()
    }
    assert(offenders.isEmpty,
      "dangling scaladoc (doc block followed by another doc block):\n" +
        offenders.mkString("\n"))
  }

  /** Born from the round-7 red row: aq59 was registered after the
    * round's final Verify run and shipped without a COVERAGE.md row —
    * the coverage map silently stopped equalling the registry. Every
    * registered query name must appear in COVERAGE.md, so a
    * late-registered query without a coverage row fails `sbt test`. */
  test("every registered query name appears in COVERAGE.md") {
    val coverage = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(coverage.contains)
    assert(missing.isEmpty,
      "registered queries with no COVERAGE.md row: " +
        missing.mkString(", "))
  }

  /** Born from the round-9 judge finding: the committed
    * bench_results.json covered 233 queries while the registry had 242
    * — the last nine landed after the final bench refresh, so the
    * round's committed perf artifact silently stopped equalling the
    * registry (the aq59 lesson recurring in artifact form). The bench
    * artifact must cover EXACTLY the registered query set: a query
    * registered without a bench refresh — or a stale benched name that
    * no longer exists — fails `sbt test`. */
  test("bench_results.json covers exactly the registered query set") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_results.json")), "UTF-8")
    // the artifact is one JSON object with a "queries": {name: sec}
    // map (flat — number values, no nested braces); names are
    // extracted from exactly that object's span, not parsed with a
    // JSON lib (none on the test classpath by design)
    val afterKey = text.drop(text.indexOf("\"queries\""))
    val qSection = afterKey.slice(
      afterKey.indexOf('{'), afterKey.indexOf('}') + 1)
    val benched = "\"([A-Za-z0-9_]+)\"\\s*:"
      .r.findAllMatchIn(qSection).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val unbenched = (registered -- benched).toSeq.sorted
    val stale = (benched -- registered).toSeq.sorted
    assert(unbenched.isEmpty && stale.isEmpty,
      s"registered-but-unbenched: ${unbenched.mkString(", ")}; " +
        s"benched-but-unregistered: ${stale.mkString(", ")} — " +
        "refresh bench_results.json (runMain graft.Bench) in the same " +
        "change that edits the registry")
  }
}
