package graft

import org.scalatest.funsuite.AnyFunSuite

/** The signed-zero audit gate (r13): every bare `round(` site in the
  * four statistics-heavy operator files must be adjudicated in
  * SIGNZERO.md — either converted to `Readout.pin` (excluded from
  * extraction) or covered by an immunity row (nonneg /
  * decimal-carrier / internal / order-only / oracle-sql /
  * pinned-text). The trap being gated: a rounded double readout whose
  * true value is a tiny negative hashes differently across engines
  * (DuckDB -0.0 vs Spark +0.0, the r11 tq33 red row). This spec makes
  * the adjudication DURABLE — a new or edited bare-round line fails
  * here until SIGNZERO.md (tools/signzero_gen.py) covers it, exactly
  * like RepoHygieneSpec gates COVERAGE.md. */
class SignZeroAuditSpec extends AnyFunSuite {

  private val files =
    Seq("Stats", "Similarity", "TextAnalysis", "Behavior")

  /** Mirror of tools/signzero_gen.py's extractor. */
  private def sites(name: String): Seq[String] = {
    val src = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"src/main/scala/graft/operators/$name.scala"))
    src.linesIterator.map(_.trim)
      .filter(_.contains("round("))
      .filterNot(t => t.contains("Readout.pin") || t.contains("math.round"))
      .filterNot(t => t.startsWith("//") || t.startsWith("*"))
      .toSeq.distinct
  }

  test("every bare round( site in the operator files is adjudicated " +
    "in SIGNZERO.md") {
    val table = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SIGNZERO.md"))
    val missing = files.flatMap { f =>
      sites(f).filterNot { t =>
        table.contains("`" + t.replace("|", "\\|") + "`")
      }.map(t => s"$f: $t")
    }
    assert(missing.isEmpty,
      "unadjudicated bare round( sites (pin them with Readout.pin or " +
        "add a reviewed immunity row via tools/signzero_gen.py):\n  " +
        missing.mkString("\n  "))
  }

  test("the table carries no orphan rows for sites that no longer exist") {
    val table = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SIGNZERO.md"))
    val live: Set[String] =
      files.flatMap(f => sites(f).map(t => "`" + t.replace("|", "\\|") + "`"))
        .toSet
    val rows = table.linesIterator
      .filter(l => l.startsWith("| ") && l.contains("`"))
      .toSeq
    val orphans = rows.filterNot { r =>
      val site = r.substring(r.indexOf('`'))
        .stripSuffix(" |").trim
      live.contains(site)
    }
    assert(orphans.isEmpty,
      "SIGNZERO.md rows with no matching source site (regenerate with " +
        "tools/signzero_gen.py):\n  " + orphans.mkString("\n  "))
  }
}
