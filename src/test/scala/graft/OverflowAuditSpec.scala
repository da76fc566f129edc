package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Institutionalized overflow audit — the check rounds 7–8 ran by
  * hand (JT variance, logRank, brier, modularity, then the proactive
  * decimal sweep over every pair-count-scaled ppm product): every
  * MULTI-FACTOR product involving a ppm/micro scale constant in the
  * operator library must either carry DECIMAL(38,0) protection in
  * its expression neighborhood or sit on the documented exemption
  * list below with a bound argument.
  *
  * Scope and rationale:
  *  - `src/main/scala/graft/operators` + `functions` — where exact
  *    integer statistics live. DuckDB oracle SQL is out of scope:
  *    DuckDB RAISES on BIGINT overflow (loud in the correctness
  *    gate), and the convention there is `::HUGEINT` (128-bit).
  *  - SINGLE-factor ppm floors `(1e6 * x) div y` are a documented
  *    safe class: budget `x < 9.2e12`, and Spark ANSI mode raises
  *    rather than wraps. The detector targets the class that
  *    actually produced round-7's defects — a scale constant times
  *    TWO OR MORE row-scaled factors (1e6·N², 1e12·d²·varden, ...),
  *    whose budget collapses to ~3e6 rows.
  *  - Divisor products are excluded (paren-depth walk stops at the
  *    numerator boundary): `(1e6*x) div (a*b)` overflows through x
  *    alone, not through a·b.
  */
class OverflowAuditSpec extends AnyFunSuite {

  private val ScaleConstants =
    Seq("1000000", "2000000", "1000000000", "1000000000000")
  private val ppmRe =
    ("""\b(""" + ScaleConstants.mkString("|") + """)L?\s*\*""").r
  private val revRe =
    ("""\*\s*(""" + ScaleConstants.mkString("|") + """)L?\b""").r
  private val protRe = """(?i)decimal\(38|HUGEINT|d38""".r

  /** True when `line` multiplies a scale constant by >= 2 further
    * factors inside the same numerator (paren-depth 0 relative to
    * the constant, stopping at `div`/`//` or the enclosing close
    * paren). */
  private[graft] def multiFactorPpm(line: String): Boolean = {
    val fwd = ppmRe.findAllMatchIn(line).exists { m =>
      var depth = 0
      var i = m.end
      var hit = false
      var done = false
      while (i < line.length && !done && !hit) {
        line.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth < 0) done = true
          case '*' if depth == 0 => hit = true
          case _ if depth == 0 && line.startsWith(" div", i) => done = true
          case _ if depth == 0 && line.startsWith("//", i) => done = true
          case _ =>
        }
        i += 1
      }
      hit
    }
    def rev = revRe.findAllMatchIn(line).exists { m =>
      var depth = 0
      var i = m.start - 1
      var hit = false
      var done = false
      while (i >= 0 && !done && !hit) {
        line.charAt(i) match {
          case ')' => depth += 1
          case '(' => depth -= 1; if (depth < 0) done = true
          case '*' if depth == 0 => hit = true
          case _ =>
        }
        i -= 1
      }
      hit
    }
    fwd || rev
  }

  /** (file basename, line substring) -> why the BIGINT budget holds.
    * Every entry must still match a flagged line (stale entries
    * fail), and every flagged line must match an entry. */
  private val exemptions: Map[(String, String), String] = Map(
    ("TimeSeries.scala", "(1000000L * ${period}L * n) div __T") ->
      ("seasonality index: period is a small caller constant (7/24/12)" +
        " and n <= T <= row count, so 1e6·period·n < 9.2e18 through" +
        " ~1.3e12 rows per period cell — raised loudly by ANSI past that")
  )

  private def flaggedLines(): Seq[(String, Int, String)] = {
    val dirs = Seq("src/main/scala/graft/operators",
      "src/main/scala/graft/functions")
    dirs.flatMap { d =>
      val p = Paths.get(d)
      if (!Files.exists(p)) Seq.empty
      else Files.walk(p).iterator().asScala
        .filter(f => f.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
        .flatMap { f =>
          val lines = Files.readAllLines(f).asScala.toVector
          lines.zipWithIndex.collect {
            case (ln, i) if multiFactorPpm(ln) &&
              !protRe.findFirstIn(lines.slice(math.max(0, i - 3),
                math.min(lines.length, i + 4)).mkString("\n")).isDefined =>
              (f.getFileName.toString, i + 1, ln.trim)
          }
        }
    }
  }

  test("every unprotected multi-factor ppm product is exempted with a bound argument") {
    val flagged = flaggedLines()
    val unexempted = flagged.filterNot { case (file, _, ln) =>
      exemptions.keys.exists { case (f, sub) => f == file && ln.contains(sub) }
    }
    assert(unexempted.isEmpty,
      "unprotected multi-factor ppm products (wrap in decimal(38,0) " +
        "or exempt with a written bound argument):\n" +
        unexempted.map { case (f, i, ln) => s"  $f:$i: $ln" }.mkString("\n"))
    val stale = exemptions.keys.filterNot { case (f, sub) =>
      flagged.exists { case (file, _, ln) => file == f && ln.contains(sub) }
    }
    assert(stale.isEmpty,
      s"stale exemptions (the code they excused is gone or now protected): $stale")
  }

  test("the detector retroactively catches the round-7 defect shapes (seeded)") {
    // the JT-variance shape: ppm constant times two row-scaled sums
    assert(multiFactorPpm(
      """expr("(1000000L * __n * (__n - 1L)) div __den")"""))
    // the brier shape: 1e12 times a squared difference chain
    assert(multiFactorPpm(
      """ "(1000000000000 * __d * __d) div (__n * __n)" """))
    // reversed chains are caught too
    assert(multiFactorPpm("""expr("(__w * __w * 1000000L) div __v")"""))
    // ...and the SAME shapes wrapped in decimal(38,0) pass the window
    // check (exercised through flaggedLines on the real tree, whose
    // protected sites — e.g. gwetAC1, quadeTest — are not flagged)
    // single-factor floors are the documented safe class
    assert(!multiFactorPpm("""expr("(1000000L * n_ab) div n_a")"""))
    // divisor products never flag
    assert(!multiFactorPpm(
      """expr("(2000000 * n_tri) div (degree * (degree - 1))")"""))
    // DuckDB floor-division numerators stop at //
    assert(!multiFactorPpm("((1000000 * w2) // (2 * n_common))"))
  }
}
