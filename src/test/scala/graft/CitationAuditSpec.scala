package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Provenance audit: every `path:line` citation in main-source scaladoc
  * must point at a file that actually exists (under `/root/reference/`
  * for reference provenance, or under the repo for self-references),
  * with the cited start line inside the file. Round 4 found one
  * fabricated citation (a plausible-looking `etl/utils/udfs.py` that
  * never existed); this spec makes that class of drift impossible to
  * reintroduce silently.
  *
  * Citations appear in two forms: suffix paths (`fb_scraper/
  * normalization.py:7-66`) and bare filenames (`common.py:31-47`,
  * cited from context where the directory is already named), so a
  * citation resolves if ANY file in either tree ends with the cited
  * path and is long enough to contain the cited start line.
  */
class CitationAuditSpec extends AnyFunSuite {

  private val citeRe =
    """([A-Za-z0-9_][A-Za-z0-9_/.-]*\.(?:py|sql|md|json|java|go|rs|cpp|sh|cfg|ini|yml|yaml)):(\d+)(?:-(\d+))?""".r

  private def walk(root: Path): Seq[Path] =
    if (!Files.exists(root)) Seq.empty
    else {
      val s = Files.walk(root)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      finally s.close()
    }

  test("every path:line citation in main sources resolves to a real file+line") {
    // repo root from the forked test JVM's cwd (sbt forks with cwd =
    // repo root) so the suite is not bound to one checkout path; the
    // reference corpus location is an environment contract and stays
    // absolute
    val repoRoot = Paths.get(sys.props("user.dir"))
    val refFiles = walk(Paths.get("/root/reference"))
    val repoFiles = walk(repoRoot).filterNot { p =>
      val s = p.toString
      s.contains("/target/") || s.contains("/.git/") ||
        s.contains("/spark-warehouse/")
    }
    val candidates = refFiles ++ repoFiles
    // byte-level newline count: immune to encoding (Files.lines throws
    // on invalid UTF-8), and an UNREADABLE file counts as 0 lines so a
    // citation into it FAILS rather than silently resolving — the
    // fail-open Long.MaxValue fallback would defeat the spec's purpose
    val lineCount = scala.collection.mutable.Map.empty[Path, Long]
    def linesOf(p: Path): Long = lineCount.getOrElseUpdate(p,
      try {
        val bytes = Files.readAllBytes(p)
        1L + bytes.count(_ == '\n'.toByte)
      } catch { case _: Exception => 0L })

    val srcRoot = repoRoot.resolve("src/main/scala")
    val sources = walk(srcRoot).filter(_.toString.endsWith(".scala"))
    assert(sources.nonEmpty)

    val dangling = sources.flatMap { src =>
      val text = new String(Files.readAllBytes(src), "UTF-8")
      citeRe.findAllMatchIn(text).flatMap { m =>
        val (path, startLine) = (m.group(1), m.group(2).toLong)
        val matches = candidates.filter(_.toString.endsWith("/" + path))
        val ok = matches.exists(f => linesOf(f) >= startLine)
        if (ok) None
        else Some(s"${srcRoot.relativize(src)}: '$path:${m.group(2)}'" +
          (if (matches.isEmpty) " (no such file)"
           else s" (file exists but has < $startLine lines)"))
      }
    }
    assert(dangling.isEmpty,
      s"dangling citations:\n${dangling.mkString("\n")}")
  }
}
