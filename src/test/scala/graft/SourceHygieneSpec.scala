package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Repo-hygiene gate: no source file may carry raw control bytes.
  *
  * Three rounds in a row a literal NUL slipped into a `.scala` file (an
  * NUL sentinel written as the raw byte by an editor round-trip:
  * Unigram.scala in r10, TextExpressions.scala + Multimodal.scala +
  * StreamingAndMultimodalSpec.scala in r11). git then treats the file as
  * binary — `git grep`, `git diff`, and review all degrade silently. The
  * fix is always the same (a unicode escape), so catch the next one at
  * `sbt test` time.
  *
  * Allowed: TAB (0x09), LF (0x0A), CR (0x0D). Everything else below 0x20
  * is a raw control byte and must be written as an escape.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private val allowed = Set[Byte](9, 10, 13)

  private def sourceFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => p.toString.endsWith(".scala") || p.toString.endsWith(".sbt"))
      .toSeq

  test("no raw control bytes in any .scala or .sbt source file") {
    val files = sourceFiles(Paths.get("src")) ++
      Seq(Paths.get("build.sbt")).filter(Files.exists(_))
    val offenders = files.flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val bad = bytes.zipWithIndex.collect {
        case (b, i) if b >= 0 && b < 32 && !allowed.contains(b) => (b, i)
      }
      if (bad.isEmpty) None
      else {
        // report the 1-based line of the first offender for a clickable fix
        val firstOff = bad.head._2
        val line = bytes.take(firstOff).count(_ == 10.toByte) + 1
        Some(s"$p: ${bad.length} control byte(s), first is 0x${"%02x".format(bad.head._1)} at line $line")
      }
    }
    assert(offenders.isEmpty,
      s"raw control bytes in source (write them as \\u escapes):\n${offenders.mkString("\n")}")
  }
}
