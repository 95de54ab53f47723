package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene: no `.scala` file may contain raw control
  * bytes. The round-10 regression class this pins: a literal NUL
  * typed where the `" "` ESCAPE was meant made one source file
  * binary to git — diffs unreadable, grep degraded, and the
  * text-based copy/leak scanners silently skipped exactly the file
  * defining the manifest path-space invariants.
  */
class RepoHygieneSpec extends AnyFunSuite {

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
    else if (f.getName.endsWith(".scala")) Seq(f)
    else Seq.empty

  test("no .scala source carries raw control bytes (tab/newline/CR " +
      "excepted) — control characters belong in escapes") {
    val offenders = walk(new java.io.File("src")).flatMap { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val bad = bytes.indexWhere(b =>
        b >= 0 && b < 0x20 && b != 0x09 && b != 0x0a && b != 0x0d)
      if (bad >= 0) Some(s"${f.getPath} (byte 0x${
        "%02x".format(bytes(bad))} at offset $bad)")
      else None
    }
    assert(offenders.isEmpty,
      s"source files with raw control bytes: ${offenders.mkString(", ")}" +
        " — spell them as escapes so the file stays text to " +
        "git/grep/scanners")
  }
}
