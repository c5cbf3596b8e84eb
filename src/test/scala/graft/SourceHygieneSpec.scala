package graft

import org.scalatest.funsuite.AnyFunSuite

/** Raw control bytes in a SOURCE file make git treat it as binary —
  * diffs stop rendering and grep answers "binary file matches",
  * defeating exactly the review tooling tests exist to serve. This
  * recurred twice (DvCodecSpec r13, MetadataSourceSpec r14 — both
  * embedded raw NULs for synthetic file headers); the fix is unicode
  * escapes, and this spec keeps it fixed. Binary test RESOURCES
  * (vendored parquet fixtures) are exempt by construction: only
  * `.scala` sources are walked. */
class SourceHygieneSpec extends AnyFunSuite {

  test("no scala source contains raw control bytes below 0x09") {
    def walk(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    val sources = walk(new java.io.File("src"))
      .filter(_.getName.endsWith(".scala"))
    assert(sources.nonEmpty, "no sources found — wrong working directory?")
    val offenders = sources.flatMap { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val bad = bytes.indexWhere(b => b >= 0 && b < 0x09)
      if (bad >= 0) Some(s"$f: raw byte 0x${"%02x".format(bytes(bad))} " +
        s"at offset $bad — use a \\uXXXX escape")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
