package graft.cdc

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class SourceDetectSpec extends SparkSpec {

  test("classifies by payload.source.connector") {
    assert(SourceDetect.detectType(
      """{"payload":{"source":{"connector":"postgresql"},"op":"c"}}""")
      .contains("postgres"))
    assert(SourceDetect.detectType(
      """{"payload":{"source":{"connector":"mongodb"},"op":"c"}}""")
      .contains("mongodb"))
  }

  test("falls back to the mongo replica-set field; rejects unknowns") {
    assert(SourceDetect.detectType(
      """{"payload":{"source":{"rs":"rs0"},"op":"c"}}""").contains("mongodb"))
    assert(SourceDetect.detectType("""{"payload":{"op":"c"}}""").isEmpty)
    assert(SourceDetect.detectType("not json at all").isEmpty)
  }

  test("detects from a source directory, skipping blanks and junk lines") {
    val dir = Files.createTempDirectory("srcdetect")
    Files.writeString(Paths.get(dir.toString, "a.jsonl"),
      "\n\nnot json\n" +
        """{"payload":{"source":{"connector":"postgresql"},"op":"c"}}""" + "\n")
    assert(SourceDetect.detectFromDir(spark, dir.toString).contains("postgres"))
    val empty = Files.createTempDirectory("srcdetect_empty")
    Files.writeString(Paths.get(empty.toString, "a.jsonl"), "\n")
    assert(SourceDetect.detectFromDir(spark, empty.toString).isEmpty)
  }
}
