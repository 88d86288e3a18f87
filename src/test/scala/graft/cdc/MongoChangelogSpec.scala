package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** The recursive extended-JSON walker (ref: cdc_stream.py:427-497):
  * wrapper unwrapping, nested docs, arrays, $binary v1/v2.
  */
class MongoChangelogSpec extends AnyFunSuite {

  test("scalar wrappers unwrap to their payload") {
    val doc = """{"_id":{"$oid":"abc123"},"n":{"$numberLong":"42"},
                  "f":{"$numberDouble":"1.5"},"d":{"$date":1700000000000},
                  "dec":{"$numberDecimal":"9.99"},"i":{"$numberInt":"7"}}"""
    val m = MongoChangelog.normalizeDocument(doc)
    assert(m("_id") == "abc123")
    assert(m("n") == "42")
    assert(m("f") == "1.5")
    assert(m("d") == "1700000000000")
    assert(m("dec") == "9.99")
    assert(m("i") == "7")
  }

  test("$binary v1 (string) and v2 ({base64, subType}) both yield base64") {
    val m = MongoChangelog.normalizeDocument(
      """{"b1":{"$binary":"AAEC"},"b2":{"$binary":{"base64":"AwQF","subType":"00"}}}""")
    assert(m("b1") == "AAEC")
    assert(m("b2") == "AwQF")
  }

  test("$regex unwraps to the pattern") {
    val m = MongoChangelog.normalizeDocument("""{"r":{"$regex":"^a.*","$options":"i"}}""")
    assert(m("r") == "^a.*")
  }

  test("nested documents serialize as JSON with wrappers unwrapped recursively") {
    val m = MongoChangelog.normalizeDocument(
      """{"nested":{"a":"x","b":{"$numberInt":"5"},"deeper":{"c":{"$oid":"ff"}}}}""")
    assert(m("nested") == """{"a":"x","b":"5","deeper":{"c":"ff"}}""")
  }

  test("arrays recurse into elements") {
    val m = MongoChangelog.normalizeDocument(
      """{"tags":["x",{"$numberLong":"5"},{"k":{"$date":1}}]}""")
    assert(m("tags") == """["x","5",{"k":1}]""") // $date payload keeps its JSON type
  }

  test("plain scalars, nulls, and null docs") {
    val m = MongoChangelog.normalizeDocument("""{"s":"str","i":3,"z":null}""")
    assert(m("s") == "str" && m("i") == "3" && m("z") == null)
    assert(MongoChangelog.normalizeDocument(null) == null)
    assert(MongoChangelog.normalizeDocument("[1,2]") == Map.empty)
  }
}
