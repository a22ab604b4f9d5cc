package graft.ext

import graft.SparkSpec

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  test("strips tags, redacts email and phone, normalizes whitespace") {
    val df = Seq(
      "Hello <b>world</b>   contact me at jane.doe+x@corp.example.org or +1 (555) 123-4567 today",
      "no pii here",
      "<div><p>tags   only</p></div>"
    ).toDF("text")
    val out = df.select(TextClean.clean($"text")).as[String].collect()
    assert(out(0) == "Hello world contact me at [EMAIL] or [PHONE] today")
    assert(out(1) == "no pii here")
    assert(out(2) == "tags only")
  }

  test("redaction leaves surrounding text intact and handles multiple hits") {
    val df = Seq("a@b.co and c@d.org; call 555-123-9876 or (555) 000-1111.").toDF("text")
    val out = df.select(TextClean.redactPii($"text")).as[String].head()
    assert(out == "[EMAIL] and [EMAIL]; call [PHONE] or [PHONE].")
  }
}
