package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit pins for the markup→text kernel's r19 extensions — the entity
  * decode ORDER semantics the c11 oracle exercises end-to-end but only
  * over the constructed corpus: numeric/named character references,
  * single-decode through `&amp;`, nbsp-to-space, and the explicit
  * whitespace class (Java `\s` ⊅ RE2 `\s` divergence on `\x0B`).
  */
class MarkupEntitySpec extends AnyFunSuite {

  private def clean(s: String): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(s).toDF("t").select(GroupC.markupClean(col("t"))).head.getString(0)
  }

  test("numeric and named refs decode to the real characters") {
    assert(clean("it&#8217;s &#x2019;x&#x2019; &#8216;y&apos; &#x27;z&#39;")
      == "it’s ’x’ ‘y' 'z'")
    assert(clean("a&#8211;b c&#8212;d e&ndash;f g&mdash;h etc&#8230; m&hellip;")
      == "a–b c—d e–f g—h etc… m…")
    assert(clean("&#8220;q&#8221; &ldquo;r&rdquo; &lsquo;s&rsquo;")
      == "“q” “r” ‘s’")
  }

  test("nbsp family decodes to a PLAIN space and collapses with neighbors") {
    // U+00A0 is outside both engines' whitespace classes — decoding to
    // ' ' keeps downstream token splits meaningful
    assert(clean("a&nbsp;b") == "a b")
    assert(clean("a &#160; b&#xa0;&#xA0;c") == "a b c")
  }

  test("single-decode: &amp;-encoded refs survive as literal ref text") {
    // the kept arm: &amp; decodes LAST, so the numeric pairs have
    // already run and cannot re-match the newly produced '&'
    assert(clean("&amp;lt; &amp;#8217; &amp;nbsp; &amp;ndash;")
      == "&lt; &#8217; &nbsp; &ndash;")
    assert(clean("&amp;amp;") == "&amp;")
  }

  test("explicit whitespace class collapses \\x0B identically to the oracle's RE2 semantics") {
    // Java \s includes \x0B, RE2's does not — the shared constant names
    // the class explicitly so both engines collapse it (r19 ADVICE)
    assert(clean("a\u000Bb\u000B\u000Bc") == "a b c")
    assert(clean("a \t\n\f\r b") == "a b")
  }
}
