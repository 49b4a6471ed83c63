package graft

import graft.functions.{DecodeXmlEntities, XmlEntityDecoder}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Entity decoder semantics: named ISO-8879 resolution, numeric refs,
  * markup safety, builtin preservation, unknown passthrough. */
class XmlEntitiesSpec extends SparkSpec {
  import spark.implicits._

  private def dec(s: String): String =
    XmlEntityDecoder.decode(UTF8String.fromString(s)).toString

  test("named entities resolve to their unicode characters") {
    assert(dec("&alpha;&beta;-blocker") == "αβ-blocker")
    assert(dec("37&deg;C &plusmn; 2") == "37°C ± 2")
    assert(dec("Caf&eacute; r&ocirc;le") == "Café rôle")
    assert(dec("x &le; y &ne; z") == "x ≤ y ≠ z")
  }

  test("decimal and hex numeric references resolve") {
    assert(dec("&#955;=280nm") == "λ=280nm")
    assert(dec("&#x3BC;M and &#X3BC;M") == "μM and μM")
    assert(dec("&#8212;") == "—")
    // supplementary plane (surrogate pair in UTF-16) and control rejection
    assert(dec("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(dec("&#7;") == "&#7;") // C0 control: left untouched
  }

  test("XML builtins are left for the parser; markup codepoints re-encode") {
    assert(dec("a &amp; b &lt; c") == "a &amp; b &lt; c")
    assert(dec("&#38;&#60;&#62;&#34;&#39;") == "&amp;&lt;&gt;&quot;&apos;")
  }

  test("unknown names, bare ampersands, and entity-free text pass through") {
    assert(dec("&notanentity; stays") == "&notanentity; stays")
    assert(dec("AT&T R&D") == "AT&T R&D")
    assert(dec("no entities here") == "no entities here")
    assert(dec("unterminated &alpha") == "unterminated &alpha")
  }

  test("codegen path agrees with the static decoder over a column") {
    val df = Seq("&alpha;-helix", "5&#x2032;-UTR", "plain", "&amp;&unknown;")
      .toDF("s")
    val got = df.select(DecodeXmlEntities.decodeXml(col("s"))).as[String].collect()
    assert(got.toSeq == Seq("α-helix", "5′-UTR", "plain", "&amp;&unknown;"))
  }

  test("surrogate-range numeric references are left untouched (no lone surrogates)") {
    val df = Seq("bad &#xD800; ref", "also &#55296; bad", "edge &#xDFFF;").toDF("s")
    val got = df.select(DecodeXmlEntities.decodeXml(col("s"))).as[String].collect()
    assert(got.toSeq == Seq("bad &#xD800; ref", "also &#55296; bad", "edge &#xDFFF;"))
  }

  test("ISO 9573-13 / MathML extension names resolve (incl. multi-codepoint)") {
    // plane-1 script/fraktur/open-face letters arrive as surrogate pairs
    assert(dec("&Ascr;&Afr;&Aopf;") ==
      new String(Character.toChars(0x1D49C)) + new String(Character.toChars(0x1D504)) +
        new String(Character.toChars(0x1D538)))
    assert(dec("f&af;(x)") == "f⁡(x)")          // invisible function application
    assert(dec("a&rarrtl;b") == "a↣b")          // isoamsa tailed arrow
    assert(dec("&b.alpha;-helix") == "-helix") // dotted isogrk4 name, PUA
    // multi-codepoint expansion with a markup char: '<' re-encodes to &lt;
    assert(dec("x&nvlt;y") == "x&lt;⃒y")
    // the 93 names shared with ISO-8879/HTML4 keep the HTML value (phi is
    // the only one whose ISO value differs)
    assert(dec("&phi;") == "φ")
    assert(XmlEntityDecoder.knownEntities.size > 1800)
  }

  test("medline round trip decodes the injected entity probe") {
    val docs = Seq((1L, "one two three four five six seven eight nine ten " * 3))
      .toDF("doc_id", "text")
    val r = graft.operators.XmlIngest.medlineEntitiesRoundTrip(docs)
      .select("title").as[String].head()
    assert(r.endsWith(graft.operators.XmlIngest.EntityProbeDecoded), r)
    assert(!r.contains("&alpha;"), r)
  }
}
