package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextAnalysisSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokens drops empty strings from leading/trailing/multiple whitespace") {
    one[Seq[String]](TextAnalysis.tokens(col("t")), "  a  b\tc \n") shouldBe Seq("a", "b", "c")
    one[Int](TextAnalysis.tokenCount(col("t")), "one two  three") shouldBe 3
  }

  test("bpeish token count splits words, digits, and punctuation runs") {
    // "don't stop, 42!" -> don ' t stop , 42 !
    one[Int](TextAnalysis.bpeishTokenCount(col("t")), "don't stop, 42!") shouldBe 7
  }

  test("ratios on a crafted string") {
    val t = "AB c, 12!" // len 9: 2 upper, 2 digits, 2 punct
    one[Double](TextAnalysis.punctRatio(col("t")), t) shouldBe (2.0 / 9) +- 1e-12
    one[Double](TextAnalysis.digitRatio(col("t")), t) shouldBe (2.0 / 9) +- 1e-12
    one[Double](TextAnalysis.upperRatio(col("t")), t) shouldBe (2.0 / 9) +- 1e-12
  }

  test("stopword ratio and mean token length") {
    val t = "the cat sat on the mat" // stopwords: the, on, the = 3/6
    one[Double](TextAnalysis.stopwordRatio(col("t")), t) shouldBe 0.5 +- 1e-12
    one[Double](TextAnalysis.meanTokenLength(col("t")), t) shouldBe (17.0 / 6) +- 1e-12
  }

  test("duplicate-line signals on a crafted boilerplate document") {
    // 5 non-empty lines: "nav" x3 (3 chars each), "body text" (9), "x" (1)
    val t = "nav\nbody text\nnav\n\nx\nnav"
    one[Double](TextAnalysis.duplicateLineRatio(col("t")), t) shouldBe (2.0 / 5) +- 1e-12
    // dup chars = (3-1)*3 = 6 of total 3+9+3+1+3 = 19 line chars
    one[Double](TextAnalysis.duplicateLineCharRatio(col("t")), t) shouldBe (6.0 / 19) +- 1e-12
    // no lines / single lines degrade to 0
    one[Double](TextAnalysis.duplicateLineRatio(col("t")), "") shouldBe 0.0
    one[Double](TextAnalysis.duplicateLineCharRatio(col("t")), "only line") shouldBe 0.0
  }

  test("top n-gram ratio flags a repeated phrase") {
    // bigrams of "buy now buy now buy now": [buy now, now buy, buy now,
    // now buy, buy now] -> top = 3/5
    val t = "buy now buy now buy now"
    one[Double](TextAnalysis.topNgramRatio(col("t"), 2), t) shouldBe (3.0 / 5) +- 1e-12
    // all-distinct bigrams -> 1/n
    one[Double](TextAnalysis.topNgramRatio(col("t"), 2), "a b c d") shouldBe (1.0 / 3) +- 1e-12
    // fewer tokens than n: the whole doc is one shingle -> ratio 1
    one[Double](TextAnalysis.topNgramRatio(col("t"), 2), "single") shouldBe 1.0
  }

  test("bullet and ellipsis line ratios") {
    val t = "- first item\n  * second\nplain line\nto be continued...\nx"
    one[Double](TextAnalysis.bulletLineRatio(col("t")), t) shouldBe (2.0 / 5) +- 1e-12
    one[Double](TextAnalysis.ellipsisLineRatio(col("t")), t) shouldBe (1.0 / 5) +- 1e-12
  }

  test("PII counts and redaction on a crafted document") {
    val t = "mail a.b+c@example.org or visit https://ex.com/a?q=1 " +
      "from 10.0.0.1 and call +1 (555) 123-4567 now"
    one[Int](TextAnalysis.emailCount(col("t")), t) shouldBe 1
    one[Int](TextAnalysis.urlCount(col("t")), t) shouldBe 1
    one[Int](TextAnalysis.ipv4Count(col("t")), t) shouldBe 1
    one[Int](TextAnalysis.phoneCount(col("t")), t) shouldBe 1
    val red = one[String](TextAnalysis.redactPii(col("t")), t)
    red should include("<EMAIL>")
    red should include("<URL>")
    red should include("<IP>")
    red should include("<PHONE>")
    red should not include "example.org"
    red should not include "10.0.0.1"
    red should not include "555"
    // clean text untouched
    one[String](TextAnalysis.redactPii(col("t")), "no pii here") shouldBe "no pii here"
  }

  test("quality score: clean English prose scores high, garbage scores low") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the old barn"
    val bad = "!!! ??? ### 111 222 333 !!!"
    val g = one[Double](TextAnalysis.qualityScore(col("t")), good)
    val b = one[Double](TextAnalysis.qualityScore(col("t")), bad)
    g should be >= 5.0 / 6
    b should be <= 0.5
  }

  test("language id picks the dominant function-word language") {
    one[String](TextAnalysis.languageId(col("t")),
      "the cat is on the mat and it is not from here") shouldBe "en"
    one[String](TextAnalysis.languageId(col("t")),
      "der Hund ist nicht in der Stadt und das ist gut") shouldBe "de"
    one[String](TextAnalysis.languageId(col("t")),
      "el perro es grande y la casa es blanca en la calle") shouldBe "es"
    one[String](TextAnalysis.languageId(col("t")), "你好世界") shouldBe "zh"
    one[String](TextAnalysis.languageId(col("t")), "zzz qqq xxx www") shouldBe "und"
  }

  test("fingerprint: identical texts share the sketch; edits shift few hashes") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq((a, a, a + " extra")).toDF("x", "y", "z")
    val r = df.select(
      TextAnalysis.fingerprint(col("x")).as("fx"),
      TextAnalysis.fingerprint(col("y")).as("fy"),
      TextAnalysis.fingerprint(col("z")).as("fz")).head()
    val fx = r.getAs[scala.collection.Seq[Long]]("fx"); val fy = r.getAs[scala.collection.Seq[Long]]("fy")
    val fz = r.getAs[scala.collection.Seq[Long]]("fz")
    fx shouldBe fy
    fx.toSet.intersect(fz.toSet).size should be >= (fx.size * 3 / 4)
  }

  test("tfidf: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTermsWithCount(docs, "doc_id", "text", n = 2, k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Double]("score"))).toSet
    // df(a)=2 -> idf ln(1)=0; df(b)=df(c)=1 -> idf ln(2)
    out shouldBe Set(
      (1L, "b", math.log(2.0)), (1L, "a", 0.0),
      (2L, "c", math.log(2.0)), (2L, "a", 0.0))
    // the in-plan-N overload (count subquery, no driver action) agrees
    val inPlan = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Double]("score"))).toSet
    inPlan shouldBe out
  }

  test("vertical tab counts as whitespace (explicit class, Java/RE2 parity)") {
    val df = Seq(Tuple1("a\u000Bb c")).toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount(col("t")).as("n"),
      TextAnalysis.bpeishTokenCount(col("t")).as("b")).head()
    r.getAs[Int]("n") shouldBe 3   // VT splits tokens
    r.getAs[Int]("b") shouldBe 3   // and is not a countable symbol
  }

  test("normalizeText: control chars, case, whitespace runs, trim, null") {
    val cases = Seq(
      "  Hello\t\tWORLD  "          -> "hello world",
      "a\u0000b\u0007c"             -> "a b c",   // control chars -> spaces
      "Mixed\r\nLine\nBreaks"       -> "mixed line breaks",
      "\u000Bleading VT"            -> "leading vt",
      "ÜNÏCODE Stays"               -> "ünïcode stays", // lowercased, not stripped
      ""                            -> "",
      "   "                         -> "",
      "\u007F"                      -> "")        // DEL alone -> empty
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0))
    got shouldBe cases.map(_._2).toArray
    // null propagates
    Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .head().isNullAt(0) shouldBe true
  }

  test("withQuality adds all columns and keeps row count") {
    val df = Seq((1L, "the cat sat"), (2L, "xyz")).toDF("doc_id", "text")
    val out = TextAnalysis.withQuality(df, "text")
    out.count() shouldBe 2
    out.columns should contain allOf ("n_tokens", "quality_score", "stopword_ratio")
  }
}
