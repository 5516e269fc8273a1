package lucy.text

import org.scalatest.funsuite.AnyFunSuite
import lucy.LucySpec

/** LucySpec §8.2 table-driven cases (SURVEY.md §5.2). */
class TokenizerSpec extends AnyFunSuite {

  test("lowercases and splits on non-alphanumerics") {
    assert(LucySpec.tokenize("Spark, SHUFFLE! partition-index")
      .sameElements(Array("spark", "shuffle", "partition", "index")))
  }

  test("drops stopwords") {
    assert(LucySpec.tokenize("the spark and the shuffle of a partition")
      .sameElements(Array("spark", "shuffle", "partition")))
  }

  test("stopword-only input yields empty") {
    assert(LucySpec.tokenize("the and of a").isEmpty)
  }

  test("empty / null input") {
    assert(LucySpec.tokenize("").isEmpty)
    assert(LucySpec.tokenize(null).isEmpty)
  }

  test("digits are token chars; mixed alnum survives") {
    assert(LucySpec.tokenize("http2 42 q4a").sameElements(Array("http2", "42", "q4a")))
  }

  test("tokens longer than 64 chars are dropped") {
    val long65 = "z" * 65
    val ok64 = "y" * 64
    assert(LucySpec.tokenize(s"spark $long65 $ok64").sameElements(Array("spark", ok64)))
  }

  test("non-Latin scripts drop out (ASCII-only tokenizer)") {
    assert(LucySpec.tokenize("中文 текст spark").sameElements(Array("spark")))
  }

  test("duplicates kept in order; docLen = token count") {
    assert(LucySpec.tokenize("spark spark shuffle spark").length === 4)
  }

  test("queryTerms: distinct + ascending order") {
    assert(LucySpec.queryTerms("spark spark SHUFFLE apple")
      .sameElements(Array("apple", "shuffle", "spark")))
    assert(LucySpec.queryTerms("the and of").isEmpty)
  }
}
