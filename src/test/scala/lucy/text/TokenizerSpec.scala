package lucy.text

import org.scalatest.funsuite.AnyFunSuite
import lucy.LucySpec
import lucy.text.PorterStemmer

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

  test("Porter stemmer: classic vocabulary pairs from the published paper") {
    val pairs = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
      "digitizer" -> "digit", "conformabli" -> "conform",
      "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    pairs.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) === want, s"stem($in)")
    }
  }

  test("stemming flag: off by default (goldens frozen), on via tokenizeWith") {
    assert(LucySpec.stemming === false)
    assert(LucySpec.tokenize("motoring ponies").sameElements(Array("motoring", "ponies")))
    assert(LucySpec.tokenizeWith("motoring ponies", stem = true)
      .sameElements(Array("motor", "poni")))
    // stemming applies after stopword/length filtering: token SET identical
    val raw = LucySpec.tokenizeWith("The cats were filing happily", stem = false)
    val st = LucySpec.tokenizeWith("The cats were filing happily", stem = true)
    assert(raw.length === st.length)
  }
}
