package lucy.text

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — public algorithm, implemented from
  * the published description). Pure function over lowercase ASCII words;
  * wired behind LucySpec.stemming (OFF in the frozen v1 spec — this
  * exists so reconciliation against the real reference, SURVEY.md §0.1,
  * is a one-flag flip with goldens regenerated both ways).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var b = word.toCharArray
    var k = b.length - 1

    @inline def isConsonant(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isConsonant(i - 1)
      case _ => true
    }

    /** m(): number of VC sequences in b[0..j]. */
    def measure(j: Int): Int = {
      var n = 0
      var i = 0
      // skip initial consonants
      while (i <= j && isConsonant(i)) i += 1
      while (i <= j) {
        while (i <= j && !isConsonant(i)) i += 1 // vowels
        if (i > j) return n
        n += 1
        while (i <= j && isConsonant(i)) i += 1 // consonants
      }
      n
    }

    def hasVowel(j: Int): Boolean = (0 to j).exists(i => !isConsonant(i))

    def endsDoubleC(j: Int): Boolean =
      j >= 1 && b(j) == b(j - 1) && isConsonant(j)

    /** *o: cvc where last c is not w, x or y. */
    def cvc(j: Int): Boolean =
      j >= 2 && isConsonant(j) && !isConsonant(j - 1) && isConsonant(j - 2) &&
        b(j) != 'w' && b(j) != 'x' && b(j) != 'y'

    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k + 1 - l + i) != s.charAt(i)) return false
        i += 1
      }
      true
    }

    /** stem length (index of last char of the stem) if `ends(s)`. */
    def stemEnd(s: String): Int = k - s.length

    def setTo(s: String, j: Int): Unit = {
      // replace suffix after j with s
      val nb = new Array[Char](j + 1 + s.length)
      System.arraycopy(b, 0, nb, 0, j + 1)
      s.getChars(0, s.length, nb, j + 1)
      b = nb
      k = nb.length - 1
    }

    // ---- step 1a ----
    if (ends("sses")) setTo("ss", stemEnd("sses"))
    else if (ends("ies")) setTo("i", stemEnd("ies"))
    else if (ends("ss")) ()
    else if (ends("s")) setTo("", stemEnd("s"))

    // ---- step 1b ----
    var extraEd = false
    if (ends("eed")) {
      val j = stemEnd("eed")
      if (measure(j) > 0) setTo("ee", j)
    } else if (ends("ed") && hasVowel(stemEnd("ed"))) {
      setTo("", stemEnd("ed")); extraEd = true
    } else if (ends("ing") && hasVowel(stemEnd("ing"))) {
      setTo("", stemEnd("ing")); extraEd = true
    }
    if (extraEd) {
      if (ends("at")) setTo("ate", stemEnd("at"))
      else if (ends("bl")) setTo("ble", stemEnd("bl"))
      else if (ends("iz")) setTo("ize", stemEnd("iz"))
      else if (endsDoubleC(k) && b(k) != 'l' && b(k) != 's' && b(k) != 'z') {
        b = b.take(k); k -= 1
      } else if (measure(k) == 1 && cvc(k)) setTo("e", k)
    }

    // ---- step 1c ----
    if (ends("y") && hasVowel(stemEnd("y"))) b(k) = 'i'

    // ---- step 2 ----
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.find(p => ends(p._1)).foreach { case (suf, rep) =>
      val j = stemEnd(suf)
      if (measure(j) > 0) setTo(rep, j)
    }

    // ---- step 3 ----
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find(p => ends(p._1)).foreach { case (suf, rep) =>
      val j = stemEnd(suf)
      if (measure(j) > 0) setTo(rep, j)
    }

    // ---- step 4 ----
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(ends).foreach { suf =>
      val j = stemEnd(suf)
      val ok =
        if (suf == "ion") j >= 0 && (b(j) == 's' || b(j) == 't')
        else true
      if (ok && measure(j) > 1) setTo("", j)
    }

    // ---- step 5a ----
    if (ends("e")) {
      val j = stemEnd("e")
      val m = measure(j)
      if (m > 1 || (m == 1 && !cvc(j))) setTo("", j)
    }
    // ---- step 5b ----
    if (endsDoubleC(k) && b(k) == 'l' && measure(k) > 1) { b = b.take(k); k -= 1 }

    new String(b, 0, k + 1)
  }
}
