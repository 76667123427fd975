package graft.model

/** Code-point string ordering (≡ UTF-8 binary order, what Spark's
  * min/sort_array/ORDER BY use). Java's `String.compareTo` orders by
  * UTF-16 code UNIT, which ranks supplementary-plane characters (whose
  * surrogates sit at U+D800..U+DFFF) below U+E000..U+FFFF — so any
  * driver-side `.sorted`/`.min` that must agree with a Spark-side
  * ordering (dictionary index assignment, min-label tie-breaks) has to
  * compare code points instead (round-4/5 advisor).
  */
object CodePoint {

  def compare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  val ordering: Ordering[String] = (a: String, b: String) => compare(a, b)

  def sorted(xs: Seq[String]): Seq[String] = xs.sorted(ordering)

  def min(xs: Iterable[String]): String = xs.min(ordering)
}
