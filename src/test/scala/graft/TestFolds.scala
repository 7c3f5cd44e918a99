package graft

/** Independent reference implementations used by multiple specs to
  * cross-check the codegen kernels. Written against the same SPEC as
  * the kernels (code-point iteration), not copied from them.
  */
object TestFolds {

  /** (acc*31 + codepoint) mod 1e9+7, iterating true code points —
    * matches `TextHashing.fingerprint` semantics including non-BMP
    * characters (a per-Char fold would diverge on surrogate pairs).
    */
  def fingerprintRef(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}
