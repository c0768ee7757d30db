package graft.sources.cdc

/** RFC 4013 SASLprep — the stringprep profile SCRAM applies to
  * passwords (RFC 5802: `SaltedPassword := Hi(Normalize(password),…)`).
  * Pure JVM: the B.1/C.* tables below are transcribed from RFC 3454's
  * appendices, NFKC comes from java.text.Normalizer, and the bidi
  * rule from RFC 3454 §6 uses Character.getDirectionality.
  *
  *  1. Map: non-ASCII spaces (C.1.2) → U+0020; "commonly mapped to
  *     nothing" (B.1) → removed;
  *  2. Normalize: Unicode NFKC;
  *  3. Prohibit: C.1.2 (none survive the mapping, but NFKC can mint
  *     none anyway), C.2 controls, C.3 private use, C.4
  *     non-characters, C.5 surrogates, C.6/C.7/C.8 inappropriate /
  *     display-changing, C.9 tagging;
  *  4. Bidi: a string containing any RandALCat character must contain
  *     no LCat character and must both start and end RandALCat.
  *
  * [[prepare]] throws on prohibited output; [[prepareOrRaw]] follows
  * PostgreSQL's documented behavior (pg_saslprep): a password that
  * fails SASLprep is used RAW rather than rejected, so a server-side
  * stored credential derived from the raw bytes keeps matching. */
object SaslPrep {

  /** B.1 commonly-mapped-to-nothing. */
  private def mapToNothing(cp: Int): Boolean = cp match {
    case 0x00AD | 0x034F | 0x1806 | 0x180B | 0x180C | 0x180D |
         0x200B | 0x200C | 0x200D | 0x2060 | 0xFEFF => true
    case _ => cp >= 0xFE00 && cp <= 0xFE0F
  }

  /** C.1.2 non-ASCII space characters. */
  private def nonAsciiSpace(cp: Int): Boolean = cp match {
    case 0x00A0 | 0x1680 | 0x202F | 0x205F | 0x3000 => true
    case _ => cp >= 0x2000 && cp <= 0x200B
  }

  /** Prohibited output: C.1.2 + C.2.1 + C.2.2 + C.3 + C.4 + C.5 +
    * C.6 + C.7 + C.8 + C.9 (RFC 4013 §2.3). */
  private def prohibited(cp: Int): Boolean =
    nonAsciiSpace(cp) ||                            // C.1.2
    cp < 0x20 || cp == 0x7F ||                      // C.2.1
    (cp >= 0x80 && cp <= 0x9F) ||                   // C.2.2 (Latin-1 controls)
    cp == 0x06DD || cp == 0x070F || cp == 0x180E ||
    cp == 0x200C || cp == 0x200D ||
    cp == 0x2028 || cp == 0x2029 ||
    (cp >= 0x2060 && cp <= 0x2063) ||
    (cp >= 0x206A && cp <= 0x206F) ||               // also C.8
    cp == 0xFEFF ||
    (cp >= 0xFFF9 && cp <= 0xFFFD) ||               // C.2.2 FFF9-FFFC + C.6 FFFD
    (cp >= 0x1D173 && cp <= 0x1D17A) ||
    (cp >= 0xE000 && cp <= 0xF8FF) ||               // C.3 private use
    (cp >= 0xF0000 && cp <= 0xFFFFD) ||
    (cp >= 0x100000 && cp <= 0x10FFFD) ||
    (cp >= 0xFDD0 && cp <= 0xFDEF) ||               // C.4 non-characters
    (cp & 0xFFFE) == 0xFFFE ||                      // …every plane's FFFE/FFFF
    (cp >= 0xD800 && cp <= 0xDFFF) ||               // C.5 surrogates
    (cp >= 0x2FF0 && cp <= 0x2FFB) ||               // C.7 ideographic desc.
    cp == 0x0340 || cp == 0x0341 ||                 // C.8 deprecated accents
    cp == 0x200E || cp == 0x200F ||
    (cp >= 0x202A && cp <= 0x202E) ||
    cp == 0xE0001 ||                                // C.9 tagging
    (cp >= 0xE0020 && cp <= 0xE007F) ||
    // RFC 4013 §2.5: unassigned code points are prohibited in stored
    // strings, and SCRAM passwords are stored strings. pg_saslprep
    // enforces this (src/common/saslprep.c table A.1) and falls back
    // to the RAW password when it trips — without this check we would
    // NFKC-normalize the rest of the string and derive a salted key
    // the server never stored. JVM Unicode tables track pg's
    // regenerated A.1 closely enough for the fallback to agree.
    Character.getType(cp) == Character.UNASSIGNED

  private def isRandAL(cp: Int): Boolean = {
    val d = Character.getDirectionality(cp)
    d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
      d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC
  }
  private def isL(cp: Int): Boolean =
    Character.getDirectionality(cp) == Character.DIRECTIONALITY_LEFT_TO_RIGHT

  /** Full SASLprep; throws IllegalArgumentException on prohibited
    * output or a bidi violation. */
  def prepare(s: String): String = {
    // step 1: mapping
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      // B.1 wins the 200B overlap with C.1.2 (ZWSP maps to NOTHING,
      // not to space — postgres/cyrus resolve the RFC overlap the
      // same way)
      if (mapToNothing(cp)) ()
      else if (nonAsciiSpace(cp)) sb.append(' ')
      else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // step 2: NFKC
    val norm = java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFKC)
    // steps 3+4: prohibition + bidi over the normalized code points
    val cps = norm.codePoints().toArray
    cps.foreach { cp =>
      if (prohibited(cp)) throw new IllegalArgumentException(
        f"saslprep: prohibited code point U+$cp%04X")
    }
    if (cps.exists(isRandAL)) {
      if (cps.exists(isL)) throw new IllegalArgumentException(
        "saslprep: string mixes RandALCat and LCat characters")
      if (!isRandAL(cps.head) || !isRandAL(cps.last))
        throw new IllegalArgumentException(
          "saslprep: RandALCat string must start and end RandALCat")
    }
    norm
  }

  /** PostgreSQL semantics (pg_saslprep): prep when possible, fall back
    * to the RAW password when the input is prohibited — credentials
    * derived from raw bytes keep working. Identity for ASCII. */
  def prepareOrRaw(s: String): String =
    try prepare(s) catch { case _: IllegalArgumentException => s }
}
