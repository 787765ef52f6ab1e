package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for LLM-data-pipeline work, composed from
 * `org.apache.spark.sql.functions._` only — every one stays inside
 * whole-stage codegen and has an exactly-equivalent DuckDB SQL rendering
 * (used by the correctness oracle; the SQL strings live next to the Scala so
 * the two definitions cannot drift independently — see `TextFunctions.sql*`).
 */
object TextFunctions {

  /** Whitespace-token count. `split` on a single space matches the synthetic
    * corpus and DuckDB's `string_split(text, ' ')` exactly. */
  def tokenCount(text: Column): Column = size(split(text, " "))
  val sqlTokenCount = "len(string_split(%s, ' '))"

  /** Word array. */
  def words(text: Column): Column = split(text, " ")

  /** DuckDB rendering of [[HashUtil.fnv1a64]] over an ASCII string expression:
    * fold the codepoints with HUGEINT mod-2^64 arithmetic (the byte-level FNV
    * stream and the codepoint stream coincide exactly for ASCII — guard the
    * input with [[sqlAsciiGuard]] so a non-ASCII row fails the oracle loudly
    * instead of silently diverging from the UTF-8-byte Spark kernel). */
  def sqlFnv1a64(v: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |  list_transform(range(1, length($v) + 1), i -> unicode($v[i])::HUGEINT)),
       |  (acc, c) -> ((xor(acc::UBIGINT, c::UBIGINT)::HUGEINT) * 1099511628211::HUGEINT
       |               % 18446744073709551616::HUGEINT))""".stripMargin

  /** Wrap an (id-typed BIGINT) expression so the oracle ERRORS on non-ASCII
    * text rather than silently hashing codepoints that no longer equal the
    * Spark side's UTF-8 bytes: `octet_length(encode(text)) == length(text)`
    * iff every codepoint is single-byte. */
  def sqlAsciiGuard(idExpr: String, textCol: String): String =
    s"CASE WHEN octet_length(encode($textCol)) <> length($textCol) " +
      s"THEN error('non-ascii $textCol: codepoint-folded hash oracle invalid') " +
      s"ELSE $idExpr END"

  /** k-word shingles (ordered, with duplicates). Empty array when the
    * document has fewer than k words. */
  def wordShingles(text: Column, k: Int): Column =
    hashFunctions.word_shingles(text, k)
  def sqlWordShingles(col: String, k: Int): String = {
    val parts = (0 until k).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, greatest(len(string_split($col, ' ')) - ${k - 1}, 0)), " +
      s"i -> $parts)"
  }

  // language marker words; shared by the Scala and SQL renderings
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "fr" -> Seq("le", "la", "les", "et", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "las", "y", "una"))

  /** Heuristic language id: arg-max of marker-word hits with fixed priority
    * order; "und" (undetermined) when no marker hits. */
  def langIdGuess(text: Column): Column =
    // null text renders as "und" (matches the SQL twin's CASE fall-through)
    coalesce(hashFunctions.lang_id_guess(text, langMarkers), lit("und"))
  def sqlLangIdGuess(col: String): String = {
    def cnt(ms: Seq[String]) =
      s"len(list_filter(string_split($col, ' '), t -> t IN (${ms.map(m => s"'$m'").mkString(",")})))"
    val cs = langMarkers.map { case (lang, ms) => lang -> cnt(ms) }
    val best = cs.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    cs.reverse.foldLeft("'und'") { case (acc, (lang, c)) =>
      s"CASE WHEN $c > 0 AND $c = $best THEN '$lang' ELSE $acc END"
    }
  }

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))
  val sqlPunctCount = "len(regexp_extract_all(%s, '[.,!?;:]'))"

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * non-alphanumeric symbols each count as one token — the cheap regex
    * approximation of a byte-pair-encoded vocabulary's token count. */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeTokenPattern), lit(0)))
  val sqlBpeTokenCount = s"len(regexp_extract_all(lower(%s), '$bpeTokenPattern'))"

  /**
   * Boundary-stable decimal rounding reproducible across engines: round the
   * IEEE product x·10^d at INTEGER scale, then divide. The product is the
   * same double in every engine (IEEE multiply is correctly rounded) and
   * integer-scale half-away rounding of a double is exact everywhere —
   * whereas `round(x, d)` internally rescales differently per engine
   * (Spark: exact-BigDecimal HALF_UP; DuckDB: float multiply) and the two
   * disagree when x sits within an ulp of a 5·10^-(d+1) boundary. Found
   * live: 8 of 5000 sf0.1 quality scores straddled .00005 boundaries.
   */
  def stableRound(c: Column, digits: Int): Column = {
    val scale = math.pow(10.0, digits)
    round(c * lit(scale)) / lit(scale)
  }
  def sqlStableRound(e: String, digits: Int): String = {
    val scale = "1" + "0" * digits
    s"(round(($e) * $scale.0) / $scale.0)"
  }

  /**
   * Quality score in [0,1]: equal-weight blend of length saturation,
   * punctuation cleanliness, marker-stopword presence and mean word length —
   * the standard cheap pre-filter shape for pretraining corpora. Pure
   * double arithmetic, so the DuckDB rendering is bit-identical.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val punct = punctCount(text).cast("double")
    val stop = size(filter(words(text),
      t => t.isin(langMarkers.flatMap(_._2).map(lit): _*))).cast("double")
    val lenScore = least(nTok / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0))
    val stopScore = least(stop * 10.0 / greatest(nTok, lit(1.0)), lit(1.0))
    val wordLenScore = least((nChar / greatest(nTok, lit(1.0))) / 10.0, lit(1.0))
    (lenScore + punctScore + stopScore + wordLenScore) / 4.0
  }
  def sqlQualityScore(col: String): String = {
    val nTok = s"CAST(len(string_split($col, ' ')) AS DOUBLE)"
    val nChar = s"CAST(len($col) AS DOUBLE)"
    val punct = s"CAST(len(regexp_extract_all($col, '[.,!?;:]')) AS DOUBLE)"
    val allMarkers = langMarkers.flatMap(_._2).map(m => s"'$m'").mkString(",")
    val stop = s"CAST(len(list_filter(string_split($col, ' '), t -> t IN ($allMarkers))) AS DOUBLE)"
    s"(least($nTok / 100.0, 1.0) + (1.0 - least($punct / greatest($nTok, 1.0), 1.0)) + " +
      s"least($stop * 10.0 / greatest($nTok, 1.0), 1.0) + " +
      s"least(($nChar / greatest($nTok, 1.0)) / 10.0, 1.0)) / 4.0"
  }

  /** Document fingerprint: 128-bit content hash of the normalized text,
    * rendered as hex (md5 in both engines ⇒ oracle-identical). */
  def fingerprint(text: Column): Column = md5(lower(trim(text)).cast("binary"))
  val sqlFingerprint = "md5(lower(trim(%s)))"

  /** ASCII punctuation as explicit ranges (the POSIX `punct` set). Spelled
    * out rather than named (`\p{Punct}` / `[[:punct:]]`) so Java's regex
    * engine and RE2 (DuckDB) are guaranteed to see the identical class. */
  private[graft] val AsciiPunctClass = "[!-/:-@\\[-`{-~]"
  /** ASCII whitespace, again explicit: Java's `\s` includes `\x0B` while
    * RE2's does not — naming the characters removes the disagreement. */
  private[graft] val AsciiSpaceClass = "[ \\t\\n\\x0B\\f\\r]+"

  /**
   * Canonicalization for fuzzy-exact dedup (the C4/RefinedWeb-style
   * pre-hash pass): punctuation → space, whitespace runs collapsed to one
   * space, trimmed, lowercased. Two trivially-reformatted copies of a
   * document (casing, punctuation, line-wrapping) normalize to the same
   * string and hash-collide in [[graft.operators.Dedup.exactRows]] — the
   * cheapest near-dup win at corpus scale, a pure codegen'd per-row chain
   * with no shuffle of its own. ASCII-exact by construction (see the class
   * constants); lowercasing agrees across engines for ASCII only, so
   * oracles over non-ASCII text must guard with [[sqlAsciiGuard]].
   */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, AsciiPunctClass, " "), AsciiSpaceClass, " ")))
  def sqlNormalizeText(col: String): String =
    s"lower(trim(regexp_replace(regexp_replace($col, '$AsciiPunctClass', ' ', 'g'), " +
      s"'$AsciiSpaceClass', ' ', 'g')))"

  /** Character-set Jaccard similarity (DuckDB `jaccard()` semantics:
    * similarity of the distinct-character sets of the two strings). */
  def charJaccard(a: Column, b: Column): Column = {
    val ca = array_distinct(split(a, ""))
    val cb = array_distinct(split(b, ""))
    size(array_intersect(ca, cb)).cast("double") /
      size(array_union(ca, cb)).cast("double")
  }

  /**
   * PII patterns a pretraining pipeline scrubs before packing (the
   * C4/Dolma-style masking pass): email addresses, NANP-shaped phone
   * numbers, IPv4 addresses. Deliberately restricted to regex syntax that
   * Java's engine and RE2 (DuckDB) interpret identically — no lookarounds,
   * no backreferences — so the oracle twin is exact. Order matters: each
   * pattern runs over the PREVIOUS pattern's output (identically in both
   * engines), and the mask tokens contain no digits, so masks never
   * re-match. A heuristic scrubber by design: a version string like
   * "10.0.55.7" masks as an IP — over-masking beats leaking.
   */
  private[graft] val PiiPatterns: Seq[(String, String)] = Seq(
    "<EMAIL>" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "<PHONE>" -> "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b|\\b[0-9]{3}[-. ][0-9]{4}\\b",
    "<IP>" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Mask every [[PiiPatterns]] match with its category token — a pure
    * per-row expression chain (three codegen'd regexp_replace calls), so
    * scrubbing 100 TB is a zero-shuffle scan stage. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (tok, pat)) =>
      regexp_replace(acc, pat, tok)
    }

  /** Total [[PiiPatterns]] matches in `text` (counted against the same
    * progressively-masked text the replacement chain sees). */
  def piiCount(text: Column): Column =
    PiiPatterns.foldLeft((text, lit(0))) { case ((t, n), (tok, pat)) =>
      (regexp_replace(t, pat, tok), n + regexp_count(t, lit(pat)))
    }._2

  // DuckDB standard string literals pass backslashes through verbatim, so
  // the Scala pattern (single backslashes after unescaping) is emitted raw
  def sqlRedactPii(col: String): String =
    PiiPatterns.foldLeft(col) { case (acc, (tok, pat)) =>
      s"regexp_replace($acc, '$pat', '$tok', 'g')"
    }
  def sqlPiiCount(col: String): String = {
    val (_, terms) = PiiPatterns.foldLeft((col, Seq.empty[String])) {
      case ((t, ts), (tok, pat)) =>
        (s"regexp_replace($t, '$pat', '$tok', 'g')",
          ts :+ s"len(regexp_extract_all($t, '$pat'))")
    }
    terms.mkString("(", " + ", ")")
  }
}
