package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text primitives (SURVEY.md §2.C).
  *
  * Every primitive exists twice: as a Spark `Column` (pure Catalyst
  * higher-order functions — codegen-capable, no UDFs, fully distributed)
  * and as a DuckDB SQL fragment (`*Sql`), built from the same constants,
  * so the dedup/fingerprint family gets REAL value oracles instead of
  * rows-only checks. All hashing is an explicit polynomial fold over
  * character codes — engine-independent integer arithmetic.
  */
object TextFns {

  /** Modulus for all polynomial hashing: 2^31-1 (Mersenne prime).
    * Keeps every intermediate < 2^62, safely inside BIGINT.
    */
  val P = 2147483647L

  /** MinHash signature width. */
  val MinhashK = 16

  /** MinHash LSH banding: 4 bands × 4 rows. */
  val Bands = 4
  val RowsPerBand = 4

  // ---------------------------------------------------------------- tokenize

  /** Lowercased whitespace tokens, empties dropped. */
  def tokenize(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), w => w =!= "")

  def tokenizeSql(c: String): String =
    raw"list_filter(string_split_regex(lower(trim($c)), '\s+'), w -> w <> '')"

  // ---------------------------------------------------------------- polyhash

  /** Polynomial rolling hash over a string's character codes:
    * fold(acc = 0; acc = (acc*31 + code) mod P). Identical fold order on
    * both engines → identical values. Spark side is the codegen'd
    * [[PolyCharFold]] expression (single UTF-8 pass, no interpreted
    * lambda).
    */
  def charFold(c: Column): Column = PolyCharFold.column(c, 31L)

  def charFoldSql(c: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($c, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $P)"

  // ---------------------------------------------------------------- shingles

  /** Distinct 3-word shingle hashes by word-hash composition: each word
    * is char-folded ONCE, then shingle i combines three word hashes
    * arithmetically — O(chars + shingles) per doc instead of the
    * O(chars × shingles) of re-folding every shingle's text. The token
    * hash array is bound via a single-element `transform` lambda so it is
    * evaluated exactly once per row (a bare sub-expression would be
    * re-evaluated at every `element_at` after CollapseProject inlines it;
    * higher-order functions get no codegen CSE).
    */
  def shingleHashes(words: Column): Column =
    element_at(transform(array(tokenHashes(words)), a => shinglesOfHashes(a)), 1)

  /** ((wh_i·131 + wh_{i+1}) mod P · 131 + wh_{i+2}) mod P — intermediates
    * stay < 2^39, safely in BIGINT on both engines.
    */
  private def shinglesOfHashes(a: Column): Column =
    when(size(a) >= 3,
      array_distinct(transform(sequence(lit(1), size(a) - 2), i =>
        (((element_at(a, i) * 131 + element_at(a, i + 1)) % P) * 131
          + element_at(a, i + 2)) % P)))
      .otherwise(array().cast("array<bigint>"))

  def shingleHashesSql(words: String): String =
    s"list_transform([${tokenHashesSql(words)}], a -> " +
      s"CASE WHEN len(a) >= 3 THEN " +
      s"list_distinct(list_transform(generate_series(1, len(a)-2), i -> " +
      s"((a[i]*131 + a[i+1]) % $P * 131 + a[i+2]) % $P)) " +
      s"ELSE [] END)[1]"

  /** POSITION-PRESERVING 3-gram hash sequence (same arithmetic as
    * [[shingleHashes]] but ordered, with duplicates) — the winnowing
    * input, where window positions matter.
    */
  def orderedShingleHashes(words: Column): Column =
    element_at(transform(array(tokenHashes(words)), a =>
      when(size(a) >= 3,
        transform(sequence(lit(1), size(a) - 2), i =>
          (((element_at(a, i) * 131 + element_at(a, i + 1)) % P) * 131
            + element_at(a, i + 2)) % P))
        .otherwise(array().cast("array<bigint>"))), 1)

  def orderedShingleHashesSql(words: String): String =
    s"list_transform([${tokenHashesSql(words)}], a -> " +
      s"CASE WHEN len(a) >= 3 THEN " +
      s"list_transform(generate_series(1, len(a)-2), i -> " +
      s"((a[i]*131 + a[i+1]) % $P * 131 + a[i+2]) % $P) " +
      s"ELSE [] END)[1]"

  // ---------------------------------------------------------------- minhash

  private def aCoef(i: String) = s"(1000003*$i + 12289)"
  private def bCoef(i: String) = s"(999983*$i + 15373)"

  /** MinHash signature: k permutation-hashes h_i(x) = (a_i·x+b_i) mod P,
    * signature[i] = min over shingle hashes. Spark side is the codegen'd
    * [[MinHashSig]] expression; [[minhashSigSql]] is the same arithmetic
    * for the oracle.
    */
  def minhashSig(hashesCol: String): Column =
    MinHashSig.column(org.apache.spark.sql.functions.col(hashesCol), MinhashK)

  def minhashSigSql(hashes: String): String =
    s"list_transform(generate_series(0, ${MinhashK - 1}), i -> " +
      s"list_min(list_transform($hashes, x -> (${aCoef("i")} * x + ${bCoef("i")}) % $P)))"

  /** LSH band key: polynomial fold of one r-row slice of the signature. */
  def bandKey(sigCol: String, bandCol: String): Column =
    expr(s"aggregate(slice($sigCol, $bandCol * $RowsPerBand + 1, $RowsPerBand), " +
      s"CAST(0 AS BIGINT), (acc, v) -> (acc * 131 + v) % $P)")

  def bandKeySql(sig: String, band: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"$sig[$band*$RowsPerBand+1 : $band*$RowsPerBand+$RowsPerBand]), " +
      s"(acc, v) -> (acc * 131 + v) % $P)"

  /** Fraction of agreeing minhash positions — the LSH jaccard estimate.
    * count/16.0 is an exact power-of-two division: bit-identical.
    */
  def sigAgreement(sa: String, sb: String): Column =
    expr(s"CAST(size(filter(sequence(1, $MinhashK), i -> element_at($sa, i) = element_at($sb, i))) AS DOUBLE) / $MinhashK.0")

  def sigAgreementSql(sa: String, sb: String): String =
    s"CAST(len(list_filter(generate_series(1, $MinhashK), i -> $sa[i] = $sb[i])) AS DOUBLE) / $MinhashK.0"

  // ---------------------------------------------------------------- simhash

  /** 32-bit SimHash over (multiset of) token hashes: each hash is
    * mixed by squaring mod P (a raw short-token polynomial fold has
    * biased high bits — see [[SimHash32]]'s scaladoc), then bit i is
    * set iff the sum of ±1 votes from each token's mixed bit i is
    * positive.
    */
  def simhash(tokenHashesCol: String): Column =
    expr(s"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      s"CASE WHEN aggregate($tokenHashesCol, CAST(0 AS BIGINT), (a, h) -> a + (shiftright((h * h) % $P, i) & 1) * 2 - 1) > 0 " +
      s"THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)")

  def simhashSql(tokenHashes: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, 31), i -> " +
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($tokenHashes, h -> (((h * h) % $P >> i) & 1) * 2 - 1)), (a, b) -> a + b) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b)"

  /** Token hash array (with multiplicity) for simhash. */
  def tokenHashes(words: Column): Column =
    transform(words, w => charFold(w))

  def tokenHashesSql(words: String): String =
    s"list_transform($words, w -> ${charFoldSql("w")})"

  /** DuckDB twin of [[WindowFoldHash]]: position-preserving k-token
    * window hashes out[i] = fold((acc·131 + wh) mod P) over
    * wh ∈ tokenHashes[i..i+k−1]; empty below k tokens. Bound through a
    * single-element list so the token-hash array evaluates once.
    */
  def windowFoldHashesSql(words: String, k: Int): String =
    s"list_transform([${tokenHashesSql(words)}], a -> " +
      s"CASE WHEN len(a) >= $k THEN " +
      s"list_transform(generate_series(1, len(a) - $k + 1), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), a[i : i + $k - 1]), " +
      s"(acc, x) -> (acc * 131 + x) % $P)) " +
      s"ELSE [] END)[1]"

  // ---------------------------------------------------------------- langid

  /** Stopword-family markers for the n-gram language heuristic. */
  val EnMarkers = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

  private def inList(vals: Seq[String]) = vals.map(v => s"'$v'").mkString("(", ", ", ")")

  def markerRatio(wordsCol: String): Column =
    expr(s"CAST(size(filter($wordsCol, w -> w IN ${inList(EnMarkers)})) AS DOUBLE) / size($wordsCol)")

  def markerRatioSql(words: String): String =
    s"CAST(len(list_filter($words, w -> w IN ${inList(EnMarkers)})) AS DOUBLE) / len($words)"
}
