package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks over a document text column: tokens,
  * shingles, hashing. All native expressions (no UDFs).
  */
object TextFunctions {

  /** Whitespace tokens (single-space corpus; empties filtered so runs of
    * spaces behave). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct word n-gram shingles, e.g. n=3: "a b c". Empty array for
    * docs shorter than n tokens. Backed by the native [[WordShingles]]
    * expression (single JVM pass; ~20× the interpreted-HOF form it
    * replaced — see that class's doc). */
  def shingles(text: Column, n: Int): Column = WordShingles(text, n)

  /** The original pure-HOF shingle formulation (zip of n shifted slices),
    * kept as the built-ins reference implementation — pinned equal to
    * [[shingles]] by TextFunctionsSpec. (The slice/zip form rather than
    * indexing: `element_at(toks, i+j)` inside a position lambda would
    * re-evaluate the whole tokenize pipeline per element — measured 7.2 s
    * to build a 260k-shingle index at sf0.1.) */
  def shinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val k = size(toks) - (n - 1)
    val shifted = (0 until n).map(j => slice(toks, lit(j + 1), k))
    val zipped = shifted.reduce((a, b) =>
      zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    when(k >= 1, array_distinct(zipped))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature of a string-array column: for seed i in [0, k),
    * sig[i] = min over elements of xxhash64(i, element). One pass over the
    * array per seed via nested higher-order functions; no explode, no
    * shuffle.
    *
    * ⚠ Eval-once rule for nested HOFs: `arr` MUST be a materialized
    * attribute (its own projection behind an exchange/cache barrier), not
    * an inline expression — Catalyst's CollapseProject inlines single-use
    * aliases into lambda bodies, and a lambda body is re-evaluated per
    * outer element, turning an inlined shingle pipeline into k×
    * recomputation per row. (Observed: 650 s on one task before the fix;
    * sub-second after.)
    */
  def minHashSignature(arr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(arr, s => xxhash64(i, s))))

  /** LSH band hashes of a minhash signature (array<long> attribute):
    * bands of `rowsPerBand`, each band hashed to one long. Pairs sharing
    * any band hash are candidate near-duplicates. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(concat_ws(",",
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>"))))

  /** Fused MinHash + LSH banding over a string-array attribute: band b's
    * hash combines the `rowsPerBand` minhashes for seeds
    * [b*rowsPerBand, (b+1)*rowsPerBand). Work per row is exactly
    * bands×rowsPerBand passes over `arr` — the minimum for minhash —
    * with no intermediate signature column to be re-inlined.
    * Same eval-once caveat as [[minHashSignature]]: pass an attribute.
    */
  def minHashBands(arr: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(concat_ws(",",
        transform(sequence(lit(0), lit(rowsPerBand - 1)), r =>
          array_min(transform(arr, s =>
            xxhash64(b * rowsPerBand + r, s))))
          .cast("array<string>"))))

  /** [[minHashBands]] over PRE-HASHED shingles (an array<long> attribute of
    * xxhash64(shingle) values): each seed's permutation re-hashes the
    * 8-byte base hash (fixed-width — ~10× cheaper than re-hashing the
    * shingle string per seed, and overflow-free under ANSI mode, unlike an
    * LCG mix which would throw ARITHMETIC_OVERFLOW). Base-hash the array
    * once per row (`transform(sh, s => xxhash64(s))`, materialized behind
    * a barrier), then band from it. */
  def minHashBandsFromHashes(h0: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(concat_ws(",",
        transform(sequence(lit(0), lit(rowsPerBand - 1)), r =>
          array_min(transform(h0, h =>
            xxhash64(b * rowsPerBand + r, h))))
          .cast("array<string>"))))

  /** 64-bit SimHash of a token-array column: token hash bit j votes +1/-1
    * on output bit j; bit set where the vote sum is positive. Computed with
    * aggregate/zip_with — one pass, no explode. */
  def simHash(toks: Column): Column = {
    // shiftright/shiftleft with a *column* shift amount go through
    // call_function (the functions._ overloads only take a literal Int).
    def shr(e: Column, n: Column): Column =
      call_function("shiftright", e, n.cast("int"))
    def shl(e: Column, n: Column): Column =
      call_function("shiftleft", e, n.cast("int"))
    val idx = typedlit((0 until 64).map(_.toLong))
    val votes = aggregate(
      toks,
      typedlit(Seq.fill(64)(0L)),
      (acc, w) => {
        val h = xxhash64(w)
        zip_with(acc, idx, (a, j) =>
          a + when(shr(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, idx, (v, j) =>
        when(v > 0, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Karp–Rabin rolling polynomial fingerprint over tokens:
    * h = sum tok_hash * B^i mod M, streamed as h = h*B + tok_hash mod M.
    * Uses xxhash64 per token folded into [0, M); M = 2^31-1 (Mersenne
    * prime — keeps acc*B + tok well under Long overflow), B = 31.
    * Order-sensitive (unlike a set hash) — reordered documents get
    * different fingerprints, equal documents identical ones. */
  def rollingFingerprint(toks: Column): Column = {
    val M = 2147483647L // 2^31 - 1
    aggregate(
      toks,
      lit(0L),
      (acc, w) => pmod(acc * 31L + pmod(xxhash64(w), lit(M)), lit(M)))
  }
}
