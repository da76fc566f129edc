package graft.functions

/** Portable, SQL-expressible text-hashing primitives.
  *
  * Every builder here renders the SAME exact 64-bit integer arithmetic
  * in two dialects:
  *
  *   - `spark`: a Spark SQL expression string (pure built-in
  *     higher-order functions — Catalyst-optimized, codegen-friendly,
  *     no UDFs, no serialization boundary), and
  *   - `duck`: the equivalent DuckDB SQL used by the correctness
  *     oracle.
  *
  * Because the arithmetic is exact integer math, the two engines
  * produce bitwise-identical results, which is what makes hash-based
  * operators (minhash/LSH dedup, simhash, fingerprinting) verifiable
  * against an independent engine.
  *
  * Base hash: the polynomial rolling hash
  * `h(s) = fold_c (h * 31 + code(c)) mod P` with `P = 1e9+7`
  * (31*h + c < 2^35, no 64-bit overflow). Seeded family:
  * `h_i(s) = (a_i * h(s) + b_i) mod P` — universal hashing
  * (a_i < P, h < P so a_i*h < 2^60, no overflow).
  *
  * Scale note (100 TB design point): these are per-row scalar
  * expressions with no shuffle; they run inside whole-stage codegen
  * and scale linearly with input. The LSH layer on top (see
  * graft.operators.DedupOps) is what bounds the pairwise comparison
  * cost.
  */
object TextHash {

  val P: Long = 1000000007L

  /** Seed pair for the wide token hash's high half (independent of the
    * minhash [[Seeds]] so signature and fingerprint bits stay
    * uncorrelated). */
  val WideA: Long = 653167841L
  val WideB: Long = 422183977L

  /** Seed pair mixing the wide token hash's LOW half. The raw rolling
    * hash of a short token is numerically small (a t-char token is
    * < 31^t·maxCode, e.g. < 2^27 for 4 chars), so its high bits are
    * zero for every token and any simhash band built from bit
    * positions ~22..29 collapses to a handful of buckets — measured:
    * 2 distinct 15-bit band keys over a 3k-doc short-token corpus.
    * Passing the hash through a seeded affine map mod P first makes
    * all 30 low bits uniform (P covers 93% of the 2^30 range). */
  val MixA: Long = 536870923L
  val MixB: Long = 974711L

  /** Deterministic seed pairs (a_i, b_i) for the minhash family. */
  val Seeds: Seq[(Long, Long)] = Seq(
    (387143553L, 9231041L),
    (53442161L, 962287861L),
    (712662842L, 330806107L),
    (262095967L, 836118547L),
    (908715265L, 111000001L),
    (145674659L, 744919543L),
    (559086749L, 423489737L),
    (983190923L, 63895397L)
  )

  /** Spark SQL dialect — strings for `org.apache.spark.sql.functions.expr`. */
  object spark {
    /** Per-character code points of `s`, 1-indexed. */
    def charCodes(s: String): String =
      s"transform(sequence(1, length($s)), i -> ascii(substring($s, i, 1)))"

    /** Polynomial rolling hash of the string expression `s`, in [0, P).
      * Native codegen expression (graft.functions.catalyst.RollingHash),
      * bitwise-equal to [[rollingHashHof]]. */
    def rollingHash(s: String): String = s"graft_rolling_hash($s)"

    /** Built-in-only HOF rendering of the same hash (interpreted; kept
      * for environments without graft's function registration and for
      * parity tests against the native expression). */
    def rollingHashHof(s: String): String =
      s"aggregate(${charCodes(s)}, cast(0 as bigint), (h, c) -> (h * 31 + c) % $P)"

    /** Whitespace tokenization (single-space corpora). */
    def tokens(s: String): String = s"split($s, ' ')"

    /** 3-word shingles over a token-array expression `t`; whole-text
      * fallback below 3 tokens keeps the result non-empty. Native
      * codegen expression (graft.functions.catalyst.Shingles3),
      * bitwise-equal to [[shingles3Hof]]. */
    def shingles3(t: String, fallbackText: String): String =
      s"graft_shingles3($t, $fallbackText)"

    /** Built-in-only HOF rendering of the same shingles (interpreted;
      * registration-free environments and parity tests). */
    def shingles3Hof(t: String, fallbackText: String): String =
      s"CASE WHEN size($t) >= 3 THEN transform(sequence(1, size($t) - 2), " +
        s"i -> concat(element_at($t, i), ' ', element_at($t, i + 1), ' ', element_at($t, i + 2))) " +
        s"ELSE array($fallbackText) END"

    /** Seeded hash of an already-computed base-hash expression. */
    def seeded(h: String, a: Long, b: Long): String = s"(($a * $h + $b) % $P)"

    /** Min over the seeded-hash image of a shingle-array expression =
      * one minhash signature component. */
    def minhash(shinglesExpr: String, a: Long, b: Long): String =
      s"array_min(transform($shinglesExpr, sh -> ${seeded(rollingHash("sh"), a, b)}))"

    /** Base hashes of every element of a string-array expression —
      * materialize this ONCE, then derive each seeded minhash from it
      * (the char-level fold is the expensive part; the seeded family
      * is two integer ops per element). Native codegen expression. */
    def hashArray(arr: String): String = s"graft_hash_array($arr)"

    /** Minhash component from a precomputed base-hash array. Native
      * codegen expression (one pass, no per-element boxing). */
    def minhashFromHashes(hs: String, a: Long, b: Long): String =
      s"graft_seeded_min($hs, ${a}L, ${b}L)"

    /** HOF renderings of the two above (parity/testing). */
    def hashArrayHof(arr: String): String =
      s"transform($arr, sh -> ${rollingHashHof("sh")})"
    def minhashFromHashesHof(hs: String, a: Long, b: Long): String =
      s"array_min(transform($hs, h -> (($a * h + $b) % $P)))"

    /** Per-token `bits`-bit hashes of a token-array expression (native
      * hash per element; the base hash has 30 usable bits). */
    def tokenHashes(t: String, bits: Int): String = {
      require(bits <= 30, "rolling hash provides 30 usable bits")
      s"transform(${hashArray(t)}, h -> h % ${1L << bits})"
    }
    def tokenHashes16(t: String): String = tokenHashes(t, 16)

    /** Per-token WIDE hashes (31..60 bits): low 30 bits from a SEEDED
      * remix of the base rolling hash (raw low bits are biased for
      * short tokens — see [[TextHash.MixA]]), high `bits - 30` from an
      * independent seeded hash — four integer ops on top of the one
      * char-level fold. Wide fingerprints exist so LSH band-bucket
      * cardinality can grow with corpus size (see graft_simhash64). */
    def tokenHashesWide(t: String, bits: Int): String = {
      require(bits > 30 && bits <= 60, "wide token hashes span (30, 60] bits")
      val hiMod = 1L << (bits - 30)
      s"transform(${hashArray(t)}, h -> ((${MixA}L * h + ${MixB}L) % $P) + " +
        s"(((${WideA}L * h + ${WideB}L) % $P) % ${hiMod}L) * ${1L << 30}L)"
    }

    /** `bits`-bit simhash over a precomputed token-hash array
      * expression `hs`: for each bit, majority vote of +-1 over
      * tokens. Native single-pass codegen expression. */
    def simhashN(hs: String, bits: Int): String = s"graft_simhash($hs, $bits)"

    /** Wide (33..63-bit) simhash — bigint result. */
    def simhashWide(hs: String, bits: Int): String = s"graft_simhash64($hs, $bits)"

    /** HOF rendering of the same simhash (one fold per bit;
      * registration-free environments and parity tests). */
    def simhashNHof(hs: String, bits: Int): String =
      (0 until bits).map { j =>
        val bit = 1L << j
        val s = s"aggregate($hs, cast(0 as bigint), (acc, h) -> acc + CASE WHEN (h div $bit) % 2 = 1 THEN 1 ELSE -1 END)"
        s"CASE WHEN $s > 0 THEN $bit ELSE 0 END"
      }.mkString("(", " + ", ")")

    def simhash16(hs: String): String = simhashN(hs, 16)

    /** Count of tokens equal to a literal word (quotes doubled — SQL
      * string-literal escaping, needed for contractions like "l'"). */
    def tokenCount(t: String, word: String): String =
      s"size(filter($t, x -> x = '${word.replace("'", "''")}'))"

    /** Rolling hashes of the character k-grams of `s`, one per start
      * position. Materialize ONCE per row before windowing. Native
      * codegen expression (graft.functions.catalyst.KgramHashes):
      * one code-point pass, no gram-string allocation, where the HOF
      * rendering re-seeks the string per position (O(n²)). Callers
      * guard `length(s) >= k` (below that the native form is empty
      * where the HOF's descending sequence was an artifact). */
    def kgramHashes(s: String, k: Int): String =
      s"graft_kgram_hashes($s, $k)"

    /** Built-in-only HOF rendering of the same k-gram hashes
      * (interpreted; parity tests — defined only for length ≥ k).
      * Lambda variable named `kg`, not `i`: the rolling hash HOF's
      * inner lambda binds `i`. */
    def kgramHashesHof(s: String, k: Int): String =
      s"transform(sequence(1, length($s) - ${k - 1}), kg -> ${rollingHashHof(s"substring($s, kg, $k)")})"

    /** Winnowing (window-min) selection over a k-gram hash array
      * expression `h`: min hash of each length-`w` window, distinct,
      * sorted — the MOSS fingerprinting scheme's selection step. */
    def winnowFromHashes(h: String, w: Int): String =
      s"array_sort(array_distinct(transform(sequence(1, size($h) - ${w - 1}), " +
        s"wj -> array_min(slice($h, wj, $w)))))"
  }

  /** DuckDB dialect — strings for the driver's oracle SQL. */
  object duck {
    def charCodes(s: String): String =
      s"list_transform(range(1, length($s) + 1), i -> ascii(substr($s, i, 1))::BIGINT)"

    def rollingHash(s: String): String =
      s"list_reduce(list_prepend(0::BIGINT, ${charCodes(s)}), (h, c) -> (h * 31 + c) % $P)"

    def tokens(s: String): String = s"string_split($s, ' ')"

    def shingles3(t: String, fallbackText: String): String =
      s"CASE WHEN len($t) >= 3 THEN list_transform(range(1, len($t) - 1), " +
        s"i -> $t[i] || ' ' || $t[i + 1] || ' ' || $t[i + 2]) " +
        s"ELSE [$fallbackText] END"

    def seeded(h: String, a: Long, b: Long): String = s"(($a * $h + $b) % $P)"

    def minhash(shinglesExpr: String, a: Long, b: Long): String =
      s"list_min(list_transform($shinglesExpr, sh -> ${seeded(rollingHash("sh"), a, b)}))"

    def tokenHashes(t: String, bits: Int): String =
      s"list_transform($t, tk -> ${rollingHash("tk")} % ${1L << bits})"
    def tokenHashes16(t: String): String = tokenHashes(t, 16)

    /** Wide token hashes — same composition as spark.tokenHashesWide
      * (nested list_transform so the char fold runs once per token). */
    def tokenHashesWide(t: String, bits: Int): String = {
      require(bits > 30 && bits <= 60, "wide token hashes span (30, 60] bits")
      val hiMod = 1L << (bits - 30)
      s"list_transform(list_transform($t, tk -> ${rollingHash("tk")}), " +
        s"h -> (($MixA * h + $MixB) % $P) + ((($WideA * h + $WideB) % $P) % $hiMod) * ${1L << 30})"
    }

    def simhashN(hs: String, bits: Int): String =
      (0 until bits).map { j =>
        val bit = 1L << j
        val s = s"list_reduce(list_prepend(0::BIGINT, list_transform($hs, h -> CASE WHEN (h // $bit) % 2 = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END)), (acc, v) -> acc + v)"
        s"CASE WHEN $s > 0 THEN $bit ELSE 0 END"
      }.mkString("(", " + ", ")")

    def simhash16(hs: String): String = simhashN(hs, 16)

    def tokenCount(t: String, word: String): String =
      s"len(list_filter($t, x -> x = '${word.replace("'", "''")}'))"

    // Outer lambda variable deliberately NOT named `i`: the rolling
    // hash's charCodes lambda also binds `i`, and DuckDB (like SQL
    // lambda scoping generally) lets the inner binding shadow the
    // outer one — the k-gram start index would silently become the
    // character index.
    def kgramHashes(s: String, k: Int): String =
      s"list_transform(range(1, length($s) - ${k - 2}), kg -> ${rollingHash(s"substr($s, kg, $k)")})"

    def winnowFromHashes(h: String, w: Int): String =
      s"list_sort(list_distinct(list_transform(range(1, len($h) - ${w - 2}), " +
        s"wj -> list_min(($h)[wj:wj + ${w - 1}]))))"
  }
}
