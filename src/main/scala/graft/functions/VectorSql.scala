package graft.functions

/** Dual-dialect float-vector expressions (embedding similarity).
  *
  * Both dialects compute the dot product as a strict LEFT-TO-RIGHT
  * fold over double products of the float components. Float→double
  * widening is exact and IEEE double add/mul are deterministic, so
  * Spark and DuckDB produce bitwise-identical similarities — the
  * property the hash-based correctness oracle needs. (Deliberately
  * NOT DuckDB's `list_dot_product`, whose accumulation order is
  * unspecified.)
  *
  * Scale note: the Spark rendering is a pure built-in higher-order
  * function chain (`zip_with` + `aggregate`), evaluated inside
  * whole-stage codegen per row — no UDF boxing, no shuffle. Top-k over
  * the scored rows compiles to `TakeOrderedAndProject` (per-partition
  * heaps + driver merge), the right plan at any scale.
  */
object VectorSql {

  object spark {
    /** Native codegen expression (graft.functions.catalyst.DotF32);
      * bitwise-equal to [[dotHof]]. */
    def dot(a: String, b: String): String = s"graft_dot_f32($a, $b)"

    /** Built-in-only HOF rendering (interpreted; kept for parity
      * tests and registration-free environments). */
    def dotHof(a: String, b: String): String =
      s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"

    /** Cosine similarity; denominators via the same fold. */
    def cosine(a: String, b: String): String =
      s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

    /** Vector L2 norm. Precompute this per VECTOR (one fold), then
      * use `cosineWithNorms` per PAIR (one fold instead of three) —
      * sqrt(dot(a,a)) is the same IEEE ops either way, so the result
      * is bitwise-identical to `cosine`. */
    def norm(a: String): String = s"sqrt(${dot(a, a)})"

    /** Cosine from a pair dot and two precomputed norm columns. */
    def cosineWithNorms(a: String, b: String, normA: String, normB: String): String =
      s"(${dot(a, b)} / ($normA * $normB))"

    /** Dot of `a` against deterministic pseudo-random hyperplane `p`
      * (components from [[VectorSql.planeComponent]], small integers —
      * exact in float AND double, so both dialects agree bitwise).
      * Rendered as a literal float array through the native codegen
      * dot — constant-folded per plane, no per-row regeneration. */
    def dotPlane(a: String, p: Int, dim: Int): String = {
      val comps = (0 until dim).map(i => s"cast(${planeComponent(p, i)} as float)")
      s"${dot(a, s"array(${comps.mkString(",")})")}"
    }
  }

  /** Component `i` of pseudo-random hyperplane `p`: integer-derived,
    * zero-mean-ish in [-48, 48]. The SAME closed form is rendered
    * arithmetically in the DuckDB dialect, so sign bits agree.
    *
    * The mix is a CUBE mod a large prime of `x = p·1000003 + i + 1` —
    * deliberately non-linear in (p, i). An affine form
    * (`a·p + b·i mod m`) makes every plane a value-shift of every
    * other, so their projection signs correlate and band keys
    * concentrate (measured: 358 distinct 16-bit keys over 3k random
    * vectors vs ~2450 for the cubic mix). All intermediates fit int64:
    * x < 2^26, x² < 2^52, (x² mod P)·x < 2^57. */
  def planeComponent(p: Int, i: Int): Int = {
    val P = 1000000007L
    val x = p.toLong * 1000003L + i.toLong + 1L
    ((((x * x) % P) * x % P) % 97L).toInt - 48
  }

  object duck {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)), (acc, v) -> acc + v)"

    def cosine(a: String, b: String): String =
      s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

    /** Dot against hyperplane `p`, components via the same closed form
      * as [[VectorSql.planeComponent]] (rendered arithmetically: the
      * 1-based range index `i` maps to component index `i - 1`, so
      * `x = p·1000003 + (i-1) + 1 = p·1000003 + i`). */
    def dotPlane(a: String, p: Int): String = {
      val x = s"($p::BIGINT * 1000003 + i)"
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
        s"i -> ($a)[i]::DOUBLE * (((($x * $x) % 1000000007) * $x % 1000000007) % 97 - 48)::DOUBLE)), " +
        s"(acc, v) -> acc + v)"
    }
  }
}
