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
  }

  object duck {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)), (acc, v) -> acc + v)"

    def cosine(a: String, b: String): String =
      s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }
}
