package graft.util

/** Shared deterministic hashing primitives (one definition — the seeded
  * embedder and the sign-LSH hyperplane stream must never diverge).
  */
object Hashing {
  /** splitmix64 finalizer: a statistically strong 64-bit mixer. */
  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
