package graft.functions

/** K-minimum-values distinct-count sketch primitives, shared by the
  * batch replay query (`q_kmv_replay`) and the streaming twin
  * ([[graft.streaming.DistinctCountStream]]).
  *
  * The sketch keeps the k smallest DISTINCT 32-bit hash values seen;
  * with a uniform hash the k-th smallest order statistic estimates
  * cardinality as (k−1)·2³²∕h₍k₎. Inserting is order-independent (a
  * value can only enter if it is below the current k-th minimum, which
  * never increases), so any partition/micro-batch interleaving yields
  * the identical state — that is what makes the streaming twin exactly
  * equal the batch computation, and what makes distributed merges
  * (union of sets, re-truncate to k) exact.
  *
  * [[hash32]] is bit-identical to the SQL side's
  * `conv(substring(md5(x), 1, 8), 16, 10)` (Spark) /
  * `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)` (DuckDB): the first
  * 4 md5 bytes of the UTF-8 encoding read as an unsigned 32-bit int.
  */
object Kmv {
  val Range: Long = 1L << 32

  // per-thread digest: getInstance per value would be a JCA provider
  // lookup + allocation on the streaming hot path (millions of
  // offers/micro-batch); reset() makes reuse bit-identical
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 32 md5 bits of the UTF-8 bytes, as an unsigned long. */
  def hash32(s: String): Long = {
    val m = md5.get()
    m.reset()
    val d = m.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Integer.toUnsignedLong(
      ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff))
  }

  /** Offer one hash to a ≤k sorted set; mutates and returns it.
    * No-op when h is a duplicate or above a full set's k-th minimum. */
  def offer(set: scala.collection.mutable.TreeSet[Long], h: Long,
            k: Int): scala.collection.mutable.TreeSet[Long] = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.max && !set.contains(h)) { set.add(h); set.remove(set.max); () }
    set
  }

  /** (k−1)·2³²∕h₍k₎ with integer division — the exact arithmetic the
    * SQL replays use (`div`/`//`); below k distinct hashes the sketch
    * IS the distinct set, so the count is exact. */
  def estimate(kUsed: Int, k: Int, hk: Long): Long =
    if (kUsed < k) kUsed.toLong else (k - 1).toLong * Range / hk
}
