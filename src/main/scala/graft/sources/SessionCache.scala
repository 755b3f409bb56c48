package graft.sources

import org.apache.spark.sql.SparkSession

/** Bounded per-session derive-once cache — the shared staging pattern
  * behind the CF/ANN/dedup query families: expensive derived state
  * (checkpointed frames, staged table tags) is computed once per
  * (session, key) and reused by every gate in the family.
  *
  * The SESSION is part of the key (ADVICE r11): cached frames hold
  * localCheckpoint blocks bound to the creating session's context — a
  * different session in the same JVM must derive its own state, never
  * be served frames whose blocks die with someone else's session.
  *
  * Growth is BOUNDED (ADVICE r12): a strong (SparkSession, …) tuple
  * key retains every session ever used — plus all its checkpointed
  * frames — for the JVM lifetime. A WeakHashMap would not fix it
  * (cached frames strongly reference their creating session, and
  * WeakHashMap holds values strongly, so the value→key chain pins
  * every entry anyway); instead this is an access-ordered LRU over
  * sessions capped at `maxSessions`. Evicting a session's entry drops
  * its frames (and the only cache-held reference to the session); a
  * still-live evicted session merely re-derives on next use, which is
  * deterministic and answer-identical.
  */
private[graft] final class SessionCache[K, V](maxSessions: Int = 4) {
  private val perSessionMaps =
    new java.util.LinkedHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[K, V]](
        16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            java.util.concurrent.ConcurrentHashMap[K, V]]): Boolean =
        size() > maxSessions
    }

  /** The cached value for (session, key), deriving it on first use.
    *
    * Deliberately NOT computeIfAbsent: a derive that re-enters this
    * cache for a DIFFERENT key (ccLabels stages the pair set first)
    * would mutate the map from inside the mapping function —
    * ConcurrentHashMap detects that as a recursive update and throws
    * (or deadlocks on a shared bin). get → derive outside any lock →
    * putIfAbsent instead; two racing callers may both derive, which is
    * harmless (derivation is deterministic; the loser's frame is
    * simply dropped).
    */
  def getOrDerive(spark: SparkSession, key: K)(derive: => V): V = {
    val perSession = perSessionMaps.synchronized {
      var m = perSessionMaps.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[K, V]()
        perSessionMaps.put(spark, m)
      }
      m
    }
    val existing = perSession.get(key)
    if (existing != null) existing
    else {
      val derived = derive
      val raced = perSession.putIfAbsent(key, derived)
      if (raced != null) raced else derived
    }
  }
}
