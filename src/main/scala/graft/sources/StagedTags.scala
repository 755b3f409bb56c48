package graft.sources

/** Session-scoped staging tags for persisted index tables.
  *
  * Round 11 derived tags from `String.hashCode` — a 32-bit hash, so two
  * distinct sf dirs (or parameter keys) could collide and silently
  * share or overwrite each other's `graft_*` tables within a session
  * (ADVICE r11). Tags are now a 48-bit md5 prefix of the full key:
  * still deterministic per key (reruns of a gate in one session reuse
  * the staged build), collision odds ~2⁻⁴⁸ per pair instead of 2⁻³².
  * Hex-only output keeps the PlanSnapshot tag-stripping regexes valid.
  */
private[graft] object StagedTags {
  def tagOf(key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }
}
