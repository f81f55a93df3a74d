package graft.plans

/** Parsed public-suffix rule table for registrable-domain ("eTLD+1")
  * extraction — the domain grouping key crawl curation caps on.
  *
  * Rules use the publicsuffix.org list syntax (a PUBLIC community
  * dataset): `com` / `co.uk` exact suffixes, `*.ck` wildcards (every
  * single label under `ck` is a suffix), `!www.ck` exceptions (carved
  * back out of a wildcard — `www.ck` IS a registrable domain). Blank
  * lines and `//` comments are tolerated so a caller can feed the raw
  * PSL file line-by-line via [[SuffixTable.fromRules]]. This box is
  * offline, so [[graft.plans.RegistrableDomain.DefaultRules]] ships a
  * starter ICANN set; production callers supply the full list — the
  * table rides whole-stage codegen as one broadcast-reference object
  * exactly like the blocklist kernel's word set, so list size never
  * touches the per-row cost (three hash probes per candidate suffix).
  */
final class SuffixTable(rules: Seq[String]) extends Serializable {
  val exact = new java.util.HashSet[String]()
  val wildcardParents = new java.util.HashSet[String]()
  val exceptions = new java.util.HashSet[String]()
  rules.foreach { r0 =>
    val r = r0.trim.toLowerCase(java.util.Locale.ROOT)
    if (r.nonEmpty && !r.startsWith("//")) {
      if (r.startsWith("!")) exceptions.add(r.substring(1))
      else if (r.startsWith("*.")) wildcardParents.add(r.substring(2))
      else exact.add(r)
    }
  }
}

object SuffixTable {
  def fromRules(rules: Seq[String]): SuffixTable = new SuffixTable(rules)
}
