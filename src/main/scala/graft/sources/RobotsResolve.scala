package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFC 9309 §2.3.1.2 robots-redirect chain resolution, shared by
  * [[FrontierQueries]]'s sitemap tier and [[ArchiveQueries]]'s
  * `RobotsFrontier` scan (round 14 — previously two ~40-line inlined
  * copies that had to stay semantically identical).
  *
  * Input: a (kind, host, path, …) row frame where
  *  - kind 7 = a well-known-path 3xx origin (host = origin host,
  *    path = the first redirect target, canonicalized),
  *  - kind 8 = a robots-pathed redirect edge (host = source uri,
  *    path = target uri),
  *  - kind 12 = a 5xx (or unparseable) robots-pathed target uri.
  *
  * The origin 3xx is redirect 1; redirects 2..5 follow through the
  * kind-8 catalog as four bounded unhinted uri equi-joins — O(hosts)
  * frames on both sides, so a redirect cycle costs exactly the cap,
  * never a fixpoint hang. Returns (host, cur, more, dead): the chain's
  * landing uri after at most five hops, `more` non-null when a sixth
  * hop is still pending (§2.3.1.3 "unavailable" — the caller applies
  * no rules), `dead` non-null when the landing is a kind-12 uri
  * (§2.3.1.4 "unreachable" — the caller synthesizes a complete
  * disallow). A landing with both null is a captured body uri the
  * caller re-keys to the origin host.
  */
private[sources] object RobotsResolve {

  def chains(raw: DataFrame): DataFrame = {
    val origins = raw.filter(col("kind") === 7)
      .select(col("host"), col("path").as("cur"))
    val redges = raw.filter(col("kind") === 8)
      .select(col("host").as("e_src"), col("path").as("e_dst"))
    var cur = origins
    for (_ <- 2 to 5)
      cur = cur.join(redges, cur("cur") === redges("e_src"), "left")
        .select(col("host"), coalesce(col("e_dst"), col("cur")).as("cur"))
    val pending = redges.select(col("e_src")).distinct()
      .withColumn("more", lit(1))
    val unreach = raw.filter(col("kind") === 12)
      .select(col("host").as("u_uri")).distinct()
      .withColumn("dead", lit(1))
    cur
      .join(pending, cur("cur") === pending("e_src"), "left")
      .join(unreach, col("cur") === col("u_uri"), "left")
      .select(col("host"), col("cur"), col("more"), col("dead"))
  }
}
