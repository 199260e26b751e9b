package graft.ops

/** Parser for the Public Suffix List's PUBLISHED file format
  * (publicsuffix.org/list/): one rule per line, `//` comments and
  * blank lines ignored, `*.` wildcard rules (any single label in the
  * starred position is part of the public suffix), `!` exception
  * rules (a registrable name carved out of a wildcard). The repo
  * bundles a fixture slice at `graft/psl_fixture.dat`; a production
  * build drops in the full published file — same parser, same join.
  *
  * Each rule parses to the JOINABLE form the registrable-domain
  * lookup consumes: `key` is the rule's literal label suffix
  * (wildcards keyed by the labels after `*.`), `keyLabels` its label
  * count (the join depth — a host matches via its last-`keyLabels`
  * labels), and the public-suffix size the rule assigns when it
  * prevails is keyLabels for a normal rule, keyLabels + 1 for a
  * wildcard (the `*` consumes one host label), keyLabels − 1 for an
  * exception. Prevailing rule per the PSL algorithm: exceptions beat
  * everything, then the longest public suffix; no match falls back to
  * the implicit `*` rule (public suffix = last label).
  */
object Psl {

  final case class Rule(key: String, keyLabels: Int, kind: String)

  def parse(lines: Iterator[String]): Seq[Rule] =
    lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        if (l.startsWith("!")) {
          val key = l.drop(1)
          Rule(key, key.count(_ == '.') + 1, "exc")
        } else if (l.startsWith("*.")) {
          val key = l.drop(2)
          Rule(key, key.count(_ == '.') + 1, "wild")
        } else Rule(l, l.count(_ == '.') + 1, "norm")
      }
      .toSeq

  /** The bundled fixture slice, parsed once. */
  lazy val fixtureRules: Seq[Rule] = {
    val in = getClass.getResourceAsStream("/graft/psl_fixture.dat")
    require(in != null, "graft/psl_fixture.dat missing from the classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines())
    finally src.close()
  }
}
