package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PSL registrable-domain join must beat the last-2-labels
  * heuristic exactly where the heuristic is wrong: multi-label public
  * suffixes. The fixture plants `site{k}.shop.co.uk` hosts — the
  * heuristic buckets ALL of them as one bogus `co.uk` domain; the PSL
  * longest-suffix match must yield `shop.co.uk`.
  */
class PslDomainSpec extends SparkSpec {

  private def urls = Relational11.normalizedUrls(spark, sfDir)

  test("multi-label suffix hosts bucket by PSL, never as the bare suffix") {
    val domains =
      urls.select(col("domain")).distinct().collect().map(_.getString(0)).toSet
    assert(domains.contains("shop.co.uk"), domains.toString)
    assert(!domains.contains("co.uk"),
      "a host bucketed as the bare public suffix — the heuristic leaked through")
    // the heuristic genuinely disagrees on this fixture (the test is
    // not vacuous): last-2-labels on the .co.uk hosts gives co.uk
    val heuristic = urls
      .withColumn("host2", substring_index(col("nurl"), "://", -1))
      .withColumn("host3", substring_index(col("host2"), "/", 1))
      .withColumn(
        "h2dom",
        array_join(slice(split(substring_index(col("host3"), ":", 1), "[.]"), -2, 2), ".")
      )
      .filter(col("h2dom") === "co.uk")
    assert(heuristic.count() > 0, "fixture lost its multi-label-suffix arm")
  }

  test("single-label suffixes and the no-match fallback still give last-2 labels") {
    val d = urls
      .select(col("domain"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(d.contains("example.com"), d.toString)
    // .org hosts keep their own registrable domain (site{k}.org)
    assert(d.exists(x => x.endsWith(".org") && x.startsWith("site")), d.toString)
  }

  test("wildcard rule: any label under *.ck is itself a public suffix") {
    val d = urls
      .select(col("domain"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    // host siteN.fooK.ck → public suffix fooK.ck → registrable is the
    // full 3-label host, one domain per siteN (never a fooK.ck bucket)
    val wild = d.filter(_.endsWith(".ck")).filterNot(_ == "www.ck")
    assert(wild.nonEmpty, d.toString)
    assert(wild.forall(x => x.count(_ == '.') == 2 && x.startsWith("site")),
      s"wildcard arm mis-bucketed: $wild")
  }

  test("exception rule: !www.ck makes www.ck ONE registrable bucket") {
    val d = urls.filter(col("domain") === "www.ck")
    // every siteN.www.ck host collapses into the single www.ck domain
    // — the exception carves it out of the *.ck wildcard (were the
    // exception missing, each siteN.www.ck would be its own domain)
    assert(d.count() > 0, "exception arm vanished from the fixture")
    val hosts = d
      .select(substring_index(substring_index(col("nurl"), "://", -1), "/", 1)
        .as("h"))
      .distinct()
      .collect()
      .map(_.getString(0))
    assert(hosts.length > 1,
      s"fixture too small: one host cannot show the collapse ($hosts)")
    assert(hosts.forall(_.endsWith(".www.ck")), hosts.mkString(","))
  }

  test("the parser reads the published format: comments, wildcard, exception") {
    val rules = Psl.parse(
      Iterator(
        "// comment",
        "",
        "com",
        "co.uk",
        "*.ck",
        "!www.ck"
      ))
    assert(rules === Seq(
      Psl.Rule("com", 1, "norm"),
      Psl.Rule("co.uk", 2, "norm"),
      Psl.Rule("ck", 1, "wild"),
      Psl.Rule("www.ck", 2, "exc")
    ))
    // and the bundled fixture actually carries all three rule kinds
    assert(Relational11.PSL_RULES.map(_.kind).toSet === Set("norm", "wild", "exc"))
  }
}
