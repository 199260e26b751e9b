package graft

import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

import graft.SparkSpec

/** The cluster-install path: a session built with `GraftExtensions`
  * (what `spark.sql.extensions=graft.GraftExtensions` does at scale)
  * must come up with the as-of strategy in its planner and the
  * `graft_*` SQL functions resolvable — with zero Scala-side
  * `ensureRegistered` calls.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions session gets the strategy and SQL functions") {
    val shared = spark.asInstanceOf[ClassicSession] // force init, keep handle
    ClassicSession.clearActiveSession()
    ClassicSession.clearDefaultSession()
    try {
      val s2 = ClassicSession
        .builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne shared, "expected a fresh session")
      assert(
        s2.sessionState.planner.strategies.contains(plans.AsOfJoinStrategy),
        "AsOfJoinStrategy not in planner strategies"
      )
      val Array(r) = s2
        .sql(
          """SELECT graft_simhash32('hello world') AS sh,
            |  graft_rolling_fingerprint('hello world') AS fp,
            |  size(graft_shingle_hashes('hello world there')) AS n_shingles,
            |  graft_cosine_similarity(
            |    cast(array(1.0, 0.0) as array<float>),
            |    cast(array(1.0, 0.0) as array<float>)) AS cos
            |""".stripMargin
        )
        .collect()
      assert(r.getLong(0) === plans.TextSketches.simHash32("hello world"))
      assert(r.getDouble(3) === 1.0)
      assert(r.getInt(2) > 0)
      // the UDTF arrives through the same install path
      val nShingles = s2
        .sql(
          """SELECT h FROM (SELECT 'hello world there friend' AS t)
            |LATERAL VIEW graft_shingle_explode(t) g AS h""".stripMargin
        )
        .count()
      assert(nShingles === 2L) // 4 tokens -> 2 distinct 3-shingles
      // the injected optimizer rule fires through this path too:
      // bounded levenshtein over a non-foldable source gains the
      // length-band guard in the optimized plan
      val ruled = s2
        .range(5)
        .selectExpr("CAST(id AS STRING) AS a", "repeat('x', CAST(id AS INT)) AS b")
        .where("levenshtein(a, b) <= 2")
      assert(
        ruled.queryExecution.optimizedPlan.toString.contains("abs((length("),
        "EditDistancePrefilter not active in the extensions-built session"
      )
      // do NOT s2.stop(): it shares the JVM-wide SparkContext
    } finally {
      ClassicSession.setDefaultSession(shared)
      ClassicSession.setActiveSession(shared)
    }
  }
}
