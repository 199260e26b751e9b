package graft.sources

import graft.SparkSpec
import java.sql.DriverManager

/** Exercises the S2 JDBC surface end-to-end against an embedded
  * in-memory Derby database (on Spark's own classpath — no external
  * server, no new dependency): read, filter/prune pushdown,
  * partitioned parallel read, and the write path.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c)
    finally c.close()
  }

  private lazy val seeded: Unit = withConn { c =>
    val st = c.createStatement()
    st.execute("CREATE TABLE msgs (id BIGINT PRIMARY KEY, content VARCHAR(100))")
    (1 to 20).foreach(i =>
      st.execute(s"INSERT INTO msgs VALUES ($i, 'message $i')")
    )
    st.close()
  }

  test("jdbc read round-trips rows and pushes filters to the remote scan") {
    seeded
    val df = JdbcSource.read(spark, url, "msgs")
    assert(df.count() === 20L)
    val filtered = df.filter(df("id") === 7L).select("content")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("IsNotNull(ID)") || plan.contains("EqualTo(ID,7)"), plan)
    val row = filtered.collect()
    assert(row.map(_.getString(0)).toSeq === Seq("message 7"))
  }

  test("partitioned read fans out to numPartitions range-striped tasks") {
    seeded
    val df = JdbcSource.read(
      spark,
      url,
      "msgs",
      partitioning = Some(JdbcSource.Partitioning("id", 1L, 21L, 4))
    )
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 20L)
  }

  test("jdbc write appends per-partition batches; readback matches") {
    seeded
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE sink (id BIGINT, content VARCHAR(100))")
      st.close()
    }
    val out = Seq((100L, "alpha"), (101L, "beta")).toDF("id", "content")
    JdbcSource.write(out, url, "sink")
    val back = JdbcSource
      .read(spark, url, "sink")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(back === Set((100L, "alpha"), (101L, "beta")))
  }
}
