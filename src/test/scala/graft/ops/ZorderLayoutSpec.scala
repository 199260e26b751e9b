package graft.ops

import graft.SparkSpec

/** q101's reason to exist, pinned: the Z-order layout's zone maps
  * must actually prune what the linear layout cannot. The assertions
  * are semantic (scan/match accounting), not snapshot values, so they
  * hold at any SF.
  */
class ZorderLayoutSpec extends SparkSpec {

  private lazy val rows =
    graft.SparkEntry
      .queries("q101_zorder_layout")(spark, sfDir)
      .collect()
      .map { r =>
        (
          r.getString(0), // layout
          r.getString(1), // probe
          r.getLong(2), // n_buckets
          r.getLong(3), // buckets_hit
          r.getLong(4), // rows_scanned
          r.getLong(5) // rows_matched
        )
      }

  private def row(layout: String, probe: String) =
    rows.find(r => r._1 == layout && r._2 == probe).get

  test("zone maps are sound: every probe's scan covers its matches") {
    rows.foreach { r =>
      assert(
        r._5 >= r._6,
        s"${r._1}/${r._2}: scanned ${r._5} < matched ${r._6}"
      )
    }
  }

  test("both layouts agree on the true match counts") {
    Seq("x_band", "y_band", "xy_box").foreach { p =>
      assert(row("zorder", p)._6 === row("linear", p)._6)
    }
  }

  test("linear layout reads EVERYTHING for the y-selective probe") {
    val (_, _, nb, hit, scanned, _) = row("linear", "y_band")
    assert(hit === nb, "every linear bucket spans all y — all hit")
    val total = rows
      .filter(r => r._1 == "linear" && r._2 == "x_band")
      .map(_._5)
    // total rows = scan of the all-hit probe
    assert(scanned > 0 && total.forall(_ <= scanned))
  }

  test("z-order prunes the y-selective probe the linear layout cannot") {
    val z = row("zorder", "y_band")
    val l = row("linear", "y_band")
    assert(
      z._5 < l._5,
      s"zorder scanned ${z._5} must beat linear's ${l._5}"
    )
    assert(z._4 < z._3, "some z buckets must be pruned")
  }

  test("z-order prunes the 2-D box probe in both dimensions") {
    val z = row("zorder", "xy_box")
    val l = row("linear", "xy_box")
    assert(z._5 <= l._5)
    assert(z._4 < z._3)
  }
}
