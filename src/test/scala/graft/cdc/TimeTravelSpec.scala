package graft.cdc

import graft.SparkSpec
import java.sql.Timestamp

/** cdc09/cdc10: point-in-time state and two-point diff, checked
  * against a driver-side replay of the raw event log.
  */
class TimeTravelSpec extends SparkSpec {

  private def stateAt(cut: String): Map[Long, (String, Option[Double])] = {
    val cutoff = Timestamp.valueOf(cut)
    graft
      .Tables(spark, sfDir)
      .events
      .select("user_id", "event_type", "value", "ts", "event_id")
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getTimestamp(3), r.getLong(4))
      )
      .filter(!_._4.after(cutoff))
      .groupBy(_._1)
      .flatMap { case (id, evs) =>
        val last = evs.maxBy(e => (e._4.getTime, e._5))
        if (last._2 == "error") None else Some(id -> (last._2, last._3))
      }
  }

  test("cdc09 equals a driver-side replay at the cutoff") {
    val expected = stateAt("2024-01-15 00:00:00")
    val got = CdcQueries
      .queries("cdc09_time_travel")(spark, sfDir)
      .collect()
      .map(r =>
        r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      )
      .toMap
    assert(got === expected)
    // time travel must actually exclude later events somewhere
    val full = stateAt("2024-12-31 00:00:00")
    assert(got !== full, "cutoff did not bind")
  }

  test("cdc10 classifies exactly the keys that changed between T1 and T2") {
    val s1 = stateAt("2024-01-10 00:00:00")
    val s2 = stateAt("2024-01-20 00:00:00")
    val expected = (s1.keySet ++ s2.keySet).flatMap { id =>
      (s1.get(id), s2.get(id)) match {
        case (None, Some(_))              => Some(id -> "I")
        case (Some(_), None)              => Some(id -> "D")
        case (Some(a), Some(b)) if a != b => Some(id -> "U")
        case _                            => None
      }
    }.toMap
    val got = CdcQueries
      .queries("cdc10_state_diff")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got === expected)
    assert(Set("I", "U", "D").subsetOf(got.values.toSet),
      "fixture does not exercise all three change classes")
  }
}
