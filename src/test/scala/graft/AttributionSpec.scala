package graft

import java.sql.Timestamp
import graft.analytics.Attribution

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")

  test("multiTouch: linear split, first/last flags, post-purchase " +
    "events ignored, direct channel, session boundary") {
    val ev = Seq(
      // u1, one session: view, click, purchase, then noise AFTER the
      // first purchase (a later view and a second purchase) — ignored
      (1L, 10L, "view", ts(0)), (1L, 11L, "click", ts(1)),
      (1L, 12L, "purchase", ts(2)), (1L, 13L, "view", ts(3)),
      (1L, 14L, "purchase", ts(4)),
      // u2: purchase with no preceding touch -> (direct)
      (2L, 20L, "purchase", ts(0)),
      // u3: no purchase -> contributes nothing
      (3L, 30L, "view", ts(0)),
      // u4: two sessions split by the 6h gap, each converting off one
      // touch (view then click)
      (4L, 40L, "view", ts(0)), (4L, 41L, "purchase", ts(1)),
      (4L, 42L, "click", ts(9)), (4L, 43L, "purchase", ts(10)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Attribution.multiTouch(ev)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // view: u1 (1 of 2 touches, 500000, first) + u4 s1 (sole touch)
    assert(got("view") === ((2L, 1500000L, 2L, 1L)))
    // click: u1 (last of 2) + u4 s2 (sole touch)
    assert(got("click") === ((2L, 1500000L, 1L, 2L)))
    // u2's conversion had no touch
    assert(got("(direct)") === ((1L, 1000000L, 1L, 1L)))
    assert(got.size == 3)
  }

  test("multiTouch: same-timestamp tie resolves on event_id — a touch " +
    "sharing the purchase's ts but a smaller id still attributes") {
    val ev = Seq(
      (1L, 1L, "click", ts(5)), (1L, 2L, "purchase", ts(5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Attribution.multiTouch(ev)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got === Map("click" -> 1000000L))
  }

  test("multiTouch credit conservation on the fixture: every " +
    "conversion hands out 10^6 minus only the floor loss") {
    val ev = graft.core.Tables(spark, SfDir, "events")
    val rows = Attribution.multiTouch(ev)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val conversions = rows.map(_._4).sum  // one first-touch per session
    val credit = rows.map(_._3).sum
    assert(credit <= conversions * 1000000L)
    // floor loss per conversion is < 10^6 ppm is way too loose; each
    // conversion loses at most (nt-1) ppm < nt <= its touch count
    val touches = rows.map(_._2).sum
    assert(credit > conversions * 1000000L - touches)
  }
}
