package graft.cdc

import graft.Schemas.Message
import graft.SparkSpec

class MessageStoreSpec extends SparkSpec {

  private def seeded = MessageStore.fromSeed(spark)

  test("findAll returns seed rows in id order") {
    val all = seeded.findAll()
    assert(all.map(_.id) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(all.head.content === "Hello from Quarkus Cloud Run!")
  }

  test("findById honors the 0-or-1/None contract") {
    assert(seeded.findById(3L).map(_.content) ===
      Some("Direct connection to Cloud SQL"))
    assert(seeded.findById(42L) === None)
  }

  test("count and firstResult") {
    assert(seeded.count() === 5L)
    assert(seeded.firstResult().map(_.id) === Some(1L))
  }

  test("update of absent key is a no-op (reference contract)") {
    val s2 = seeded.update(99L, "ghost")
    assert(s2.count() === 5L)
    assert(s2.findById(99L) === None)
  }

  test("delete is idempotent") {
    val s2 = seeded.delete(4L).delete(4L)
    assert(s2.count() === 4L)
    assert(s2.findById(4L) === None)
  }

  test("save with nextId mirrors DB-sequence assignment") {
    val s = seeded
    val id = s.nextId()
    assert(id === 6L)
    val s2 = s.save(Message(id, "sixth"))
    assert(s2.count() === 6L)
    assert(s2.findById(6L).map(_.content) === Some("sixth"))
  }
}
