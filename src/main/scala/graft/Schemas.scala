package graft

import java.sql.Timestamp

/** Typed row models.
  *
  * `Message`/`MyEntity` mirror the reference's JPA entities
  * (reference: hello_cloud_run/.../Message.java:8-32,
  * quarkus_cloud_run/.../MyEntity.java:26-29 — see SURVEY.md §1).
  * `ChangeEvent` reifies the change stream implied by the reference's
  * CRUD endpoints (SURVEY.md §2.1 S3-S5): the reference has no explicit
  * event type; its REST responses are the events in all but transport.
  */
object Schemas {

  /** The reference's `message` table: id BIGINT PK, content TEXT. */
  final case class Message(id: Long, content: String)

  /** The reference's `myentity` table. */
  final case class MyEntity(id: Long, field: String)

  /** Reified CDC event. op ∈ {"I","U","D"}; content None for deletes.
    * `ts` is event time and the latest-wins tiebreak; `seq` breaks
    * equal-ts ties deterministically (source offset / event id).
    */
  final case class ChangeEvent(
      op: String,
      id: Long,
      content: Option[String],
      ts: Timestamp,
      seq: Long
  )

  /** Seed rows from the reference's import.sql:13-17. */
  val seedMessages: Seq[Message] = Seq(
    Message(1L, "Hello from Quarkus Cloud Run!"),
    Message(2L, "Testing JVM vs Native performance"),
    Message(3L, "Direct connection to Cloud SQL"),
    Message(4L, "Using PgBouncer for connection pooling"),
    Message(5L, "Jib makes container builds easy!")
  )

  /** Seed rows from the reference's import.sql:6-10. */
  val seedMyEntities: Seq[MyEntity] =
    (1L to 5L).map(i => MyEntity(i, s"Sample field $i"))
}
