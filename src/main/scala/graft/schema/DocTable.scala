package graft.schema

/**
 * Showcase typed schema over the `documents` corpus — the engine's twin of the
 * reference's `WebCrawlSchema` declaration (reference
 * src/test/.../WebCrawlSchemaTest.scala:22-41): a fixed `meta` family with
 * typed columns and a dynamic per-day counter family. Used by `q61_typed_refs`
 * (oracle-checked) and TypedSchemaSpec.
 */
object DocTable extends TypedTableDef[Long]("doc_meta") {
  class Meta extends Family("meta") {
    val lang = col[String]("lang")
    val source = col[String]("source")
    val nChars = col[Long]("n_chars")
  }
  val meta = new Meta
  val viewsByDay = new DynFamily[java.sql.Date, Long]("viewsByDay")
}
