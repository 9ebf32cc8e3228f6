package graft.contracts

import scala.jdk.CollectionConverters._
import scala.util.Try

/** `get_source_files` analog (`plain_contract.rs:183-202`): normalize a
  * stored source file to its constituent sources. A `contract.json`
  * standard-json container explodes into its `sources` map entries; any
  * other file passes through unchanged. Shared by the derivation pipeline
  * and the export sink, exactly as the reference calls it from both
  * `index-functions` and `export-source`.
  */
object SourceFiles {

  /** Expand one (name, content) entry; tolerant of `{{…}}`-wrapped blobs. */
  def expand(name: String, content: String): Seq[(String, String)] = {
    if (name == null || content == null) return Seq.empty
    if (!name.toLowerCase.endsWith(".json")) return Seq((name, content))
    val body =
      if (content.startsWith("{{")) content.substring(1, content.length - 1)
      else content
    Try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val sources = mapper.readTree(body).path("sources")
      require(sources.isObject && sources.properties().iterator().hasNext)
      sources.properties().asScala.toSeq.map { e =>
        e.getKey -> e.getValue.path("content").asText("")
      }
    }.getOrElse(Seq((name, content))) // not standard-json: pass through
  }
}
