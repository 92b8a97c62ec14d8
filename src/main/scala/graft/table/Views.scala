package graft.table

import com.fasterxml.jackson.databind.node.ObjectNode

import graft.meta.model.JsonCodecs

/** Persisted SQL VIEW metadata (the view lineage the reference era points
  * toward; upstream later grew a view spec — re-expressed here on the
  * repo's own primitives): a view is a METADATA-ONLY object — the defining
  * SQL, the catalog/namespace context it must re-resolve under, the
  * analyzed schema, and properties. Storage mirrors the table commit
  * protocol in miniature: immutable versioned JSON files
  * `<location>/view/v<N>.json`, committed by create-new atomicity
  * ([[FileIO.writeAtomic]]) — CREATE writes v1, REPLACE writes v<N+1>
  * (a concurrent replace loses the CAS and retries/fails loudly), the
  * current version is the highest N, and old versions remain as history.
  * A keyed catalog seals view JSON like every other metadata file (the
  * defining SQL can embed literals — it is content, not structure).
  *
  * A view directory is disjoint from a table directory by construction
  * (`view/` vs `metadata/`), so the catalog can tell the two apart
  * without a marker file.
  */
final case class ViewMeta(sql: String, currentCatalog: String,
    currentNamespace: Seq[String], schemaJson: String,
    queryColumnNames: Seq[String], columnAliases: Seq[String],
    columnComments: Seq[String], properties: Map[String, String])

object Views {
  private def dir(location: String) = s"$location/view"
  private def versionPath(location: String, v: Int) = s"${dir(location)}/v$v.json"

  def toJson(v: ViewMeta): String = {
    val mapper = JsonCodecs.mapper
    val node = mapper.createObjectNode()
    node.put("format-version", 1)
    node.put("sql", v.sql)
    node.put("current-catalog", v.currentCatalog)
    val ns = node.putArray("current-namespace")
    v.currentNamespace.foreach(ns.add)
    node.put("schema", v.schemaJson)
    val qc = node.putArray("query-column-names")
    v.queryColumnNames.foreach(qc.add)
    val ca = node.putArray("column-aliases")
    v.columnAliases.foreach(ca.add)
    val cc = node.putArray("column-comments")
    v.columnComments.foreach(c => if (c == null) cc.addNull() else cc.add(c))
    val props = node.putObject("properties")
    v.properties.toSeq.sortBy(_._1).foreach { case (k, s) => props.put(k, s) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  def fromJson(s: String): ViewMeta = {
    import scala.jdk.CollectionConverters._
    val node = JsonCodecs.mapper.readTree(s).asInstanceOf[ObjectNode]
    require(node.get("format-version").asInt() == 1,
      s"unsupported view format version ${node.get("format-version")}")
    def strings(field: String): Seq[String] =
      node.get(field).elements().asScala
        .map(e => if (e.isNull) null else e.asText()).toSeq
    ViewMeta(
      sql = node.get("sql").asText(),
      currentCatalog = node.get("current-catalog").asText(),
      currentNamespace = strings("current-namespace"),
      schemaJson = node.get("schema").asText(),
      queryColumnNames = strings("query-column-names"),
      columnAliases = strings("column-aliases"),
      columnComments = strings("column-comments"),
      properties = node.get("properties").fields().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
  }

  /** (version, meta) of the current view, or None if no view here. */
  def current(io: FileIO, location: String): Option[(Int, ViewMeta)] = {
    val d = dir(location)
    if (!io.exists(d)) return None
    val versions = io.list(d).map(_.getPath.getName)
      .flatMap(n => n.stripPrefix("v").stripSuffix(".json").toIntOption
        .filter(_ => n.startsWith("v") && n.endsWith(".json")))
    versions.maxOption.map(v =>
      (v, fromJson(io.readString(versionPath(location, v)))))
  }

  /** Only a COMMITTED v<N>.json counts: writeAtomic stages a tmp file
    * inside view/ before the create-new link, so directory presence alone
    * would make a crashed mid-CREATE read as an existing view — loadView
    * would throw NoSuchView while CREATE refuses forever. */
  def exists(io: FileIO, location: String): Boolean =
    current(io, location).nonEmpty

  /** CREATE: commit v1 by create-new atomicity; loses to any concurrent
    * create (or an existing view). */
  def create(io: FileIO, location: String, v: ViewMeta): Unit = {
    if (!io.writeAtomic(versionPath(location, 1), toJson(v)))
      throw new ValidationException(s"View already exists at $location")
  }

  /** REPLACE: commit the next version; a concurrent replace of the same
    * base version loses the create-new CAS. */
  def replace(io: FileIO, location: String, v: ViewMeta): Unit = {
    val base = current(io, location).map(_._1).getOrElse(0)
    if (!io.writeAtomic(versionPath(location, base + 1), toJson(v)))
      throw new CommitFailedException(
        s"Concurrent view replace at $location (base v$base)")
  }

  def drop(io: FileIO, location: String): Boolean = {
    // directory presence, not exists(): DROP is the cleanup path for a
    // crashed mid-CREATE (tmp file staged, no committed version)
    if (!io.exists(dir(location))) return false
    io.deleteRecursive(location)
    true
  }
}
