package graft.operators

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

/** The `_meta` JSON sidecar protocol shared by the persisted stores
  * ([[DedupStore]], [[IvfIndex]]): one small self-description file at
  * `<path>/_meta`, overwritten in place by the store's single mutator,
  * fully read and version-checked by every entry point. One
  * implementation on purpose — the protocol existed as two private
  * copies and a drift between them (say, one side stops version-checking
  * or changes the overwrite semantics) would be a silent-corruption
  * source across store generations.
  *
  * Field-level encode/decode stays with each store (their payloads
  * differ); what is shared is exactly the protocol: overwrite-create of
  * the whole file, full read, JSON parse, `version == 1` gate, and
  * JSON-escaping of caller-supplied strings (a quote or backslash in a
  * column name must not write a corrupt sidecar).
  */
private[operators] object MetaSidecar {

  /** Sidecar schema version this build reads and writes. */
  val Version = 1

  // one thread-safe Jackson mapper for the sidecar (reader and writer)
  private val mapper = new ObjectMapper()

  /** JSON string literal (quoted, escaped) for caller-supplied values. */
  def jstr(v: String): String = mapper.writeValueAsString(v)

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_meta")

  private def fsFor(spark: SparkSession, path: String) =
    metaPath(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** True iff the sidecar exists (store-presence probe). */
  def exists(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(metaPath(path))

  /** Sidecar modification time; fails with the store's build hint when
    * the sidecar is absent. Used both as the presence gate and as the
    * cache-coherence stamp (one FS stat serves both).
    */
  def stamp(spark: SparkSession, path: String, kind: String,
      buildHint: String): Long = {
    val fs = fsFor(spark, path)
    val p = metaPath(path)
    require(fs.exists(p), s"no $kind metadata at $path/_meta — $buildHint")
    fs.getFileStatus(p).getModificationTime
  }

  /** Overwrite `<path>/_meta` with `fields` (the JSON object body minus
    * the version, which this helper owns).
    */
  def write(spark: SparkSession, path: String, fields: String): Unit = {
    val json = s"""{"version":$Version,$fields}"""
    val out = fsFor(spark, path).create(metaPath(path), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Full read + parse + version gate. `kind` names the store in errors
    * ("dedup store", "index"); `buildHint` says how to (re)build it.
    */
  def read(spark: SparkSession, path: String, kind: String,
      buildHint: String): JsonNode = {
    val fs = fsFor(spark, path)
    val p = metaPath(path)
    require(fs.exists(p), s"no $kind metadata at $path/_meta — $buildHint")
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val node = mapper.readTree(new String(buf, StandardCharsets.UTF_8))
    val version = Option(node.get("version")).map(_.asInt).getOrElse(-1)
    require(version == Version,
      s"$kind at $path has _meta version $version; this build reads " +
        s"version $Version — rebuild the $kind or upgrade the library")
    node
  }
}
