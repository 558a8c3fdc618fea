package graft.catalog

/** Option grammar for the catalog and CREATE TABLE — the key surface (and
  * its validation errors) of the reference's params round-trip
  * (/root/reference/src/utils/params.rs:22-69): client/pool keys at
  * catalog level, engine keys at table level. The embedded transport
  * ignores most client keys' VALUES, but unknown keys and mistyped values
  * fail fast with the valid-key list, matching the reference's UX.
  */
object ChOptions {

  /** Client/pool keys (params.rs client surface) + this engine's own. */
  val CatalogKeys: Set[String] = Set(
    // transport / auth
    "path", "endpoint", "username", "password", "default_database",
    "compression", "domain", "cafile", "use_tls", "strings_as_strings",
    "cloud_timeout", "cloud_wakeup", "shard_by", "load_balancing",
    // pool
    "pool_max_size", "pool_min_idle", "pool_test_on_check_out",
    "pool_max_lifetime", "pool_idle_timeout", "pool_connection_timeout",
    "pool_retry_connection",
    // engine knobs
    "coerce_schemas", "read.streams", "read.split_by", "read.bucket_by",
    "read.buckets", "write.concurrency", "write.batch_size",
    "write.distribute", "write.sort_on_insert")

  /** Catalog keys `settings.<name>` carry ClickHouse SERVER settings, the
    * reference's leftover-params-become-Settings surface
    * (params.rs:256-266) made explicit: the reference forwards any
    * unreserved key as a server setting, but an allowlisted grammar
    * cannot accept arbitrary bare keys without reopening the
    * accepted-but-inert hole — so server settings are namespaced. A
    * handful of names the transport itself pins are reserved (the
    * reference errors on ClientOption collisions the same way,
    * params.rs:186-189).
    */
  val SettingsPrefix = "settings."

  /** Setting names the HTTP transport reserves for itself: overriding
    * them would silently break the wire contract (UTC text rendering,
    * codec negotiation, the query slot in the URL).
    */
  val ReservedServerSettings: Set[String] =
    Set("session_timezone", "enable_http_compression", "query", "database")

  /** Extract `settings.*` catalog options as a server-settings map. */
  def serverSettings(options: Map[String, String]): Map[String, String] =
    options.collect {
      case (k, v) if k.toLowerCase.startsWith(SettingsPrefix) =>
        k.toLowerCase.stripPrefix(SettingsPrefix) -> v
    }

  private val BoolCatalogKeys = Set(
    "use_tls", "strings_as_strings", "pool_test_on_check_out",
    "pool_retry_connection", "coerce_schemas", "write.distribute",
    "write.sort_on_insert")

  /** Keys the HTTP transport actually honors — the catalog rejects any
    * other key when `endpoint` is set (honored-or-rejected contract; a
    * denylist here would silently accept future unhonored keys).
    */
  val HttpHonoredKeys: Set[String] = Set(
    "endpoint", "username", "password", "default_database", "compression",
    "use_tls", "pool_max_size", "pool_connection_timeout",
    "pool_retry_connection", "shard_by", "load_balancing",
    // transport-agnostic connector knobs, consumed by the catalog itself
    "coerce_schemas", "read.streams", "read.split_by", "read.bucket_by",
    "read.buckets", "write.concurrency", "write.batch_size",
    "write.distribute", "write.sort_on_insert")

  private val IntCatalogKeys = Set(
    "cloud_timeout", "cloud_wakeup", "pool_max_size", "pool_min_idle",
    "pool_max_lifetime", "pool_idle_timeout", "pool_connection_timeout",
    "read.streams", "read.buckets", "write.concurrency", "write.batch_size")

  /** Table-creation keys (params.rs create surface) + embedded attach. */
  val TableKeys: Set[String] = Set(
    "engine", "order_by", "primary_keys", "partition_by", "sampling",
    "ttl", "settings", "defaults", "defaults_for_nullable", "external_paths")

  /** Properties Spark itself may attach to a CREATE TABLE — passed
    * through silently, never forwarded to the store.
    */
  private val SparkReservedTableProps = Set(
    "provider", "location", "comment", "owner", "external")

  def validateCatalogOptions(catalog: String, options: Map[String, String]): Unit = {
    options.keys.filter(_.toLowerCase.startsWith(SettingsPrefix)).foreach { k =>
      val name = k.toLowerCase.stripPrefix(SettingsPrefix)
      if (name.isEmpty)
        throw new IllegalArgumentException(
          s"option '$k' of catalog '$catalog': empty server-setting name")
      if (ReservedServerSettings.contains(name))
        throw new IllegalArgumentException(
          s"option '$k' of catalog '$catalog': server setting '$name' is reserved " +
            "by the transport (it pins UTC rendering / compression negotiation / " +
            "statement framing) and cannot be overridden")
    }
    val unknown = options.keySet.map(_.toLowerCase)
      .filterNot(_.startsWith(SettingsPrefix)).diff(CatalogKeys)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown option(s) ${unknown.toSeq.sorted.mkString(", ")} for ClickHouse " +
          s"catalog '$catalog'; valid options: ${CatalogKeys.toSeq.sorted.mkString(", ")}")
    options.foreach { case (k0, v) =>
      val k = k0.toLowerCase
      if (BoolCatalogKeys.contains(k) && !v.equalsIgnoreCase("true") &&
        !v.equalsIgnoreCase("false"))
        throw new IllegalArgumentException(
          s"option '$k' of catalog '$catalog' must be true/false, got: $v")
      if (IntCatalogKeys.contains(k) && scala.util.Try(v.toInt).isFailure)
        throw new IllegalArgumentException(
          s"option '$k' of catalog '$catalog' must be an integer, got: $v")
    }
  }

  /** Split CREATE TABLE properties into (store options, ignored). Unknown
    * keys error with the valid-key list (params.rs rejects them too).
    */
  def validateTableProps(
      table: String, props: Map[String, String]): Map[String, String] = {
    val (reserved, rest) = props.partition { case (k, _) =>
      SparkReservedTableProps.contains(k.toLowerCase) || k.startsWith("option.")
    }
    val unknown = rest.keySet.map(_.toLowerCase).diff(TableKeys)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown table propert${if (unknown.size == 1) "y" else "ies"} " +
          s"${unknown.toSeq.sorted.mkString(", ")} for ClickHouse table '$table'; " +
          s"valid: ${TableKeys.toSeq.sorted.mkString(", ")}")
    val _ = reserved
    rest.map { case (k, v) => k.toLowerCase -> v }
  }
}
