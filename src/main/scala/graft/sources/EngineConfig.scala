package graft.sources

import scala.collection.immutable.ListMap

/** Env-layered engine configuration — the reference's config loader
  * (`airflow/utils/common.py:31-116` over `airflow/utils/config.yml`)
  * re-expressed as a typed immutable tree instead of a mutated dict:
  *
  *  - leaves whose value starts with `ENV_` resolve from the
  *    environment, falling back to the literal when unset
  *    (`resolve_env_variables`, common.py:31-47);
  *  - a deploy-env suffix layers every table name and blob prefix, and
  *    paths under a suffixed prefix are re-rooted to `prefix/path`
  *    (`add_env_suffix`, common.py:50-90) — so dev/staging/prod builds
  *    of the same pipeline never collide;
  *  - `ENV_`-prefixed values are exempt from suffixing (they are
  *    resolved bindings, not names to layer), as in the reference.
  *
  * The environment is injected as a lookup function (defaults to
  * `sys.env.get`) so configurations are testable and resolution is
  * referentially transparent — no hidden global reads mid-pipeline.
  */
object EngineConfig {

  sealed trait Node
  final case class Leaf(value: String) extends Node
  final case class Branch(children: ListMap[String, Node]) extends Node {
    def apply(key: String): Node = children(key)
  }
  object Branch {
    def of(kvs: (String, Node)*): Branch = Branch(ListMap(kvs: _*))
  }

  /** The suffix source: `ENV_SUBFIX` env var (the reference's literal
    * spelling), else the config's own `env` leaf, else none. */
  def envSuffix(conf: Branch,
                lookup: String => Option[String] = sys.env.get): String =
    lookup("ENV_SUBFIX").orElse(conf.children.get("env").collect {
      case Leaf(v) => v
    }).getOrElse("")

  /** Recursively resolve `ENV_*` leaves from the environment
    * (common.py:31-47: default to the original literal when unset). */
  def resolveEnv(node: Node,
                 lookup: String => Option[String] = sys.env.get): Node =
    node match {
      case Branch(m) => Branch(m.map { case (k, v) =>
        k -> resolveEnv(v, lookup) })
      case Leaf(v) if v.startsWith("ENV_") =>
        Leaf(lookup(v.stripPrefix("ENV_")).getOrElse(v))
      case leaf => leaf
    }

  /** `base-env` table naming (common.py:116 `table_name_with_env`). */
  def tableNameWithEnv(base: String, env: String): String =
    if (env.isEmpty) base else s"$base-$env"

  /** Apply the env suffix to a warehouse section (common.py:50-90):
    * every leaf under `table` is suffixed; every blob entry's `prefix`
    * is suffixed and its sibling paths are re-rooted under the new
    * prefix. Resolved-`ENV_` escapes are left untouched. */
  def addEnvSuffix(section: Branch, suffix: String): Branch = {
    def suffixable(v: String): Boolean = !v.startsWith("ENV_")
    def tables(n: Node): Node = n match {
      case Leaf(v) if suffixable(v) => Leaf(tableNameWithEnv(v, suffix))
      case other => other
    }
    def blob(n: Node): Node = n match {
      case Branch(m) if m.get("prefix").exists {
          case Leaf(p) => suffixable(p); case _ => false } =>
        val Leaf(p) = m("prefix"): @unchecked
        val newPrefix = tableNameWithEnv(p, suffix)
        Branch(m.map {
          case ("prefix", _) => "prefix" -> Leaf(newPrefix)
          case (k, Leaf(path)) => k -> Leaf(s"$newPrefix/$path")
          case other => other
        })
      case other => other
    }
    Branch(section.children.map {
      case ("table", Branch(m)) =>
        "table" -> Branch(m.map { case (k, v) => k -> tables(v) })
      case ("blob", Branch(m)) =>
        "blob" -> Branch(m.map { case (k, v) => k -> blob(v) })
      case other => other
    })
  }

  /** Full load pipeline over an in-memory tree (the reference's
    * `load_config`: parse → resolve env → layer the warehouse section,
    * conventionally under key `warehouse`). */
  def load(conf: Branch,
           lookup: String => Option[String] = sys.env.get): Branch = {
    val resolved = resolveEnv(conf, lookup).asInstanceOf[Branch]
    val suffix = envSuffix(resolved, lookup)
    Branch(resolved.children.map {
      case ("warehouse", b: Branch) => "warehouse" -> addEnvSuffix(b, suffix)
      case other => other
    })
  }

  /** Flatten a tree to dotted-key/value pairs in stable (insertion)
    * order — the audit/export view of a resolved configuration, and
    * the shape the s22 oracle checks the whole layering pipeline
    * through. */
  def flatten(conf: Branch, prefix: String = ""): Seq[(String, String)] =
    conf.children.toSeq.flatMap {
      case (k, Leaf(v)) =>
        Seq((if (prefix.isEmpty) k else s"$prefix.$k") -> v)
      case (k, b: Branch) =>
        flatten(b, if (prefix.isEmpty) k else s"$prefix.$k")
    }

  /** Dotted-path getter: `get(conf, "warehouse.table.ods")`. */
  def get(conf: Branch, path: String): Option[String] = {
    val parts = path.split('.')
    parts.foldLeft(Option(conf: Node)) {
      case (Some(Branch(m)), k) => m.get(k)
      case _ => None
    }.collect { case Leaf(v) => v }
  }
}
