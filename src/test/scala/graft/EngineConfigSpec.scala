package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EngineConfig
import graft.sources.EngineConfig.{Branch, Leaf}

/** F15: env-layered config resolution, expectations hand-computed from
  * the reference's `resolve_env_variables` / `add_env_suffix` /
  * `table_name_with_env` (airflow/utils/common.py:31-116). */
class EngineConfigSpec extends AnyFunSuite {

  private val conf = Branch.of(
    "env" -> Leaf("dev"),
    "warehouse" -> Branch.of(
      "project" -> Leaf("ENV_PROJECT"),
      "table" -> Branch.of(
        "ods" -> Leaf("ods_reviews"),
        "secret" -> Leaf("ENV_TABLE_OVERRIDE")),
      "blob" -> Branch.of(
        "places" -> Branch.of(
          "prefix" -> Leaf("raw"),
          "daily" -> Leaf("places.jsonl"),
          "archive" -> Leaf("old/places.jsonl")))))

  test("ENV_ leaves resolve from the environment, else keep the literal") {
    val env = Map("PROJECT" -> "proj-123")
    val out = EngineConfig.load(conf, env.get)
    assert(EngineConfig.get(out, "warehouse.project").contains("proj-123"))
    // unset var → original literal survives (common.py:46), and the
    // still-ENV_-prefixed value is exempt from suffixing
    assert(EngineConfig.get(out, "warehouse.table.secret")
      .contains("ENV_TABLE_OVERRIDE"))
  }

  test("env suffix layers table names, blob prefixes and re-roots paths") {
    val out = EngineConfig.load(conf, Map.empty[String, String].get)
    assert(EngineConfig.get(out, "warehouse.table.ods")
      .contains("ods_reviews-dev"))
    assert(EngineConfig.get(out, "warehouse.blob.places.prefix")
      .contains("raw-dev"))
    assert(EngineConfig.get(out, "warehouse.blob.places.daily")
      .contains("raw-dev/places.jsonl"))
    assert(EngineConfig.get(out, "warehouse.blob.places.archive")
      .contains("raw-dev/old/places.jsonl"))
  }

  test("ENV_SUBFIX wins over the config env; empty env = no layering") {
    val out = EngineConfig.load(conf, Map("ENV_SUBFIX" -> "prod").get)
    assert(EngineConfig.get(out, "warehouse.table.ods")
      .contains("ods_reviews-prod"))
    val noEnv = Branch.of("warehouse" -> Branch.of(
      "table" -> Branch.of("ods" -> Leaf("ods_reviews"))))
    val plain = EngineConfig.load(noEnv, Map.empty[String, String].get)
    assert(EngineConfig.get(plain, "warehouse.table.ods")
      .contains("ods_reviews"))
    assert(EngineConfig.tableNameWithEnv("t", "") === "t")
    assert(EngineConfig.tableNameWithEnv("t", "prod") === "t-prod")
  }
}
