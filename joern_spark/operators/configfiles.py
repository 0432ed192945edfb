"""Config-file and dependency passes — CONFIG_FILE and DEPENDENCY nodes as
DataFrame pipelines over the raw source table.

Reference semantics:

* ConfigPass (jssrc2cpg/.../passes/ConfigPass.scala:20-34): every file whose
  name ends in one of ``.json .config.js .conf.js .vue .html .pug`` and that
  does not live under ``node_modules`` becomes a CONFIG_FILE node carrying
  (name=relative path, content).
* PrivateKeyFilePass (PrivateKeyFilePass.scala:13-26): ``.key`` files whose
  content matches ``.*RSA\\sPRIVATE\\sKEY.*`` become CONFIG_FILE nodes whose
  content is redacted to "Content omitted for security reasons.".
* DependenciesPass (DependenciesPass.scala:15-35 + utils/PackageJsonParser
  .scala:41-93): per directory, if a ``package-lock.json`` has a non-empty
  ``dependencies`` object it wins; otherwise the sibling ``package.json``'s
  four groups (dependencies, devDependencies, peerDependencies,
  optionalDependencies) are read.  Lock-file values may be plain version
  strings or ``{"version": ...}`` objects.  Each (name, version) becomes a
  DEPENDENCY node.

Scale shape: both passes are pure projections + ``from_json`` over the source
scan (JVM-side Jackson, whole-stage codegen) — zero Python, zero shuffle
except the final per-directory anti-join, which is keyed on directory (one
row per package.json, never per source line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ConfigPass.selectedExtensions (ConfigPass.scala:21)
CONFIG_EXTENSIONS = (".json", ".config.js", ".conf.js", ".vue", ".html",
                     ".pug")
PRIVATE_KEY_REGEX = r"RSA\sPRIVATE\sKEY"
REDACTED = "Content omitted for security reasons."
NODE_MODULES = "node_modules"

PACKAGE_JSON = "package.json"
PACKAGE_LOCK = "package-lock.json"
# PackageJsonParser.ProjectDependencies (PackageJsonParser.scala:20-21)
DEPENDENCY_GROUPS = ("dependencies", "devDependencies", "peerDependencies",
                     "optionalDependencies")


def _not_under_node_modules(col: str = "path"):
    # SourceFiles.determine(...).filterNot(_.contains(NodeModulesFolder))
    return ~F.col(col).contains(NODE_MODULES)


def config_file_nodes(source: DataFrame) -> DataFrame:
    """source(repo, path, commit, lang, content) -> (name, content)
    CONFIG_FILE rows: ConfigPass + PrivateKeyFilePass combined."""
    base = source.filter(_not_under_node_modules())
    is_config = F.lit(False)
    for ext in CONFIG_EXTENSIONS:
        is_config = is_config | F.col("path").endswith(ext)
    cfg = (base.filter(is_config)
           .select(F.col("path").alias("name"), F.col("content")))
    keys = (base.filter(F.col("path").endswith(".key")
                        & F.col("content").rlike(PRIVATE_KEY_REGEX))
            .select(F.col("path").alias("name"),
                    F.lit(REDACTED).alias("content")))
    return cfg.unionByName(keys)


def _dir_of(col: str = "path"):
    return F.regexp_replace(F.col(col), "[^/]*$", "")


def dependency_nodes(source: DataFrame) -> DataFrame:
    """source -> (name, version) DEPENDENCY rows.

    Lock files win per directory when non-empty (PackageJsonParser.scala:
    79-92); both value shapes (``"dep": "0.1"`` and ``"dep": {"version":
    "0.1"}``) are handled by parsing the lock content twice with the two
    shapes and coalescing per entry.
    """
    base = source.filter(_not_under_node_modules())
    lock = base.filter(F.col("path").endswith(PACKAGE_LOCK))
    pkg = (base.filter(F.col("path").endswith(PACKAGE_JSON)
                       & ~F.col("path").endswith(PACKAGE_LOCK)))

    # -- lock-file deps: map<string,string> OR map<string,{version}> -------
    lock_str = (lock
                .select(_dir_of().alias("dir"),
                        F.explode_outer(F.from_json(
                            "content",
                            "struct<dependencies: map<string,string>>"
                        )["dependencies"]).alias("name", "version"))
                # from_json(map<string,string>) serializes object values as
                # their raw JSON text — those belong to the struct branch
                # below (PackageJsonParser's Str vs Obj match, :52-59)
                .filter(F.col("name").isNotNull()
                        & F.col("version").isNotNull()
                        & ~F.col("version").startswith("{")))
    lock_obj = (lock
                .select(_dir_of().alias("dir"),
                        F.explode_outer(F.from_json(
                            "content",
                            "struct<dependencies:"
                            " map<string, struct<version: string>>>"
                        )["dependencies"]).alias("name", "v"))
                .filter(F.col("name").isNotNull()
                        & F.col("v")["version"].isNotNull())
                .select("dir", "name", F.col("v")["version"].alias("version")))
    lock_deps = lock_str.unionByName(lock_obj).distinct()

    # -- package.json deps: the four project groups -------------------------
    group_schema = "struct<" + ", ".join(
        f"`{g}`: map<string,string>" for g in DEPENDENCY_GROUPS) + ">"
    parsed = pkg.select(_dir_of().alias("dir"),
                        F.from_json("content", group_schema).alias("j"))
    pkg_deps = None
    for g in DEPENDENCY_GROUPS:
        part = (parsed
                .select("dir", F.explode_outer(F.col("j")[g])
                        .alias("name", "version"))
                .filter(F.col("name").isNotNull()
                        & F.col("version").isNotNull()))
        pkg_deps = part if pkg_deps is None else pkg_deps.unionByName(part)

    # per-directory precedence: lock wins when it produced any entry
    lock_dirs = lock_deps.select("dir").distinct()
    effective = lock_deps.unionByName(
        pkg_deps.join(lock_dirs, "dir", "left_anti"))
    return effective.select("name", "version").distinct()
