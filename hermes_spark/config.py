"""Declarative YAML job config — the engine's user-facing surface.

The reference's operators never write code: its entire surface is a
YAML datamodel — types with primary keys and FKs, attribute mappings
(plain column / column list / template expression), merge and
integrity constraints, queue/retry knobs — validated against a
cerberus schema and loaded into runtime objects
(/root/reference/hermes-server-config-example.yml:100-310,
/root/reference/lib/config/__init__.py:88-447,
/root/reference/server/config-schema-server.yml).

The Spark analog here: ONE YAML document wires the existing engine
pieces into a ready-to-run pipeline.  Nothing in this module computes;
it validates, names the offending config path on error (the cerberus
behavior users rely on), and constructs the same objects a Python
caller would::

    hermes-spark:
      pipeline:
        source: /data/incoming          # parquet micro-batch dir
        work_dir: /data/run             # checkpoint + target + dlq
        mode: stateful                  # stateful | join
        watermark: "10 minutes"
        max_files_per_trigger: 1
        n_buckets: 1024
        validator: {expr: "coalesce(length(text) <= 4096, true)"}
        retry_every: 4                  # errorQueue_retryInterval
        maintain_every: 8               # in-stream incremental compact
        foreignkeys_policy: on_remove_event
        foreignkeys:
          - {parent: conv_id, child: conv_id}
      datamodel:                        # client fan-out (optional)
        passthrough: [ts]
        types:
          user_turns:
            attrsmapping:               # plans.mapping spec language:
              login: text               #   str        -> column
              evidence: [text, tool]    #   list[str]  -> compact array
              mood: {expr: "upper(tool)"}   # {expr} -> SQL expression
            allow_empty: false
      status:
        path: /data/run/status.jsonl    # JSONL audit stream
        keep: 256

The expression language is Spark SQL analyzed by Catalyst (the
reference uses Jinja interpreted per row — same role, JVM speed), so
a bad expression fails at LOAD time with the config path named, not
mid-stream.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "ConfigError",
    "load_config",
    "build_pipeline",
    "register_validator",
    "VALIDATORS",
]


class ConfigError(ValueError):
    """A config problem, carrying the dotted path of the bad node —
    the error shape the reference's cerberus validation gives users
    (config path + reason), which is what makes a declarative surface
    debuggable without reading engine code."""

    def __init__(self, path: str, message: str) -> None:
        self.path = path
        super().__init__(f"{path}: {message}")


# -- named-validator registry ------------------------------------------------

#: Callables usable as ``validator: {name: ...}`` — ``fn(df) -> Column``
#: (boolean verdict per row; NULL means "no opinion" → the row applies).
VALIDATORS: dict[str, Callable[[DataFrame], Any]] = {}


def register_validator(name: str, fn: Callable[[DataFrame], Any]) -> None:
    VALIDATORS[name] = fn


# -- tiny schema walker --------------------------------------------------------


def _require_mapping(node: Any, path: str) -> Mapping:
    if not isinstance(node, Mapping):
        raise ConfigError(path, f"expected a mapping, got {type(node).__name__}")
    return node


def _check_keys(node: Mapping, path: str, required: set, optional: set) -> None:
    missing = required - set(node)
    if missing:
        raise ConfigError(path, f"missing required key(s): {sorted(missing)}")
    unknown = set(node) - required - optional
    if unknown:
        raise ConfigError(
            path,
            f"unknown key(s) {sorted(unknown)} — "
            f"valid keys: {sorted(required | optional)}",
        )


def _typed(node: Mapping, path: str, key: str, types, default=None, enum=None):
    if key not in node or node[key] is None:
        return default
    v = node[key]
    if types is bool and not isinstance(v, bool):
        raise ConfigError(f"{path}.{key}", f"expected a boolean, got {v!r}")
    if types is int and (isinstance(v, bool) or not isinstance(v, int)):
        raise ConfigError(f"{path}.{key}", f"expected an integer, got {v!r}")
    if types is str and not isinstance(v, str):
        raise ConfigError(f"{path}.{key}", f"expected a string, got {v!r}")
    if enum is not None and v not in enum:
        raise ConfigError(f"{path}.{key}", f"must be one of {sorted(enum)}, got {v!r}")
    return v


def _str_list(node: Mapping, path: str, key: str, default: list) -> list[str]:
    if key not in node or node[key] is None:
        return list(default)
    v = node[key]
    if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
        raise ConfigError(f"{path}.{key}", f"expected a list of strings, got {v!r}")
    return v


_FK_POLICIES = {"disabled", "on_remove_event", "on_every_event"}
_MODES = {"stateful", "join"}


def _validate_mapping_spec(spec: Any, path: str) -> None:
    """One attrsmapping entry, in the plans.mapping spec language
    (reference attrsmapping: column / list-of-columns / template,
    hermes-server-config-example.yml:127-139 and 313-341)."""
    if isinstance(spec, str):
        return
    if isinstance(spec, list):
        if not spec or not all(isinstance(c, str) for c in spec):
            raise ConfigError(path, "column list must be non-empty strings")
        return
    if isinstance(spec, Mapping):
        _check_keys(spec, path, {"expr"}, set())
        if not isinstance(spec["expr"], str) or not spec["expr"].strip():
            raise ConfigError(f"{path}.expr", "expected a non-empty SQL expression")
        return
    raise ConfigError(
        path,
        f"bad mapping spec {spec!r} — use a column name, a list of "
        "column names, or {expr: <SQL>}",
    )


def load_config(source) -> dict:
    """Parse + validate a job config; returns the normalized dict.

    ``source``: a path to a YAML file, a YAML string, or an
    already-parsed mapping.  Raises :class:`ConfigError` naming the
    dotted path of the first offending node."""
    import os

    if isinstance(source, Mapping):
        doc = source
    else:
        import yaml

        text = source
        if isinstance(source, str) and (
            os.path.sep in source or source.endswith((".yml", ".yaml"))
        ) and os.path.exists(source):
            with open(source) as f:
                text = f.read()
        try:
            doc = yaml.safe_load(text)
        except yaml.YAMLError as e:
            raise ConfigError("<document>", f"invalid YAML: {e}") from e
    doc = _require_mapping(doc, "<document>")
    _check_keys(doc, "<document>", {"hermes-spark"}, set())
    root = _require_mapping(doc["hermes-spark"], "hermes-spark")
    _check_keys(root, "hermes-spark", {"pipeline"}, {"datamodel", "status"})

    out: dict = {}

    # -- pipeline ----------------------------------------------------------
    p_path = "hermes-spark.pipeline"
    p = _require_mapping(root["pipeline"], p_path)
    _check_keys(
        p, p_path, {"source", "work_dir"},
        {"mode", "watermark", "max_files_per_trigger", "n_buckets",
         "validator", "retry_every", "maintain_every",
         "foreignkeys_policy", "foreignkeys"},
    )
    mode = _typed(p, p_path, "mode", str, default="stateful", enum=_MODES)
    pipeline = {
        "mode": mode,
        "source": _typed(p, p_path, "source", str),
        "work_dir": _typed(p, p_path, "work_dir", str),
        "watermark": _typed(p, p_path, "watermark", str, default="10 minutes"),
        "max_files_per_trigger": _typed(p, p_path, "max_files_per_trigger", int),
        "n_buckets": _typed(
            p, p_path, "n_buckets", int,
            default=1024 if mode == "stateful" else 32,
        ),
        "retry_every": _typed(p, p_path, "retry_every", int),
        "maintain_every": _typed(p, p_path, "maintain_every", int),
        "foreignkeys_policy": _typed(
            p, p_path, "foreignkeys_policy", str,
            default="disabled", enum=_FK_POLICIES,
        ),
    }
    if not isinstance(p["source"], str) or not isinstance(p["work_dir"], str):
        raise ConfigError(p_path, "source and work_dir must be strings")
    for k in ("retry_every", "maintain_every", "max_files_per_trigger"):
        if pipeline[k] is not None and pipeline[k] < 1:
            raise ConfigError(f"{p_path}.{k}", f"must be >= 1, got {pipeline[k]}")

    v = p.get("validator")
    if v is not None:
        v_path = f"{p_path}.validator"
        v = _require_mapping(v, v_path)
        _check_keys(v, v_path, set(), {"expr", "name"})
        if ("expr" in v) == ("name" in v):
            raise ConfigError(v_path, "give exactly one of expr: or name:")
        if "name" in v and v["name"] not in VALIDATORS:
            raise ConfigError(
                f"{v_path}.name",
                f"unknown validator {v['name']!r} — registered: "
                f"{sorted(VALIDATORS) or '(none)'}",
            )
        pipeline["validator"] = dict(v)
    else:
        pipeline["validator"] = None

    fks = p.get("foreignkeys")
    fk_map: list[tuple[str, str]] = []
    if fks is not None:
        if not isinstance(fks, list):
            raise ConfigError(f"{p_path}.foreignkeys", "expected a list")
        for i, edge in enumerate(fks):
            e_path = f"{p_path}.foreignkeys[{i}]"
            edge = _require_mapping(edge, e_path)
            _check_keys(edge, e_path, {"parent", "child"}, set())
            fk_map.append(
                (
                    _typed(edge, e_path, "parent", str),
                    _typed(edge, e_path, "child", str),
                )
            )
    pipeline["fk_map"] = fk_map or None
    if pipeline["foreignkeys_policy"] != "disabled" and not fk_map:
        raise ConfigError(
            f"{p_path}.foreignkeys_policy",
            f"{pipeline['foreignkeys_policy']!r} needs at least one "
            "foreignkeys: edge",
        )
    out["pipeline"] = pipeline

    # -- datamodel (fan-out) -------------------------------------------------
    dm = root.get("datamodel")
    if dm is not None:
        d_path = "hermes-spark.datamodel"
        if mode != "stateful":
            raise ConfigError(
                d_path, "datamodel fan-out requires pipeline.mode: stateful"
            )
        dm = _require_mapping(dm, d_path)
        _check_keys(dm, d_path, {"types"}, {"passthrough", "type_col"})
        passthrough = _str_list(dm, d_path, "passthrough", ["ts"])
        type_col = _typed(dm, d_path, "type_col", str, default="_objtype")
        types_node = _require_mapping(dm["types"], f"{d_path}.types")
        if not types_node:
            raise ConfigError(f"{d_path}.types", "declare at least one type")
        reserved = {"conv_id", "turn_idx", "op", type_col, *passthrough}
        types = []
        for name, spec in types_node.items():
            t_path = f"{d_path}.types.{name}"
            spec = _require_mapping(spec, t_path)
            _check_keys(spec, t_path, {"attrsmapping"}, {"allow_empty"})
            am = _require_mapping(spec["attrsmapping"], f"{t_path}.attrsmapping")
            if not am:
                raise ConfigError(f"{t_path}.attrsmapping", "must not be empty")
            for attr, m in am.items():
                a_path = f"{t_path}.attrsmapping.{attr}"
                if attr in reserved:
                    raise ConfigError(
                        a_path,
                        f"attribute name collides with reserved column "
                        f"{attr!r} (key/op/passthrough/type_col)",
                    )
                _validate_mapping_spec(m, a_path)
            types.append(
                {
                    "name": str(name),
                    "attrsmapping": {
                        k: (dict(v) if isinstance(v, Mapping) else v)
                        for k, v in am.items()
                    },
                    "allow_empty": _typed(
                        spec, t_path, "allow_empty", bool, default=False
                    ),
                }
            )
        out["datamodel"] = {
            "passthrough": passthrough,
            "type_col": type_col,
            "types": types,
        }

    # -- status ---------------------------------------------------------------
    st = root.get("status")
    if st is not None:
        s_path = "hermes-spark.status"
        st = _require_mapping(st, s_path)
        _check_keys(st, s_path, set(), {"path", "keep"})
        keep = _typed(st, s_path, "keep", int, default=256)
        if keep < 1:
            raise ConfigError(f"{s_path}.keep", f"must be >= 1, got {keep}")
        out["status"] = {
            "path": _typed(st, s_path, "path", str),
            "keep": keep,
        }

    return out


# -- construction ---------------------------------------------------------------


def _compile_validator(spec: dict, probe: DataFrame, path: str):
    if "name" in spec:
        return VALIDATORS[spec["name"]]
    expr = spec["expr"]
    try:
        probe.select(F.expr(expr))
    except Exception as e:
        raise ConfigError(f"{path}.expr", f"does not analyze: {_first_line(e)}") from e
    return lambda df: F.expr(expr)


def _first_line(e: Exception) -> str:
    return str(e).strip().splitlines()[0] if str(e).strip() else type(e).__name__


def build_pipeline(spark: SparkSession, config, **overrides):
    """Construct a ready-to-run pipeline from a config (path, YAML
    text, or mapping).  Keyword overrides replace pipeline-section
    values (e.g. ``work_dir=...`` in tests).

    Every expression in the config is ANALYZED here against an empty
    frame of the engine's schemas — a typo'd column or bad SQL fails
    at build time with its config path, never mid-stream.  When a
    datamodel is declared, the fan-out runs inside the sink (reference
    clients/datamodel.py:497-621) and the target schema is derived by
    analyzing the fan-out against the empty frame, so the MERGE
    schema, the DLQ payload schema, and the per-objtype counters all
    agree without a row of data."""
    from hermes_spark.plans.mapping import (
        LocalTypeSpec,
        fanout_events,
        union_fanout,
    )
    from hermes_spark.schema import CHANGE_EVENT_SCHEMA
    from hermes_spark.streaming.cdc_join import JoinCdcPipeline
    from hermes_spark.streaming.pipeline import CdcPipeline

    cfg = load_config(config)
    pcfg = dict(cfg["pipeline"])
    for k, v in overrides.items():
        if k not in pcfg:
            raise ConfigError(f"override.{k}", "not a pipeline setting")
        pcfg[k] = v

    mode = pcfg.pop("mode")
    probe = spark.createDataFrame([], CHANGE_EVENT_SCHEMA)

    transform = None
    type_col = None
    type_names: tuple[str, ...] | None = None
    target_schema = None
    dm = cfg.get("datamodel")
    if dm is not None:
        types = []
        for t in dm["types"]:
            for attr, m in t["attrsmapping"].items():
                if isinstance(m, str):
                    cols = [m]
                elif isinstance(m, list):
                    cols = m
                else:
                    a_path = (
                        f"hermes-spark.datamodel.types.{t['name']}"
                        f".attrsmapping.{attr}"
                    )
                    try:
                        probe.select(F.expr(m["expr"]))
                    except Exception as e:
                        raise ConfigError(
                            f"{a_path}.expr", f"does not analyze: {_first_line(e)}"
                        ) from e
                    cols = []
                known = {f.name for f in CHANGE_EVENT_SCHEMA.fields}
                for c in cols:
                    if c not in known:
                        raise ConfigError(
                            f"hermes-spark.datamodel.types.{t['name']}"
                            f".attrsmapping.{attr}",
                            f"unknown change-event column {c!r} — "
                            f"available: {sorted(known)}",
                        )
            types.append(
                LocalTypeSpec(
                    name=t["name"],
                    mapping=t["attrsmapping"],
                    allow_empty=t["allow_empty"],
                )
            )
        passthrough = tuple(dm["passthrough"])
        type_col = dm["type_col"]
        type_names = tuple(t.name for t in types)

        def transform(df, _types=types, _pt=passthrough, _tc=type_col):
            return union_fanout(
                fanout_events(
                    df, _types, key_cols=("conv_id", "turn_idx"),
                    passthrough=_pt,
                ),
                type_col=_tc,
            )

        # derive the target schema from the ANALYZED fan-out plan: the
        # MERGE column list, DLQ payload and evolution all follow it.
        # The type column STAYS — it joins the MERGE key below (sibling
        # types carry the same (conv_id, turn_idx) and must not
        # overwrite each other, reference clients/datamodel.py:497-621)
        target_schema = transform(probe).schema

    validator = None
    if pcfg["validator"] is not None:
        vprobe = transform(probe) if transform is not None else probe
        validator = _compile_validator(
            pcfg["validator"], vprobe, "hermes-spark.pipeline.validator"
        )

    common = dict(
        spark=spark,
        source_dir=pcfg["source"],
        work_dir=pcfg["work_dir"],
        max_files_per_trigger=pcfg["max_files_per_trigger"],
        n_buckets=pcfg["n_buckets"],
        validator=validator,
        retry_every=pcfg["retry_every"],
        fk_map=pcfg["fk_map"],
        foreignkeys_policy=pcfg["foreignkeys_policy"],
        maintain_every=pcfg["maintain_every"],
    )
    if mode == "join":
        pipe = JoinCdcPipeline(**common)
    else:
        pipe = CdcPipeline(
            watermark=pcfg["watermark"],
            transform=transform,
            type_col=type_col,
            type_names=type_names,
            target_schema=target_schema,
            target_key=(
                (type_col, "conv_id", "turn_idx")
                if type_col is not None else ("conv_id", "turn_idx")
            ),
            **common,
        )

    st = cfg.get("status")
    if st is not None:
        from hermes_spark.streaming.status import (
            PipelineStatus,
            PipelineStatusListener,
        )

        listener = PipelineStatusListener(path=st["path"], keep=st["keep"])
        spark.streams.addListener(listener)
        pipe.status_api = PipelineStatus(pipe, listener)

    return pipe
