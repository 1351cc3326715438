"""Config-driven pipeline builder (the YAML topology analogue).

Reference: the collector wires receivers -> processors -> exporters from a
YAML config; the stanza factory turns the receiver's operator list into an
executable pipeline (internal/stanza/factory.go:45-63:
``pipeline = [inputCfg] + operatorCfgs``), and service.New resolves the
processor/exporter graph (cmd/otelcontribcol/main.go:46-50).

Spark translation (SURVEY.md section 3, EP1): a config is a plain list of
stage dicts; building it folds the stages into ONE lazy DataFrame plan that
Catalyst optimizes as a whole — stage boundaries in the config do NOT become
execution boundaries (no materialization between operators, unlike the
reference's channel hops).

Supported stage types (each names its reference analogue):

  {"type": "filter",   "expr": SQL-bool}                    # filterprocessor
  {"type": "metadata", "set": {col: SQL-expr}}              # stanza metadata
  {"type": "restructure", "select"|"drop"|"rename": ...}    # stanza restructure
  {"type": "regex_parser", "col":, "pattern":, "groups":}   # stanza regex_parser
  {"type": "router",   "routes": [[name, SQL-bool]...],
                       "default": name, "out": col}         # stanza router
  {"type": "enrich",   "dim": DataFrame, "on":, "attrs":,
                       "override": bool}                    # k8sprocessor
  {"type": "attrs",    "set": {col: SQL-expr}, "override":} # resourcedetection
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import parse as parse_fns
from ..operators import attributes


def build_stage(df: DataFrame, stage: dict) -> DataFrame:
    t = stage["type"]
    if t == "filter":
        return df.filter(stage["expr"])
    if t == "metadata":
        return df.withColumns({k: F.expr(v) for k, v in stage["set"].items()})
    if t == "restructure":
        out = df
        if "select" in stage:
            out = out.select(*stage["select"])
        for old, new in stage.get("rename", {}).items():
            out = out.withColumnRenamed(old, new)
        if "drop" in stage:
            out = out.drop(*stage["drop"])
        return out
    if t == "regex_parser":
        cols = parse_fns.regex_parser(
            F.col(stage["col"]), stage["pattern"], stage["groups"]
        )
        return df.select("*", *cols)
    if t == "router":
        tag = parse_fns.router(
            [(name, F.expr(cond)) for name, cond in stage["routes"]],
            default=stage.get("default"),
        )
        return df.withColumn(stage.get("out", "route"), tag)
    if t == "enrich":
        return attributes.enrich_lookup(
            df, stage["dim"], on=stage["on"], attrs=stage["attrs"],
            override=stage.get("override", False),
        )
    if t == "attrs":
        return attributes.upsert_attrs(
            df, {k: F.expr(v) for k, v in stage["set"].items()},
            override=stage.get("override", False),
        )
    raise ValueError(f"unknown stage type: {t}")


def build_pipeline(df: DataFrame, stages: list[dict]) -> DataFrame:
    """Fold config stages into one lazy plan (factory.go:45-63 analogue)."""
    for stage in stages:
        df = build_stage(df, stage)
    return df
