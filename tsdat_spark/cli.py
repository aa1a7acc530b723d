"""CLI — yaml-config JSON-schema generation (tsdat parity surface).

The reference's CLI does exactly one thing: emit JSON Schemas that editors
use to validate the pipeline yaml files (``tsdat/cli/cli.py:7-17`` →
``tsdat/cli/generate_schema/generate_schema.py:18-52``, with ``tsdat``/
``acdd``/``ioos`` dataset-attribute standards). This module mirrors that:
``python -m tsdat_spark.cli generate-schema [--dir D] [--standards S]``
writes ``{retriever,dataset,quality,storage,pipeline}-schema.json``.

The schemas are hand-authored against THIS engine's yaml surface (what
``yaml_config.py`` actually parses — cited per schema), not auto-dumped
from dataclasses: the yaml shape and the runtime dataclasses differ
deliberately (e.g. rule dicts vs ``VarRule`` lists), and the schema must
validate what users write. ACDD/IOOS standards add the required global
attributes those conventions define (both public metadata standards).
"""

from __future__ import annotations

import argparse
import json
import os

_VAR_NODE = {
    "type": ["object", "null"],
    "properties": {
        "dtype": {"type": "string", "enum": [
            "double", "float", "long", "int", "string", "timestamp"]},
        "data": {"description": "static value (tsdat static variables)"},
        "attrs": {
            "type": "object",
            "properties": {
                "units": {"type": "string"},
                "_FillValue": {},
                "long_name": {"type": "string"},
            },
            "additionalProperties": True,
        },
    },
    "additionalProperties": True,
}

_RETRIEVER_RULE = {
    "type": ["object", "null"],
    "properties": {
        "name": {"oneOf": [{"type": "string"}, {"type": "array", "items": {"type": "string"}}]},
        "data_converters": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "classname": {"type": "string"},
                    "parameters": {"type": "object"},
                },
                "required": ["classname"],
            },
        },
    },
    # per-input-key rules: regex pattern -> rule (yaml_config._parse_rules)
    "additionalProperties": True,
}

RETRIEVER_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "title": "Retriever config (tsdat_spark.yaml_config._parse_retriever)",
    "type": "object",
    "properties": {
        "classname": {"type": "string"},
        "readers": {
            "type": "object",
            "description": "regex input-key pattern -> reader node; first match wins",
            "additionalProperties": {
                "type": "object",
                "properties": {
                    "classname": {"type": "string"},
                    "parameters": {"type": "object"},
                },
                "required": ["classname"],
            },
        },
        "coords": {"type": "object", "additionalProperties": _RETRIEVER_RULE},
        "data_vars": {"type": "object", "additionalProperties": _RETRIEVER_RULE},
    },
}

_ACDD_REQUIRED = ["title", "description"]
_ACDD_PROPS = {
    "title": {"type": "string"},
    "description": {"type": "string"},
    "conventions": {"type": "string"},
    "featureType": {"type": "string"},
    "id": {"type": "string"},
    "infoUrl": {"type": "string"},
    "license": {"type": "string"},
    "naming_authority": {"type": "string"},
    "standard_name_vocabulary": {"type": "string"},
    "creator_name": {"type": "string"},
    "creator_url": {"type": "string"},
}
_IOOS_REQUIRED = _ACDD_REQUIRED + ["creator_country", "creator_institution"]
_IOOS_PROPS = {**_ACDD_PROPS, "creator_country": {"type": "string"},
               "creator_institution": {"type": "string"},
               "creator_sector": {"type": "string"},
               "publisher_country": {"type": "string"}}


def dataset_schema(standards: str) -> dict:
    attrs: dict = {
        "type": "object",
        "properties": {
            "dataset_name": {"type": "string"},
            "location_id": {"type": "string"},
            "data_level": {"type": "string"},
            "datastream": {"type": "string"},
        },
        "additionalProperties": True,
    }
    if standards == "acdd":
        attrs["properties"].update(_ACDD_PROPS)
        attrs["required"] = _ACDD_REQUIRED
    elif standards == "ioos":
        attrs["properties"].update(_IOOS_PROPS)
        attrs["required"] = _IOOS_REQUIRED
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": f"Dataset config, {standards} standards "
                 "(tsdat_spark.yaml_config._parse_dataset)",
        "type": "object",
        "properties": {
            "attrs": attrs,
            "coords": {"type": "object", "additionalProperties": _VAR_NODE},
            "data_vars": {"type": "object", "additionalProperties": _VAR_NODE},
        },
        "required": ["coords", "data_vars"],
    }


QUALITY_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "title": "Quality config (tsdat_spark.yaml_config._parse_quality)",
    "type": "object",
    "properties": {
        "managers": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "name": {"type": "string"},
                    "checker": {
                        "type": "object",
                        "properties": {"classname": {"type": "string"},
                                       "parameters": {"type": "object"}},
                        "required": ["classname"],
                    },
                    "handlers": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "properties": {"classname": {"type": "string"},
                                           "parameters": {"type": "object"}},
                            "required": ["classname"],
                        },
                    },
                    "apply_to": {
                        "type": "array",
                        "items": {"type": "string"},
                        "description": "variable names or COORDS / DATA_VARS",
                    },
                    "exclude": {"type": "array", "items": {"type": "string"}},
                },
                "required": ["checker"],
            },
        }
    },
    "required": ["managers"],
}

STORAGE_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "title": "Storage config (tsdat_spark.yaml_config._parse_storage)",
    "type": "object",
    "properties": {
        "classname": {"type": "string"},
        "parameters": {
            "type": "object",
            "properties": {"data_storage_path": {"type": "string"}},
            "additionalProperties": True,
        },
        "handler": {
            "type": "object",
            "properties": {
                "classname": {"type": "string"},
                "writer": {
                    "type": "object",
                    "properties": {"classname": {"type": "string"},
                                   "parameters": {"type": "object"}},
                },
            },
        },
    },
}


def pipeline_schema(standards: str) -> dict:
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Pipeline config (tsdat_spark.yaml_config.load_pipeline_yaml)",
        "type": "object",
        "properties": {
            "classname": {"type": "string"},
            "triggers": {"type": "array", "items": {"type": "string"}},
            "parameters": {"type": "object"},
            "retriever": {"oneOf": [{"type": "string"}, RETRIEVER_SCHEMA]},
            "dataset": {"oneOf": [{"type": "string"}, dataset_schema(standards)]},
            "quality": {"oneOf": [{"type": "string"}, QUALITY_SCHEMA]},
            "storage": {"oneOf": [{"type": "string"}, STORAGE_SCHEMA]},
        },
        "required": ["triggers", "retriever", "dataset", "storage"],
    }


def vap_retriever_schema() -> dict:
    """Retriever + VAP fetch/transformation parameters (reference
    ``vap_retriever_config.py:12-60``; engine: fetch padding in
    ``pipeline.py`` and transform alignment/range/width in
    ``transform/``)."""
    sch = json.loads(json.dumps(RETRIEVER_SCHEMA))  # deep copy
    sch["title"] = "VAP retriever config (retriever + fetch/transformation parameters)"
    sch["properties"]["parameters"] = {
        "type": "object",
        "properties": {
            "fetch_parameters": {
                "type": "object",
                "properties": {
                    "time_padding": {
                        "type": "string",
                        "pattern": r"^[\+|\-]?[0-9]+[h|m|s]?(ms)?$",
                        "description": "look-back/ahead padding around the "
                        "requested [begin, end) fetch range, e.g. -24h / +30m / 24h",
                    }
                },
            },
            "transformation_parameters": {
                "type": "object",
                "properties": {
                    "alignment": {
                        "type": "object",
                        "additionalProperties": {"enum": ["LEFT", "RIGHT", "CENTER"]},
                    },
                    "range": {"type": "object",
                              "additionalProperties": {"type": "string"}},
                    "width": {"type": "object",
                              "additionalProperties": {"type": "string"}},
                },
            },
        },
    }
    return sch


def generate_schema(dir: str = ".vscode/schema/", standards: str = "tsdat") -> list[str]:
    if standards not in ("tsdat", "acdd", "ioos"):
        raise SystemExit(f"unknown standards {standards!r} (tsdat | acdd | ioos)")
    os.makedirs(dir, exist_ok=True)
    print(f"Using {standards} dataset standards")
    mapping = {
        "retriever": RETRIEVER_SCHEMA,
        "vap-retriever": vap_retriever_schema(),
        "dataset": dataset_schema(standards),
        "quality": QUALITY_SCHEMA,
        "storage": STORAGE_SCHEMA,
        "pipeline": pipeline_schema(standards),
    }
    written = []
    for cfg_type, schema in mapping.items():
        path = os.path.join(dir, f"{cfg_type}-schema.json")
        with open(path, "w") as f:
            json.dump(schema, f, indent=2)
        written.append(path)
        print(f"Wrote {cfg_type} schema files to {path}")
    print("Done!")
    return written


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="tsdat_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    gs = sub.add_parser(
        "generate-schema",
        help="Generate schemas to validate yaml configuration files.",
    )
    gs.add_argument("--dir", default=".vscode/schema/")
    gs.add_argument("--standards", default="tsdat", choices=["tsdat", "acdd", "ioos"])
    args = parser.parse_args(argv)
    if args.command == "generate-schema":
        generate_schema(args.dir, args.standards)


if __name__ == "__main__":
    main()
