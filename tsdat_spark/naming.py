"""tstring templating + datastream naming.

tsdat names datastreams and storage paths with f-string-style templates
supporting ``[optional]`` bracket groups (``tsdat/tstring/template.py:12``,
``template_registry.py``: ``"{location_id}.{dataset_name}[-{qualifier}]
[-{temporal}].{data_level}"``) and resolves storage paths like
``data/{datastream}`` (``tsdat/io/storage/file_system.py:27-59``).

In the relational engine the datastream is the TABLE name (tier tables are
``<datastream>/tier_<t>``), so this is a small pure-string module:
``render_template`` substitutes ``{var}`` from a mapping and drops
``[...]`` groups whose variables are missing, raising on missing required
variables — the same contract as tsdat's ``Template.substitute``.
"""

from __future__ import annotations

import re

DATASTREAM_TEMPLATE = "{location_id}.{dataset_name}[-{qualifier}][-{temporal}].{data_level}"

_VAR_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def render_template(template: str, mapping: dict[str, object]) -> str:
    """Substitute ``{var}``s; ``[...]`` groups with any missing/None var are
    dropped; missing required (unbracketed) vars raise ValueError."""

    def sub_group(text: str, optional: bool) -> str:
        out, missing = text, False
        for var in _VAR_RE.findall(text):
            val = mapping.get(var)
            if val is None or val == "":
                missing = True
            else:
                out = out.replace("{%s}" % var, str(val))
        if missing:
            if optional:
                return ""
            absent = [v for v in _VAR_RE.findall(text) if not mapping.get(v)]
            raise ValueError(f"template {template!r} missing required variables {absent}")
        return out

    # split into bracket groups and plain chunks (no nesting, like tsdat)
    parts: list[str] = []
    i = 0
    while i < len(template):
        if template[i] == "[":
            j = template.index("]", i)
            parts.append(sub_group(template[i + 1 : j], optional=True))
            i = j + 1
        else:
            j = template.find("[", i)
            j = j if j != -1 else len(template)
            parts.append(sub_group(template[i:j], optional=False))
            i = j
    return "".join(parts)


def get_datastream(**attrs: object) -> str:
    """``tsdat/utils/get_datastream.py:4`` — the canonical datastream id."""
    return render_template(DATASTREAM_TEMPLATE, attrs)


def storage_path(path_template: str, attrs: dict[str, object]) -> str:
    """Resolve a storage path template (``data/{datastream}``): the
    ``datastream`` variable is derived from the dataset attrs if absent."""
    mapping = dict(attrs)
    if "datastream" not in mapping:
        mapping["datastream"] = get_datastream(**attrs)
    return render_template(path_template, mapping)
