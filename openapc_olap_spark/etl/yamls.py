"""Treemap-site YAML config generator (reference assets_generator.py:738-789,
``generate_yamls``).

One YAML document per institution with a cubes_name: site header fields from
the institutions dimension, then one ``hierarchies`` entry per institutional
cube ordered by the manifest priority, with the per-type hierarchy spec
(filters / table_items / drilldowns — reference
static/templates/YAML_STATIC_PART_{APC,APC_AC,BPC,TA,DEAL}).

The hierarchy specs are encoded as data here (semantic parity with the
templates, provenance cited per block) and rendered through a deterministic
YAML emitter. Inputs are the same frames the pipeline already produces —
the institutional manifest (institution, cube_name, full_name, cube_type,
priority) and the institutions dimension; both are dimension-scale, so the
driver-side render loop is bounded by the institution count (hundreds),
never fact data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Hierarchy specs, field-equivalent to the reference YAML templates.
# percentage rows are the client-side A6 total_percentage derivation.
_PCT = {"name": "percentage", "type": "total_percentage",
        "format": "percentage", "label": "Percentage"}


def _items(primary: str, names_formats: list[tuple[str, str]]) -> list[dict]:
    out = [{"name": n, "type": "aggregate", "format": f}
           for n, f in names_formats]
    out.append(dict(_PCT, relates_to=primary))
    return out


# static/templates/YAML_STATIC_PART_APC:1-31
_APC_SPEC = {
    "name": "APC",
    "primary_aggregate": "apc_amount_sum",
    "filters": [("period", "Year"), ("is_hybrid", "Hybrid Status")],
    "table_items": _items("apc_amount_sum", [
        ("apc_amount_sum", "monetary"), ("apc_num_items", "number"),
        ("apc_amount_avg", "monetary"), ("apc_amount_stddev", "monetary")]),
    "drilldowns": ["publisher", "journal_full_title", "doi"],
}

# static/templates/YAML_STATIC_PART_APC_AC:1-38
_AC_SPEC = {
    "name": "Additional Costs",
    "primary_aggregate": "apc_amount_sum",
    "filters": [("period", "Year"), ("is_hybrid", "Hybrid Status"),
                ("cost_category", "Cost Category")],
    "table_items": _items("apc_amount_sum", [
        ("apc_amount_sum", "monetary"), ("apc_num_items", "number"),
        ("cost_data_num_items", "number"), ("apc_amount_avg", "monetary"),
        ("apc_amount_stddev", "monetary")]),
    "drilldowns": ["publisher", "journal_full_title", "doi", "cost_type"],
}

# static/templates/YAML_STATIC_PART_BPC:1-36
_BPC_SPEC = {
    "name": "BPC",
    "primary_aggregate": "bpc_amount_sum",
    "filters": [("period", "Year"), ("country", "Country"),
                ("backlist_oa", "Backlist OA"), ("doab", "in DOAB")],
    "table_items": _items("bpc_amount_sum", [
        ("bpc_amount_sum", "monetary"), ("bpc_num_items", "number"),
        ("bpc_amount_avg", "monetary"), ("bpc_amount_stddev", "monetary")]),
    "drilldowns": ["publisher", "book_title", "doi"],
}

# static/templates/YAML_STATIC_PART_TA:1-20
_TA_SPEC = {
    "name": "TA",
    "primary_aggregate": "num_items",
    "filters": [("period", "Year"), ("is_hybrid", "Hybrid Status")],
    "table_items": _items("num_items", [("num_items", "number")]),
    "drilldowns": ["agreement", "journal_full_title", "doi"],
}

# static/templates/YAML_STATIC_PART_DEAL:1-36
_DEAL_SPEC = {
    "name": "DEAL",
    "primary_aggregate": "apc_amount_sum",
    "filters": [("period", "Year"), ("is_hybrid", "Hybrid Status"),
                ("opt_out", "Opt Out")],
    "table_items": _items("apc_amount_sum", [
        ("apc_amount_sum", "monetary"), ("apc_num_items", "number"),
        ("apc_amount_avg", "monetary"), ("apc_amount_stddev", "monetary")]),
    "drilldowns": ["publisher", "journal_full_title", "doi"],
}

HIERARCHY_SPECS = {"apc": _APC_SPEC, "apc_ac": _AC_SPEC, "bpc": _BPC_SPEC,
                   "ta": _TA_SPEC, "deal": _DEAL_SPEC}

# Site header constants (assets_generator.py:769-774)
_SOURCE = "Open APC"
_SOURCE_URL = "https://github.com/OpenAPC/openapc-de"
_DATA_URL = ("https://github.com/OpenAPC/openapc-de/blob/master/data/"
             "apc_de.csv")


def institution_yaml(full_name: str, slug: str, continent: str, country: str,
                     state: str, cubes: list[tuple[str, str]]) -> str:
    """Render one institution's site config. ``cubes`` is the
    priority-ordered [(cube_type, cube_name), ...] from the manifest; the
    first entry is the default hierarchy (assets_generator.py:762-763)."""
    default = cubes[0][0]
    lines = [
        f'name: "{full_name}"',
        f"slug: {slug}",
        f'tagline: "{full_name} publication cost data"',
        f"source: {_SOURCE}",
        f"source_url: {_SOURCE_URL}",
        f"data_url: {_DATA_URL}",
        f"continent: {continent}",
        f"country: {country}",
        f"state: {state}",
        "level: kommune",
        f"dataset: '{slug}'",
        f"default: {default}",
        "",
        "hierarchies:",
    ]
    for cube_type, cube_name in cubes:
        spec = HIERARCHY_SPECS[cube_type]
        lines.append(f"    {cube_type}:")
        lines.append(f"        cube: {cube_name}")
        lines.append(f"        name: {spec['name']}")
        lines.append(f"        primary_aggregate: {spec['primary_aggregate']}")
        lines.append("        filters:")
        for field, label in spec["filters"]:
            lines.append(f"          - field: '{field}'")
            lines.append(f"            name: '{label}'")
            lines.append("            nullable: true")
        lines.append("        table_items:")
        for item in spec["table_items"]:
            lines.append(f"          - name: '{item['name']}'")
            lines.append(f"            type: '{item['type']}'")
            lines.append(f"            format: '{item['format']}'")
            if "relates_to" in item:
                lines.append(f"            relates_to: '{item['relates_to']}'")
            if "label" in item:
                lines.append(f"            label: '{item['label']}'")
        lines.append("        drilldowns:")
        for d in spec["drilldowns"]:
            lines.append(f"            - {d}")
    return "\n".join(lines) + "\n"


def generate_yamls(manifest: DataFrame, institutions: DataFrame,
                   out_dir: str) -> list[str]:
    """Write one ``<slug>.yaml`` per institution in the manifest
    (assets_generator.py:738-789). Returns the written paths.

    Both inputs are dimension frames (institutions x cube types — hundreds
    of rows); the collect here is the same scale as the reference's CSV
    read, not a fact-side action.
    """
    _YAML_ROW_GUARD = 100_000          # manifests are ~10^3 at full scale;
    n = institutions.limit(_YAML_ROW_GUARD + 1).count()
    if n > _YAML_ROW_GUARD:            # a fact frame passed by mistake would
        raise ValueError(              # otherwise OOM the driver silently
            f"generate_yamls: institutions frame exceeds {_YAML_ROW_GUARD} "
            "rows — this expects the institution dimension, not facts")
    inst_rows = {r["institution"]: r for r in institutions.collect()}
    by_inst: dict[str, list] = {}
    for r in manifest.collect():
        by_inst.setdefault(r["institution"], []).append(r)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for institution, rows in sorted(by_inst.items()):
        rows.sort(key=lambda r: r["priority"])
        inst = inst_rows[institution]
        slug = rows[0]["cube_name"] if rows[0]["cube_type"] == "apc" else None
        slug = slug or inst["_cube_name"]
        text = institution_yaml(
            full_name=rows[0]["full_name"],
            slug=slug,
            continent=inst["_continent"],
            country=inst["_country"],
            state=inst["_state"],
            cubes=[(r["cube_type"], r["cube_name"]) for r in rows])
        path = os.path.join(out_dir, f"{slug}.yaml")
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        written.append(path)
    return written
