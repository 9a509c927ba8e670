"""Sinks (SURVEY §2.1 S6-S9).

- CSV/parquet/JSON-lines sinks are plain df.write (S6).
- entity_map_json (S7): the reference's `{id: to_dict()}` JSON with
  null/empty fields dropped (data_models.py:37-38,65-75,98-105).
- gexf (S9): Gephi XML export with label + RGB viz color per node
  (grapher.py:140-163). Serving-boundary sink — subgraphs are
  human-scale, so rows are collected and the XML is written
  driver-side; the heavy lifting (which nodes/edges, colors) stays in
  DataFrames.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

# grapher.py:144-148
RGB_MAP = {
    "red": (255, 0, 0),
    "green": (6, 200, 50),
    "gray": (128, 128, 128),
}

# data_models.py: ATTRIBUTES serialization order per class.
WORK_ATTRS = [
    "id", "type", "name", "aka", "author_ids", "base_text_ids",
    "commentary_ids", "discipline", "highest_year", "lowest_year",
    "author_highest_year", "author_lowest_year",
]
AUTHOR_ATTRS = [
    "id", "type", "name", "aka", "social_identifiers", "work_ids",
    "disciplines", "highest_year", "lowest_year",
]


def entity_map_json(entities: DataFrame, path: str) -> None:
    """Write the `{id: entity_dict}` map JSON (transform.py:167-171):
    UTF-8 (ensure_ascii=False), fields with None dropped — the same
    shape data_models.to_dict produces. Collected at the driver: the
    artifact is the reference's human-readable snapshot, not a
    distributed table (the queryable form is the entities DataFrame
    itself, written as parquet)."""
    import json

    out = {}
    for r in entities.collect():
        d = r.asDict()
        attrs = WORK_ATTRS if d.get("type") == "work" else AUTHOR_ATTRS
        ent = {}
        for k in attrs:
            v = d.get(k)
            if v is None or v == "" or (isinstance(v, list) and not v):
                continue
            ent[k] = v
        out[d["id"]] = ent
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=4, ensure_ascii=False)


def write_gexf(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    label_col: str = "label",
    color_col: str = "color",
) -> None:
    """GEXF 1.2draft export (grapher.py:140-163): nodes (node, label,
    color) + edges (src, dst). Directed, with viz:color attributes for
    the reference's red/green/gray scheme."""
    node_rows = nodes.collect()
    edge_rows = edges.select("src", "dst").collect()
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://www.gexf.net/1.2draft" '
        'xmlns:viz="http://www.gexf.net/1.2draft/viz" version="1.2">',
        '  <graph defaultedgetype="directed" mode="static">',
        "    <nodes>",
    ]
    for r in node_rows:
        d = r.asDict()
        nid = escape(str(d["node"]), {'"': "&quot;"})
        label = escape(str(d.get(label_col) or d["node"]), {'"': "&quot;"})
        lines.append(f'      <node id="{nid}" label="{label}">')
        rgb = RGB_MAP.get(d.get(color_col) or "")
        if rgb:
            lines.append(
                f'        <viz:color r="{rgb[0]}" g="{rgb[1]}" b="{rgb[2]}" />'
            )
        lines.append("      </node>")
    lines.append("    </nodes>")
    lines.append("    <edges>")
    for i, r in enumerate(edge_rows):
        s = escape(str(r.src), {'"': "&quot;"})
        t = escape(str(r.dst), {'"': "&quot;"})
        lines.append(f'      <edge id="{i}" source="{s}" target="{t}" />')
    lines.append("    </edges>")
    lines.append("  </graph>")
    lines.append("</gexf>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
