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


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~target_file_bytes each (the classic post-streaming / post-partition
    maintenance job — thousands of KB-sized part files from micro-batch
    commits or over-parallel writes destroy scan throughput via
    per-file open/footer costs and scheduler pressure).

    File count = ceil(total_bytes / target) from the source footers (no
    data pass), laid out by repartition(n); an optional
    sortWithinPartitions restores intra-file clustering so min/max
    row-group stats stay selective after the rewrite. Returns the
    number of files written. Reads + writes the data exactly once.
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_dir)
    return n_files


def affected_files_plan(spark, layout_dir: str, keys, key_col: str):
    """The file-targeting plan of targeted_delete, unexecuted: a
    LEFT-SEMI join of the layout (tagged with input_file_name) against
    the doomed keys, reduced to distinct file paths. Exposed so
    scripts/explain_audit.py can gate the shape (semi join, never a
    full materialization of matching rows)."""
    from pyspark.sql import functions as F

    back = spark.read.parquet(layout_dir).withColumn(
        "_f", F.input_file_name()
    )
    return back.join(keys, key_col, "semi").select("_f").distinct()


def kept_rows_plan(spark, files: list[str], keys, key_col: str):
    """The rewrite plan of targeted_delete, unexecuted: ONLY the
    affected files are re-read, minus the doomed keys via LEFT-ANTI
    join — the full table is never rewritten. Exposed for the plan
    audit (anti join over a file-scoped scan)."""
    return spark.read.parquet(*files).join(keys, key_col, "left_anti")


def targeted_delete(
    spark, layout_dir: str, keys_df, key_col: str
) -> tuple[int, int]:
    """Key-targeted delete over a parquet layout — the lakehouse
    DELETE/GDPR-erasure pattern: locate the files that actually contain
    affected keys (input_file_name ⋉ keys), rewrite ONLY those files
    minus the deleted rows, and leave every other file untouched. On a
    key-clustered layout a handful of keys maps to a handful of files,
    so erasing 100 users from 100 TB rewrites megabytes, not the table
    (pinned by test_targeted_delete_rewrites_only_affected_files).

    Mechanics: the affected-file list is a collect of FILE PATHS (file-
    count-bounded, never rows); kept rows of those files are written to
    a staging subdir and swapped in file-atomically (os.replace per
    file after the originals are removed). NOT a transaction — a real
    deployment wraps the swap in a commit log (Delta/Iceberg); the
    file-targeting and anti-join rewrite are the engine-side work this
    operator owns, and the swap window is the documented gap.

    Returns (n_files_rewritten, n_files_total).
    """
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    keys = keys_df.select(F.col(keys_df.columns[0]).alias(key_col)).distinct()
    affected = sorted(
        r["_f"]
        for r in affected_files_plan(
            spark, layout_dir, keys, key_col
        ).collect()
    )
    total_files = len(
        [f for f in os.listdir(layout_dir) if f.endswith(".parquet")]
    )
    if not affected:
        return 0, total_files
    local = [p[len("file:"):] if p.startswith("file:") else p for p in affected]
    staging = os.path.join(layout_dir, "_staging_delete")
    kept = kept_rows_plan(spark, local, keys, key_col)
    kept.repartition(len(local)).write.mode("overwrite").parquet(staging)
    for p in local:
        os.remove(p)
    # Rewrite names must be unique PER INVOCATION: a fixed numbering
    # (deleted-rewrite-00000…) would let a second delete os.replace()
    # over a live, unaffected file produced by an earlier delete,
    # silently losing rows — fatal for repeated GDPR erasure requests.
    tag = uuid.uuid4().hex[:12]
    for i, f in enumerate(
        sorted(x for x in os.listdir(staging) if x.endswith(".parquet"))
    ):
        dst = os.path.join(
            layout_dir, f"deleted-rewrite-{tag}-{i:05d}.parquet"
        )
        if os.path.exists(dst):  # uuid collision guard: never clobber
            raise RuntimeError(f"targeted_delete: refusing to overwrite {dst}")
        os.replace(os.path.join(staging, f), dst)
    shutil.rmtree(staging, ignore_errors=True)
    return len(local), total_files
