"""Serving layer: the reference's API surface (SURVEY §3) composed
from engine operators. Each function returns the exact response shape
of the corresponding Flask endpoint; heavy lifting stays in DataFrames,
dict shaping happens at the collect() boundary exactly as the
reference's jsonify boundary.

Flagship: subgraph_response == POST /api/graph/subgraph
(flask_app.py:183-252): validate → k-hop BFS with exclusion
(grapher.py:25-94) → annotate (grapher.py:118-137) → per-type node
projection + edge relationship phrases → response dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from panditya_spark.functions.labels import date_info, edge_relationship
from panditya_spark.operators.graph import khop_bfs


def validate_subgraph_inputs(authors, works, hops, exclude_list):
    """flask_app.py:163-170 — same messages, same order."""
    if not authors and not works:
        return {"error": "require either one or both of authors or works"}
    if not isinstance(hops, int) or isinstance(hops, bool) or hops < 0:
        return {"error": "hops must be a non-negative integer"}
    if not isinstance(exclude_list, list):
        return {"error": "exclude_list must be a list"}
    return None


def subgraph_response(
    entities: DataFrame,
    edges: DataFrame,
    etext_links: DataFrame | None,
    authors: list[str],
    works: list[str],
    hops: int,
    exclude_list: list[str] | None = None,
) -> dict:
    """Full §3.1 lifecycle. entities/edges come from etl.py;
    etext_links is the (work_id, collection, subtype, url) long table
    or None. Returns the flask_app.py:233-245 response dict."""
    spark = entities.sparkSession
    authors = list(dict.fromkeys(authors))
    works = list(dict.fromkeys(works))
    exclude_list = list(set(exclude_list or []))
    err = validate_subgraph_inputs(authors, works, hops, exclude_list)
    if err is not None:
        return err

    center = list(set(authors) | set(works))
    seeds = spark.createDataFrame([(c,) for c in center], ["node"])
    exclude_df = (
        spark.createDataFrame([(x,) for x in exclude_list], ["node"])
        if exclude_list
        else None
    )
    nodes, sub_edges = khop_bfs(edges, seeds, hops, exclude=exclude_df)

    # Unknown seed ids → the reference raises KeyError → 400.
    known = nodes.join(
        entities.select(F.col("id").alias("node")), "node", "left_semi"
    ).count()
    if known < nodes.count():
        missing = (
            nodes.join(entities.select(F.col("id").alias("node")), "node", "left_anti")
            .limit(1)
            .collect()[0][0]
        )
        return {"error": f"Invalid ID: '{missing}'"}

    dates = date_info(
        F.col("type"),
        F.col("lowest_year"),
        F.col("highest_year"),
        F.col("author_lowest_year"),
        F.col("author_highest_year"),
    )
    annotated = (
        nodes.join(entities, nodes.node == entities.id)
        .select(
            "node",
            F.col("name").alias("label"),
            "type",
            "aka",
            F.when(F.col("type") == "author", F.col("social_identifiers")).alias("social_ids"),
            dates.alias("dates"),
            F.when(F.col("type") == "work", F.col("discipline")).alias("discipline"),
            F.when(F.col("type") == "author", F.col("disciplines")).alias("disciplines"),
            F.col("node").isin(center).alias("is_central"),
            F.col("node").isin(exclude_list).alias("is_excluded")
            if exclude_list
            else F.lit(False).alias("is_excluded"),
        )
    )

    # e-text annotation (J7): nested per-work shape from the long table.
    links_by_work: dict[str, dict] = {}
    if etext_links is not None:
        from panditya_spark.etl import etext_nested_mapping

        sub_links = etext_links.join(
            nodes.withColumnRenamed("node", "work_id"), "work_id", "left_semi"
        )
        grouped = (
            sub_links.groupBy("work_id", "collection", "subtype")
            .agg(F.array_sort(F.collect_set("url")).alias("urls"))
            .collect()
        )
        for r in grouped:
            links_by_work.setdefault(r.work_id, {}).setdefault(r.collection, {})[
                r.subtype
            ] = list(r.urls)
        for wid, colls in links_by_work.items():
            for cname, subtypes in list(colls.items()):
                if len(subtypes) == 1:
                    colls[cname] = next(iter(subtypes.values()))

    filtered_nodes = []
    for r in annotated.collect():
        filtered_nodes.append(
            {
                "id": r.node,
                "label": r.label,
                "type": r.type,
                "aka": r.aka,
                "social_ids": r.social_ids,
                "dates": r.dates,
                "discipline": r.discipline,
                "disciplines": r.disciplines,
                "is_central": bool(r.is_central),
                "is_excluded": bool(r.is_excluded),
                # reference uses False (not None) for works without links
                "etext_links": links_by_work.get(r.node, False),
            }
        )

    src_t = entities.select(F.col("id").alias("src"), F.col("type").alias("src_type"))
    dst_t = entities.select(F.col("id").alias("dst"), F.col("type").alias("dst_type"))
    typed_edges = (
        sub_edges.join(F.broadcast(src_t), "src")
        .join(F.broadcast(dst_t), "dst")
        .select(
            "src",
            "dst",
            edge_relationship(F.col("src_type"), F.col("dst_type")).alias("rel"),
        )
        .collect()
    )
    filtered_edges = [
        {"source": e.src, "target": e.dst, "relationship": e.rel} for e in typed_edges
    ]

    return {
        "parameters": {
            "authors": authors,
            "works": works,
            "hops": hops,
            "exclude_list": exclude_list,
        },
        "graph": {"nodes": filtered_nodes, "edges": filtered_edges},
    }


def entity_labels_response(entities: DataFrame, ids: list[str]) -> dict:
    """GET /api/entities/labels (flask_app.py:109-146) — returns labels
    only for VALID ids (the reference builds from unvalidated input and
    can KeyError; SURVEY §3.4 documents the fix)."""
    import re

    if any(not re.fullmatch(r"[\d,]*", i) for i in ids):
        return {"error": "invalid id format"}
    rows = (
        entities.filter(F.col("id").isin(ids))
        .select("id", F.col("name").alias("label"))
        .collect()
    )
    return {"labels": {r.id: r.label for r in rows}}


def dropdown_options(entities: DataFrame) -> dict:
    """GET /api/entities/{authors|works|all} (flask_app.py:59-73,95-106):
    '{name} ({id})' + optional date/aka brackets, collation-sorted.
    Built once per session in the reference; same here (cache the
    result)."""
    from panditya_spark.functions.collation import collate
    from panditya_spark.functions.labels import date_info, dropdown_label

    dates = date_info(
        F.col("type"),
        F.col("lowest_year"),
        F.col("highest_year"),
        F.col("author_lowest_year"),
        F.col("author_highest_year"),
    )
    labeled = entities.select(
        "id",
        "type",
        dropdown_label(F.col("name"), F.col("id"), dates, F.col("aka")).alias("label"),
    ).orderBy(collate(F.col("label")))
    rows = labeled.collect()
    out = {"all": [], "authors": [], "works": []}
    for r in rows:
        opt = {"id": r.id, "label": r.label}
        out["all"].append(opt)
        out[r.type + "s"].append(opt)
    return out
