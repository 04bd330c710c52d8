"""View-graph analysis of the matching database.

Parity: reference ``graph.py:61-287`` — build a networkx graph from the
database's two_view_geometries (nodes = images, edge weight = verified match
count), greedy-modularity communities, clustering-coefficient outlier flags,
maximum spanning tree + inter-community expansion edges; writes
communities.csv, MST pair lists, and a self-contained interactive HTML view
(vis-network; the reference uses pyvis, which is not in this environment —
the HTML is generated directly with the same content).
"""

from __future__ import annotations

import logging
import sqlite3
from pathlib import Path
from typing import List, Union

from .io.colmap_db import pair_id_to_image_ids

logger = logging.getLogger("dim_tpu")

_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8">
<script src="https://unpkg.com/vis-network/standalone/umd/vis-network.min.js"></script>
<style>#net {{ width: 100%; height: 95vh; border: 1px solid #ccc; }}</style>
</head><body><div id="net"></div>
<script>
var nodes = new vis.DataSet({nodes});
var edges = new vis.DataSet({edges});
new vis.Network(document.getElementById("net"), {{nodes: nodes, edges: edges}},
  {{physics: {{solver: "forceAtlas2Based"}}}});
</script></body></html>
"""

_PALETTE = [
    "#e6194b", "#3cb44b", "#4363d8", "#f58231", "#911eb4",
    "#46f0f0", "#f032e6", "#bcf60c", "#fabebe", "#008080",
]


def build_graph_from_db(db_path: Union[str, Path]):
    import networkx as nx

    con = sqlite3.connect(str(db_path))
    cur = con.cursor()
    G = nx.Graph()
    for name, img_id in cur.execute("SELECT name, image_id FROM images"):
        G.add_node(int(img_id), title=str(name))
    for pair_id, rows in cur.execute(
        "SELECT pair_id, rows FROM two_view_geometries"
    ):
        i, j = pair_id_to_image_ids(pair_id)
        G.add_edge(int(i), int(j), matches=int(rows))
    con.close()
    return G


def view_graph(
    db: Union[str, Path],
    output_dir: Union[str, Path],
    imgs_dir: Union[str, Path] = None,
) -> None:
    import networkx as nx

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    G = build_graph_from_db(db)
    if G.number_of_edges() == 0:
        logger.warning("View graph has no edges; skipping visualization")
        return

    # analysis subgraph = aligned (non-isolated) nodes
    aligned = [n for n in G.nodes() if G.degree[n] > 0]
    AG = G.subgraph(aligned)

    communities: List = list(
        nx.community.greedy_modularity_communities(AG, "matches", resolution=1)
    )
    mst = nx.maximum_spanning_tree(AG, "matches")

    # clustering-coefficient outliers (reference graph.py:214-224)
    clustering = nx.clustering(AG, weight="matches")
    mean_c = sum(clustering.values()) / max(len(clustering), 1)
    outliers = {n for n, c in clustering.items() if c < 0.3 * mean_c}

    # communities.csv: image name, community index
    comm_of = {}
    for ci, comm in enumerate(communities):
        for n in comm:
            comm_of[n] = ci
    with open(output_dir / "communities.csv", "w") as f:
        f.write("image,community\n")
        for n in sorted(comm_of):
            f.write(f"{G.nodes[n].get('title', n)},{comm_of[n]}\n")

    # MST pair list + expansion edges between communities
    def write_pairs(path, edges):
        with open(path, "w") as f:
            for i, j in edges:
                f.write(
                    f"{G.nodes[i].get('title', i)} {G.nodes[j].get('title', j)}\n"
                )

    write_pairs(output_dir / "mst_pairs.txt", mst.edges())
    expansion = [
        (i, j) for i, j in AG.edges()
        if comm_of.get(i) != comm_of.get(j) and not mst.has_edge(i, j)
    ]
    write_pairs(output_dir / "mst_expanded_pairs.txt", list(mst.edges()) + expansion)

    # interactive HTML
    nodes_js = [
        {
            "id": n,
            "label": str(n),
            "title": G.nodes[n].get("title", str(n)),
            "color": _PALETTE[comm_of.get(n, 0) % len(_PALETTE)]
            if n not in outliers
            else "#808080",
        }
        for n in G.nodes()
    ]
    max_m = max(d["matches"] for _, _, d in G.edges(data=True))
    edges_js = [
        {
            "from": i,
            "to": j,
            "value": d["matches"] / max_m,
            "title": f"{d['matches']} matches",
        }
        for i, j, d in G.edges(data=True)
    ]
    (output_dir / "graph.html").write_text(
        _HTML_TEMPLATE.format(nodes=nodes_js, edges=edges_js)
    )
    logger.info(
        f"View graph: {G.number_of_nodes()} nodes, {G.number_of_edges()} edges, "
        f"{len(communities)} communities, {len(outliers)} outlier nodes "
        f"-> {output_dir / 'graph.html'}"
    )
