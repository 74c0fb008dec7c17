"""Reciprocity + rich club — osmspark/graph/structure.py."""

from osmspark.graph import reciprocity, rich_club

SCHEMA = "src long, dst long"


def test_reciprocity_counts(spark):
    # (0,1) mutual; (2,3) one-way; dup + self-loop ignored
    edges = [(0, 1), (1, 0), (2, 3), (2, 3), (4, 4)]
    r = reciprocity(spark.createDataFrame(edges, SCHEMA)).collect()[0]
    assert r["n_edges"] == 3 and r["n_reciprocal"] == 2
    assert abs(r["reciprocity"] - 2 / 3) < 1e-9


def test_reciprocity_fully_mutual(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    r = reciprocity(spark.createDataFrame(edges, SCHEMA)).collect()[0]
    assert r["reciprocity"] == 1.0


def test_rich_club_star_plus_clique(spark):
    # 4-clique (each deg>=3) + leaves on node 0
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    leaves = [(0, 10 + i) for i in range(5)]
    df = spark.createDataFrame(clique + leaves, SCHEMA)
    rows = {r["k"]: r for r in rich_club(df, ks=[0, 2, 7]).collect()}
    # k=0: all 9 nodes, all 11 edges
    assert rows[0]["n_nodes"] == 9 and rows[0]["n_edges"] == 11
    # k=2: deg>2 -> nodes 0 (deg 8), 1, 2, 3 (deg 3): the 4-clique
    assert rows[2]["n_nodes"] == 4 and rows[2]["n_edges"] == 6
    assert rows[2]["phi"] == 1.0
    # k=7: only node 0 -> NULL phi, zero edges
    assert rows[7]["n_nodes"] == 1 and rows[7]["n_edges"] == 0
    assert rows[7]["phi"] is None


def test_rich_club_brute_force(spark):
    edges = [(i % 13, (i * i + 2) % 13) for i in range(50)]
    df = spark.createDataFrame(edges, SCHEMA)
    canon = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for r in rich_club(df, ks=[1, 2, 3]).collect():
        k = r["k"]
        nodes = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in canon if a in nodes and b in nodes)
        assert r["n_nodes"] == len(nodes) and r["n_edges"] == ek
        if len(nodes) > 1:
            assert abs(r["phi"] - 2 * ek / (len(nodes) * (len(nodes) - 1))) < 1e-9
