"""Graph operator tests — node dedup, edge weights, components
(mirrors the intent of tests/test_vector/test_graph.py: isomorphism to a
known graph; here structural equality against hand-built expectations)."""

import math

import pytest
import pyspark.sql.functions as F

from solaris_spark.operators import graph


class TestBuildGraph:
    def test_shared_vertex_dedup(self, spark):
        """Two linestrings meeting at (1,1): shared node appears once."""
        roads = spark.createDataFrame(
            [(1, "LINESTRING (0 0, 1 1)", "primary"),
             (2, "LINESTRING (1 1, 2 0)", "primary")],
            "road_id long, wkt string, type string")
        nodes, edges = graph.build_graph(roads, type_col="type")
        assert nodes.count() == 3
        e = edges.collect()
        assert len(e) == 2
        for r in e:
            assert r["weight"] == pytest.approx(math.sqrt(2))

    def test_road_type_filter_and_empty_skip(self, spark):
        roads = spark.createDataFrame(
            [(1, "LINESTRING (0 0, 1 0)", "primary"),
             (2, "LINESTRING (0 1, 1 1)", "path"),
             (3, "LINESTRING EMPTY", "primary")],
            "road_id long, wkt string, type string")
        nodes, edges = graph.build_graph(
            roads, type_col="type", valid_road_types=["primary"])
        assert edges.count() == 1
        assert nodes.count() == 2

    def test_multilinestring_parts(self, spark):
        roads = spark.createDataFrame(
            [(1, "MULTILINESTRING ((0 0, 1 0), (5 5, 6 5, 7 5))", "t")],
            "road_id long, wkt string, type string")
        nodes, edges = graph.build_graph(roads)
        assert nodes.count() == 5
        assert edges.count() == 3  # 1 + 2, no edge across parts

    def test_normalize_factor(self, spark):
        roads = spark.createDataFrame([(1, "LINESTRING (0 0, 3 4)")],
                                      "road_id long, wkt string")
        _, edges = graph.build_graph(roads, normalize_factor=2.0)
        assert edges.collect()[0]["weight"] == pytest.approx(10.0)


class TestComponents:
    def test_two_components(self, spark):
        roads = spark.createDataFrame(
            [(1, "LINESTRING (0 0, 1 0, 2 0)"),
             (2, "LINESTRING (10 10, 11 10)")],
            "road_id long, wkt string")
        nodes, edges = graph.build_graph(roads)
        comp = graph.connected_components(nodes, edges)
        n_comp = comp.select("component").distinct().count()
        assert n_comp == 2


class TestDistributedSink:
    def test_geojsonl_matches_driver_sink(self, spark, tmp_path):
        """graph_to_geojsonl (executor-written GeoJSONSeq) carries exactly
        the same features as the driver-side FeatureCollection sink."""
        import glob
        import json

        roads = spark.createDataFrame(
            [(1, "LINESTRING (0 0, 1 1, 2 0)", "primary"),
             (2, "LINESTRING (2 0, 3 1)", "secondary")],
            "road_id long, wkt string, type string")
        nodes, edges = graph.build_graph(roads, type_col="type")

        np_, ep_ = graph.graph_to_geojson(
            nodes, edges, str(tmp_path / "doc.geojson"))
        doc_feats = []
        for p in (np_, ep_):
            doc_feats += json.load(open(p))["features"]

        nd, ed = graph.graph_to_geojsonl(nodes, edges, str(tmp_path / "dist"))
        dist_feats = []
        for d in (nd, ed):
            for part in glob.glob(f"{d}/part-*"):
                with open(part) as fh:
                    dist_feats += [json.loads(line) for line in fh
                                   if line.strip()]

        def key(f):
            return json.dumps(f, sort_keys=True)

        assert sorted(map(key, dist_feats)) == sorted(map(key, doc_feats))

    def test_geojsonl_carries_road_type(self, spark, tmp_path):
        import glob
        import json

        roads = spark.createDataFrame(
            [(1, "LINESTRING (0 0, 1 0)", "motorway")],
            "road_id long, wkt string, type string")
        nodes, edges = graph.build_graph(roads, type_col="type")
        _, ed = graph.graph_to_geojsonl(nodes, edges, str(tmp_path / "rt"))
        feats = []
        for part in glob.glob(f"{ed}/part-*"):
            with open(part) as fh:
                feats += [json.loads(line) for line in fh if line.strip()]
        assert len(feats) == 1
        assert feats[0]["properties"]["road_type"] == "motorway"
        assert feats[0]["geometry"]["coordinates"] == [[0.0, 0.0],
                                                       [1.0, 0.0]]


class TestStarComponents:
    """Alternating large-star/small-star CC (Kiveris et al. 2014)."""

    def test_long_chain_diameter_independent(self, spark):
        """A 200-node path has diameter 199: min-label flooding would need
        ~200 rounds (far beyond max_iter), star contraction converges
        within the default 25."""
        import pyspark.sql.functions as F
        n = 200
        nodes = spark.range(n).select(F.col("id").alias("node_id"))
        edges = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst"),
        )
        comp = graph.connected_components(nodes, edges)
        rows = comp.collect()
        assert len(rows) == n
        assert {r["component"] for r in rows} == {0}

    def test_randomized_networkx_parity(self, spark):
        """Component PARTITION equality vs networkx on seeded G(n, p)
        graphs, including isolated nodes and a duplicate-heavy edge list."""
        import random

        import networkx as nx
        import pyspark.sql.functions as F

        rng = random.Random(42)
        for trial, (n, p) in enumerate([(60, 0.03), (80, 0.02), (40, 0.1)]):
            g = nx.gnp_random_graph(n, p, seed=100 + trial)
            edge_rows = [(a, b) for a, b in g.edges()]
            edge_rows += [(b, a) for a, b in edge_rows[: len(edge_rows) // 2]]
            rng.shuffle(edge_rows)
            nodes = spark.createDataFrame(
                [(i,) for i in range(n)], "node_id long")
            if edge_rows:
                edges = spark.createDataFrame(edge_rows, "src long, dst long")
            else:
                edges = spark.createDataFrame([], "src long, dst long")
            got = {r["node_id"]: r["component"]
                   for r in graph.connected_components(nodes, edges).collect()}
            want = {}
            for cc in nx.connected_components(g):
                root = min(cc)
                for v in cc:
                    want[v] = root
            assert got == want, f"trial {trial}"

    def test_self_loops_and_empty(self, spark):
        import pyspark.sql.functions as F
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
        edges = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
        got = {r["node_id"]: r["component"]
               for r in graph.connected_components(nodes, edges).collect()}
        assert got == {1: 1, 2: 2, 3: 3}
        empty = spark.createDataFrame([], "src long, dst long")
        got2 = {r["node_id"]: r["component"]
                for r in graph.connected_components(nodes, empty).collect()}
        assert got2 == {1: 1, 2: 2, 3: 3}

    def test_string_ids(self, spark):
        """Ids only need a total order — doc-style string keys work."""
        nodes = spark.createDataFrame(
            [("d1",), ("d2",), ("d3",), ("d9",)], "node_id string")
        edges = spark.createDataFrame(
            [("d2", "d3"), ("d3", "d9")], "src string, dst string")
        got = {r["node_id"]: r["component"]
               for r in graph.connected_components(nodes, edges).collect()}
        assert got == {"d1": "d1", "d2": "d2", "d3": "d2", "d9": "d2"}

    def test_large_mixed_topology_unionfind_parity(self, spark):
        """1,500-node stress: a 400-node path (deep diameter), two dense
        blobs, random cross edges and isolated nodes — component
        partition must equal a pure-Python union-find oracle."""
        import random

        rng = random.Random(7)
        n = 1500
        edge_rows = [(i, i + 1) for i in range(400)]          # long path
        for base in (500, 700):                               # two blobs
            members = list(range(base, base + 120))
            for _ in range(400):
                edge_rows.append((rng.choice(members), rng.choice(members)))
        for _ in range(150):                                  # random wires
            edge_rows.append((rng.randrange(900, 1400),
                              rng.randrange(900, 1400)))
        rng.shuffle(edge_rows)

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        roots = {}
        for v in range(n):
            r = find(v)
            roots.setdefault(r, min(r, v))
        for v in range(n):
            want[v] = roots[find(v)]

        nodes = spark.createDataFrame([(i,) for i in range(n)],
                                      "node_id long")
        edges = spark.createDataFrame(edge_rows, "src long, dst long")
        got = {r["node_id"]: r["component"]
               for r in graph.connected_components(nodes, edges).collect()}
        assert got == want
