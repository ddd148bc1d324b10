"""Property tests: custom operators vs brute-force reference oracles on
randomized inputs. These are the operators whose formulations are clever
enough to hide bugs (the advisor's as-of NULL-carry bug is exactly the
class this catches): the scalable formulation must equal the obvious
O(N^2)/driver-side computation on every generated input."""

from __future__ import annotations

import random

from pyspark.sql import Row

from manga_ocr_spark.operators.dedup import dup_clusters
from manga_ocr_spark.operators.joins import as_of_join


def _brute_asof(left_rows, right_rows, value_cols):
    """Per left row: the right row with max rts <= ts on the same key
    (ties broken by... inputs are generated tie-free), else NULLs."""
    out = {}
    for lr in left_rows:
        cand = [r for r in right_rows if r["k"] == lr["k"] and r["rts"] <= lr["ts"]]
        if cand:
            best = max(cand, key=lambda r: r["rts"])
            out[lr["name"]] = tuple(best[c] for c in value_cols)
        else:
            out[lr["name"]] = tuple(None for _ in value_cols)
    return out


def test_asof_join_equals_bruteforce_on_random_tables(spark):
    rng = random.Random(20240316)
    for trial in range(3):
        keys = [1, 2, 3]
        # distinct timestamps per key on the right => no tie ambiguity
        right_rows = []
        for k in keys:
            for i, t in enumerate(sorted(rng.sample(range(100), rng.randint(0, 8)))):
                right_rows.append(
                    {
                        "k": k,
                        "rts": t,
                        # NULL values included: the struct carry must
                        # preserve them (the advisor-found bug class)
                        "price": None if rng.random() < 0.3 else round(rng.random(), 3),
                        "note": f"r{k}_{i}",
                    }
                )
        left_rows = [
            {"k": rng.choice(keys), "ts": rng.randrange(100), "name": f"l{j}"}
            for j in range(20)
        ]
        left = spark.createDataFrame(
            [Row(**r) for r in left_rows], "k int, ts int, name string"
        )
        right = spark.createDataFrame(
            [Row(**r) for r in right_rows], "k int, rts int, price double, note string"
        ) if right_rows else spark.createDataFrame([], "k int, rts int, price double, note string")

        got = {
            r.name: (r.price, r.note)
            for r in as_of_join(left, right, "k", "ts", "rts", ["price", "note"]).collect()
        }
        want = _brute_asof(left_rows, right_rows, ["price", "note"])
        assert got == want, f"trial {trial}"


def _union_find_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_dup_clusters_equals_union_find_on_random_graphs(spark):
    rng = random.Random(99)
    for trial in range(3):
        n_nodes = 40
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n_nodes), 2)))
                for _ in range(rng.randint(5, 50))
            }
        )
        pairs = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
        )
        got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
        want = _union_find_components(edges)
        # union-find roots are min-compressed; normalize both to min-of-
        # component before comparing
        def canon(labels):
            comp = {}
            for node, lbl in labels.items():
                comp.setdefault(lbl, []).append(node)
            return {n: min(ns) for lbl, ns in comp.items() for n in ns}

        assert canon(got) == canon(want), f"trial {trial}"


def test_global_row_number_equals_sorted_enumeration_on_random_inputs(spark):
    # two-phase ranking vs the obvious driver-side sorted enumeration on
    # randomized key distributions (clustered, uniform, heavy outliers)
    import random

    from manga_ocr_spark.operators.ranking import global_row_number

    rng = random.Random(20250816)
    for trial in range(3):
        n = rng.randint(1, 400)
        style = trial % 3
        if style == 0:
            keys = rng.sample(range(10**6), n)  # uniform sparse
        elif style == 1:
            base = rng.randrange(1000)
            keys = rng.sample(range(base, base + n * 2), n)  # dense cluster
        else:
            keys = rng.sample(range(100), min(n, 100)) + [
                rng.randrange(2**50) for _ in range(n // 3)
            ]
            keys = list(dict.fromkeys(keys))  # dense + huge outliers
        df = spark.createDataFrame(
            [Row(k=int(k)) for k in keys]
        ).repartition(rng.randint(1, 9))
        nb = rng.choice([2, 8, 64])
        got = {r.k: r.rn for r in global_row_number(df, "k", num_buckets=nb).collect()}
        want = {k: i + 1 for i, k in enumerate(sorted(keys))}
        assert got == want, f"trial {trial} buckets {nb} n {len(keys)}"


def test_global_row_number_string_keys_equal_sorted_enumeration(spark):
    # the string-key path (seeded-sample range partitioner instead of
    # approxQuantile) vs driver-side sorted enumeration: url-like keys
    # with heavy shared prefixes, plus unicode and mixed-length randoms.
    # Python sorted() and Spark's UTF8_BINARY comparison agree because
    # UTF-8 byte order == code-point order.
    import random

    from manga_ocr_spark.operators.ranking import global_row_number

    rng = random.Random(20250817)
    alph = "abcxyz0189/._-é中ア"
    for trial in range(3):
        n = rng.randint(1, 300)
        if trial == 0:
            keys = [f"https://host{rng.randrange(5)}.example/p/{rng.randrange(10**6)}" for _ in range(n)]
        elif trial == 1:
            keys = ["".join(rng.choice(alph) for _ in range(rng.randint(1, 12))) for _ in range(n)]
        else:
            keys = ["common/prefix/" + "".join(rng.choice("ab") for _ in range(rng.randint(1, 6))) for _ in range(n)]
        keys = list(dict.fromkeys(keys))
        df = spark.createDataFrame([Row(k=k) for k in keys]).repartition(rng.randint(1, 9))
        nb = rng.choice([2, 8, 64])
        got = {r.k: r.rn for r in global_row_number(df, "k", num_buckets=nb).collect()}
        want = {k: i + 1 for i, k in enumerate(sorted(keys))}
        assert got == want, f"trial {trial} buckets {nb} n {len(keys)}"
