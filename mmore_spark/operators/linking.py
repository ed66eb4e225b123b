"""Cross-document entity linking & canonicalization (SURVEY.md §2.7 "NEW").

The reference's only global entity key is the UPPERCASED surface name
(/root/reference/src/mmore/process/post_processor/ner/output_parser.py:55) —
exact-match linking.  This module adds the real thing, designed for
10^12-doc scale:

  1. **Blocking** — MinHash-LSH over the name's token set: P independent
     min-hashes per name (md5-family, hashing.py), one blocking key per
     (perm, min-hash) pair, candidate pairs = names sharing any key.
     Pure DataFrame ops: explode → self-join → distinct.  Names sharing a
     token collide with probability 1-(1-J)^P; P=12 gives >99% recall at
     token-Jaccard ≥ 1/3 (covers abbreviation/suffix alias families).
  2. **Verification** — a native-expression entity-resolution predicate:
     digit tokens must match exactly as multisets (rejects "March 4, 2024"
     vs "March 4, 2022"), and every word token of the shorter name must
     prefix-match a token of the longer ("A. KELLER" ≲ "ALICE KELLER",
     "ACME CORP" ≲ "ACME CORPORATION", "ZUG" ≲ "ZUG CITY").
     No Python — array higher-order functions only.
  3. **Connected components** — iterative min-label propagation over the
     verified match edges (GraphFrames-style), driver-side loop with
     ``localCheckpoint`` per iteration to cut lineage; alias clusters are
     shallow so convergence is fast, and the loop is bounded.
  4. **Canonical election** — per component, the most-mentioned surface
     form wins (ties: lexicographic min) via one window rank.
  5. **Rewrite** — triples' subj/obj mapped through the canonical map
     (broadcast when dimension-sized; AQE otherwise), and the global
     triple merge goes through two-phase SALTED aggregation
     (operators/agg.py) because entity mentions are Zipf-skewed.

Scale notes: step 1's join key space is (perm × hash) — uniform by
construction; step 3 shuffles only the edge set (≪ mention count: distinct
names only); nothing here touches per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hof import fresh
from ..hashing import h60

N_PERMUTATIONS = 12
MAX_CC_ITERATIONS = 25


# NOTE on lambda parameter names: PySpark names the SQL lambda variable
# after the PYTHON parameter.  Same-named lambdas that end up nested in one
# expression tree (Catalyst collapses withColumn chains!) silently resolve
# to the wrong binding — observed as nondeterministic MinHash signatures.
# Hence every HOF lambda in this module has a UNIQUE parameter name, and
# the signature itself is a raw SQL expr with explicit variable names.


def name_tokens(col) -> "F.Column":
    """UPPER alnum word tokens of a name (native expressions)."""
    cleaned = F.regexp_replace(F.upper(col), r"[^A-Z0-9 ]", "")
    return F.filter(F.split(cleaned, r" +"), fresh(lambda ntk: F.length(ntk) > 0))


def _digit_tokens(tokens) -> "F.Column":
    return F.array_sort(F.filter(tokens, fresh(lambda dtk: dtk.rlike(r"^[0-9]+$"))))


def _word_tokens(tokens) -> "F.Column":
    return F.filter(tokens, fresh(lambda wtk: ~wtk.rlike(r"^[0-9]+$")))


def name_tokens_py(name: str) -> list[str]:
    """Python twin of name_tokens."""
    import re

    return [t for t in re.sub(r"[^A-Z0-9 ]", "", name.upper()).split(" ") if t]


def names_match_py(a: str, b: str) -> bool:
    """The verification predicate (module doc §2) — pure Python.

    Three conjunctive rules:
      * digit tokens equal as sorted multisets (rejects "March 4, 2024"
        vs "March 4, 2022");
      * ANCHOR: the names share ≥1 exact word token of length ≥3
        (stops single-letter initials absorbing unrelated names:
        "L. COSTA" vs "LUGANO" has no anchor);
      * COVERAGE: every word token of the token-poorer name prefix-matches
        (either direction) some token of the richer one
        ("A. KELLER" ≲ "ALICE KELLER", "ACME CORP" ≲ "ACME CORPORATION").

    Python (vectorized via pandas_udf), NOT native array expressions:
    deeply-nested higher-order-function lambdas evaluated inside a
    collapsed join projection misfired intermittently in pyspark 4.1.2
    (~1/20 runs merged two distinct dates) — see the module NOTE.  The
    predicate runs only on LSH candidate pairs (dimension-scale), so the
    Arrow hop costs nothing at corpus scale.
    """
    ta, tb = name_tokens_py(a), name_tokens_py(b)
    da = sorted(t for t in ta if t.isdigit())
    db = sorted(t for t in tb if t.isdigit())
    if da != db:
        return False
    wa = [t for t in ta if not t.isdigit()]
    wb = [t for t in tb if not t.isdigit()]
    if not set(t for t in wa if len(t) >= 3) & set(t for t in wb if len(t) >= 3):
        return False
    small, big = (wa, wb) if len(wa) <= len(wb) else (wb, wa)
    return all(any(u.startswith(t) or t.startswith(u) for u in big) for t in small)


def names_match_udf():
    """Arrow-batched boolean predicate over (name_a, name_b) columns."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _match(a, b):
        return pd.Series([names_match_py(x, y) for x, y in zip(a, b)], dtype="boolean")

    # real type objects: `from __future__ import annotations` would turn
    # inline hints into strings pandas_udf cannot resolve
    _match.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_match, "boolean")


# Full-pair cutover for one (perm, minv) bucket in the name LSH; larger
# buckets emit star edges to the bucket min (k−1 rows instead of k²/2 —
# the operators/dedup.candidate_edges decision applied to the name path,
# VERDICT r03 #3).  A bucket this size is overwhelmingly a same-token-set
# name family (permuted word orders), where names_match verifies every
# pair anyway, so the star keeps the connected components exact; for a
# mixed bucket (dissimilar names sharing one min-hash token) only
# same-bucket matches that bypass the bucket min are forfeited — pairs a
# production run at this bucket size could not afford to enumerate.
MAX_NAME_BUCKET = 4096


def candidate_pairs(names: DataFrame, n_perm: int = N_PERMUTATIONS,
                    max_bucket: int = MAX_NAME_BUCKET) -> DataFrame:
    """names(name) → distinct (name_a < name_b) candidate pairs via LSH.

    Self-join key = (permutation index, min-hash value): uniform hash
    domain, so no skewed join keys regardless of token distribution —
    but a duplicate NAME FAMILY shares whole buckets, hence the
    ``max_bucket`` star fallback above.

    The signature is computed in one Arrow-batched stage with hashlib —
    byte-identical to hashing.h60_py, immune to the Catalyst HOF pitfalls
    documented in this module's NOTE, and ~10× faster than interpreted
    nested transforms.  Names are dimension-sized, so the stage is cheap.
    """
    import re as _re

    from pyspark.sql import types as T

    def sig_batches(batches):
        import hashlib

        import pandas as pd

        def h60(s: str) -> int:
            return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

        for pdf in batches:
            out_n, out_p, out_m = [], [], []
            for name in pdf["name"]:
                toks = [t for t in _re.sub(r"[^A-Z0-9 ]", "", name.upper()).split(" ") if t]
                if not toks:
                    continue
                for p in range(n_perm):
                    out_n.append(name)
                    out_p.append(p)
                    out_m.append(min(h60(f"{t}#perm{p}") for t in toks))
            yield pd.DataFrame({"name": out_n, "perm": out_p, "minv": out_m})

    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("perm", T.IntegerType()),
        T.StructField("minv", T.LongType()),
    ])
    sig = (
        names.select("name").distinct()
        .mapInPandas(sig_batches, schema=schema)
        # materialize before the self-join: otherwise both sides recompute
        # the signature, and plan-level pushdowns can serialize the work
        .persist()
    )
    sig.count()
    sizes = sig.groupBy("perm", "minv").agg(F.count("*").alias("_k"))
    big_keys = sizes.filter(F.col("_k") > max_bucket).select("perm", "minv")
    normal = sig.join(F.broadcast(big_keys), ["perm", "minv"], "left_anti")
    left = normal.alias("a")
    right = normal.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.perm") == F.col("b.perm"))
            & (F.col("a.minv") == F.col("b.minv"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
    )
    fam = sig.join(F.broadcast(big_keys), ["perm", "minv"], "left_semi")
    mins = fam.groupBy("perm", "minv").agg(F.min("name").alias("_m"))
    stars = (
        fam.join(F.broadcast(mins), ["perm", "minv"])
        .filter(F.col("name") != F.col("_m"))
        .select(F.col("_m").alias("name_a"), F.col("name").alias("name_b"))
    )
    out = (
        pairs.unionByName(stars)
        .distinct()
        # materialize the (small) pair set so the signature cache can be freed
        .localCheckpoint()
    )
    sig.unpersist()
    return out


def match_edges(names: DataFrame, n_perm: int = N_PERMUTATIONS) -> DataFrame:
    """Verified duplicate-name edges (name_a, name_b)."""
    pairs = candidate_pairs(names, n_perm)
    match = names_match_udf()
    return pairs.filter(match(F.col("name_a"), F.col("name_b"))).select(
        "name_a", "name_b"
    )


DRIVER_CC_MAX_EDGES = 2_000_000


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iterations: int = MAX_CC_ITERATIONS,
                         strategy: str = "auto",
                         metrics: dict | None = None) -> DataFrame:
    """nodes(name), edges(name_a, name_b) → (name, component) where
    component is the minimum 60-bit name hash in the component.

    Strategies:
      * ``driver`` — union-find on collected edges.  The name graph is
        DIMENSION-scale (distinct entity names ≪ documents), so even a
        10^12-doc corpus rarely exceeds a few 10^7 names; one collect +
        one broadcast-able map replaces ~4 Spark jobs per iteration.
      * ``twophase`` — alternating large-star/small-star rounds (Kiveris
        et al., "Connected Components in MapReduce and Beyond"):
        converges in O(log n) rounds regardless of diameter — the shape
        that survives chain-like graphs a label-propagation loop cannot.
      * ``auto`` (default) — driver path when the edge count is under
        DRIVER_CC_MAX_EDGES, else twophase.

    A third strategy (min-label propagation) was retired in round 4: at
    2.4M edges it merely TIED twophase on its best-case shape (diameter-2
    stars: 21.6 s vs 21.8 s, local[32]) and its round count is the graph
    diameter, so on chain-like graphs it loses unboundedly (twophase
    labels a diameter-1023 chain in 10 rounds) — no niche where it wins
    (VERDICT r03 #6; measurement in BENCH/BASELINE.md).

    All produce identical labels (min name-hash per component) — asserted
    by tests/test_linking.py.
    """
    if strategy == "auto":
        # bounded-limit count decides the strategy with 8 bytes on the
        # driver (a limit+collect probe materialized up to
        # DRIVER_CC_MAX_EDGES rows there even when twophase was then
        # chosen — VERDICT r04 nit #2) AND early-terminates: counting
        # limit(cap+1) stops after cap+1 rows instead of scanning an
        # arbitrarily large edge set (a full count() cost ~30 s extra at
        # 8.8M edges).  The persist keeps the single-ER-evaluation
        # property — partitions the probe touches are cached, the rest
        # compute once for whichever path consumes e.
        e = edges.select("name_a", "name_b").persist()
        try:
            if e.limit(DRIVER_CC_MAX_EDGES + 1).count() <= DRIVER_CC_MAX_EDGES:
                if metrics is not None:
                    metrics["strategy"] = "driver"
                # guard-ok: dimension-scale collect, gated by the count
                return _connected_components_driver(nodes, e.collect())
            if metrics is not None:
                metrics["strategy"] = "twophase"
            # twophase's first localCheckpoint is eager, so e is fully
            # consumed before this returns and unpersist below is safe
            return _connected_components_twophase(nodes, e, max_iterations,
                                                  metrics)
        finally:
            e.unpersist()
    if strategy == "driver":
        # guard-ok: dimension-scale collect — distinct-name edges, not rows
        return _connected_components_driver(
            nodes, edges.select("name_a", "name_b").collect())
    if strategy == "twophase":
        return _connected_components_twophase(nodes, edges, max_iterations, metrics)
    raise ValueError(f"unknown connected-components strategy: {strategy!r}")


def _connected_components_driver(nodes: DataFrame, edge_rows: list) -> DataFrame:
    from ..hashing import h60_py

    spark = nodes.sparkSession
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edge_rows:
        for n in (r["name_a"], r["name_b"]):
            parent.setdefault(n, n)
        ra, rb = find(r["name_a"]), find(r["name_b"])
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[str, int] = {}
    for n in list(parent):
        root = find(n)
        h = h60_py(n)
        comp_min[root] = min(comp_min.get(root, h), h)
    labels = [(n, comp_min[find(n)]) for n in parent]
    from ..functions.localrel import local_df
    linked = local_df(spark, labels, "name string, component long")
    all_names = nodes.select("name").distinct()
    return (
        all_names.join(F.broadcast(linked), "name", "left")
        .withColumn("component", F.coalesce(F.col("component"), h60(F.col("name"))))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighborhood
    element (Kiveris et al. §3): (v, m) for v ∈ N(u), v > u,
    m = min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect u and all its smaller neighbors to the minimum of the
    neighborhood: orient u > v, m = min(N(u) ∪ {u}) = min(v); emit (x, m)
    for x ∈ N(u) ∪ {u}, x ≠ m."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        o.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_arm = mins.filter(F.col("u") != F.col("m")).select("u", F.col("m").alias("v"))
    return nbr.union(self_arm).distinct()


def _edge_stats(e: DataFrame) -> tuple[int, int | None]:
    """(count, order-insensitive checksum) of an edge set in ONE action."""
    # decimal(38,0) sum: order-insensitive and overflow-free under ANSI
    # mode for any realistic edge count (long sums overflow at ~2^63)
    row = e.agg(F.count("*").alias("n"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk")
                ).first()
    return row["n"], row["chk"]


def _connected_components_twophase(nodes: DataFrame, edges: DataFrame,
                                   max_iterations: int = MAX_CC_ITERATIONS,
                                   metrics: dict | None = None) -> DataFrame:
    """Large-star/small-star over 60-bit name-hash ids: O(log n) rounds
    regardless of graph diameter (each round is 2 groupBys + 2 joins over
    the shrinking edge set; per-round localCheckpoint cuts lineage).

    Convergence check is count + order-insensitive ``sum(xxhash64(u, v))``
    in one action per round; the full ``exceptAll`` set-difference (an
    extra shuffle on the whole edge set) runs only when both match —
    i.e. roughly once, at convergence — instead of every round
    (VERDICT r03 "what's wrong" #2).

    If ``metrics`` is given, ``metrics["rounds"]`` records the number of
    star rounds executed (per-call, not a module global — concurrent CC
    jobs in one driver don't race; ADVICE r03).
    """
    names = nodes.select("name").distinct().withColumn("id", h60(F.col("name")))
    e = (
        edges.join(names.select(F.col("name").alias("name_a"),
                                F.col("id").alias("u")), "name_a")
        .join(names.select(F.col("name").alias("name_b"),
                           F.col("id").alias("v")), "name_b")
        .select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    if e.isEmpty():
        if metrics is not None:
            metrics["rounds"] = rounds
        return names.select("name", F.col("id").alias("component"))
    prev_n, prev_chk = _edge_stats(e)
    for rounds in range(1, max_iterations + 1):
        e1 = _large_star(e).localCheckpoint()
        e2 = _small_star(e1).localCheckpoint()
        n2, chk2 = _edge_stats(e2)
        # checksum equality is necessary for set equality; confirm with the
        # exact set-difference only on a match (guards hash-sum collisions)
        stable = n2 == prev_n and chk2 == prev_chk and e2.exceptAll(e).isEmpty()
        e, prev_n, prev_chk = e2, n2, chk2
        if stable:
            break
    if metrics is not None:
        metrics["rounds"] = rounds
    # converged star graph: u = member, v = component root (its min id)
    labels = (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return (
        names.join(labels, "id", "left")
        .select("name", F.coalesce(F.col("component"), F.col("id")).alias("component"))
    )


# Count-gated driver path for the WHOLE linking stage (r6): distinct entity
# names are dimension-scale (the module premise), and below this cap the
# LSH + ER + CC + election sequence is a few ms of driver Python versus
# ~8 sequential Spark jobs (sig materialization, bucket sizing broadcasts,
# self-join, pandas-UDF verify, CC probe, election window) — measured ~3 s
# of fixed latency at local[32].  Same philosophy as DRIVER_CC_MAX_EDGES
# (VERDICT r04: the count-gated dimension-scale collect is the accepted
# exception); the Spark path remains the >cap production path and pytest
# asserts both produce identical maps.
DRIVER_LINK_MAX_NAMES = 20_000
# Bail out of the driver path when candidate-pair volume explodes (dense
# same-token name families near the name cap can approach n²/2 pairs —
# fine distributed, not single-threaded); the caller falls through to the
# Spark path, so the gate bounds work, never results.
DRIVER_LINK_MAX_PAIRS = 5_000_000


def _canonicalize_driver(spark, rows, n_perm: int = N_PERMUTATIONS,
                         max_bucket: int = MAX_NAME_BUCKET,
                         max_pairs: int = DRIVER_LINK_MAX_PAIRS
                         ) -> "DataFrame | None":
    """Driver twin of the Spark linking path over collected
    (name, n_mentions, entity_type) rows — semantics mirrored exactly:
    candidate_pairs' (perm, min-hash) bucketing with the star cap,
    names_match_py verification, union-find CC with min-h60 component
    labels, and the most-mentioned-then-lex-min election.  Returns None
    (caller → Spark path) if the candidate-pair set exceeds
    ``max_pairs``."""
    from ..hashing import h60_py

    stats = {r["name"]: (r["n_mentions"], r["entity_type"]) for r in rows}
    names = list(stats)
    buckets: dict[tuple[int, int], list[str]] = {}
    for name in names:
        toks = name_tokens_py(name)
        if not toks:
            continue
        for p in range(n_perm):
            mv = min(h60_py(f"{t}#perm{p}") for t in toks)
            buckets.setdefault((p, mv), []).append(name)
    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        if len(members) <= max_bucket:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = members[i], members[j]
                    pairs.add((a, b) if a < b else (b, a))
        else:
            m = min(members)
            for x in members:
                if x != m:
                    pairs.add((m, x))
        if len(pairs) > max_pairs:
            return None
    parent = {n: n for n in names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if names_match_py(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    comp_members: dict[str, list[str]] = {}
    for n in names:
        comp_members.setdefault(find(n), []).append(n)
    out = []
    for members in comp_members.values():
        comp = min(h60_py(n) for n in members)
        canonical = min(members, key=lambda n: (-stats[n][0], n))
        cid = h60_py(canonical)
        for n in members:
            out.append((n, comp, canonical, cid, stats[n][1], stats[n][0]))
    schema = ("name string, component long, canonical_name string, "
              "canonical_id long, entity_type string, n_mentions long")
    from ..functions.localrel import local_df
    return local_df(spark, out, schema)


def canonicalize(mentions: DataFrame, n_perm: int = N_PERMUTATIONS,
                 metrics: dict | None = None,
                 driver_max_names: int = DRIVER_LINK_MAX_NAMES) -> DataFrame:
    """mentions(doc_id, entity_name, entity_type, …) → canonical entity map:

        (name, component, canonical_name, canonical_id, entity_type,
         n_mentions)

    Canonical form = the most-mentioned surface name in the component
    (ties → lexicographically smallest); canonical_id = 60-bit hash of the
    canonical name.  The returned map has one row per distinct surface
    name — dimension-sized, broadcastable downstream.  ``metrics``
    (optional dict) receives the CC strategy chosen and, on the twophase
    path, its round count — surfaced into pipeline lineage.
    """
    from pyspark.sql import Window

    counts_lazy = mentions.groupBy(F.col("entity_name").alias("name")).agg(
        F.count("*").alias("n_mentions"),
        # deterministic election: longest type wins, ties broken
        # lexicographically (a bare max_by ties arbitrarily, which would
        # break value-level oracle comparison)
        F.max_by(
            "entity_type",
            F.struct(
                F.length(F.coalesce("entity_type", F.lit(""))).alias("l"),
                F.coalesce("entity_type", F.lit("")).alias("t"),
            ),
        ).alias("entity_type"),
    )
    # ONE early-terminating probe job decides the strategy AND, below the
    # cap, already holds every row the driver path needs — replacing the
    # former localCheckpoint + count + collect sequence (3 jobs) on the
    # common dimension-scale path (guard-ok: bounded by the limit).  The
    # persist keeps the >cap path from aggregating the full mention set
    # twice (probe partitions are cached; the rest compute once for the
    # localCheckpoint below).
    counts_lazy = counts_lazy.persist()
    try:
        probe = counts_lazy.limit(driver_max_names + 1).collect()
        if len(probe) <= driver_max_names:
            out = _canonicalize_driver(mentions.sparkSession, probe, n_perm)
            if out is not None:
                if metrics is not None:
                    metrics["strategy"] = "driver"
                return out
        # dimension-sized (distinct names); cut lineage so the LSH
        # self-join and the CC loop don't re-aggregate the full mention
        # set repeatedly
        counts = counts_lazy.localCheckpoint()
    finally:
        counts_lazy.unpersist()
    edges = match_edges(counts.select("name"), n_perm)
    comps = connected_components(counts.select("name"), edges, metrics=metrics)
    labeled = counts.join(comps, "name")
    w = (
        Window.partitionBy("component")
        .orderBy(F.desc("n_mentions"), F.asc("name"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    elected = labeled.withColumn("canonical_name", F.first("name").over(w)).withColumn(
        "canonical_id", h60(F.col("canonical_name"))
    )
    return elected.select(
        "name", "component", "canonical_name", "canonical_id", "entity_type", "n_mentions"
    )


def entities_table(canonical_map: DataFrame) -> DataFrame:
    """Final entities table: one row per canonical entity with its alias
    members (FIXTURES.md golden_entities shape)."""
    return (
        canonical_map.groupBy("canonical_id", "canonical_name")
        .agg(
            # deterministic: most-mentioned surface form's type, ties broken
            # by lexicographically greatest type (oracle-comparable)
            F.max_by("entity_type", F.struct(F.col("n_mentions"), F.col("entity_type")))
            .alias("entity_type"),
            F.sort_array(F.collect_set("name")).alias("members"),
            F.sum("n_mentions").alias("n_mentions"),
        )
    )


def rewrite_triples(triples: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """Rewrite triples' subj/obj to canonical names; keep the unordered-
    pair orientation (subj <= obj).  The map is dimension-sized →
    broadcast both joins; at extreme cardinality drop the hint and let
    AQE choose."""
    cmap = F.broadcast(canonical_map.select("name", "canonical_name"))
    out = (
        triples.join(cmap.withColumnRenamed("name", "subj")
                     .withColumnRenamed("canonical_name", "subj_c"), "subj", "left")
        .join(cmap.withColumnRenamed("name", "obj")
              .withColumnRenamed("canonical_name", "obj_c"), "obj", "left")
        .withColumn("subj_cc", F.coalesce("subj_c", "subj"))
        .withColumn("obj_cc", F.coalesce("obj_c", "obj"))
    )
    return out.select(
        "doc_id",
        F.least("subj_cc", "obj_cc").alias("subj"),
        F.greatest("subj_cc", "obj_cc").alias("obj"),
        "pred",
        "weight",
    )
