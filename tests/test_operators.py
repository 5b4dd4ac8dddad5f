"""Unit tests for the secondary operators: dedup, ANN, text, scalars,
dim join, interval merge, multimodal plumbing, sources, maintenance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------------------
# scalars (pure, no Ray)


def test_scalar_library():
    from etl_cms_ray.functions.scalars import (
        add_months_clamped,
        concat_key_col,
        date_to_iso_col,
        dict_decode_col,
        parse_float_col,
        reformat_date_col,
        zero_pad_col,
    )

    d = reformat_date_col(pa.array(["20080131", "", "bogus", None]))
    assert d[0].as_py().isoformat() == "2008-01-31"
    assert d[1].as_py() is None and d[2].as_py() is None and d[3].as_py() is None
    assert date_to_iso_col(pa.chunked_array([d]))[0].as_py() == "2008-01-31"

    out = add_months_clamped(np.array(["2008-01-31", "2008-02-29"], dtype="datetime64[D]"), 1)
    assert str(out[0]) == "2008-02-29"  # end-of-month clamp, leap year
    assert str(out[1]) == "2008-03-29"

    assert zero_pad_col(pa.array(["7", "123"]), 3).to_pylist() == ["007", "123"]
    assert concat_key_col(pa.array(["AL"]), pa.array(["007"]), sep="").to_pylist() == ["AL007"]

    dec = dict_decode_col(pa.array(["1", "2", "9"]), {"1": 8507, "2": 8532}, default=0)
    assert dec.to_pylist() == [8507, 8532, 0]

    f = parse_float_col(pa.array(["1.5", "", "junk", None]))
    assert f.to_pylist() == [1.5, 0.0, 0.0, 0.0]


def test_minhash_identities():
    from etl_cms_ray.functions.minhash import (
        MinHasher,
        hamming64,
        jaccard,
        simhash64,
        word_shingles,
    )

    a = word_shingles("the quick brown fox jumps over the lazy dog today", 3)
    b = word_shingles("the quick brown fox jumps over the lazy dog today", 3)
    assert jaccard(np.sort(a), np.sort(b)) == 1.0
    mh = MinHasher(num_perm=64, bands=16)
    assert np.array_equal(mh.signature(a), mh.signature(b))
    # batch API == per-doc API
    batch = mh.signatures_batch([a, b])
    assert np.array_equal(batch[0], mh.signature(a))
    s1, s2 = simhash64(a), simhash64(b)
    assert hamming64(s1, s2) == 0


def test_interval_merge_gap_semantics():
    from etl_cms_ray.stages.compact import merge_intervals_pd

    g = pd.DataFrame(
        {"k": ["x"] * 4, "s": [0.0, 5.0, 100.0, 104.0], "e": [2.0, 8.0, 101.0, 110.0]}
    )
    out = merge_intervals_pd(g, "s", "e", gap=10.0, keys=["k"])
    assert len(out) == 2  # [0..8] and [100..110]
    assert out["n_events"].tolist() == [2, 2]
    out2 = merge_intervals_pd(g, "s", "e", gap=200.0, keys=["k"])
    assert len(out2) == 1 and out2["n_events"].iloc[0] == 4


def test_closure_roots_flattens_hierarchies():
    """Pointer-doubling closure: deep chain resolves in O(log d) merges,
    forests keep separate roots, cycles are rejected."""
    from etl_cms_ray.stages.closure import closure_roots

    # 1000-deep chain n0 <- n1 <- ... <- n999 (root n0)
    chain = pa.table(
        {
            "child": [f"n{i}" for i in range(1, 1000)],
            "parent": [f"n{i-1}" for i in range(1, 1000)],
        }
    )
    out = closure_roots(chain).set_index("node")
    assert (out["root"] == "n0").all()
    assert out.loc["n999", "depth"] == 999 and out.loc["n0", "depth"] == 0
    # forest with two roots
    forest = pa.table(
        {"child": ["a", "b", "c"], "parent": ["r1", "r1", "r2"]}
    )
    f = closure_roots(forest).set_index("node")
    assert f.loc["a", "root"] == "r1" and f.loc["c", "root"] == "r2"
    assert f.loc["r2", "root"] == "r2" and f.loc["r2", "depth"] == 0
    # cycles must raise, never silently self-root
    cyc = pa.table({"child": ["x", "y"], "parent": ["y", "x"]})
    with pytest.raises(ValueError):
        closure_roots(cyc)
    # multiple parents rejected (closure here is a tree/forest flatten)
    multi = pa.table({"child": ["x", "x"], "parent": ["p", "q"]})
    with pytest.raises(ValueError):
        closure_roots(multi)


def test_unpivot_list_flatten_and_zip():
    """M2/M3 kernel: single-list explode with 1-based pos, parallel-list
    zip, null rows skipped, non-parallel lists rejected."""
    from etl_cms_ray.stages.unpivot import unpivot_list

    t = pa.table(
        {
            "k": pa.array([10, 20, 30, 40], type=pa.int64()),
            "codes": pa.array([["a", "b"], [], None, ["c"]], type=pa.list_(pa.string())),
            "amts": pa.array([[1.0, 2.0], [], None, [3.0]], type=pa.list_(pa.float64())),
        }
    )
    out = unpivot_list(t, ["codes", "amts"])
    assert out.column_names == ["k", "pos", "codes_item", "amts_item"]
    assert out["k"].to_pylist() == [10, 10, 40]
    assert out["pos"].to_pylist() == [1, 2, 1]
    assert out["codes_item"].to_pylist() == ["a", "b", "c"]
    assert out["amts_item"].to_pylist() == [1.0, 2.0, 3.0]
    # empty table
    empty = unpivot_list(t.slice(1, 1), "codes")
    assert empty.num_rows == 0
    # non-parallel lists must raise, not silently misalign
    bad = pa.table(
        {
            "k": pa.array([1], type=pa.int64()),
            "xs": pa.array([["a", "b"]], type=pa.list_(pa.string())),
            "ys": pa.array([[1.0]], type=pa.list_(pa.float64())),
        }
    )
    with pytest.raises(ValueError):
        unpivot_list(bad, ["xs", "ys"])
    # differing NULL patterns with coincidentally equal flatten lengths
    # must also raise (pc.all ignores nulls; a silent pass here zips
    # values onto the wrong parent rows)
    nullbad = pa.table(
        {
            "k": pa.array([1, 2, 3], type=pa.int64()),
            "xs": pa.array([["a"], None, ["c"]], type=pa.list_(pa.string())),
            "ys": pa.array([["p"], ["q"], None], type=pa.list_(pa.string())),
        }
    )
    with pytest.raises(ValueError):
        unpivot_list(nullbad, ["xs", "ys"])


def test_fingerprint_vectorized_matches_scalar():
    """The sorted-prefix numpy FNV must be byte-identical to the scalar
    reference across empties, unicode, nulls, slices and length skew."""
    from etl_cms_ray.functions.text import fingerprint64, fingerprint_column

    strs = ["", "a", "hello world", "héllo wörld 日本", "x" * 5000,
            "word " * 400, "short"] + [f"doc {i} " * (i % 37) for i in range(200)]
    arr = pa.array(strs + [None], type=pa.string())
    expect = [
        int(np.array([fingerprint64(s)], dtype=np.uint64).view(np.int64)[0])
        if s is not None else 0
        for s in strs + [None]
    ]
    assert fingerprint_column(arr).to_pylist() == expect
    # chunked and sliced views hit the buffer-offset arithmetic
    ch = pa.chunked_array([arr[:50], arr[50:]])
    assert fingerprint_column(ch).to_pylist() == expect
    assert fingerprint_column(arr.slice(3, 100)).to_pylist() == expect[3:103]
    # skew: the straggler path (few long rows) must agree too
    skew = pa.array(["tiny"] * 100 + ["z" * 20000])
    out = fingerprint_column(skew)
    assert out[100].as_py() == int(
        np.array([fingerprint64("z" * 20000)], dtype=np.uint64).view(np.int64)[0]
    )


# ---------------------------------------------------------------------------
# Ray-backed operators


def test_dimjoin_one_to_many(ray_session):
    from etl_cms_ray.stages.dimjoin import BroadcastJoiner, put_dim, split_matched

    dim = pa.table(
        {"code": ["a", "a", "b"], "target": pa.array([1, 2, 3], type=pa.int64())}
    )
    facts = rd.from_arrow(pa.table({"code": ["a", "b", "z"], "v": [10, 20, 30]}))
    joined = facts.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(dim_ref=put_dim(dim), key="code", one_to_many=True),
        batch_format="pyarrow",
        concurrency=1,
    )
    t = pa.Table.from_pandas(joined.to_pandas(), preserve_index=False)
    # 'a' fans out to 2 rows (J2 multi-mapping), 'z' is a miss
    assert t.num_rows == 4
    matched, dead = split_matched(t)
    assert matched.num_rows == 3
    assert dead.num_rows == 1 and dead["code"][0].as_py() == "z"


def test_minhash_finds_planted_near_dups(ray_session):
    from etl_cms_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = [base + f"variant {i} " + "filler words here and there " * i for i in range(8)]
    texts.append(base + "tiny tail change")  # near-dup of texts[0]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5, concurrency=1).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 8)).any(), pairs


def test_simhash_pairs_near_identical(ray_session):
    from etl_cms_ray.stages.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta " * 10
    texts = [base, base + "iota", "completely different text about other things " * 10]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()), "text": texts})
    )
    pairs = simhash_pairs(docs, max_hamming=6, concurrency=1).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 1)).any()
    assert not ((pairs["a"] == 0) & (pairs["b"] == 2)).any()


def test_ann_brute_force_matches_numpy(ray_session):
    from etl_cms_ray.stages.ann import brute_force_topk

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            }
        )
    )
    out = brute_force_topk(ds, np.array([0]), vecs[0:1].astype(np.float64), k=3,
                           concurrency=1, round_digits=None).to_pandas()
    m = vecs.astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn[0]
    sims[0] = -np.inf
    expect = set(np.argsort(-sims)[:3])
    assert set(out["neighbor_id"]) == expect


def test_ann_lsh_subset_of_exact(ray_session):
    from etl_cms_ray.stages.ann import lsh_topk

    rng = np.random.RandomState(4)
    vecs = rng.standard_normal((80, 16)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(80), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            }
        )
    )
    out = lsh_topk(ds, np.array([0]), vecs[0:1].astype(np.float64), k=5, bits=4,
                   concurrency=1).to_pandas()
    assert len(out) <= 5  # approximate: may return fewer, never more
    assert (out["neighbor_id"] != 0).all()


def test_lang_id_obvious_cases():
    from etl_cms_ray.functions.text import lang_id_table

    t = pa.table(
        {
            "text": [
                "the cat and the dog of the house is big",
                "le chat et le chien dans les maisons des villes",
                "el gato y el perro que viven en las casas",
                "zzzz qqqq xxxx",
            ]
        }
    )
    out = lang_id_table(t)
    assert out["lang_pred"].to_pylist() == ["en", "fr", "es", "unknown"]


def test_multimodal_plumbing(ray_session):
    from etl_cms_ray.stages.multimodal import DecodeStub, FrameSampler, synth_media_table

    media = rd.from_arrow(synth_media_table(n=30))
    feats = media.map_batches(DecodeStub, batch_format="pyarrow", batch_size=8,
                              concurrency=1).to_pandas()
    assert len(feats) == 30
    assert len(feats["features"].iloc[0]) == 8
    # deterministic: same payload -> same features
    feats2 = rd.from_arrow(synth_media_table(n=30)).map_batches(
        DecodeStub, batch_format="pyarrow", batch_size=8, concurrency=1
    ).to_pandas()
    assert np.allclose(np.stack(feats["features"]), np.stack(feats2["features"]))
    frames = media.map_batches(FrameSampler, batch_format="pyarrow", batch_size=8,
                               concurrency=1).to_pandas()
    assert (frames["frame_ts_ms"] >= 0).all()
    # strict decode raises on unsupported kind
    stub = DecodeStub(strict=True)
    bad = synth_media_table(n=3).set_column(1, "kind", pa.array(["hologram"] * 3))
    with pytest.raises(NotImplementedError):
        stub(bad)


def test_sources_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from etl_cms_ray.fixtures import make_repos, snapshot_to_events
    from etl_cms_ray.sources.events import (
        read_events_parquet,
        snapshot_to_event_stream,
        union_event_sources,
    )

    repos = make_repos(2, 4)
    ev = snapshot_to_events(repos)
    path = str(tmp_path / "events.parquet")
    pq.write_table(ev, path)
    ds = read_events_parquet(path)
    assert ds.count() == ev.num_rows
    assert ds.schema().names[: len(ev.schema.names)] == list(ev.schema.names)

    u = union_event_sources([ds, ds], source_tags=["a", "b"])
    df = u.to_pandas()
    assert len(df) == 2 * ev.num_rows
    assert set(df["source_tag"]) == {"a", "b"}

    snap = rd.from_arrow(repos)
    stream = snapshot_to_event_stream(snap)
    assert stream.count() == repos.num_rows
    # deterministic seq regardless of blocking
    a = stream.to_pandas().sort_values(["repo", "path"])["seq"].tolist()
    b = snapshot_to_event_stream(rd.from_arrow(repos).repartition(4)).to_pandas().sort_values(
        ["repo", "path"]
    )["seq"].tolist()
    assert a == b


def test_repartition_and_audit(ray_session, tmp_path):
    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.fixtures import make_events, make_repos
    from etl_cms_ray.oracle import replay, tables_equal_by_sha
    from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
    from etl_cms_ray.pipelines.maintenance import audit_lake, repartition_lake

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    ingest(rd.from_arrow(ev), cfg)
    before = read_lake_table(cfg.lake_root)

    audit = audit_lake(cfg.lake_root)
    assert audit["healthy"], audit

    m = repartition_lake(cfg.lake_root, 16)
    assert m.num_partitions == 16
    after = read_lake_table(cfg.lake_root)
    assert tables_equal_by_sha(before, after)
    assert audit_lake(cfg.lake_root)["healthy"]

    # ingest continues against the re-bucketed lake.  Repartition collapses
    # fences to the MIN over source partitions (the conservative direction:
    # max would silently drop never-applied low-epoch events), so a full
    # replay may re-offer some already-applied epochs — LWW makes that
    # idempotent and the state must not change.
    cfg16 = EngineConfig(lake_root=cfg.lake_root, num_partitions=16)
    ingest(rd.from_arrow(ev), cfg16)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_cosine_pairs_finds_planted(ray_session):
    from etl_cms_ray.stages.ann import cosine_pairs

    rng = np.random.RandomState(9)
    vecs = rng.standard_normal((40, 16)).astype(np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant a near-duplicate of vector 0 at id 100
    twin = vecs[0] * 1.0001 + 1e-4
    ids = list(range(40)) + [100]
    mat = np.vstack([vecs, twin[None, :]])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array([r.astype(np.float32) for r in mat],
                                      type=pa.list_(pa.float32())),
            }
        )
    )
    pairs = cosine_pairs(ds, threshold=0.999).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 100)).any(), pairs


def test_semdedup_pairs_planted_clusters(ray_session):
    """SemDeDup blocking contract: near-dups inside a semantic cluster
    are found exactly (match the brute-force all-pairs answer on
    well-separated data), deterministically across batch splits."""
    from etl_cms_ray.stages.ann import semdedup_pairs

    rng = np.random.default_rng(23)
    dirs = np.eye(12)[:4]  # 4 orthogonal semantic directions
    rows, ids = [], []
    nid = 0
    for c in range(4):
        for _ in range(25):
            rows.append(dirs[c] + rng.normal(scale=0.02, size=12))
            ids.append(nid)
            nid += 1
    # plant one twin per cluster: ids 1000+c duplicate member c*25
    planted = []
    for c in range(4):
        src = rows[c * 25]
        rows.append(src * 1.0001 + 1e-4)
        ids.append(1000 + c)
        planted.append((c * 25, 1000 + c))
    mat = np.stack(rows)

    def make_ds(nblocks):
        t = pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([r.astype(np.float32) for r in mat],
                                  type=pa.list_(pa.float32())),
        })
        return rd.from_arrow(t).repartition(nblocks)

    out1 = (semdedup_pairs(make_ds(3), k=4, threshold=0.999)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    for a, b in planted:
        assert ((out1["a"] == a) & (out1["b"] == b)).any(), (a, b, out1)

    # exact vs brute force at this threshold (clusters are separated, so
    # every qualifying pair is intra-cell — the SemDeDup contract holds)
    M = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = M @ M.T
    iu = np.triu_indices(len(ids), k=1)
    want = {(min(ids[i], ids[j]), max(ids[i], ids[j]))
            for i, j in zip(*iu) if cos[i, j] >= 0.999}
    got = set(zip(out1["a"].tolist(), out1["b"].tolist()))
    assert got == want, (got ^ want)

    # determinism across a different batch split
    out2 = (semdedup_pairs(make_ds(7), k=4, threshold=0.999)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out1, out2)


def test_lake_langmap_enrichment(ray_session, tmp_path):
    """Enrich the lake with the F4 langmap dimension (vocabulary-join
    analog): matched rows gain lang_id/family, 'unknown' rows dead-letter
    — engine dead letters equal the oracle's replay_dead_letter keys."""
    import ray.data

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.fixtures import langmap_table, make_events, make_repos
    from etl_cms_ray.oracle import replay, replay_dead_letter
    from etl_cms_ray.pipelines.ingest import ingest, read_lake
    from etl_cms_ray.stages.dimjoin import BroadcastJoiner, put_dim, split_matched

    repos = make_repos(3, 8)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    ingest(ray.data.from_arrow(ev), cfg)

    joined = read_lake(cfg.lake_root).map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(dim_ref=put_dim(langmap_table()), key="lang"),
        batch_format="pyarrow",
        concurrency=1,
    )
    t = pa.Table.from_pandas(joined.to_pandas(), preserve_index=False)
    matched, dead = split_matched(t)
    assert set(dead["lang"].to_pylist()) <= {"unknown"}
    assert matched["lang_id"].null_count == 0
    # dead-letter keys == lake keys whose lang is unmapped (oracle view)
    lake_expected = replay(ev)
    exp_dead = {
        (r, p)
        for r, p, lang in zip(
            lake_expected["repo"].to_pylist(),
            lake_expected["path"].to_pylist(),
            lake_expected["lang"].to_pylist(),
        )
        if lang == "unknown"
    }
    got_dead = set(zip(dead["repo"].to_pylist(), dead["path"].to_pylist()))
    assert got_dead == exp_dead


def test_lake_repo_stats(ray_session, tmp_path):
    import ray.data

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.fixtures import make_events, make_repos
    from etl_cms_ray.oracle import replay
    from etl_cms_ray.pipelines.ingest import ingest
    from etl_cms_ray.pipelines.stats import lake_repo_stats

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    ingest(ray.data.from_arrow(ev), cfg)
    stats = lake_repo_stats(cfg.lake_root)

    exp = replay(ev).to_pandas().groupby("repo").agg(
        n_files=("size", "size"), total_bytes=("size", "sum"),
        min_epoch=("epoch", "min"), max_epoch=("epoch", "max"),
    ).reset_index()
    got = stats.sort_values("repo").reset_index(drop=True)
    exp = exp.sort_values("repo").reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(exp), (got, exp)


def test_hyperloglog_accuracy_and_merge(ray_session):
    from etl_cms_ray.functions.sketch import HyperLogLog, approx_distinct

    # merge property: sketch(A) ∪ sketch(B) == sketch(A ∪ B)
    a, b, ab = HyperLogLog(10), HyperLogLog(10), HyperLogLog(10)
    xs = [f"x{i}" for i in range(3000)]
    ys = [f"y{i}" for i in range(2000)]
    a.add_many(xs); b.add_many(ys); ab.add_many(xs + ys)
    assert np.array_equal(a.merge(b).registers, ab.registers)
    est = a.merge(b).cardinality()
    assert abs(est - 5000) / 5000 < 0.1

    # distributed: approx distinct of l_orderkey at sf0.001 vs exact
    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet", columns=["l_orderkey"])
    exact = len(ds.unique("l_orderkey"))
    est = approx_distinct(ds, "l_orderkey", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # serialization round-trip
    rt = HyperLogLog.from_bytes(ab.to_bytes())
    assert rt.cardinality() == ab.cardinality()


def test_kll_quantile_error_and_merge(ray_session):
    """Rank error stays under ~1.5% at k=200 on uniform, lognormal and
    sorted adversarial streams, through chunked merges; deterministic."""
    from etl_cms_ray.functions.sketch import KLL, approx_quantiles

    rng = np.random.default_rng(11)
    streams = {
        "uniform": rng.uniform(0, 1, 60000),
        "lognormal": rng.lognormal(0, 2, 60000),
        "sorted": np.arange(60000, dtype=np.float64),
    }
    for name, data in streams.items():
        def build():
            parts = []
            for c in np.array_split(data, 9):
                g = KLL(k=200)
                g.add_many(c)
                parts.append(g)
            acc = parts[0]
            for p in parts[1:]:
                acc = acc.merge(p)
            return KLL.from_bytes(acc.to_bytes())

        acc = build()
        assert acc.n == len(data)
        srt = np.sort(data)
        for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            est = acc.quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / len(data)
            assert abs(true_rank - q) <= 0.015, (name, q, true_rank)
        # deterministic: rebuilding from the same chunks gives the same sketch
        acc2 = build()
        assert acc.to_bytes() == acc2.to_bytes(), name

    # distributed helper against a Dataset
    ds = rd.from_arrow(pa.table({"x": streams["lognormal"]})).repartition(6)
    acc = approx_quantiles(ds, "x", [0.5], k=200)
    srt = np.sort(streams["lognormal"])
    tr = np.searchsorted(srt, acc.quantile(0.5), side="right") / len(srt)
    assert abs(tr - 0.5) <= 0.02, tr


def test_bloom_filter_prune(ray_session):
    """No false negatives ever; FPR near the design point; distributed
    build == single-pass build; prune counters fire."""
    from etl_cms_ray.stages.bloom import BloomFilter, bloom_prune, build_bloom
    from etl_cms_ray.stages.metrics import make_counter, read_counter

    keys = np.arange(0, 20000, 2, dtype=np.int64)  # evens present
    probe = np.arange(20000, dtype=np.int64)
    f = BloomFilter(n_bits=1 << 18, k=5)
    f.add_many(keys)
    mask = f.contains_many(probe)
    assert mask[::2].all(), "false negative"
    fpr = mask[1::2].mean()
    assert fpr < 0.05, fpr  # ~26 bits/key, k=5 -> well under 5%

    # merge == union; serialization round-trip
    a, b = BloomFilter(1 << 14, 4), BloomFilter(1 << 14, 4)
    a.add_many(keys[:1000]); b.add_many(keys[1000:2000])
    m = BloomFilter.from_bytes(a.merge(b).to_bytes())
    assert m.contains_many(keys[:2000]).all()

    # distributed build over a Dataset == driver-side build
    import ray as _ray
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(4)
    ref = build_bloom(ds, "k", n_bits=1 << 18, k=5)
    dist = _ray.get(ref)
    assert np.array_equal(dist.bits, f.bits)

    # prune keeps every true match and counts what it drops
    fact = rd.from_arrow(pa.table({"k": probe, "v": probe * 2}))
    c = make_counter()
    kept = bloom_prune(fact, "k", ref, counter=c).to_pandas()
    assert set(keys).issubset(set(kept["k"]))
    # fire-and-forget adds from worker tasks land asynchronously
    import time as _time
    for _ in range(50):
        counts = read_counter(c)
        if counts.get("bloom_kept", 0) + counts.get("bloom_pruned", 0) == len(probe):
            break
        _time.sleep(0.1)
    assert counts["bloom_kept"] == len(kept)
    assert counts["bloom_pruned"] == len(probe) - len(kept)
    assert counts["bloom_pruned"] > 0.9 * (len(probe) - len(keys))


def test_misra_gries_invariant_and_merge(ray_session):
    """PODS'12 mergeable-summary invariant on a skewed stream, chunked
    and merged every way the distributed path exercises it."""
    from etl_cms_ray.functions.sketch import MisraGries, heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish skew over 500 keys, ~30k total weight
    keys = [f"k{i}" for i in range(500)]
    weights = (3000.0 / np.arange(1, 501)).astype(np.int64) + 1
    stream = np.repeat(np.arange(500), weights)
    rng.shuffle(stream)
    true = {k: int(w) for k, w in zip(keys, weights)}
    n = int(weights.sum())

    def sketch_of(chunk, m):
        g = MisraGries(m)
        vals, cnts = np.unique(chunk, return_counts=True)
        g.insert_counts([keys[v] for v in vals], cnts)
        return g

    for m in (8, 32, 128):
        parts = [sketch_of(c, m) for c in np.array_split(stream, 7)]
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge(p)
        acc = MisraGries.from_bytes(acc.to_bytes())  # round-trip
        assert acc.n == n
        assert acc.err <= n / (m + 1), (m, acc.err, n)
        assert len(acc.counts) <= m
        for k, t in true.items():
            c = acc.counts.get(k, 0)
            assert c <= t, (m, k, c, t)
            assert c >= t - acc.err, (m, k, c, t, acc.err)
            if t > acc.err:  # heavy keys must be tracked
                assert k in acc.counts

    # distributed helper == exact when vocabulary fits in m
    t = pa.table(
        {"token": [keys[v] for v in stream[:5000]], "cnt": np.ones(5000, np.int64)}
    )
    ds = rd.from_arrow(t).repartition(5)
    acc = heavy_hitters(ds, "token", "cnt", m=1024)
    assert acc.err == 0
    vals, cnts = np.unique(stream[:5000], return_counts=True)
    assert acc.counts == {keys[v]: int(c) for v, c in zip(vals, cnts)}


def test_sharded_manifest_commit_is_incremental(tmp_path):
    """Format-2 manifests: a commit touching one partition rewrites only
    that partition's shard + the index; untouched shards are reused by
    path; legacy single-file manifests stay readable; round-trip exact."""
    import json
    import os

    from etl_cms_ray.state.manifest import LakeStore, Manifest, PartitionState

    root = str(tmp_path / "lake")
    store = LakeStore(root)
    P = 256  # shard_size = ceil(256/64) = 4
    m1 = Manifest(version=1, num_partitions=P)
    for p in range(P):
        m1.partitions[p] = PartitionState(
            part_id=p, file=f"data/part={p:05d}/e0-x.parquet", rows=p,
            applied_through_epoch=0, content_hash=f"h{p}",
        )
    store.publish(m1, expect_version=0)
    idx1 = json.load(open(os.path.join(store.manifest_dir, "manifest-000001.json")))
    assert idx1["format"] == 2 and len(idx1["shards"]) == 64

    # touch exactly one partition
    m2 = Manifest(version=2, num_partitions=P, partitions=dict(m1.partitions))
    m2.partitions[7] = PartitionState(
        part_id=7, file="data/part=00007/e1-y.parquet", rows=99,
        applied_through_epoch=1, content_hash="h7b",
    )
    store.publish(m2, expect_version=1, changed_parts={7})
    idx2 = json.load(open(os.path.join(store.manifest_dir, "manifest-000002.json")))
    changed = [
        s for s in idx2["shards"]
        if idx2["shards"][s]["file"] != idx1["shards"][s]["file"]
    ]
    assert changed == ["1"]  # only shard 7//4 == 1 got a new file

    # round-trip: loaded state equals what was published (and time travel)
    got = store.load_manifest()
    assert got.version == 2 and len(got.partitions) == P
    assert got.partitions[7].rows == 99 and got.partitions[8].rows == 8
    old = store.load_manifest(1)
    assert old.partitions[7].rows == 7

    # legacy format-1 files still load
    legacy = Manifest(version=3, num_partitions=4)
    legacy.partitions[0] = PartitionState(part_id=0, file="f", rows=5)
    with open(os.path.join(store.manifest_dir, "manifest-000003.json"), "w") as f:
        f.write(legacy.to_json())
    with open(store.current_path, "w") as f:
        f.write("3")
    assert store.load_manifest().partitions[0].rows == 5


def test_partitioner_abi_guard(ray_session, tmp_path):
    """A lake whose manifest records a different key->partition function
    must be refused by ingest (fences are per-partition; applying events
    through another hash silently duplicates keys)."""
    import json
    import os

    import ray.data

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.fixtures import make_events, make_repos
    from etl_cms_ray.pipelines.ingest import ingest
    from etl_cms_ray.state.manifest import LakeStore

    lake = str(tmp_path / "lake")
    cfg = EngineConfig(lake_root=lake, num_partitions=4)
    ev = make_events(make_repos(n_repos=2, files_per_repo=5), n_epochs=2)
    ingest(ray.data.from_arrow(ev), cfg)
    store = LakeStore(lake)
    # simulate a pre-FNV lake: rewrite the index with the legacy tag
    path = os.path.join(store.manifest_dir, f"manifest-{store.current_version():06d}.json")
    d = json.load(open(path))
    d["partitioner"] = "crc32"
    json.dump(d, open(path, "w"))
    with pytest.raises(ValueError, match="partitioner"):
        ingest(ray.data.from_arrow(ev), cfg)


def test_fanout_multi_sink_routing(ray_session, tmp_path):
    """One pass, N typed sinks: overlapping routes fan a record to several
    tables, the catch-all gets only unclaimed rows, per-table schemas are
    the declared projections, and the single manifest commits everything
    (reads before the commit fail)."""
    import pyarrow.compute as pc

    from etl_cms_ray.stages.fanout import Route, fanout_write, read_fanout_table

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "kind": ["a", "b", "ab", "z"],
            "v": pa.array([1.0, 2.0, 3.0, 4.0], type=pa.float64()),
        }
    )
    routes = [
        Route("alpha", lambda b: pc.match_substring(b["kind"], "a"), ["id", "v"]),
        Route("beta", lambda b: pc.match_substring(b["kind"], "b"), ["id"]),
        Route("rest", None, ["id", "kind"]),
    ]
    root = str(tmp_path / "fan")
    with pytest.raises(FileNotFoundError):
        read_fanout_table(root, "alpha")  # nothing committed yet
    manifest = fanout_write(rd.from_arrow(t), routes, root)
    assert manifest["alpha"]["rows"] == 2  # ids 1, 3 (overlap: 3 also in beta)
    assert manifest["beta"]["rows"] == 2  # ids 2, 3
    assert manifest["rest"]["rows"] == 1  # id 4 only — unclaimed
    alpha = read_fanout_table(root, "alpha").to_pandas()
    assert sorted(alpha.columns) == ["id", "v"] and set(alpha["id"]) == {1, 3}
    beta = read_fanout_table(root, "beta").to_pandas()
    assert list(beta.columns) == ["id"] and set(beta["id"]) == {2, 3}
    rest = read_fanout_table(root, "rest").to_pandas()
    assert set(rest["id"]) == {4}
    # idempotent rerun: content-addressed names -> same files, same manifest
    manifest2 = fanout_write(rd.from_arrow(t), routes, root)
    assert manifest2 == manifest


def test_skew_guard_counters_fire_on_degenerate_corpus(ray_session):
    """Capped LSH / ANN buckets must be counted, not silently dropped."""
    import ray

    from etl_cms_ray.stages.ann import cosine_pairs
    from etl_cms_ray.stages.dedup import minhash_lsh_pairs
    from etl_cms_ray.stages.metrics import make_counter, read_counter

    # 120 identical documents -> every band bucket holds 120 > max_bucket=64
    texts = ["all documents share exactly this degenerate content " * 5] * 120
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(120), type=pa.int64()), "text": texts})
    )
    c1 = make_counter()
    pairs = minhash_lsh_pairs(docs, threshold=0.5, concurrency=1,
                              broadcast_texts=True, metrics=c1).to_pandas()
    m1 = read_counter(c1)
    assert m1.get("lsh_capped_buckets", 0) > 0, m1
    assert m1.get("lsh_capped_bucket_rows", 0) >= 120, m1
    assert len(pairs) == 0  # everything was capped away — and we know it

    # identical embeddings -> one hyperplane bucket of 40 > max_bucket=8
    vec = np.ones(16, dtype=np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), type=pa.int64()),
                "embedding": pa.array([vec] * 40, type=pa.list_(pa.float32())),
            }
        )
    )
    c2 = make_counter()
    out = cosine_pairs(emb, threshold=0.99, max_bucket=8, metrics=c2).to_pandas()
    m2 = read_counter(c2)
    assert m2.get("ann_capped_buckets", 0) > 0, m2
    assert len(out) == 0
    for h in (c1, c2):
        ray.kill(h)


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    """Prefix filtering must be COMPLETE: both ordering modes return
    exactly the brute-force all-pairs answer (no cap fires here)."""
    import itertools

    from etl_cms_ray.stages.dedup import _word_ngram_hashes, ngram_jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [base,
             base + "tail one",
             base.replace("delta", "DELTA"),
             "totally different words entirely here now " * 6,
             "alpha beta gamma " * 2]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    )
    expect = set()
    for (i, x), (j, y) in itertools.combinations(enumerate(texts), 2):
        ga, gb = _word_ngram_hashes(x, 3), _word_ngram_hashes(y, 3)
        inter = np.intersect1d(ga, gb, assume_unique=True).size
        if inter and inter / (len(ga) + len(gb) - inter) >= 0.5:
            expect.add((i, j))
    for order in ("df", "hash", "df_join"):
        got = ngram_jaccard_pairs(
            docs, threshold=0.5, n=3, order=order, join_partitions=2
        ).to_pandas()
        assert set(map(tuple, got[["a", "b"]].values.tolist())) == expect, order
        assert (got["jaccard"] >= 0.5).all()


def test_minhash_join_verify_equals_broadcast(ray_session):
    """The scalable (join-based) verify path returns the same pairs as the
    broadcast-texts path."""
    from etl_cms_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = [base + f"variant {i} " + "filler words here and there " * i for i in range(8)]
    texts.append(base + "tiny tail change")
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    )
    a = minhash_lsh_pairs(docs, threshold=0.5, concurrency=1).to_pandas()
    b = minhash_lsh_pairs(docs, threshold=0.5, concurrency=1,
                          broadcast_texts=False, join_partitions=2).to_pandas()
    ka = sorted(map(tuple, a[["a", "b"]].values.tolist()))
    kb = sorted(map(tuple, b[["a", "b"]].values.tolist()))
    assert ka == kb and ka, (ka, kb)


def test_lake_is_duckdb_readable(ray_session, tmp_path):
    """Interop: the lake's live parquet files are directly queryable by
    DuckDB (after compaction for merge-on-read lakes) and agree with the
    engine's own read path."""
    import duckdb
    import ray.data

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.fixtures import make_events, make_repos
    from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
    from etl_cms_ray.state.manifest import LakeStore

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    ingest(ray.data.from_arrow(ev), cfg)

    store = LakeStore(cfg.lake_root)
    files = [store.abspath(f) for f in store.load_manifest().live_files()]
    con = duckdb.connect()
    n, keys = con.execute(
        "SELECT count(*), count(DISTINCT repo || '/' || path) FROM read_parquet(?)",
        [files],
    ).fetchone()
    engine = read_lake_table(cfg.lake_root)
    assert n == engine.num_rows == keys


def test_repartition_preserves_delete_fences(ray_session, tmp_path):
    """Regression (review finding, sharpened): repartition must keep fence
    knowledge for EVERY new bucket — an empty bucket without a manifest
    entry would let a replayed pre-delete insert resurrect a deleted key."""
    import ray.data

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.fixtures import make_events, make_repos
    from etl_cms_ray.oracle import replay, tables_equal_by_sha
    from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
    from etl_cms_ray.pipelines.maintenance import repartition_lake
    from etl_cms_ray.state.manifest import LakeStore

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=80, scenario="tombstone")
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    ingest(ray.data.from_arrow(ev), cfg)
    repartition_lake(cfg.lake_root, 32)  # many buckets -> some are empty
    m = LakeStore(cfg.lake_root).load_manifest()
    assert len(m.partitions) == 32  # every bucket has a fence entry
    # full at-least-once replay: deleted keys must NOT resurrect
    res = ingest(
        ray.data.from_arrow(ev),
        EngineConfig(lake_root=cfg.lake_root, num_partitions=32),
    )
    assert res.events_applied == 0
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_redact_rules_and_counts():
    import pyarrow as pa

    from etl_cms_ray.stages.redact import (
        DEFAULT_RULES,
        oracle_redact_sql,
        redact_batch,
        redact_column,
    )

    col = pa.array(
        [
            "mail a@b.co and c.d+x@e.org here",
            "host 192.168.0.1 key 0123456789abcdef0123456789abcdef done",
            "clean text, no secrets",
            None,
        ]
    )
    red, n = redact_column(col)
    assert red.to_pylist() == [
        "mail <EMAIL> and <EMAIL> here",
        "host <IP> key <KEY> done",
        "clean text, no secrets",
        None,
    ]
    assert n.to_pylist() == [2, 2, 0, None]

    t = redact_batch(pa.table({"doc_id": pa.array([1, 2]), "text": col[:2]}))
    assert t.column_names == ["doc_id", "text", "n_redactions"]
    assert t["n_redactions"].to_pylist() == [2, 2]

    # the generated SQL mirror computes the same thing in DuckDB
    import duckdb

    red_sql, cnt_sql = oracle_redact_sql("s")
    df = duckdb.sql(
        "SELECT "
        + red_sql
        + " AS r, "
        + cnt_sql
        + " AS n FROM (SELECT unnest(["
        + ",".join("'" + v.replace("'", "''") + "'" for v in col.to_pylist()[:3])
        + "]) AS s)"
    ).df()
    assert list(df["r"]) == red.to_pylist()[:3]
    assert list(df["n"]) == n.to_pylist()[:3]

    # an email that is ALSO preceded by hex-ish text: rules fire in order
    tricky = pa.array(["deadbeefdeadbeefdeadbeefdeadbeef bob@x.io"])
    r2, n2 = redact_column(tricky)
    assert r2.to_pylist() == ["<KEY> <EMAIL>"]
    assert n2.to_pylist() == [2]


def test_pack_token_chunks_order_independent(ray_session):
    """The distributed prefix sum must produce the doc_id-ORDERED global
    offsets regardless of input row order or batching: shuffled rows in
    tiny batches equal the single-process cumsum."""
    import numpy as np

    from etl_cms_ray.stages.packing import pack_token_chunks

    rng = np.random.RandomState(11)
    n = 5000
    ntok = rng.randint(1, 90, size=n)
    texts = ["w " * (k - 1) + "w" for k in ntok]  # exactly k single-space tokens
    order = rng.permutation(n)
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(order.astype("int64")),
                  "text": pa.array([texts[i] for i in order])})
    ).map_batches(lambda b: b, batch_format="pyarrow", batch_size=257)
    got = (
        pack_token_chunks(docs, max_tokens=64, bucket_width=128)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    start = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    assert got["ntok"].to_numpy().tolist() == ntok.tolist()
    assert got["tok_start"].to_numpy().tolist() == start.tolist()
    assert (got["chunk_start"] == start // 64).all()
    assert (got["chunk_end"] == (start + ntok - 1) // 64).all()
    # chunk ranges tile the stream: consecutive docs overlap or abut
    ce = got["chunk_end"].to_numpy()
    cs = got["chunk_start"].to_numpy()
    assert (cs[1:] - ce[:-1] <= 1).all() and (cs[1:] >= cs[:-1]).all()


def test_weighted_corpus_mix_rates_and_determinism(ray_session):
    from etl_cms_ray.stages.packing import weighted_corpus_mix

    docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    a = weighted_corpus_mix(docs).to_pandas().sort_values("doc_id")
    b = weighted_corpus_mix(docs).to_pandas().sort_values("doc_id")
    assert a.equals(b.reset_index(drop=True).set_axis(a.index))  # deterministic
    full = docs.to_pandas()
    kept = a.groupby("lang").size()
    total = full.groupby("lang").size()
    assert kept["en"] == total["en"]  # rate 1.0 keeps everything
    for lang, lo, hi in (("zh", 0.3, 0.7), ("es", 0.1, 0.45)):
        frac = kept.get(lang, 0) / total[lang]
        assert lo <= frac <= hi, (lang, frac)
    # invalid rate (not a multiple of 1/16) must raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_corpus_mix(docs, rates={"en": 0.3}).count()


def test_substring_dup_planted(ray_session):
    """Planted duplicated spans: two docs sharing one 4-token window are
    both flagged with exactly one duplicated window; a window repeated
    WITHIN one doc only is not duplicated; tiny batches force the
    cross-batch document-frequency partials to sum correctly."""
    import numpy as np

    from etl_cms_ray.stages.dedup import substring_dup_stats

    shared = "alpha beta gamma delta"
    rows = [
        (0, shared + " one two three"),          # shares `shared` with doc 1
        (1, "x y " + shared + " z"),             # shares `shared` with doc 0
        (2, "p q r s p q r s p q r s"),          # intra-doc repeats only
        (3, "u v w"),                            # < window tokens: no output row
        (4, "lone words that match nothing else here"),
    ]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                  "text": pa.array([r[1] for r in rows])})
    ).map_batches(lambda b: b, batch_format="pyarrow", batch_size=1)
    got = (
        substring_dup_stats(docs, window=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 2, 4]  # doc 3 has no windows
    by = got.set_index("doc_id")
    assert by.loc[0, "n_dup_windows"] == 1
    assert by.loc[1, "n_dup_windows"] == 1
    assert by.loc[2, "n_dup_windows"] == 0  # intra-doc repetition is not dup
    assert by.loc[4, "n_dup_windows"] == 0
    # distinct-window counts: doc 2 has 12 tokens -> 9 positions but only
    # 4 distinct windows (period-4 repetition)
    assert by.loc[2, "n_windows"] == 4
    assert np.isclose(by.loc[0, "dup_ratio"], 1 / by.loc[0, "n_windows"])


def test_incremental_exact_dedup_against_lake(ray_session, tmp_path):
    """New-batch docs dedup against committed lake content: a re-crawled
    copy of committed content is dropped, an in-batch duplicate pair
    collapses to its min id, fresh content survives."""
    import pyarrow.compute as pc

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.pipelines.ingest import ingest
    from etl_cms_ray.stages.dedup import incremental_exact_dedup

    committed = ["the committed text one", "the committed text two"]
    ev = pa.table({
        "repo": pa.array(["r"] * 2),
        "path": pa.array(["a", "b"]),
        "op": pa.array(["insert"] * 2),
        "commit": pa.array(["c0"] * 2),
        "epoch": pa.array([0, 0], type=pa.int64()),
        "seq": pa.array([0, 1], type=pa.int64()),
        "lang": pa.array(["py", "py"]),
        "content": pa.array(committed),
    })
    lake = str(tmp_path / "lake")
    ingest(rd.from_arrow(ev), EngineConfig(lake_root=lake, num_partitions=4),
           count_input=False)

    newb = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "text": pa.array([
            "the committed text one",   # lake dup -> dropped
            "brand new text",           # fresh -> survives
            "another new text",         # fresh, duplicated in-batch
            "another new text",         # in-batch dup -> collapses to 12
        ]),
    })).map_batches(lambda b: b, batch_format="pyarrow", batch_size=1)
    got = (
        incremental_exact_dedup(newb, lake)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [11, 12]


def test_compression_ratio_pinned_reference(ray_session):
    """doc_compression_ratio kernel vs an inline zlib reference, and the
    keep-band gate behavior on planted extremes."""
    import zlib

    from etl_cms_ray.pipelines.queries import doc_compression_ratio

    sf = "/root/testdata/sf0.001"
    out = doc_compression_ratio(sf).to_pandas().set_index("doc_id")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for _, row in docs.head(25).iterrows():
        enc = row["text"].encode()
        got = out.loc[row["doc_id"]]
        assert got["raw_bytes"] == len(enc)
        assert got["compressed_bytes"] == len(zlib.compress(enc, 6))
        r = got["compressed_bytes"] * 100
        assert bool(got["keep"]) == (len(enc) > 0
                                     and got["raw_bytes"] * 8 <= r <= got["raw_bytes"] * 85)
    # extremes: pure repetition compresses under the floor; random bytes
    # exceed the ceiling — both must be gated out by the integer band
    rep = ("spam " * 500).encode()
    assert len(zlib.compress(rep, 6)) * 100 < len(rep) * 8
