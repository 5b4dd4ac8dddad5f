"""hash_join (stages/join.py) semantics vs in-memory pandas merges.

The co-group join is the engine's task-based replacement for native
Dataset.join on every catalog pipeline; these tests pin its SQL
semantics (inner/left/semi/anti, suffixing, multi-key, string keys,
null keys) independent of the DuckDB catalog oracles.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from etl_cms_ray.stages.join import hash_join


def _ds(table: pa.Table) -> "ray.data.Dataset":
    return ray.data.from_arrow(table)


@pytest.fixture()
def sides(ray_session):
    rng = np.random.default_rng(7)
    left = pa.table(
        {
            "k": rng.integers(0, 50, 200),
            "lv": np.arange(200, dtype=np.int64),
            "name": [f"l{i % 17}" for i in range(200)],
        }
    )
    right = pa.table(
        {
            "k": rng.integers(25, 75, 120),  # half-overlapping key range
            "rv": np.arange(120, dtype=np.int64) * 10,
            "name": [f"r{i % 13}" for i in range(120)],
        }
    )
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_inner_left_matches_pandas(sides):
    left, right = sides
    lp, rp = left.to_pandas(), right.to_pandas()
    for how, phow in [("inner", "inner"), ("left", "left")]:
        got = hash_join(_ds(left), _ds(right), on="k", how=how,
                        num_partitions=8).to_pandas()
        exp = lp.merge(rp, on="k", how=phow, suffixes=("", "_r"))
        pd.testing.assert_frame_equal(_sorted(got), _sorted(exp),
                                      check_dtype=False)


def test_semi_anti(sides):
    left, right = sides
    lp, rp = left.to_pandas(), right.to_pandas()
    keys = set(rp["k"])
    semi = hash_join(_ds(left), _ds(right), on="k", how="semi",
                     num_partitions=8).to_pandas()
    anti = hash_join(_ds(left), _ds(right), on="k", how="anti",
                     num_partitions=8).to_pandas()
    pd.testing.assert_frame_equal(_sorted(semi), _sorted(lp[lp["k"].isin(keys)]))
    pd.testing.assert_frame_equal(_sorted(anti), _sorted(lp[~lp["k"].isin(keys)]))
    # semi/anti keep left columns only and partition left exactly
    assert sorted(semi.columns) == sorted(lp.columns)
    assert len(semi) + len(anti) == len(lp)


def test_multikey_and_string_key(ray_session):
    left = pa.table({"a": [1, 1, 2, 2], "s": ["x", "y", "x", "y"], "v": [1, 2, 3, 4]})
    right = pa.table({"a": [1, 2, 2], "s": ["y", "x", "z"], "w": [10, 20, 30]})
    got = hash_join(_ds(left), _ds(right), on=("a", "s"),
                    num_partitions=4).to_pandas()
    exp = left.to_pandas().merge(right.to_pandas(), on=["a", "s"])
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)

    got_s = hash_join(_ds(left), _ds(right), on="s", right_on="s", how="inner",
                      num_partitions=4).to_pandas()
    exp_s = left.to_pandas().merge(right.to_pandas(), on="s", suffixes=("", "_r"))
    pd.testing.assert_frame_equal(_sorted(got_s), _sorted(exp_s), check_dtype=False)


def test_null_keys_never_match(ray_session):
    left = pa.table({"k": pa.array([1, None, 3], type=pa.int64()), "v": [1, 2, 3]})
    right = pa.table({"k": pa.array([1, None], type=pa.int64()), "w": [10, 20]})
    got = hash_join(_ds(left), _ds(right), on="k", num_partitions=4).to_pandas()
    assert got["k"].tolist() == [1]
    assert got["w"].tolist() == [10]


def test_float_key_rejected(ray_session):
    left = pa.table({"k": [1.0, 2.0], "v": [1, 2]})
    with pytest.raises(Exception):
        hash_join(_ds(left), _ds(left), on="k", num_partitions=2).to_pandas()


def test_schema_propagation_avoids_reexecution(sides):
    """Chained joins read the statically propagated output schema (the
    _cogroup_schema attr) instead of sampling the upstream plan."""
    left, right = sides
    j1 = hash_join(_ds(left), _ds(right), on="k", num_partitions=4)
    assert isinstance(j1._cogroup_schema, pa.Schema)
    assert j1._cogroup_schema.names == ["k", "lv", "name", "rv", "name_r"]
    j2 = hash_join(j1, _ds(right), on="k", num_partitions=4)
    # collisions suffix repeatedly: right's rv -> rv_r, name -> name_r_r
    assert j2._cogroup_schema.names == [
        "k", "lv", "name", "rv", "name_r", "rv_r", "name_r_r"
    ]
    lp, rp = left.to_pandas(), right.to_pandas()
    exp1 = lp.merge(rp, on="k", suffixes=("", "_r"))
    exp2 = exp1.merge(rp, on="k", suffixes=("", "_rr"))
    got = j2.to_pandas()
    assert len(got) == len(exp2)


def test_asof_join_matches_pandas(ray_session):
    import pandas as pd

    from etl_cms_ray.stages.asof import asof_join

    rng = np.random.default_rng(11)
    L = pa.table({"k": rng.integers(0, 10, 120), "ts": rng.integers(0, 500, 120),
                  "lv": np.arange(120)})
    rdf = (pd.DataFrame({"k": rng.integers(0, 10, 90),
                         "ts": rng.integers(0, 500, 90),
                         "rv": np.arange(90) * 3})
           .groupby(["k", "ts"], as_index=False)["rv"].max())
    got = asof_join(_ds(L), _ds(pa.Table.from_pandas(rdf, preserve_index=False)),
                    on="ts", by="k", num_partitions=8).to_pandas()
    exp = pd.merge_asof(
        L.to_pandas().sort_values("ts", kind="mergesort"),
        rdf.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward", suffixes=("", "_r"),
    )
    # pandas keeps one ts column; ours exposes the right ts as ts_r — drop
    # for comparison and check it separately on a known row
    g = _sorted(got.drop(columns=["ts_r"]))
    e = _sorted(exp)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_interval_join_semantics(ray_session):
    from etl_cms_ray.stages.rangejoin import interval_join

    bands = pa.table({"name": ["a", "b"], "lo": [0.0, 10.0], "hi": [10.0, 20.0]})
    rows = pa.table({"v": [-1.0, 0.0, 9.99, 10.0, 19.99, 20.0, 25.0]})
    inner = interval_join(_ds(rows), bands, "v").to_pandas()
    assert inner["v"].tolist() == [0.0, 9.99, 10.0, 19.99]
    assert inner["name"].tolist() == ["a", "a", "b", "b"]
    left = interval_join(_ds(rows), bands, "v", how="left").to_pandas()
    assert len(left) == 7
    assert left.sort_values("v")["name"].tolist()[:1] == [None]

    with pytest.raises(Exception):
        overl = pa.table({"name": ["a", "b"], "lo": [0.0, 5.0], "hi": [10.0, 20.0]})
        interval_join(_ds(rows), overl, "v")


def test_hot_key_salting_preserves_results(ray_session):
    """Salted join == unsalted join on a skewed corpus (hot left rows
    spread over `salt` partitions, hot right rows replicated to all of
    them — every pair still meets exactly once)."""
    rng = np.random.default_rng(23)
    n = 4000
    k = np.where(rng.random(n) < 0.7, 7, rng.integers(0, 200, n))  # key 7 hot
    left = pa.table({"k": k.astype(np.int64), "lv": np.arange(n, dtype=np.int64)})
    rk = np.where(rng.random(300) < 0.3, 7, rng.integers(0, 200, 300))
    right = pa.table({"k": rk.astype(np.int64),
                      "rv": np.arange(300, dtype=np.int64) * 3})
    plain = hash_join(_ds(left), _ds(right), on="k",
                      num_partitions=16).to_pandas()
    for how in ("inner", "left", "semi", "anti"):
        a = hash_join(_ds(left), _ds(right), on="k", how=how,
                      num_partitions=16).to_pandas()
        b = hash_join(_ds(left), _ds(right), on="k", how=how,
                      num_partitions=16, hot_keys=[7], salt=4).to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b), check_dtype=False)
    assert len(plain) > n  # the hot key actually fanned out


def test_full_outer_matches_pandas(sides):
    left, right = sides
    lp, rp = left.to_pandas(), right.to_pandas()
    got = hash_join(_ds(left), _ds(right), on="k", how="outer").to_pandas()
    exp = lp.merge(rp, on="k", how="outer", suffixes=("", "_r"))
    assert _sorted(got).equals(_sorted(exp.astype({"k": "int64"})))
    # both unmatched sides must actually be exercised by the fixture
    assert got["lv"].isna().any() and got["rv"].isna().any()


def test_full_outer_null_keys_emitted_unmatched(ray_session):
    left = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                     "lv": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"k": pa.array([None, 3, 9], pa.int64()),
                      "rv": pa.array([7, 8, 9], pa.int64())})
    got = hash_join(_ds(left), _ds(right), on="k", how="outer").to_pandas()
    # SQL semantics: null keys never match but DO survive a full outer
    assert len(got) == 5
    m = got[got["k"] == 3]
    assert len(m) == 1 and m["lv"].iloc[0] == 30 and m["rv"].iloc[0] == 8
    assert got["k"].isna().sum() == 2


def test_full_outer_rejects_salting(ray_session):
    left = pa.table({"k": pa.array([1], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        hash_join(_ds(left), _ds(right), on="k", how="outer", hot_keys=[1])
