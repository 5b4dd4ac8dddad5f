"""Ingest-time expectations: declared row constraints route violating
rows to the dead-letter sink with per-row reasons; the lake receives
only rows passing every check, and the reason taxonomy covers built-in
well-formedness plus declared expectations on multi-violation rows."""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_dead_letter, read_lake_table
from etl_cms_ray.stages.expectations import Expectation, reason_strings, violation_masks

LAKE = "/tmp/test_expect_lake"


def _events():
    repos = make_repos(n_repos=4, files_per_repo=6)
    return make_events(repos, n_epochs=2, events_per_epoch=40)


@pytest.fixture()
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    return EngineConfig(lake_root=LAKE, num_partitions=8)


def test_expectation_gates_rows_and_records_reasons(lake):
    cfg = lake
    ev = _events()
    cap = 120
    exps = [Expectation("content_cap", "content", "max_bytes", cap),
            Expectation("lang_known", "lang", "in_set", ("py", "rs", "go", "md"))]
    r = ingest(rd.from_arrow(ev), cfg, expectations=exps)

    sizes = pc.binary_length(ev["content"].cast(pa.large_binary()))
    not_del = pc.invert(pc.fill_null(pc.equal(ev["op"], "delete"), False))
    v_cap = pc.and_(pc.fill_null(pc.greater(sizes, cap), False), not_del)
    v_lang = pc.and_(
        pc.invert(pc.fill_null(
            pc.is_in(ev["lang"], value_set=pa.array(["py", "rs", "go", "md"])),
            False)),
        not_del,
    )
    def _n(m):
        return pc.sum(pc.cast(m, pa.int64())).as_py() or 0

    n_cap, n_lang = _n(v_cap), _n(v_lang)
    n_dead = _n(pc.or_(v_cap, v_lang))
    assert n_cap > 0 and r.dead_rows == n_dead
    assert sum(c for k, c in r.dead_reasons.items()
               if "content_cap" in k) == n_cap
    assert sum(c for k, c in r.dead_reasons.items()
               if "lang_known" in k) == n_lang
    # reasons survive in the dead-letter parquet
    dead = read_dead_letter(LAKE).to_pandas()
    assert len(dead) == n_dead
    assert (dead["dead_reason"].str.contains("content_cap").sum()) == n_cap
    # the lake holds no row over the cap
    t = read_lake_table(LAKE)
    assert pc.max(t["size"]).as_py() <= cap


def test_expectations_clean_stream_noop(lake):
    cfg = lake
    ev = _events()
    exps = [Expectation("content_cap", "content", "max_bytes", 10_000_000)]
    r1 = ingest(rd.from_arrow(ev), cfg, expectations=exps)
    assert r1.dead_rows == 0 and r1.dead_reasons == {}
    # same stream without expectations produces the identical lake
    shutil.rmtree(LAKE, ignore_errors=True)
    r2 = ingest(rd.from_arrow(ev), EngineConfig(lake_root=LAKE, num_partitions=8))
    assert r2.lake_rows == r1.lake_rows


def test_multi_violation_reason_is_joined():
    t = pa.table({
        "op": ["insert", "insert", "delete", "insert"],
        "lang": ["py", "zz", "zz", "zz"],
        "n": pa.array([1, -5, -5, 7], type=pa.int64()),
    })
    exps = [Expectation("lang_known", "lang", "in_set", ("py",)),
            Expectation("n_nonneg", "n", "ge", 0)]
    masks = violation_masks(t, exps)
    valid, reasons = reason_strings(masks, [e.name for e in exps], t.num_rows)
    assert list(valid) == [True, False, True, False]  # delete rows skip
    assert reasons.to_pylist() == [None, "lang_known,n_nonneg", None,
                                   "lang_known"]


def test_null_fails_and_on_delete_opts_in():
    t = pa.table({
        "op": ["insert", "delete"],
        "lang": pa.array([None, None], type=pa.string()),
    })
    strict = [Expectation("lang_nn", "lang", "not_null", on_delete=True)]
    lax = [Expectation("lang_nn", "lang", "not_null")]
    v_strict, _ = reason_strings(violation_masks(t, strict), ["lang_nn"], 2)
    v_lax, _ = reason_strings(violation_masks(t, lax), ["lang_nn"], 2)
    assert list(v_strict) == [False, False]
    assert list(v_lax) == [False, True]


def test_unknown_op_rejected():
    with pytest.raises(ValueError):
        Expectation("x", "lang", "no_such_op")


def test_cli_expect_spec_parsing():
    from etl_cms_ray.cli import _parse_expectations

    exps = _parse_expectations([
        "cap:content:max_bytes:400",
        "langs:lang:in_set:py,rs,go",
        "band:size:between:10:99.5",
        "nn:repo:not_null",
    ])
    assert [e.op for e in exps] == ["max_bytes", "in_set", "between",
                                    "not_null"]
    assert exps[0].value == 400 and isinstance(exps[0].value, int)
    assert exps[1].value == ("py", "rs", "go")
    assert exps[2].value == 10 and exps[2].value2 == 99.5
    import pytest as _pt
    with _pt.raises(SystemExit):
        _parse_expectations(["malformed"])
