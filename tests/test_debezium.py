"""Debezium-envelope source: decode parity with the direct event stream."""

import os

import pyarrow as pa
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.sources.debezium import (
    decode_debezium,
    read_events_debezium,
    to_debezium_lines,
)

pytestmark = pytest.mark.fast


def _jsonl(tmp_path, name, lines):
    d = tmp_path / name
    d.mkdir()
    f = d / "segment-000.json"
    f.write_text("\n".join(lines) + "\n")
    return str(d)


def test_envelope_roundtrip_matches_direct_ingest(ray_session, tmp_path):
    repos = make_repos(4, 8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=60, scenario="tombstone")
    path = _jsonl(tmp_path, "binlog", to_debezium_lines(ev))
    stream = read_events_debezium(path)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8,
                       normalize_concurrency=2, applier_concurrency=2)
    ingest(stream, cfg, count_input=False)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_decode_op_mapping_and_delete_preimage(ray_session):
    import json

    rows = [
        {"payload": {"before": None,
                     "after": {"repo": "r", "path": "a", "commit": "c0",
                               "lang": "py", "content": "x"},
                     "op": "c", "ts_ms": 1,
                     "source": {"txId": 0, "lsn": 5, "table": "t"}}},
        {"payload": {"before": None,
                     "after": {"repo": "r", "path": "b", "commit": "c0",
                               "lang": "py", "content": "y"},
                     "op": "r", "ts_ms": 1,
                     "source": {"txId": 0, "lsn": 6, "table": "t"}}},
        {"payload": {"before": {"repo": "r", "path": "a", "commit": "c1",
                                "lang": "py", "content": "x"},
                     "after": None, "op": "d", "ts_ms": 2,
                     "source": {"txId": 1, "lsn": 9, "table": "t"}}},
    ]
    import pyarrow.json as paj

    raw = paj.read_json(__import__("io").BytesIO(
        ("\n".join(json.dumps(r) for r in rows)).encode()))
    out = decode_debezium(raw)
    assert out["op"].to_pylist() == ["insert", "insert", "delete"]
    assert out["epoch"].to_pylist() == [0, 0, 1]
    assert out["seq"].to_pylist() == [5, 6, 9]
    # delete: key comes from the pre-image, content is nulled
    assert out["repo"].to_pylist()[2] == "r" and out["path"].to_pylist()[2] == "a"
    assert out["content"].to_pylist() == ["x", "y", None]


def test_schemas_disabled_envelopes(ray_session, tmp_path):
    """No 'payload' wrapper (Debezium with schemas disabled)."""
    import json

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    lines = [json.dumps(json.loads(line)["payload"])
             for line in to_debezium_lines(ev)]
    path = _jsonl(tmp_path, "nowrap", lines)
    stream = read_events_debezium(path)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake2"), num_partitions=8,
                       normalize_concurrency=2, applier_concurrency=2)
    ingest(stream, cfg, count_input=False)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_unknown_op_rejected(ray_session):
    import io
    import json

    import pyarrow.json as paj

    raw = paj.read_json(io.BytesIO(json.dumps(
        {"payload": {"after": {"repo": "r", "path": "p", "commit": "c",
                               "lang": "py", "content": "z"},
                     "before": None, "op": "t",  # truncate: unsupported
                     "source": {"txId": 0, "lsn": 1}}}).encode()))
    with pytest.raises(ValueError, match="unknown Debezium op"):
        decode_debezium(raw)


def test_export_changelog_roundtrip(ray_session, tmp_path):
    """CDC OUT: exporting each commit's changelog as envelopes and
    re-ingesting through the connector reconstructs the source lake
    exactly — including update after-images and delete pre-image keys;
    an all-insert segment (JSON-inferred null `before`) decodes too."""
    import pandas as pd
    import pyarrow.compute as pc

    from etl_cms_ray.pipelines.ingest import read_lake
    from etl_cms_ray.sources.debezium import export_changelog_debezium

    repos = make_repos(5, 10)
    ev = make_events(repos, n_epochs=4, events_per_epoch=80)
    a_root = str(tmp_path / "lakeA")
    b_root = str(tmp_path / "lakeB")
    cfg = EngineConfig(lake_root=a_root, num_partitions=8)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)

    s1 = export_changelog_debezium(a_root, 0, 1, out_dir=str(tmp_path / "s1"))
    s2 = export_changelog_debezium(a_root, 1, 2, out_dir=str(tmp_path / "s2"))
    cfg_b = EngineConfig(lake_root=b_root, num_partitions=8)
    r1 = ingest(read_events_debezium(s1), cfg_b, count_input=False)
    r2 = ingest(read_events_debezium(s2), cfg_b, count_input=False)
    assert r1.events_applied > 0 and r2.events_applied > 0

    cols = ["repo", "path", "commit", "lang", "content"]
    a = read_lake(a_root).to_pandas()[cols].sort_values(
        ["repo", "path"]).reset_index(drop=True)
    b = read_lake(b_root).to_pandas()[cols].sort_values(
        ["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # replaying the same exported segment is an exactly-once no-op
    r3 = ingest(read_events_debezium(s2), cfg_b, count_input=False)
    assert r3.events_applied == 0
