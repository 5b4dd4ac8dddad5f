"""Benchmark decontamination (stages/decontam.py)."""

import pyarrow as pa
import ray.data as rd

from etl_cms_ray.stages.decontam import decontaminate, shingle_rows

SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_shingle_rows_windows_and_boundaries():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e f", "x y", "p q r s t"], pa.string()),
        }
    )
    out = shingle_rows(t, n=5).to_pandas()
    got = set(zip(out["doc_id"], out["shingle"]))
    assert got == {
        (1, "a b c d e"),
        (1, "b c d e f"),
        (3, "p q r s t"),
    }  # doc 2 is shorter than n -> no shingles; no cross-doc windows


def test_contaminated_docs_dropped_clean_kept(ray_session):
    bench = _ds([(100, "alpha beta gamma delta epsilon zeta")])
    pool = _ds(
        [
            (1, "totally unrelated words one two three four five six"),
            # contains the benchmark 5-gram verbatim mid-document:
            (2, "prefix words alpha beta gamma delta epsilon suffix words here"),
            (3, "alpha beta gamma but not five in a row of them at all"),
            (4, "short doc"),
        ]
    )
    clean = decontaminate(pool, bench, n=5, pool_schema=SCHEMA).to_pandas()
    assert sorted(clean["doc_id"]) == [1, 3, 4]


def test_no_overlap_keeps_everything(ray_session):
    bench = _ds([(100, "q w e r t y u i o p")])
    pool = _ds([(1, "a b c d e f g"), (2, "h i j k l m n")])
    clean = decontaminate(pool, bench, n=5, pool_schema=SCHEMA).to_pandas()
    assert sorted(clean["doc_id"]) == [1, 2]


def test_hash_and_string_modes_agree(ray_session):
    import numpy as np

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(60)]
    mk = lambda k: " ".join(rng.choice(vocab, k))
    bench = _ds([(100 + i, mk(20)) for i in range(5)])
    bench_texts = bench.to_pandas()["text"].tolist()
    pool_rows = [(i, mk(30)) for i in range(40)]
    # plant verbatim benchmark passages into a few pool docs
    pool_rows[3] = (3, pool_rows[3][1] + " " + bench_texts[0])
    pool_rows[7] = (7, bench_texts[2])
    pool = _ds(pool_rows)
    a = sorted(decontaminate(pool, bench, n=5, pool_schema=SCHEMA,
                             key="hash").to_pandas()["doc_id"])
    b = sorted(decontaminate(pool, bench, n=5, pool_schema=SCHEMA,
                             key="string").to_pandas()["doc_id"])
    assert a == b
    assert 3 not in a and 7 not in a
