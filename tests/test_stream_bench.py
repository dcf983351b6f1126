"""The streaming-bench staging invariant: the file stream must replay
events CHRONOLOGICALLY (ascending file mtimes over event-time-ordered
chunks), or the first micro-batch jumps the watermark to ~max(ts) and
the rest of the stream is silently classified late (measured: a
time-shuffled replay made dropDuplicatesWithinWatermark emit only 25%
of a unique stream). See scripts/stream_bench.py."""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory, monkeypatch_module):
    import stream_bench

    monkeypatch_module.setattr(stream_bench, "SF_DIR", "/root/testdata/sf0.001")
    out = str(tmp_path_factory.mktemp("stage") / "chunks")
    stream_bench.stage(spark, 1, out_dir=out)
    return out


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def _chunks(staged):
    return sorted(
        f for f in os.listdir(staged) if f.startswith("chunk_")
    )


def test_stage_chunk_files_and_marker(staged):
    import stream_bench

    assert len(_chunks(staged)) == stream_bench.N_FILES
    assert os.path.exists(os.path.join(staged, "_STAGED"))


def test_stage_mtimes_ascend_with_chunk_order(staged):
    mtimes = [
        os.path.getmtime(os.path.join(staged, f)) for f in _chunks(staged)
    ]
    assert mtimes == sorted(mtimes)
    assert len(set(mtimes)) == len(mtimes)  # strictly ascending


def test_stage_chunks_partition_event_time(staged):
    """Chunk i's max(ts) ≤ chunk i+1's min(ts): the replay is a true
    event-time partition, so the watermark advances monotonically."""
    prev_max = None
    total = 0
    for f in _chunks(staged):
        t = pq.read_table(os.path.join(staged, f), columns=["ts"])
        col = t.column("ts").to_pylist()
        total += len(col)
        assert col, f
        lo, hi = min(col), max(col)
        if prev_max is not None:
            assert prev_max <= lo, (f, prev_max, lo)
        prev_max = hi
    assert total == 1000  # sf0.001 events, nothing dropped in staging


def test_stage_docs_partitions_doc_id(spark, tmp_path, monkeypatch):
    """The ingest bench's doc chunks must partition doc_id ranges so
    the 8 scheduler fires replay a deterministic growing corpus."""
    import stream_bench

    monkeypatch.setattr(stream_bench, "SF_DIR", "/root/testdata/sf0.001")
    d = stream_bench.stage_docs(spark, 1, out_dir=str(tmp_path / "chunks"))
    files = sorted(f for f in os.listdir(d) if f.startswith("chunk_"))
    assert len(files) == stream_bench.N_FILES
    prev_max = None
    total = 0
    for f in files:
        t = pq.read_table(os.path.join(d, f), columns=["doc_id"])
        ids = t.column("doc_id").to_pylist()
        total += len(ids)
        if prev_max is not None:
            assert prev_max < min(ids)
        prev_max = max(ids)
    assert total == 500  # sf0.001 documents, nothing dropped in staging


def test_marker_keyed_by_sf_dir(tmp_path, monkeypatch):
    """A staged chunk dir is reusable only when it was staged FROM the
    current SF_DIR — flipping SPARK_GRAFT_SF_DIR must force a re-stage
    instead of silently replaying the other dataset's chunks."""
    import stream_bench

    marker = str(tmp_path / "_STAGED")
    monkeypatch.setattr(stream_bench, "SF_DIR", "/root/testdata/sf0.001")
    assert not stream_bench._marker_matches(marker)  # absent
    stream_bench._write_marker(marker)
    assert stream_bench._marker_matches(marker)
    monkeypatch.setattr(stream_bench, "SF_DIR", "/root/testdata/sf0.01")
    assert not stream_bench._marker_matches(marker)  # stale source
    # legacy "ok" markers (pre-provenance) also force a re-stage
    with open(marker, "w") as f:
        f.write("ok")
    assert not stream_bench._marker_matches(marker)


def test_merge_record_appends_invocation_provenance(tmp_path, monkeypatch):
    """STREAM_BENCH.json accumulates across invocations; each must
    append a provenance entry naming its scales/pipelines so a mixed
    1x/10x + manual 100x artifact is auditable."""
    import stream_bench

    monkeypatch.setattr(stream_bench, "SF_DIR", "/root/testdata/sf0.1")
    rec1 = stream_bench._merge_record(
        str(tmp_path),
        {"p1": {"x1": {"wall_s": 1.0}, "x10": {"wall_s": 2.0}}},
        (1, 10),
    )
    assert [i["scales_run"] for i in rec1["invocations"]] == [[1, 10]]
    rec2 = stream_bench._merge_record(
        str(tmp_path), {"p1": {"x100": {"wall_s": 30.0}}}, (1, 10, 100)
    )
    assert [i["scales_run"] for i in rec2["invocations"]] == [
        [1, 10], [1, 10, 100]
    ]
    assert rec2["invocations"][1]["pipelines_run"] == ["p1"]
    assert all("recorded_at" in i for i in rec2["invocations"])
    # the per-scale rows merged, none lost
    assert set(rec2["pipelines"]["p1"]) >= {"x1", "x10", "x100"}


def test_report_guards_none_and_timeout(tmp_path):
    """rows_per_s is None when wall_s is 0 and growth ratios can be
    None — the renderer must emit em-dashes, never crash or print
    'Nonex'; a timed_out run is flagged in its cells."""
    import stream_bench

    record = {
        "sf_dir": "/root/testdata/sf0.1",
        "pipelines": {
            "degenerate": {
                "x1": {"rows_per_s": None, "max_state_rows": 0,
                       "wall_s": 0.0, "input_rows": 0,
                       "output_rows": 0, "n_batches": 0},
                "x10": {"rows_per_s": 17.0, "max_state_rows": 3,
                        "wall_s": 600.0, "input_rows": 10000,
                        "output_rows": 1, "n_batches": 2,
                        "timed_out": True},
                "wall_growth_x1_x10": None,
                "state_growth_x1_x10": None,
            },
        },
    }
    stream_bench._write_report(str(tmp_path), record)
    md = (tmp_path / "STREAM_BENCH.md").read_text()
    assert "Nonex" not in md and "None" not in md
    assert "| degenerate | — | 17 (timeout) | 0 | 3 (timeout) | — | — |" in md


def test_report_renders_mixed_scale_records(tmp_path):
    """_write_report must render records regardless of which scales a
    pipeline has recorded (a --scales 1,10,100 refresh can land before
    every pipeline has its second decade)."""
    import stream_bench

    record = {
        "sf_dir": "/root/testdata/sf0.1",
        "pipelines": {
            "two_decades": {
                "x1": {"rows_per_s": 100.0, "max_state_rows": 5,
                       "wall_s": 1.0, "input_rows": 100,
                       "output_rows": 100, "n_batches": 8},
                "x10": {"rows_per_s": 1000.0, "max_state_rows": 5,
                        "wall_s": 1.0, "input_rows": 1000,
                        "output_rows": 1000, "n_batches": 8},
                "x100": {"rows_per_s": 9000.0, "max_state_rows": 5,
                         "wall_s": 1.1, "input_rows": 10000,
                         "output_rows": 10000, "n_batches": 8},
                "wall_growth_x1_x10": 1.0,
                "wall_growth_x10_x100": 1.1,
                "state_growth_x1_x10": 1.0,
                "state_growth_x10_x100": 1.0,
            },
            "one_decade": {
                "x1": {"rows_per_s": 50.0, "max_state_rows": 2,
                       "wall_s": 2.0, "input_rows": 100,
                       "output_rows": 90, "n_batches": 8},
                "x10": {"rows_per_s": 400.0, "max_state_rows": 20,
                        "wall_s": 2.5, "input_rows": 1000,
                        "output_rows": 900, "n_batches": 8},
                "wall_growth_x1_x10": 1.25,
                "state_growth_x1_x10": 10.0,
            },
        },
    }
    stream_bench._write_report(str(tmp_path), record)
    md = (tmp_path / "STREAM_BENCH.md").read_text()
    assert "| two_decades | 100 | 1000 | 9000 | 5 | 5 | 5 " in md
    # the one-decade record renders em-dashes for the missing scale
    assert "| one_decade | 50 | 400 | — | 2 | 20 | — " in md
    assert "1.0x/1.1x" in md  # consecutive-decade wall ratios
    assert "rows/s (100x)" in md  # header includes every present scale
