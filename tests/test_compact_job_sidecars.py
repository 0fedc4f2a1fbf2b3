"""Unit tests (Spark-free) for jobs/compact_sinks.copy_sidecars — the
lineage/dictionary copy that points consumers at the clustered root.

ADVICE r5: the manifest 'path' rewrite was an unanchored str.replace of
--input, which silently no-oped whenever --input was spelled differently
(relative vs absolute, trailing slash) from the root recorded at commit
time — the copied manifests then still pointed at the source run.  The
rewrite now rebuilds the path from the destination root and fails loudly
on a recorded path outside the input root.
"""

import json
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "jobs"),
)
from compact_sinks import copy_sidecars  # noqa: E402


def _make_run(root, sink_path):
    lin = root / "_lineage" / "run-x"
    lin.mkdir(parents=True)
    (lin / "web.json").write_text(json.dumps(
        {"rows": 7, "path": sink_path, "run_id": "run-x", "sink": "web"}
    ))
    (lin / "_data.marker").write_text(json.dumps(
        {"run_id": "run-x", "sink_layout": "archive"}
    ))


def _manifest_path(out):
    with open(os.path.join(str(out), "_lineage", "run-x", "web.json")) as f:
        return json.load(f)["path"]


def test_rewrite_absolute_input(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _make_run(src, str(src / "sinks" / "sink=web"))
    copy_sidecars(str(src), str(dst))
    assert _manifest_path(dst) == os.path.join(str(dst), "sinks", "sink=web")
    # non-JSON marker copied verbatim
    assert os.path.exists(
        os.path.join(str(dst), "_lineage", "run-x", "_data.marker")
    )


def test_rewrite_survives_different_input_spelling(tmp_path, monkeypatch):
    # recorded path is absolute; --input is given RELATIVE with a
    # trailing slash — the old str.replace found no match and no-oped
    src, dst = tmp_path / "src", tmp_path / "dst"
    _make_run(src, str(src / "sinks" / "sink=web"))
    monkeypatch.chdir(tmp_path)
    copy_sidecars("src/", str(dst))
    got = _manifest_path(dst)
    assert got == os.path.join(str(dst), "sinks", "sink=web")
    assert str(src) not in got  # must not point at the source run


def test_recorded_path_outside_input_root_fails_loud(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _make_run(src, str(tmp_path / "elsewhere" / "sink=web"))
    with pytest.raises(ValueError, match="outside the input root"):
        copy_sidecars(str(src), str(dst))


def test_archive_dictionary_travels(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _make_run(src, str(src / "sinks" / "sink=web"))
    d = src / "archive_logtype_dict"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"not-a-real-parquet")
    copy_sidecars(str(src), str(dst))
    assert (dst / "archive_logtype_dict" / "part-0.parquet").read_bytes() == (
        b"not-a-real-parquet"
    )
