"""Artifact store: catalog resolution, sha256 verify, executor shipping."""

import json
import os

import pytest

from nlp_cube_spark.io import modelstore as MS


def test_resolve_packaged_and_latest():
    p = MS.resolve("micro_parser")
    assert os.path.exists(p)
    assert MS.latest_version("micro_parser") == "1.0"
    w = MS.load_json("micro_parser")
    assert isinstance(w, dict) and len(w) > 10


def test_sha_mismatch_raises(tmp_path):
    f = tmp_path / "w.json"
    f.write_text("{}")
    MS.register("tampered", "1.0", str(f), sha256="0" * 64)
    with pytest.raises(ValueError, match="sha256 mismatch"):
        MS.resolve("tampered", "1.0")


def test_version_resolution(tmp_path):
    for v in ("1.0", "2.5", "2.0"):
        f = tmp_path / f"m{v}.json"
        f.write_text(json.dumps({"v": v}))
        MS.register("multi", v, str(f))
    assert MS.latest_version("multi") == "2.5"
    assert MS.load_json("multi")["v"] == "2.5"
    assert MS.load_json("multi", "1.0")["v"] == "1.0"


def test_unknown_raises():
    with pytest.raises(KeyError):
        MS.resolve("no_such_model")
    with pytest.raises(KeyError):
        MS.resolve("micro_parser", "99")


def test_ship_reaches_executors(spark):
    """addFile fan-out: every task reads the artifact via SparkFiles.get —
    the distributed analog of the reference unpacking into ~/.nlpcube."""
    basename = MS.ship(spark, "micro_parser")

    def probe(it):
        from nlp_cube_spark.io.modelstore import executor_path

        p = executor_path(basename)
        with open(p) as f:
            n = len(json.load(f))
        for _ in it:
            pass
        yield n

    ns = spark.sparkContext.parallelize(range(8), 4).mapPartitions(probe).collect()
    assert len(set(ns)) == 1 and ns[0] > 10
