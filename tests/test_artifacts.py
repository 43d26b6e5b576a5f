"""build_artifact atomic-publish contract: a crashed build must never
be mistaken for a finished artifact, and a successful retry must
produce correct results."""

import os

import pytest

from clickhub_spark.artifacts import build_artifact, derived_artifact_path
from clickhub_spark.catalog import load

from tests.conftest import SF_DIR


def test_build_artifact_crash_then_retry(spark):
    import uuid

    src = load(spark, SF_DIR, "region")
    tag = f"atomic_test_{uuid.uuid4().hex[:8]}"  # fresh per run: the
    # warehouse persists across sessions and a published artifact from
    # a previous run would short-circuit the crash path
    expected = derived_artifact_path(src, tag)
    calls = {"n": 0}

    def crashing_writer(build: str) -> None:
        calls["n"] += 1
        # simulate a crash AFTER partial output exists
        os.makedirs(build, exist_ok=True)
        with open(os.path.join(build, "part-00000.parquet"), "w") as f:
            f.write("partial garbage")
        raise RuntimeError("simulated mid-build crash")

    with pytest.raises(RuntimeError):
        build_artifact(src, tag, crashing_writer)
    # the half-built directory must NOT have been published
    assert not os.path.isdir(expected)

    def good_writer(build: str) -> None:
        calls["n"] += 1
        src.write.mode("overwrite").parquet(build)

    path = build_artifact(src, tag, good_writer)
    assert path == expected and os.path.isdir(path)
    assert spark.read.parquet(path).count() == src.count()

    # third call: cached — the writer must not run again
    before = calls["n"]
    assert build_artifact(src, tag, good_writer) == expected
    assert calls["n"] == before
