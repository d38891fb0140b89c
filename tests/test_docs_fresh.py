"""Docs-freshness gates (round-9 verdict item 4): cheap grep/recompute
checks that the meta-artifacts a judge reads first (registry_report.json,
SCALE.md) cannot silently contradict the live code / grade state again.

Each test recomputes the ground truth from source-of-record files
(CORRECTNESS_r*.json, the live registry) rather than trusting the doc.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _graded_ever() -> dict[str, bool]:
    """name -> latest-grade pass, recomputed from every CORRECTNESS file."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                ok = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and (row.get("hash_match") is not False)
                    and not row.get("err")
                )
                if name not in latest or rnd > latest[name][0]:
                    latest[name] = (rnd, ok)
    return {n: ok for n, (_, ok) in latest.items()}


@pytest.fixture(scope="module")
def report():
    path = os.path.join(REPO, "registry_report.json")
    assert os.path.exists(path), (
        "registry_report.json missing — regenerate with "
        "`python tools/registry_report.py` as the LAST close-out step"
    )
    with open(path) as f:
        return json.load(f)


def test_report_grade_counts_match_correctness_files(report):
    """summary.driver_graded_ever must equal the union of CORRECTNESS
    files — the exact staleness that bit round 8 (pre-grade snapshot)."""
    truth = _graded_ever()
    assert report["summary"]["driver_graded_ever"] == len(truth), (
        f"registry_report.json is stale: says "
        f"{report['summary']['driver_graded_ever']} graded, CORRECTNESS "
        f"files say {len(truth)} — rerun tools/registry_report.py"
    )
    fails = sorted(n for n, ok in truth.items() if not ok)
    assert sorted(report["summary"]["latest_grade_fail"]) == fails


def test_report_registry_size_matches_live_registry(report):
    from my_flink_1_10_2_spark.queries import all_queries

    live = all_queries()
    assert report["summary"]["registry"] == len(live), (
        "registry_report.json predates a registry change — regenerate"
    )


def test_staging_floats_never_graded_first(report):
    """The auto-float staging contract: while a grading backlog exists,
    the first 50 positions (the driver's grade window) must all be
    never-graded queries."""
    if report["summary"]["never_graded"] >= 50:
        assert report["summary"]["first_50_all_never_graded"] is True


def test_scale_md_does_not_claim_closed_gates_open():
    """SCALE.md's 'remaining honest gates' list must not name gates the
    code has since closed (the 16-bit-PNG staleness of rounds 7-8)."""
    with open(os.path.join(REPO, "SCALE.md")) as f:
        text = f.read()
    m = re.search(r"Remaining honest gates:.*?\.", text, re.S)
    assert m, "SCALE.md lost its honest-gates line"
    gates = m.group(0)
    # 16-bit PNG closed r7 (llm/png.py), avro snappy/zstd closed r9
    assert "16-bit PNG" not in gates
    assert "snappy/zstd" not in gates and "snappy/zstandard" not in gates

    from my_flink_1_10_2_spark.sources import avro_py

    assert "snappy" in avro_py.CODECS and "zstandard" in avro_py.CODECS


def test_scale_md_has_per_round_sections():
    """Every round from 7 on must leave a labelled scale-audit section
    (or pointer block) in SCALE.md so a fresh reader gets the current
    picture without spelunking COVERAGE."""
    with open(os.path.join(REPO, "SCALE.md")) as f:
        text = f.read()
    for rnd in (7, 8, 9):
        assert re.search(rf"## Round-{rnd} additions", text), (
            f"SCALE.md missing a labelled Round-{rnd} section"
        )
