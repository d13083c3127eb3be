"""Pin the committed weak-scaling artifact (round-3 VERDICT item 8).

BASELINE.md's >=85% weak-scaling target needs measured rows; real
multi-chip hardware is unavailable in CI, so the artifact records the
virtual-CPU-mesh ALGORITHMIC efficiency (flat-throughput ideal) plus a
2-process jax.distributed row. This test is the tripwire: the artifact
must exist, carry every schema field, and include the mesh sizes the
study claims — hard failures, not skips (the round-2 lesson from
test_sweep_artifact.py).
"""

import json
from pathlib import Path

ARTIFACT = Path(__file__).resolve().parents[1] / "WEAKSCALING_r03.json"

REQUIRED_FIELDS = {
    "mode",
    "devices",
    "n",
    "gsamples_per_s",
    "weak_scaling_efficiency",
    "algorithmic_efficiency",
}


def _load():
    assert ARTIFACT.exists(), (
        "WEAKSCALING_r03.json missing — run "
        "benchmarks/weak_scaling.py --cpu --two-process --out WEAKSCALING_r03.json"
    )
    return json.loads(ARTIFACT.read_text())


def test_artifact_schema_and_coverage():
    art = _load()
    assert art["per_device"] >= 1_000_000
    assert "protocol" in art and "K-differential" in art["protocol"]
    rows = art["rows"]
    assert rows, "artifact has no rows"
    for r in rows:
        assert REQUIRED_FIELDS <= set(r), r
        assert r["gsamples_per_s"] > 0, r
    by_mode = {}
    for r in rows:
        by_mode.setdefault(r["mode"], set()).add(r["devices"])
    # the virtual mesh study must cover 1..8 devices
    mesh_modes = [m for m in by_mode if m.endswith("_mesh")]
    assert mesh_modes, by_mode
    assert {1, 2, 4, 8} <= by_mode[mesh_modes[0]], by_mode
    # and the process-spanning jax.distributed row must be present
    assert "jax_distributed_2x4" in by_mode, by_mode
    assert 8 in by_mode["jax_distributed_2x4"]


def test_artifact_algorithmic_efficiency_sane():
    # on a shared socket, ideal weak scaling keeps absolute throughput
    # flat: algorithmic efficiency far below 1 would flag real collective
    # overhead (or a broken measurement); far above ~4 would flag a wrong
    # normalization
    art = _load()
    for r in art["rows"]:
        if r["devices"] > 1:
            assert 0.25 <= r["algorithmic_efficiency"] <= 4.0, r
