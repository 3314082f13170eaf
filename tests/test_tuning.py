"""Backend-fingerprint-keyed kernel tuning table (VERDICT r4 Next #4)."""
import numpy as np

from multilevel_gnn_tpu.ops.pallas import tuning


def _with_fp(monkeypatch, fp):
    monkeypatch.setattr(tuning, "_fingerprint_cache", fp)
    monkeypatch.delenv("MGTPU_TE", raising=False)


def test_known_backend_build_picks_tuned_te(monkeypatch):
    _with_fp(monkeypatch, "PJRT C API\ntfrt_tpu v5e build cl/831091709")
    assert tuning.tuned_te() == 128


def test_unknown_backend_gets_default(monkeypatch):
    _with_fp(monkeypatch, "cpu something cl/999")
    assert tuning.tuned_te() == 256
    _with_fp(monkeypatch, "")  # off-TPU / error path
    assert tuning.tuned_te() == 256


def test_env_override_wins(monkeypatch):
    _with_fp(monkeypatch, "build cl/831091709")
    monkeypatch.setenv("MGTPU_TE", "512")
    assert tuning.tuned_te() == 512


def test_graph_build_uses_tuned_te(monkeypatch):
    """with_sorted_meta routes through the table: a known backend build
    changes the flat-layout chunking without any env var."""
    from multilevel_gnn_tpu.core.graph import Graph

    rng = np.random.RandomState(0)
    edges = rng.randint(0, 500, size=(2, 4000))
    _with_fp(monkeypatch, "v5e build cl/831091709")
    g128 = Graph.from_edges(edges, None, 500).with_sorted_meta()
    _with_fp(monkeypatch, "unknown build")
    g256 = Graph.from_edges(edges, None, 500).with_sorted_meta()
    assert g128.csr.te == 128 and g256.csr.te == 256
