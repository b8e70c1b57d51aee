"""Tri-state perf-flag gates (ops/dispatch.py).

The round-4 TPU sweep (benchmarks/results/flag_sweep_r4{,b}.jsonl) set
the defaults: window-resident Swin stages ON, attention proj-fusion /
LN-prologue / patchify OFF.  Every gate is tri-state — unset inherits
the measured default, "0"/"false"/"off" forces off, anything else on —
so deployments can reproduce any sweep row without code changes.
"""

import pytest

from vitta_tpu.ops import dispatch

GATES = [
    # (fn, env var, measured default)
    (dispatch.window_resident_enabled, "VITTA_WINDOW_RESIDENT", True),
    (dispatch.attn_ln_enabled, "VITTA_ATTN_LN", False),
    (dispatch.patchify_enabled, "VITTA_PATCHIFY", False),
    (dispatch.attn_proj_fused_enabled, "VITTA_ATTN_PROJ_FUSED", False),
    # round-5b/c sweep: attention head-loop pipe won at both dtypes,
    # LN-MLP pipe measured neutral (flag_sweep_r5{b,c}.jsonl)
    (dispatch.attn_pipe_enabled, "VITTA_ATTN_PIPE", True),
    (dispatch.mlp_pipe_enabled, "VITTA_MLP_PIPE", False),
]


@pytest.mark.parametrize("fn,var,default", GATES,
                         ids=[v for _, v, _ in GATES])
def test_tristate(fn, var, default, monkeypatch):
    monkeypatch.delenv(var, raising=False)
    monkeypatch.delenv("VITTA_ATTN_NO_PROJ", raising=False)
    assert fn() is default
    monkeypatch.setenv(var, "")
    assert fn() is default
    for off in ("0", "false", "off", "OFF"):
        monkeypatch.setenv(var, off)
        assert fn() is False
    for on in ("1", "true", "yes"):
        monkeypatch.setenv(var, on)
        assert fn() is True


def test_legacy_no_proj_forces_packed(monkeypatch):
    """VITTA_ATTN_NO_PROJ=1 (the pre-flip escape hatch, kept for the
    sweep configs) overrides even an explicit PROJ_FUSED=1."""
    monkeypatch.setenv("VITTA_ATTN_PROJ_FUSED", "1")
    monkeypatch.delenv("VITTA_ATTN_NO_PROJ", raising=False)
    assert dispatch.attn_proj_fused_enabled() is True
    monkeypatch.setenv("VITTA_ATTN_NO_PROJ", "1")
    assert dispatch.attn_proj_fused_enabled() is False
