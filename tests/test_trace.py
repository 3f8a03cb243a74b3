"""Tracing utilities (SURVEY §5: ark_std timer + DEBUG_PROFILING analogs)."""

import jax.numpy as jnp

from panda_tpu.utils import trace


def test_timer_records_and_prints(capsys, monkeypatch):
    monkeypatch.setenv("PANDA_PRINT_TRACE", "1")
    trace.reset()
    with trace.timer("unit: test phase", block=jnp.zeros((4,))):
        pass
    out = capsys.readouterr().out
    assert "Start: unit: test phase" in out
    assert "End:   unit: test phase" in out
    s = trace.summary()
    assert s["unit: test phase"]["count"] == 1
    assert s["unit: test phase"]["total_s"] >= 0


def test_span_silent_by_default(capsys, monkeypatch):
    monkeypatch.delenv("PANDA_PRINT_TRACE", raising=False)
    trace.reset()
    t = trace.span("quiet phase")
    dt = t.end()
    assert dt >= 0
    assert capsys.readouterr().out == ""
    assert trace.phase_times["quiet phase"] == [dt]


def test_api_records_phases(rng):
    """The byte API should populate the phase registry."""
    import panda_tpu
    from panda_tpu import InitUnitType, PandaManager
    from panda_tpu.runtime import api

    fr = panda_tpu.BN254.fr
    trace.reset()
    gm = PandaManager.init_all(0, InitUnitType.NTT)
    vals = [rng.randrange(fr.modulus) for _ in range(8)]
    data = b"".join(fr.to_wire_int(v).to_bytes(32, "little") for v in vals)
    api.ntt_bn254(gm, data, 3)
    assert "ntt: execute" in trace.phase_times