"""Execution worker: the accelerated engine behind the native C ABI.

The reference's C ABI dispatches into the GPU units in-process
(``/root/reference/src/cuda/core/panda_interface.cu:152-191``).  A TPU
analog cannot link XLA into ``libpanda_host.so`` — the engine lives in the
JAX runtime — so the native library reaches it through THIS worker: a
long-lived subprocess (one per ``panda_session`` with the TPU execution
target) speaking a length-prefixed binary protocol over stdin/stdout.
The process boundary replaces the reference's CUDA-context boundary; the
worker keeps jitted executables warm across calls exactly like the
reference keeps its setup state resident (``wrapper.rs``).

Protocol (all integers little-endian):
  request  = u32 cmd | u32 curve_len | curve utf-8 | body
    cmd 1 (MSM): u64 slen | scalars | u64 blen | bases
    cmd 2 (NTT): u32 log_n | u32 inverse | u32 has_omega |
                 [32/48B omega if has_omega] | u64 len | data
    cmd 0 (PING): empty body
  reply    = i32 rc | u64 outlen | out-bytes
rc values are PandaError codes (runtime/errors.py), 0 = success.  Any
unexpected exception maps to INTERNAL (9) with an empty payload; the
worker never crashes on malformed work — the C side surfaces rc.

Wire format of the payloads is the byte API's (LE Montgomery), so a
result obtained here is byte-identical to ``runtime.api.msm``.
"""

from __future__ import annotations

import struct
import sys


def _read_exact(f, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            raise EOFError
        buf += chunk
    return buf


def serve(inp, out) -> None:
    from panda_tpu.runtime import api
    from panda_tpu.runtime.errors import PandaError, PandaRuntimeError
    from panda_tpu.runtime.manager import PandaManager

    managers: dict[str, PandaManager] = {}

    def manager(curve: str) -> PandaManager:
        if curve not in managers:
            managers[curve] = PandaManager.new(0, curve)
        return managers[curve]

    def reply(rc: int, payload: bytes = b"") -> None:
        out.write(struct.pack("<iQ", rc, len(payload)))
        out.write(payload)
        out.flush()

    while True:
        try:
            head = _read_exact(inp, 8)
        except EOFError:
            return                          # clean shutdown: C side closed
        cmd, clen = struct.unpack("<II", head)
        curve = _read_exact(inp, clen).decode() if clen else ""
        try:
            if cmd == 0:                    # ping / warmup
                reply(0)
            elif cmd == 1:                  # MSM
                (slen,) = struct.unpack("<Q", _read_exact(inp, 8))
                scalars = _read_exact(inp, slen)
                (blen,) = struct.unpack("<Q", _read_exact(inp, 8))
                bases = _read_exact(inp, blen)
                reply(0, api.msm(manager(curve), scalars, bases))
            elif cmd == 2:                  # NTT / INTT / v1
                log_n, inverse, has_omega = struct.unpack(
                    "<III", _read_exact(inp, 12))
                gm = manager(curve)
                omega = (_read_exact(inp, gm.curve.fr.n_bytes)
                         if has_omega else None)
                (dlen,) = struct.unpack("<Q", _read_exact(inp, 8))
                data = _read_exact(inp, dlen)
                if inverse:
                    res = api.intt(gm, data, log_n)
                elif omega is not None:
                    res = api.ntt_v1(gm, data, log_n, omega)
                else:
                    res = api.ntt(gm, data, log_n)
                reply(0, res)
            else:
                reply(int(PandaError.INVALID_VALUE))
        except PandaRuntimeError as e:
            reply(int(e.code))
        except EOFError:
            return
        except Exception as e:              # pragma: no cover - safety net
            print(f"panda worker error: {e!r}", file=sys.stderr, flush=True)
            reply(int(PandaError.INTERNAL))


def main() -> None:
    # Binary stdio; all diagnostics go to stderr.
    serve(sys.stdin.buffer, sys.stdout.buffer)


if __name__ == "__main__":
    main()
