"""TPU-gated Pallas flash-attention numerics lock (VERDICT r3 next #6,
ADVICE r3 #3): the in-process suite forces an 8-device CPU mesh, where
sm3x/models/vit.py's flash path statically falls back to the checkpointed
XLA attention — so the ACTUAL kernel (padding, segment-id masking, custom
VJP) is locked here via a subprocess on the default backend. Skips
cleanly when no TPU is reachable (hermetic runs).

slow-gated: shares the axon tunnel with benches — never run -m slow
while a TPU bench is in a timed window (BENCH.md methodology).
"""

import os
import subprocess
import sys

import pytest

_CHECK = os.path.join(os.path.dirname(__file__), "flash_tpu_check.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_flash_attention_tpu_numerics():
    env = dict(os.environ)
    # keep the axon plugin importable (NOTES_ROUND3: dropping
    # /root/.axon_site from PYTHONPATH silently loses the TPU backend)
    parts = [_REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p]
    axon = "/root/.axon_site"
    if os.path.isdir(axon) and axon not in parts:
        parts.append(axon)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    proc = subprocess.run([sys.executable, _CHECK], env=env,
                          capture_output=True, text=True, timeout=1800)
    out = proc.stdout + proc.stderr
    if proc.returncode == 42:
        pytest.skip(f"no TPU backend in subprocess: {out[-500:]}")
    assert proc.returncode == 0, out[-3000:]
    assert "flash TPU numerics: PASS" in out
